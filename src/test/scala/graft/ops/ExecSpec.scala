package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestSession, Tables}

/** Exec.materialize must be a pure execution-policy switch: the durable
  * (cluster) path and the localCheckpoint (local) path must produce
  * identical results for the operators built on it. */
class ExecSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def runBoth(q: => org.apache.spark.sql.DataFrame): (Set[String], Set[String]) = {
    def rows(): Set[String] = q.collect().map(_.toString).toSet
    spark.conf.set(Exec.DurableConf, "false")
    val local = try rows() finally spark.conf.unset(Exec.DurableConf)
    spark.conf.set(Exec.DurableConf, "true")
    val durable = try rows() finally {
      spark.conf.unset(Exec.DurableConf)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    (local, durable)
  }

  test("ngramJaccardPairs identical under local and durable materialization") {
    val docs = Tables.documents(spark, sf)
    val (local, durable) = runBoth(
      graft.text.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5))
    assert(local.nonEmpty || durable.isEmpty)
    assert(local == durable, s"modes diverge: only-local=${local -- durable} only-durable=${durable -- local}")
  }

  test("lshNearDup identical under local and durable materialization") {
    val emb = Tables.embeddings(spark, sf)
    val (local, durable) = runBoth(
      graft.sim.Similarity.lshNearDup(emb, "vec_id", "embedding", "label", 0.35, 4))
    assert(local == durable, s"modes diverge: only-local=${local -- durable} only-durable=${durable -- local}")
  }

  test("release on a DERIVED frame reaps the materialized parent (both modes)") {
    // r15 review: the bare-caller contract (pass the returned frame to
    // release) silently did nothing in durable mode — lineage is
    // retained there, so the parent is a cached SUBTREE, not the
    // frame's own plan; the CacheBridge walk has to find it
    import spark.implicits._
    def pinned(): Int = spark.sparkContext.getPersistentRDDs.size
    for (durable <- Seq("false", "true")) {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      assert(pinned() == 0)
      spark.conf.set(Exec.DurableConf, durable)
      try {
        val parent = Exec.materialize((1 to 100).toDF("v"))
        val derived = parent.select((org.apache.spark.sql.functions.col("v") * 2).as("w"))
        assert(derived.count() == 100)
        assert(pinned() > 0)
        Exec.release(derived)
        val deadline = System.nanoTime() + 10e9.toLong
        while (pinned() > 0 && System.nanoTime() < deadline) Thread.sleep(50)
        assert(pinned() == 0,
          s"release(derived, durable=$durable) left ${pinned()} pinned RDDs")
      } finally spark.conf.unset(Exec.DurableConf)
    }
  }

  test("release stops at the topmost pinned layer — a live parent below a released child survives (both modes)") {
    // the precision rule that makes release safe mid-computation
    // (collectShingleStats releases its stats frame while the shingle
    // arrays BELOW it are still live): local mode gets this from
    // lineage truncation, durable mode from the walk stopping at the
    // first cache hit
    import spark.implicits._
    def pinned(): Int = spark.sparkContext.getPersistentRDDs.size
    for (durable <- Seq("false", "true")) {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      assert(pinned() == 0)
      spark.conf.set(Exec.DurableConf, durable)
      try {
        val parent = Exec.materialize((1 to 100).toDF("v"))
        val child = Exec.materialize(
          parent.select((org.apache.spark.sql.functions.col("v") * 2).as("w")))
        assert(child.count() == 100)
        Exec.release(child)
        // the parent must still be pinned AND still serve its rows
        assert(parent.count() == 100)
        assert(pinned() > 0,
          s"release(child, durable=$durable) must not reach the live parent")
        Exec.release(parent)
        val deadline = System.nanoTime() + 10e9.toLong
        while (pinned() > 0 && System.nanoTime() < deadline) Thread.sleep(50)
        assert(pinned() == 0)
      } finally spark.conf.unset(Exec.DurableConf)
    }
  }

  test("release drops the blocks materialize pinned (both modes)") {
    // review r14: Exec.materialize pins blocks (cache-manager entry in
    // durable mode, a checkpointed RDD outside the cache manager in
    // local mode) and library callers had no release that reached both;
    // Dataset.unpersist alone misses the localCheckpoint RDD
    import spark.implicits._
    def pinned(): Int = spark.sparkContext.getPersistentRDDs.size
    for (durable <- Seq("false", "true")) {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      assert(pinned() == 0)
      spark.conf.set(Exec.DurableConf, durable)
      try {
        val m = Exec.materialize((1 to 100).toDF("v"))
        assert(m.count() == 100)
        assert(pinned() > 0, s"materialize(durable=$durable) pinned nothing")
        Exec.release(m)
        // unpersist(false) is async in places — poll briefly
        val deadline = System.nanoTime() + 10e9.toLong
        while (pinned() > 0 && System.nanoTime() < deadline) Thread.sleep(50)
        assert(pinned() == 0, s"release(durable=$durable) left ${pinned()} pinned RDDs")
      } finally spark.conf.unset(Exec.DurableConf)
    }
  }
}
