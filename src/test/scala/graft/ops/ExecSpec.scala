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
