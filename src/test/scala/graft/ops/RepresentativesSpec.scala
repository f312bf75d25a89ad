package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cluster-representative selection: best-copy argmax with the
  * documented tie order, singleton pass-through, and one-keeper-per-
  * cluster invariants. */
class RepresentativesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("chained cluster keeps its highest-quality member; ties break to min id") {
    // 1–2–3 chain into one cluster: qualities 5, 9, 9 → keeper 2.
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 1L)).toDF("doc_id", "q")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val assign = Components.connectedComponents(edges, "id_a", "id_b")
    val out = Components.representatives(docs, assign, "doc_id", col("q"))
      .select("doc_id", "dup_group", "keeper_id", "keep")
      .as[(Long, Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 1L, 2L, 0), (2L, 1L, 2L, 1), (3L, 1L, 2L, 0),
      (10L, 10L, 10L, 1)), s"got $out")
  }

  test("every cluster emits exactly one keeper and a shared keeper_id") {
    // two clusters {1,2}, {5,6,7} plus singletons 8, 9
    val docs = Seq((1L, 3L), (2L, 4L), (5L, 7L), (6L, 2L), (7L, 7L),
      (8L, 1L), (9L, 1L)).toDF("doc_id", "q")
    val edges = Seq((1L, 2L), (5L, 6L), (6L, 7L)).toDF("id_a", "id_b")
    val assign = Components.connectedComponents(edges, "id_a", "id_b")
    val out = Components.representatives(docs, assign, "doc_id", col("q"))
      .select("doc_id", "dup_group", "keeper_id", "keep")
      .as[(Long, Long, Long, Int)].collect()
    assert(out.length == 7)
    out.groupBy(_._2).foreach { case (g, rows) =>
      assert(rows.count(_._4 == 1) == 1, s"cluster $g keeper count")
      assert(rows.map(_._3).distinct.length == 1, s"cluster $g keeper_id split")
      val keeper = rows.find(_._4 == 1).get
      assert(keeper._1 == keeper._3, s"cluster $g keeper flags wrong row")
    }
    // {5,6,7}: qualities 7,2,7 → keeper 5 (tie 5 vs 7 → min id)
    assert(out.find(_._1 == 6L).get._3 == 5L)
  }

  test("no pairs at all: every row is its own keeper") {
    val docs = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "q")
    val edges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val assign = Components.connectedComponents(edges, "id_a", "id_b")
    val out = Components.representatives(docs, assign, "doc_id", col("q"))
      .select("doc_id", "keeper_id", "keep").as[(Long, Long, Int)].collect()
    assert(out.toSet == Set((1L, 1L, 1), (2L, 2L, 1)))
  }
}
