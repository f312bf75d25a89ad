package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Fixed-iteration PageRank: fixed points, authority ordering on a
  * star, mass conservation on undirected graphs, dangling absorption
  * on directed ones, and knob validation. */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pr(edges: Seq[(Long, Long)], iters: Int = 3): Map[Long, Double] =
    PageRank.pagerank(edges.toDF("s", "t"), col("s"), col("t"), iters)
      .as[(Long, Double)].collect().toMap

  test("two mutually linked nodes sit at the 1.0 fixed point") {
    // rank' = 0.15 + 0.85 * rank/1: starting at 1.0 stays exactly 1.0.
    val m = pr(Seq((1L, 2L), (2L, 1L)), iters = 5)
    assert(m == Map(1L -> 1.0, 2L -> 1.0), s"got $m")
  }

  test("undirected star: the hub outranks the leaves, mass is conserved") {
    val leaves = (2L to 6L)
    val edges = leaves.flatMap(l => Seq((1L, l), (l, 1L)))
    val m = pr(edges, iters = 3)
    assert(leaves.forall(l => m(1L) > m(l)), s"hub must dominate: $m")
    assert(leaves.map(m).toSet.size == 1, "leaves are symmetric")
    // No dangling nodes -> total rank stays at N (up to quantization).
    assert(math.abs(m.values.sum - 6.0) < 1e-3, s"mass: ${m.values.sum}")
  }

  test("directed chain: a pure sink absorbs rank, a pure source decays") {
    // 1 -> 2 -> 3; node 3 has no out-edges (dangling, mass absorbed).
    val m = pr(Seq((1L, 2L), (2L, 3L)), iters = 10)
    assert(m(1L) == 0.15000000000000002, s"source decays to 1-d: ${m(1L)}")
    assert(m(2L) > m(1L) && m(3L) > m(1L), s"downstream gains: $m")
  }

  test("duplicate and null edges are cleaned before the degree count") {
    val df = Seq[(Option[Long], Option[Long])](
      (Some(1L), Some(2L)), (Some(1L), Some(2L)), // dup: one edge
      (Some(2L), Some(1L)),
      (None, Some(9L)), (Some(9L), None)          // nulls: dropped
    ).toDF("s", "t")
    val m = PageRank.pagerank(df, col("s"), col("t"), 4)
      .as[(Long, Double)].collect().toMap
    // Node 9 never enters via a complete edge; 1 and 2 behave as the
    // mutual pair (fixed point 1.0 exactly).
    assert(m == Map(1L -> 1.0, 2L -> 1.0), s"got $m")
  }

  test("knob validation") {
    val e = Seq((1L, 2L)).toDF("s", "t")
    intercept[IllegalArgumentException] {
      PageRank.pagerank(e, col("s"), col("t"), iterations = 0)
    }
    intercept[IllegalArgumentException] {
      PageRank.pagerank(e, col("s"), col("t"), damping = 1.0)
    }
  }
}
