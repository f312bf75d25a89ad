package graft.ops

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Property tests for PageRank: on random directed edge lists —
  * self-loops, duplicate edges, dangling nodes (targets with no
  * out-edges), multiple components — the distributed ranks must be
  * BIT-IDENTICAL to a single-threaded reference spelling the same
  * per-iteration quantization (floor(x·1e7 + 0.5) per contribution,
  * integer sum, one double divide, one damping FMA-free update). This
  * pins the operator's central determinism claim: ranks are a pure
  * function of the input, independent of partitioning — the property
  * the x32 oracle checks on one fixed graph, here over the space. */
class PageRankPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private val caseGen: Gen[(Seq[(Long, Long)], Int, Double)] = for {
    n <- Gen.chooseNum(1, 50)
    es <- Gen.listOfN(n, for {
      u <- Gen.chooseNum(0L, 15L); v <- Gen.chooseNum(0L, 15L) } yield (u, v))
    iters <- Gen.chooseNum(1, 5)
    d <- Gen.oneOf(0.85, 0.5, 0.99)
  } yield (es, iters, d)

  /** The reference: identical arithmetic, one thread, no Spark. */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
                        d: Double): Map[Long, Double] = {
    val e = edges.distinct
    val outdeg = e.groupBy(_._1).map { case (k, v) => k -> v.size }
    val nodes = e.flatMap(t => Seq(t._1, t._2)).distinct
    var rank = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val sums = e.groupBy(_._2).map { case (dst, in) =>
        val q = in.map { case (s, _) =>
          math.floor(rank(s) / outdeg(s) * 1e7 + 0.5).toLong }.sum
        dst -> q.toDouble / 1e7
      }
      rank = nodes.map(n => n -> ((1.0 - d) + d * sums.getOrElse(n, 0.0))).toMap
    }
    rank
  }

  test("ranks are bit-identical to the single-threaded quantized reference") {
    val cases = Gen.listOfN(6, caseGen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { case (edges, iters, d) =>
      val got = PageRank.pagerank(edges.toDF("s", "t"), col("s"), col("t"),
          iterations = iters, damping = d)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = reference(edges, iters, d)
      assert(got == want,
        s"iters=$iters d=$d edges=$edges:\n$got\nvs $want")
    }
  }
}
