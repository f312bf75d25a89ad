package graft.ops

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Property tests for per-group robust scaling: on random groups —
  * nulls (dropped both sides of the fence), singletons and constant
  * groups (z = 0 by contract), heavy outliers (the winsorize target) —
  * the emitted (winsorized, zscore) pair must be BIT-IDENTICAL to a
  * single-threaded reference spelling the same arithmetic: Spark's
  * exact-percentile interpolation formula, the 1e-7-quantized sums
  * behind mean/variance, the n−1 variance with the −ε clamp, and the
  * floor-form 4-dp rounding. */
class ScalingPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions.col

  private type R = (Long, Long, Option[Double]) // (id, group, value)

  private val caseGen: Gen[Seq[R]] = for {
    n <- Gen.chooseNum(1, 50)
    rows <- Gen.listOfN(n, for {
      g <- Gen.chooseNum(0L, 4L)
      v <- Gen.frequency(1 -> Gen.const(Option.empty[Double]),
        1 -> Gen.const(Some(500.0)), // planted outlier
        7 -> Gen.chooseNum(-160, 160).map(i => Some(i / 4.0)))
    } yield (g, v))
  } yield rows.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }

  private def q7sum(vs: Seq[Double]): Double =
    vs.map(v => BigInt(math.floor(v * 1e7 + 0.5).toLong)).sum.toDouble / 1e7
  private def r4(v: Double): Double = {
    val t = v * 10000.0 + 0.5
    if (math.abs(t) < 9.007199254740992e15) math.floor(t) / 10000.0
    else t / 10000.0
  }
  /** Spark Percentile.getPercentile, verbatim arithmetic. */
  private def pct(sorted: IndexedSeq[Double], p: Double): Double = {
    val position = p * (sorted.length - 1)
    val lower = math.floor(position).toInt
    val higher = math.ceil(position).toInt
    if (higher == lower) sorted(lower)
    else (higher - position) * sorted(lower) + (position - lower) * sorted(higher)
  }

  private def reference(rows: Seq[R]): Map[Long, (Double, Double)] =
    rows.collect { case (_, g, Some(_)) => g }.distinct.flatMap { g =>
      val vs = rows.collect { case (id, `g`, Some(v)) => (id, v) }
      val sorted = vs.map(_._2).sorted.toIndexedSeq
      val (lo, hi) = (pct(sorted, 0.05), pct(sorted, 0.95))
      val n = vs.size
      val s = q7sum(vs.map(_._2))
      val s2 = q7sum(vs.map(v => v._2 * v._2))
      val mean = s / n
      val sd =
        if (n >= 2) math.sqrt(math.max((s2 - s * s / n) / (n - 1.0), 0.0)) else 0.0
      vs.map { case (id, v) =>
        val w = r4(math.min(math.max(v, lo), hi))
        val z = if (sd > 0.0) r4((v - mean) / sd) else 0.0
        id -> ((w, z))
      }
    }.toMap

  test("robustScale is bit-identical to the single-threaded exact reference") {
    val cases = Gen.listOfN(6, caseGen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { rows =>
      import spark.implicits._
      val got = Scaling.robustScale(
          rows.toDF("id", "g", "v").repartition(4), "g", "v")
        .collect().map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4))))
        .toMap
      val want = reference(rows)
      assert(got == want, s"rows=$rows:\n$got\nvs $want")
    }
  }
}
