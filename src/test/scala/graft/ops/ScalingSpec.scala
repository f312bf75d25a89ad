package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-group robust scaling: hand-checked fences and z-scores,
  * degenerate groups never divide by zero, nulls drop, in-range
  * values pass the winsorizer untouched. */
class ScalingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(String, java.lang.Double)]) =
    Scaling.robustScale(
      rows.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
        .toDF("id", "g", "v"), "g", "v")
      .select("id", "g", "v", "winsorized", "zscore")
      .as[(Long, String, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap

  test("hand-checked fences and z on {0,0,0,0,10}") {
    // p05 = 0, p95 = 8.0 (0.95·4 = 3.8 → 0·0.2 + 10·0.8); mean 2,
    // sample sd = sqrt(20) → z(10) = 1.7889, z(0) = −0.4472
    val got = run(Seq(("a", Double.box(0.0)), ("a", Double.box(0.0)),
      ("a", Double.box(0.0)), ("a", Double.box(0.0)), ("a", Double.box(10.0))))
    assert(got(4L)._4 == 8.0, got(4L))
    assert(got(4L)._5 == 1.7889, got(4L))
    assert(got(0L)._4 == 0.0 && got(0L)._5 == -0.4472, got(0L))
  }

  test("constant and singleton groups emit z = 0 without dividing by zero") {
    val got = run(Seq(("c", Double.box(7.0)), ("c", Double.box(7.0)),
      ("c", Double.box(7.0)), ("solo", Double.box(3.0))))
    assert(got.values.forall(_._5 == 0.0), got)
    assert(got(3L)._4 == 3.0)
  }

  test("null values drop; other rows' stats are unaffected") {
    val base = run(Seq(("a", Double.box(1.0)), ("a", Double.box(2.0)),
      ("a", Double.box(3.0))))
    val withNull = Scaling.robustScale(
      Seq((0L, "a", Double.box(1.0)), (1L, "a", Double.box(2.0)),
        (2L, "a", Double.box(3.0)), (9L, "a", null: java.lang.Double))
        .toDF("id", "g", "v"), "g", "v")
      .select("id", "g", "v", "winsorized", "zscore")
      .as[(Long, String, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(!withNull.contains(9L))
    assert(withNull.view.mapValues(_._5).toMap == base.view.mapValues(_._5).toMap)
  }

  test("values inside the fences are unchanged by winsorization") {
    val got = run((1 to 100).map(i => ("g", Double.box(i.toDouble))))
    // fences at p05/p95 of 1..100: interior points keep their value
    val interior = got.values.filter(r => r._3 > 10 && r._3 < 90)
    assert(interior.nonEmpty && interior.forall(r => r._4 == r._3))
    // the extremes clamp to the fences, monotonically
    assert(got.values.map(_._4).min >= got.values.filter(_._3 <= 10).map(_._4).min)
  }

  test("reference percentile: hand-checked buckets against 1..100") {
    // boundaries at p = 0.1..0.9 of 1..100 interpolate to 10.9, 20.8,
    // …, 90.1 (pos = p·99)
    val ref = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val probe = Seq((1L, 0.5), (2L, 11.0), (3L, 55.0), (4L, 100.0), (5L, 999.0))
      .toDF("id", "v")
    val got = Scaling.referencePercentile(probe, "v", ref, "v", buckets = 10)
      .select("id", "ref_bucket").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 5, 4L -> 9, 5L -> 9), got)
  }

  test("reference percentile: empty reference yields null buckets, not a silent 0") {
    val ref = Seq((1L, 5.0)).toDF("id", "v").filter(col("v") < 0)
    val probe = Seq((1L, 3.0)).toDF("id", "v")
    val out = Scaling.referencePercentile(probe, "v", ref, "v", buckets = 10)
      .select("ref_bucket").collect()
    assert(out.length == 1 && out.head.isNullAt(0))
    intercept[IllegalArgumentException] {
      Scaling.referencePercentile(probe, "v", probe, "v", buckets = 1)
    }
  }

  test("fence arguments are validated") {
    val df = Seq((1L, "g", 1.0)).toDF("id", "g", "v")
    intercept[IllegalArgumentException] { Scaling.robustScale(df, "g", "v", 0.9, 0.1) }
    intercept[IllegalArgumentException] { Scaling.robustScale(df, "g", "v", -0.1, 0.5) }
  }
}
