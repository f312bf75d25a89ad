package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Loud-contract pins for the hostile-value classes the round-10
  * differential sweep surfaced but deliberately keeps OUT of the twin
  * tables (a twin row would turn whole sweep queries into expected
  * crashes):
  *
  *  - [[Exprs.rnd]] previously rounded through Spark's `floor(double)`
  *    (returns LONG), silently saturating at ±9.2e18 scaled and
  *    mapping NaN to 0.0 — both silent corruption. The fixed form
  *    passes NaN through and computes the pure-double floor form past
  *    2^53, bit-identical to the DuckDB oracle expression.
  *  - [[Exprs.sumExact]]'s quantization domain is now ENFORCED at
  *    |x| < 9e11 — the point where the scaled long would actually
  *    saturate (the documented DESIGN bound is the stricter |x| < 1e11,
  *    an order of magnitude of headroom; see the sumExact doc) — so
  *    out-of-domain and non-finite rows abort with the offending
  *    value named, instead of clamping to Long.MaxValue.
  */
class HostileValuesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def r4One(v: Double): java.lang.Double = {
    val r = Seq(v).toDF("x").select(Exprs.r4(col("x")).as("r")).collect()(0)
    if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0))
  }

  test("r4 passes NaN through instead of collapsing it to 0.0") {
    assert(r4One(Double.NaN).isNaN)
    assert(r4One(Double.PositiveInfinity) == Double.PositiveInfinity)
    assert(r4One(Double.NegativeInfinity) == Double.NegativeInfinity)
  }

  test("r4 on huge values matches the pure-double floor form (no long saturation)") {
    // previously: floor(double)->LONG clamped these to Long.MaxValue/1e4
    for (x <- Seq(1e30, 1e15, 9.3e14, -1e30, 1.23456789e16)) {
      val expected = { val v = x * 1e4 + 0.5
        (if (math.abs(v) >= 9007199254740992d) v else math.floor(v)) / 1e4 }
      assert(r4One(x) == expected, s"r4($x)")
      assert(r4One(x) != 922337203685477.5807, s"r4($x) clamped")
    }
    // in-range values keep the exact historical semantics
    assert(r4One(4201.31499999999996) == math.floor(4201.31499999999996 * 1e4 + 0.5) / 1e4)
    assert(r4One(-0.0) == 0.0)
    assert(r4One(0.00005) == 0.0001)
  }

  test("r4 of null stays null") {
    val r = Seq(Tuple1[java.lang.Double](null)).toDF("x")
      .select(Exprs.r4(col("x")).as("r")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("sumExact aborts loudly outside its |x| < 9e11 quantization domain") {
    def sumOf(vs: Seq[java.lang.Double]): java.lang.Double = {
      val r = vs.map(Tuple1(_)).toDF("x")
        .agg(Exprs.sumExact(col("x")).as("s")).collect()(0)
      if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0))
    }
    // in-domain: exact, null rows skip (SQL SUM)
    assert(sumOf(Seq(1.5, 2.25, null)) == 3.75)
    assert(sumOf(Seq(8.9e11, -8.9e11)) == 0.0)
    // out-of-domain magnitude, NaN, Inf: loud, with the value named
    for (bad <- Seq(1e12, Double.NaN, Double.PositiveInfinity)) {
      val e = intercept[Exception] { sumOf(Seq(1.0, bad)) }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("quantization domain")),
        s"sumExact($bad) error did not name the domain: ${e.getMessage}")
    }
  }
}
