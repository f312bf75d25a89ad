package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Expression + aggregation/window operator specs (SURVEY.md §5.2):
  * flip involution on 2-dp inputs, angle-diff range/symmetry, argmin
  * tie-breaking, group-size and distinct-count filters, many-to-one
  * assertion. */
class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("X2 flip is an involution on 2-dp coordinates") {
    val df = Seq((12.34, 50.10, 271.50), (0.0, 53.3, 0.0), (120.0, 0.0, 359.99))
      .toDF("x", "y", "dir")
      .withColumn("left", lit(true))
    val once = df.select(
      Exprs.flipCoord(col("left"), col("x"), 120.0).as("x"),
      Exprs.flipCoord(col("left"), col("y"), 53.3).as("y"),
      Exprs.flipAngle(col("left"), col("dir")).as("dir"),
      col("left"))
    val twice = once.select(
      Exprs.flipCoord(col("left"), col("x"), 120.0).as("x"),
      Exprs.flipCoord(col("left"), col("y"), 53.3).as("y"),
      Exprs.flipAngle(col("left"), col("dir")).as("dir"))
    val in = df.select("x", "y", "dir").collect().map(_.toSeq)
    val out = twice.collect().map(_.toSeq)
    assert(in.toSeq == out.toSeq)
  }

  test("sumExact survives totals past int64 (the 100-TB overflow regime)") {
    // 4000 values of ~1e9 magnitude: the 1e-7-quantized running total is
    // ~4e19 > Long.MaxValue (9.2e18) — a long-typed sum silently wraps
    // negative; the decimal-routed sum must match exact BigDecimal math.
    val rng = new scala.util.Random(3)
    val vals = Seq.fill(4000)((rng.nextDouble() * 2 - 0.5) * 1e9)
    val sumQ = vals.map(v => BigDecimal(math.floor(v * 1e7 + 0.5))).sum
    assert(sumQ.abs > BigDecimal(Long.MaxValue),
      "test must actually exceed int64") // guard the premise
    val expected = sumQ.toDouble / 1e7 // same op order as sumExact's cast+divide
    val got = vals.toDF("v").repartition(8)
      .agg(Exprs.sumExact(col("v")).as("s")).head().getDouble(0)
    assert(got == expected, s"got $got want $expected")
  }

  test("avgExact: SQL AVG semantics — nulls excluded from the denominator") {
    val df = Seq(Some(2.0), Some(4.0), None).toDF("v")
    val r = df.agg(Exprs.avgExact(col("v")).as("a"), avg(col("v")).as("b")).head()
    assert(r.getDouble(0) == 3.0 && r.getDouble(1) == 3.0,
      s"null row must not deflate the mean: got ${r.getDouble(0)}")
    // all-null group degenerates to null, same as avg()
    val allNull = Seq[Option[Double]](None, None).toDF("v")
    assert(allNull.agg(Exprs.avgExact(col("v"))).head().isNullAt(0))
  }

  test("argminSelect/argmaxSelect agree with the window form on ties and order") {
    val df = Seq(
      (1L, 3, 10.0, "a"), (1L, 1, 10.0, "b"), (1L, 1, 5.0, "c"),
      (2L, 2, 7.0, "d"), (2L, 2, 7.0, "d"), // full duplicate row
      (3L, 9, 1.0, "e"))
      .toDF("k", "seq", "v", "payload")
    val order = Seq(col("v"), col("seq"), col("payload"))
    val viaWindow = Aggs.argminPerGroup(df, Seq(col("k")),
      order.map(_.asc))
      .select(col("k"), col("payload"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val viaAgg = Aggs.argminSelect(df, Seq(col("k")), order, Seq("payload", "v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg == Set((1L, "c", 5.0), (2L, "d", 7.0), (3L, "e", 1.0)))
    val viaMax = Aggs.argmaxSelect(df, Seq(col("k")), order, Seq("payload", "v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(viaMax == Set((1L, "a", 10.0), (2L, "d", 7.0), (3L, "e", 1.0)))
  }

  test("X3 angle diff is in [0, 180] and symmetric") {
    val rng = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rng.nextDouble() * 360, rng.nextDouble() * 360))
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      Exprs.angleDiff(col("a"), col("b")).as("ab"),
      Exprs.angleDiff(col("b"), col("a")).as("ba")).collect()
    rows.foreach { r =>
      val (ab, ba) = (r.getDouble(0), r.getDouble(1))
      assert(ab >= 0.0 && ab <= 180.0)
      assert(math.abs(ab - ba) < 1e-9)
    }
  }

  test("X1/X8/X14: distance, boundary distance, closing speed") {
    val df = Seq((0.0, 0.0, 3.0, 4.0)).toDF("x1", "y1", "x2", "y2")
    val r = df.select(
      Exprs.dist(col("x1"), col("y1"), col("x2"), col("y2")).as("d"),
      Exprs.boundaryDist(col("x2"), col("y2")).as("b"),
      // defender at origin moving due +x at speed 2 toward receiver at (3,4):
      // closing = -(v·(rec-def))/|rec-def| = -(2*3)/5 = -1.2
      Exprs.closingSpeed(col("x1"), col("y1"), lit(2.0), lit(0.0), col("x2"), col("y2")).as("c"))
      .head()
    assert(math.abs(r.getDouble(0) - 5.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 3.0) < 1e-12) // min(4, 49.3, 3, 117)
    assert(math.abs(r.getDouble(2) - (-1.2)) < 1e-12)
  }

  test("X12 recovery piecewise values for C/I/IN") {
    val df = Seq(("C", 0.3), ("I", 0.3), ("IN", 0.3), ("X", 0.3)).toDF("pr", "p")
    val out = df.select(col("pr"), Exprs.recoveryScore(col("pr"), col("p")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("C") - (-0.3)) < 1e-12)
    assert(math.abs(out("I") - 0.7) < 1e-12)
    assert(math.abs(out("IN") - 1.2 * 0.7) < 1e-12)
    assert(out("X") == 0.0)
  }

  test("rnd equals the portable floor-form on boundary-adjacent values") {
    // The invariant is engine agreement, not true-decimal rounding: rnd
    // must equal floor(x*100+0.5)/100 computed with plain IEEE doubles,
    // which is exactly what the DuckDB oracles spell out. (e.g. 2.675*100
    // rounds UP to 267.5 in binary, so the portable answer is 2.68 even
    // though the stored double is below 2.675.)
    val vals = Seq(1.005, 2.675, 4201.315, -3.145, 0.0, 0.985, 123.456)
    val df = vals.toDF("v")
    val out = df.select(Exprs.r2(col("v")).as("r")).as[Double].collect()
    val expected = vals.map(v => math.floor(v * 100 + 0.5) / 100)
    assert(out.toSeq == expected)
  }

  test("A4 argmin tie-break keeps the explicit-order winner") {
    val df = Seq(
      (1L, 5.0, 2L, "b"), (1L, 5.0, 1L, "a"), (1L, 7.0, 0L, "c"),
      (2L, 1.0, 9L, "z")).toDF("g", "m", "tie", "payload")
    val got = Aggs.argminPerGroup(df, Seq(col("g")), Seq(col("m").asc, col("tie").asc))
      .orderBy("g").collect().map(r => (r.getLong(0), r.getString(3))).toSeq
    assert(got == Seq((1L, "a"), (2L, "z")))
  }

  test("A6 group-size filter keeps only groups with >= n rows") {
    val df = (1 to 10).map(i => (if (i <= 7) "big" else "small", i)).toDF("g", "v")
    val got = Aggs.groupSizeFilter(df, Seq(col("g")), 5L)
      .select("g").distinct().as[String].collect().toSeq
    assert(got == Seq("big"))
  }

  test("A7 distinct-count filter keeps groups with exactly k distinct values") {
    val df = Seq(("p1", "QB"), ("p1", "WR"), ("p1", "DB"),
      ("p2", "QB"), ("p2", "QB"), ("p3", "QB"), ("p3", "WR")).toDF("g", "role")
    val got = Aggs.distinctCountFilter(df, Seq(col("g")), col("role"), 3)
      .select("g").distinct().as[String].collect().toSeq
    assert(got == Seq("p1"))
  }

  test("J2 many-to-one assertion passes on unique dim, fails on dup") {
    val uniq = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Joins.assertManyToOne(uniq, Seq("k")) // must not throw
    val dup = Seq((1L, "a"), (1L, "b")).toDF("k", "v")
    assertThrows[IllegalArgumentException] {
      Joins.assertManyToOne(dup, Seq("k"))
    }
    // pandas null semantics: ONE null-keyed row is a legal unique dim
    // (count(*) vs bare countDistinct would falsely flag it); TWO are
    // duplicates like any other repeated key value
    val oneNull = Seq((Some(1L), "a"), (None, "b")).toDF("k", "v")
    Joins.assertManyToOne(oneNull, Seq("k")) // must not throw
    val twoNulls = Seq((Some(1L), "a"), (None, "b"), (None, "c")).toDF("k", "v")
    assertThrows[IllegalArgumentException] {
      Joins.assertManyToOne(twoNulls, Seq("k"))
    }
  }
}
