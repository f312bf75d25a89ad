package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-key OLS trend: exact lines come back exactly, constants are
  * flat, null y rows don't shift the index, and the ≥2-point / total-
  * order contracts hold. */
class TrendSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fit(rows: Seq[(String, Int, java.lang.Double)]) =
    Trend.fitLine(rows.toDF("k", "ord", "y"), "k", Seq(col("ord")), "y")
      .select("k", "n_points", "slope", "intercept")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("an exact line y = 2x + 1 fits exactly; a constant is flat") {
    val rows = (1 to 10).map(i => ("line", i, Double.box(2.0 * i + 1.0))) ++
      (1 to 5).map(i => ("flat", i, Double.box(7.25)))
    val got = fit(rows)
    assert(got("line") == ((10L, 2.0, 1.0)), got("line"))
    assert(got("flat") == ((5L, 0.0, 7.25)), got("flat"))
  }

  test("a decreasing sequence has a negative slope") {
    val got = fit((1 to 8).map(i => ("down", i, Double.box(100.0 - 3.0 * i))))
    assert(got("down")._2 == -3.0, got("down"))
  }

  test("null y rows are dropped BEFORE indexing — the line is unchanged") {
    val clean = (1 to 6).map(i => ("k", i, Double.box(5.0 * i)))
    val holey = Seq(("k", 0, null: java.lang.Double)) ++
      (1 to 6).flatMap(i => Seq(("k", i, Double.box(5.0 * i)))) ++
      Seq(("k", 99, null: java.lang.Double))
    assert(fit(holey) == fit(clean),
      "nulls must not consume an index position or shift x")
  }

  test("keys with fewer than two points are absent by contract") {
    val got = fit(Seq(("solo", 1, Double.box(3.0)), ("pair", 1, Double.box(1.0)),
      ("pair", 2, Double.box(2.0))))
    assert(got.keySet == Set("pair"))
    assert(got("pair") == ((2L, 1.0, 0.0)), got("pair"))
  }
}
