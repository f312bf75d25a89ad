package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Weighted median per group: hand-checked centers, weight dominance,
  * tie accumulation under the RANGE frame, null/degenerate-weight
  * drops, and agreement with a brute-force scan on random inputs. */
class WeightedMedianSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def wm(rows: Seq[(String, Double, Double)]): Map[String, Double] =
    Aggs.weightedMedian(rows.toDF("k", "v", "w"), col("k"), col("v"), col("w"))
      .as[(String, Double)].collect().toMap

  test("hand-checked: heavy weight drags the median to its value") {
    // a: cum weights 1,2,12 over values 1,2,3 -> half-total 6 first
    // reached at v=3. b: uniform weights -> ordinary median element.
    val m = wm(Seq(
      ("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 10.0),
      ("b", 10.0, 1.0), ("b", 20.0, 1.0), ("b", 30.0, 1.0)))
    assert(m == Map("a" -> 3.0, "b" -> 20.0), s"got $m")
  }

  test("exact half-total boundary keeps the earlier value (2*cum >= tot)") {
    // cum(1.0)=5 of total 10: 2*5 >= 10 -> v=1 qualifies.
    val m = wm(Seq(("a", 1.0, 5.0), ("a", 2.0, 5.0)))
    assert(m("a") == 1.0, s"got $m")
  }

  test("tied values accumulate together under the RANGE frame") {
    // Three rows at v=1 (weight 2 each) vs one row at v=9 (weight 5):
    // every v=1 row sees cum=6 >= 11/2 -> median 1; a ROWS frame would
    // give the first v=1 row cum=2 and still pass only via its peers.
    val m = wm(Seq(("a", 1.0, 2.0), ("a", 1.0, 2.0), ("a", 1.0, 2.0),
      ("a", 9.0, 5.0)))
    assert(m("a") == 1.0, s"got $m")
  }

  test("null values and null/zero/negative weights are dropped") {
    val df = Seq(
      ("a", Some(1.0), Some(1.0)),
      ("a", Some(50.0), Some(0.0)),   // zero weight: ignored
      ("a", Some(60.0), Some(-3.0)),  // negative: ignored
      ("a", None, Some(9.0)),         // null value: ignored
      ("a", Some(70.0), None)         // null weight: ignored
    ).toDF("k", "v", "w")
    val m = Aggs.weightedMedian(df, col("k"), col("v"), col("w"))
      .as[(String, Double)].collect().toMap
    assert(m == Map("a" -> 1.0), s"got $m")
  }

  test("float group keys: -0.0 and 0.0 land in ONE group (SQL-normalized equality)") {
    // SQL grouping normalizes -0.0 to 0.0 while raw JVM boxed equality
    // does not — the two-pass scheme must apply one equality on both
    // sides or the pass-2 total lookup misses (regression shape for the
    // normKey fix). The -0.0 group must merge with 0.0: five unit
    // weights over values 1..5 → median 3.0.
    val df = Seq(
      (-0.0, 1.0, 1.0), (0.0, 2.0, 1.0), (-0.0, 3.0, 1.0),
      (0.0, 4.0, 1.0), (-0.0, 5.0, 1.0),
      (7.5, 9.0, 1.0)
    ).toDF("k", "v", "w")
    val got = Aggs.weightedMedian(df, col("k"), col("v"), col("w"))
      .as[(Double, Double)].collect().toMap
    assert(got.size == 2, s"expected merged zero group + one other, got $got")
    assert(got(0.0) == 3.0 && got(7.5) == 9.0, s"got $got")
  }

  test("fallback path (cap exceeded) returns identical medians") {
    // Force the windowed fallback with a tiny cap: the two execution
    // paths must agree row-for-row. 40 groups of 5 rows each; cap=3
    // guarantees both the per-partition truncation marker and the
    // driver-side total check trip.
    val rows = (0 until 200).map { i =>
      (s"g${i % 40}", ((i * 17) % 11).toDouble, 1.0 + (i * 7) % 3)
    }
    val df = rows.toDF("k", "v", "w")
    val fast = Aggs.weightedMedian(df, col("k"), col("v"), col("w"))
      .as[(String, Double)].collect().toMap
    val fb = Aggs.weightedMedian(df, col("k"), col("v"), col("w"),
        maxTwoPassGroups = 3)
      .as[(String, Double)].collect().toMap
    assert(fb == fast, s"fallback diverged: $fb vs $fast")
    assert(fb.size == 40)
  }

  test("struct group keys: nested -0.0 merges with +0.0 (recursive normKey)") {
    // SQL grouping normalizes floats INSIDE nested keys; both passes
    // must share that equality or pass-2's total lookup misses. One
    // merged group (0.0, "z") with unit weights over 1..4 → median 2.
    val df = Seq(
      (-0.0, "z", 1.0, 1.0), (0.0, "z", 2.0, 1.0),
      (-0.0, "z", 3.0, 1.0), (0.0, "z", 4.0, 1.0),
      (5.0, "q", 9.0, 1.0)
    ).toDF("ka", "kb", "v", "w")
    val got = Aggs.weightedMedian(df, struct(col("ka"), col("kb")),
        col("v"), col("w"))
      .select(col("key.ka"), col("key.kb"), col("w_median"))
      .as[(Double, String, Double)].collect()
    assert(got.length == 2, s"expected merged struct-zero group, got ${got.toSeq}")
    val m = got.map { case (a, b, v) => (a, b) -> v }.toMap
    assert(m((0.0, "z")) == 2.0 && m((5.0, "q")) == 9.0, s"got $m")
  }

  test("matches brute force on random-ish weighted rows") {
    val rows = (0 until 300).map { i =>
      (s"k${i % 4}", ((i * 41) % 17).toDouble, 1.0 + (i * 13) % 5)
    }
    val got = wm(rows)
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val tot = rs.map(_._3).sum
      val want = rs.sortBy(_._2)
        .scanLeft((0.0, 0.0)) { case ((_, c), (_, v, w)) => (v, c + w) }
        .drop(1)
        .collectFirst {
          // brute force mirrors the RANGE frame: a value qualifies on
          // the cumulative weight of ALL rows with value <= v
          case (v, _) if rs.filter(_._2 <= v).map(_._3).sum * 2 >= tot => v
        }.get
      assert(got(k) == want, s"key $k: got ${got(k)}, want $want")
    }
  }
}
