package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binned range join vs the brute-force cross product: identical
  * matches, no duplicate pairs, and a plan with no nested-loop join. */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def points = Seq(
    (1L, -30.0), (2L, 0.0), (3L, 10.0), (4L, 25.0), (5L, 49.999),
    (6L, 50.0), (7L, 99.5), (8L, 100.0), (9L, 250.0), (10L, 999.99),
    (11L, 1000.0), (12L, -0.001)).toDF("pid", "v")

  private def intervals = Seq(
    (101L, 0.0, 50.0),      // half-open: excludes 50.0
    (102L, 25.0, 100.0),    // overlaps 101
    (103L, -50.0, 0.0),     // negative range, excludes 0.0
    (104L, 50.0, 50.0),     // empty (lo == hi, hi exclusive)
    (105L, 200.0, 100.0),   // inverted → matches nothing
    (106L, 0.0, 1000.0),    // wide catch-all, many bins
    (107L, 49.999, 50.001)  // straddles a bin boundary
  ).toDF("iid", "lo", "hi")

  test("matches the brute-force cross-join exactly, with no duplicates") {
    val got = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", binWidth = 50.0)
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    val want = points.crossJoin(intervals)
      .filter(col("v") >= col("lo") && col("v") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    assert(got.toSeq == want.toSeq)
    assert(got.length == got.distinct.length, "pair emitted in more than one bin")
  }

  test("boundary semantics: lo inclusive, hi exclusive, across bin edges") {
    val got = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 50.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got.contains((2L, 101L)))   // v=0.0 in [0,50)
    assert(!got.contains((6L, 101L)))  // v=50.0 not in [0,50)
    assert(got.contains((6L, 107L)))   // v=50.0 in [49.999,50.001)
    assert(!got.contains((2L, 103L)))  // v=0.0 not in [-50,0)
    assert(got.contains((1L, 103L)))   // v=-30 in [-50,0)
    assert(!got.contains((11L, 106L))) // v=1000.0 not in [0,1000)
    assert(got.forall(_._2 != 104L) && got.forall(_._2 != 105L)) // empty/inverted
  }

  test("null point or null bounds match nothing") {
    val p = Seq((1L, Some(10.0)), (2L, None)).toDF("pid", "v")
    val i = Seq((101L, Some(0.0), Some(50.0)), (102L, None, Some(50.0)),
      (103L, Some(0.0), None)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, "v", i, "lo", "hi", 50.0)
      .select("pid", "iid").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 101L)))
  }

  test("plans as an equi-join on the bin key, not a nested loop") {
    val plan = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 50.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a cross product:\n$plan")
  }

  test("binWidth must be positive; colliding column names rejected") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 0.0)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "v",
        intervals.withColumnRenamed("iid", "pid"), "lo", "hi", 50.0)
    }
  }

  test("a pathologically wide interval fails loudly instead of exploding bins") {
    def allMsgs(t: Throwable): String = {
      val sb = new StringBuilder
      var cur: Throwable = t
      while (cur != null) { sb ++= Option(cur.getMessage).getOrElse(""); cur = cur.getCause }
      sb.toString
    }
    // an open-ended band: billions of bins at binWidth 50 would OOM an
    // executor or die in sequence() with an opaque error — the in-action
    // guard names the row and the knobs instead
    val open = Seq((900L, 0.0, Double.MaxValue)).toDF("iid", "lo", "hi")
    val e1 = intercept[Exception] {
      RangeJoin.pointInInterval(points, "v", open, "lo", "hi", 50.0).collect()
    }
    assert(allMsgs(e1).contains("spans more than"), allMsgs(e1))
    // the cap is a real parameter: tightening it trips on a moderate span
    val e2 = intercept[Exception] {
      RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 50.0,
        maxBinsPerInterval = 5L).collect() // iid 106 spans 21 bins
    }
    assert(allMsgs(e2).contains("spans more than"), allMsgs(e2))
  }
}
