package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gaps-and-islands sessionization: boundary strictness, equal-ts
  * behavior, per-key independence, and the one-shuffle plan contract. */
class SessionizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toSeq.toDF("user_id", "event_id", "s")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")

  private def sess(df: org.apache.spark.sql.DataFrame, gapSec: Long = 3600) =
    Sessionize.sessionize(df, col("user_id"), col("ts"), gapSec, col("event_id"))
      .select("user_id", "event_id", "session_id")
      .as[(Long, Long, Long)].collect().sorted.toSeq

  test("splits where the gap strictly exceeds the threshold") {
    val got = sess(ev(
      (1L, 1L, "2024-01-01 00:00:00"),
      (1L, 2L, "2024-01-01 00:30:00"),  // 30min gap → same session
      (1L, 3L, "2024-01-01 02:00:00"),  // 90min gap → new session
      (1L, 4L, "2024-01-01 02:59:00")))
    assert(got == Seq((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (1L, 4L, 2L)))
  }

  test("a gap exactly equal to the threshold does NOT split (strict >)") {
    val got = sess(ev(
      (1L, 1L, "2024-01-01 00:00:00"),
      (1L, 2L, "2024-01-01 01:00:00"),   // exactly 3600s
      (1L, 3L, "2024-01-01 02:00:01"))) // 3601s → split
    assert(got == Seq((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L)))
  }

  test("equal timestamps always share a session; keys are independent") {
    val got = sess(ev(
      (1L, 1L, "2024-01-01 00:00:00"),
      (1L, 2L, "2024-01-01 00:00:00"),
      (2L, 3L, "2024-01-01 00:00:00"),
      (2L, 4L, "2024-01-02 00:00:00")))
    assert(got == Seq((1L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L), (2L, 4L, 2L)))
  }

  test("the downstream per-session aggregate adds no second exchange") {
    val df = ev((1L, 1L, "2024-01-01 00:00:00"), (1L, 2L, "2024-01-01 05:00:00"),
      (2L, 3L, "2024-01-01 00:00:00"))
    val agg = Sessionize.sessionize(df, col("user_id"), col("ts"), 3600, col("event_id"))
      .groupBy("user_id", "session_id").agg(count(lit(1)).as("n"))
    val nShuffles = agg.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(nShuffles == 1,
      s"expected the window's single shuffle to serve the aggregate too:\n${agg.queryExecution.executedPlan}")
    assert(agg.count() == 3)
  }
}
