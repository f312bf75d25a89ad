package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Hostile-row parity for the streaming surface (r10: the batch
  * scoreboard runs green over the hostile twin, but stream-vs-batch
  * agreement was only pinned on clean fixtures). The single-code-path
  * contract must hold on exactly the row classes HostileGen plants:
  * NULL event times, NULL group keys, duplicate ids, -0.0/1e10
  * values, NULL dedup fingerprints. */
class StreamingHostileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(minutes: Int): Timestamp = new Timestamp(60000L * (minutes + 60))

  test("tumbling windows: NULL ts rows vanish identically on stream and batch; -0.0/1e10 values agree") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Option[Timestamp], Double)]
    val rows = Seq(
      (1L, 101L, Some(ts(0)), -0.0),        // negative zero value
      (1L, 101L, Some(ts(1)), 1e10),        // duplicate event_id, huge value
      (2L, 901L, None, 5.0),                // NULL ts: the as-of phantom class
      (2L, 202L, Some(ts(2)), 2.5),
      (9L, 999L, Some(ts(5000)), 0.0))      // far future: advances watermark
    val stream = input.toDF().toDF("user_id", "event_id", "ts", "value")
    val q = Streaming.tumblingAgg(stream, "1 hour", watermark = Some("0 seconds"))
      .writeStream.format("memory").queryName("hostile_tumble")
      .outputMode(OutputMode.Append).start()
    input.addData(rows); q.processAllAvailable()
    // a second batch moves the watermark past the first hour
    input.addData(Seq((9L, 998L, Some(ts(6000)), 0.0))); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("hostile_tumble")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
    val batchAll = Streaming.tumblingAgg(
      rows.toDF("user_id", "event_id", "ts", "value"), "1 hour")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
    // stream emitted every window closed by the final watermark; the
    // NULL-ts row belongs to NO window on either side (TimeWindow emits
    // nothing for a null event time — same contract as the batch
    // oracles' `ts IS NOT NULL` exclusion)
    val closed = batchAll.filter(_._1.getTime < ts(6000).getTime)
    assert(streamed == closed, s"streamed=$streamed\nclosed=$closed")
    // the first-hour window carries both hostile values exactly
    val firstHour = streamed.find(_._1.getTime == ts(0).getTime)
    assert(firstHour.exists(w => w._2 == 3L && w._3 == 1.00000000025e10),
      s"first-hour window: $firstHour")
    assert(!streamed.exists(_._1 == null) && !batchAll.exists(_._1 == null))
  }

  test("session windows: a NULL user_id is a GROUP on stream and batch alike") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Option[Long], Long, Timestamp, Double)]
    val rows = Seq(
      (Some(1L), 101L, ts(0), 1.0),
      (None, 901L, ts(1), 2.0),            // NULL user: a real group
      (None, 902L, ts(3), 3.0),            // same NULL-user session
      (Some(1L), 102L, ts(2), 4.0),
      (Some(9L), 999L, ts(5000), 0.0))     // watermark advancer
    val stream = input.toDF().toDF("user_id", "event_id", "ts", "value")
      .select(col("user_id"), col("ts"), col("value"))
    val q = Streaming.sessionAgg(stream, "10 minutes", watermark = Some("0 seconds"))
      .writeStream.format("memory").queryName("hostile_sess")
      .outputMode(OutputMode.Append).start()
    input.addData(rows); q.processAllAvailable()
    input.addData(Seq((Some(9L), 998L, ts(6000), 0.0))); q.processAllAvailable()
    q.stop()

    def norm(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (if (r.isNullAt(0)) -1L else r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3), r.getDouble(4))
    }.toSet
    val streamed = norm(spark.table("hostile_sess"))
    val batchDf = rows.toDF("user_id", "event_id", "ts", "value")
      .select(col("user_id"), col("ts"), col("value"))
    // final watermark is ts(6000): user 9's FIRST session (end
    // ts(5000)+gap) is closed under it and must appear on both sides
    val closed = norm(Streaming.sessionAgg(batchDf, "10 minutes"))
      .filter(_._3.getTime < ts(6000).getTime)
    assert(streamed == closed, s"streamed=$streamed\nclosed=$closed")
    // the NULL-user session exists, merged events 901+902 (gap 2 min)
    assert(streamed.exists(s => s._1 == -1L && s._4 == 2L && s._5 == 5.0),
      s"null-user session missing: $streamed")
  }

  test("checkpoint restart: window state and offsets recover — no replays, no losses") {
    // Exactly-once across a query RESTART, which nothing else covers:
    // run 1 closes hour A and leaves hour C's partial aggregate in the
    // state store; run 2 (same checkpoint, fresh query) must emit hour
    // C exactly once — from RECOVERED state, without reprocessing or
    // re-emitting run 1's rows.
    implicit val ctx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val (ckpt, out) = (s"$base/ckpt", s"$base/out")
    val input = MemoryStream[(Long, Long, Timestamp, Double)]
    // the memory sink rejects checkpoint recovery outright — the file
    // sink is the fault-tolerant one, and its manifest also proves the
    // no-duplicate half (a replayed batch would land twice in out/)
    def startQuery() = {
      val stream = input.toDF().toDF("user_id", "event_id", "ts", "value")
      Streaming.tumblingAgg(stream, "1 hour", watermark = Some("0 seconds"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
    }
    val q1 = startQuery()
    input.addData(Seq(
      (1L, 101L, ts(0), 1.5), (1L, 102L, ts(5), 2.5),  // hour A
      (9L, 999L, ts(5000), 4.0)))                       // hour C (partial)
    q1.processAllAvailable(); q1.stop()
    def readOut() = spark.read.parquet(out)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
    val run1 = readOut()
    assert(run1.size == 1 && run1.head._2 == 2L && run1.head._3 == 4.0,
      s"run 1 must close exactly hour A: $run1") // 1.5+2.5

    val q2 = startQuery()
    input.addData(Seq((9L, 998L, ts(8000), 0.0)))       // closes hour C
    q2.processAllAvailable(); q2.stop()
    val run2 = readOut()
    // hour C appears once, with run 1's recovered partial (n=1, 4.0);
    // hour A is still there exactly once (no replay, no loss)
    assert(run2.size == 2 && run2.contains(run1.head),
      s"run 2 out must be hour A + recovered hour C exactly: $run2")
    val hourC = (run2 - run1.head).head
    assert(hourC._2 == 1L && hourC._3 == 4.0,
      s"hour C must carry run 1's recovered partial: $hourC")
  }

  test("streaming dedup: NULL fingerprints dedup together within the horizon (dropDuplicates null-as-value)") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Option[String], Timestamp)]
    val stream = input.toDF().toDF("doc_id", "text", "ts")
    val q = Streaming.dedupStream(stream, "text", "ts", horizon = "1 hour")
      .writeStream.format("memory").queryName("hostile_dedup")
      .outputMode(OutputMode.Append).start()
    input.addData(Seq(
      (1L, Some("same text"), ts(0)),
      (2L, Some("same text"), ts(1)),   // exact dup: dropped
      (3L, None, ts(2)),                // NULL text -> NULL md5
      (4L, None, ts(3)),                // second NULL fingerprint
      (5L, Some("other"), ts(4))))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("hostile_dedup").select("doc_id")
      .as[Long].collect().toSet
    // dropDuplicatesWithinWatermark treats NULL as a VALUE (SQL
    // distinct semantics): the second null-text row is a duplicate of
    // the first — pinned here so a change in that contract is loud.
    assert(kept == Set(1L, 3L, 5L), s"kept=$kept")
  }
}
