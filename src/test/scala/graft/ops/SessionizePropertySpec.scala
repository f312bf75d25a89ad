package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property check: sessionize over seeded random event streams (dense
  * timestamps, duplicates, many users) equals an in-memory reference
  * fold, for several gap thresholds. */
class SessionizePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def reference(rows: Seq[(Long, Long, Long)], gapMicros: Long): Map[(Long, Long), Long] = {
    // rows: (user, eventId, tsMicros) → (user, eventId) -> sessionId
    rows.groupBy(_._1).flatMap { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._2))
      var session = 0L
      var prev = Long.MinValue
      sorted.map { case (_, id, t) =>
        if (prev == Long.MinValue || t - prev > gapMicros) session += 1
        prev = t
        (u, id) -> session
      }
    }
  }

  test("random streams match the reference fold across gap thresholds") {
    val rnd = new Random(42L)
    for (round <- 1 to 3) {
      val rows = (1L to 400L).map { id =>
        val user = rnd.nextInt(7).toLong
        // cluster timestamps so gaps of every size occur, incl. exact ties
        val t = rnd.nextInt(50) * 600L + rnd.nextInt(3) * 17L
        (user, id, t * 1000000L)
      }
      val df = rows.toDF("user_id", "event_id", "us")
        .withColumn("ts", timestamp_micros(col("us")))
      for (gapSec <- Seq(600L, 1800L, 1L)) {
        val got = Sessionize.sessionize(df, col("user_id"), col("ts"),
            gapSec, col("event_id"))
          .select("user_id", "event_id", "session_id")
          .as[(Long, Long, Long)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
        val want = reference(rows, gapSec * 1000000L)
        assert(got == want, s"round=$round gap=$gapSec diverged")
      }
    }
  }
}
