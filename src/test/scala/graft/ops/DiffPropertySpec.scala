package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property check: snapshotDiff over seeded random snapshot pairs
  * (overlapping keys, NULL-bearing values, forced equal rows) equals a
  * driver-side reference diff, and the recovered change stream applied
  * back to the old snapshot reproduces the new one. */
class DiffPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("random snapshot pairs: classification matches the reference; diff→merge round-trips") {
    val rnd = new Random(7L)
    for (round <- 1 to 3) {
      def snap(): Map[Long, (Option[String], Double)] =
        (0L until 200L).flatMap { k =>
          if (rnd.nextDouble() < 0.7)
            Some(k -> (if (rnd.nextDouble() < 0.15) None else Some(s"v${rnd.nextInt(4)}"),
              rnd.nextInt(5).toDouble))
          else None
        }.toMap
      val oldM = snap()
      // newer: mutate from older so unchanged rows genuinely occur
      val newM = (0L until 200L).flatMap { k =>
        (oldM.get(k), rnd.nextInt(4)) match {
          case (Some(v), 0) => Some(k -> v)                        // unchanged
          case (Some(_), 1) => Some(k -> (Some(s"n${rnd.nextInt(3)}"): Option[String], 9.0)) // changed
          case (Some(_), 2) => None                                // deleted
          case (None, _) if rnd.nextBoolean() => Some(k -> (Some("add"): Option[String], 1.0)) // added
          case _ => None
        }
      }.toMap
      val older = oldM.toSeq.map { case (k, (s, v)) => (k, s, v) }.toDF("k", "s", "v")
      val newer = newM.toSeq.map { case (k, (s, v)) => (k, s, v) }.toDF("k", "s", "v")
      val got = Diff.snapshotDiff(older, newer, Seq("k"), Seq("s", "v"))
        .select("k", "change_type").as[(Long, String)].collect().toMap
      val want = ((oldM.keySet ++ newM.keySet).flatMap { k =>
        (oldM.get(k), newM.get(k)) match {
          case (None, Some(_)) => Some(k -> "added")
          case (Some(_), None) => Some(k -> "deleted")
          case (Some(a), Some(b)) if a != b => Some(k -> "changed")
          case _ => None
        }
      }).toMap
      assert(got == want, s"round=$round classification diverged")

      // round trip: old + recovered changes == new
      val diff = Diff.snapshotDiff(older, newer, Seq("k"), Seq("s", "v"))
      val changes = diff.select(col("k"), col("new_s").as("s"),
        coalesce(col("new_v"), lit(0.0)).as("v"), lit(1L).as("ver"),
        (col("change_type") === "deleted").as("del"))
      val base = older.withColumn("ver", lit(0L)).withColumn("del", lit(false))
      val merged = Merge.applyChanges(base, changes, Seq("k"), Seq("ver"), "del")
        .select("k", "s", "v").as[(Long, Option[String], Double)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(merged == newM, s"round=$round merge round-trip diverged")
    }
  }
}
