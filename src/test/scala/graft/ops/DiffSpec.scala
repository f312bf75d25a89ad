package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot diff: classification truth table (incl. NULL transitions)
  * and the diff→merge round trip (applying the recovered changes to the
  * old snapshot reproduces the new one). */
class DiffSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("classifies added / deleted / changed and drops unchanged") {
    val older = Seq((1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
      (3L, Some("c"), 30.0), (4L, None: Option[String], 40.0),
      (5L, Some("e"), 50.0)).toDF("k", "s", "v")
    val newer = Seq((1L, Some("a"), 10.0),            // unchanged
      (2L, Some("B"), 20.0),                          // changed (string)
      (3L, Some("c"), 31.0),                          // changed (double)
      (4L, None: Option[String], 40.0),               // unchanged (NULL==NULL)
      (6L, Some("f"), 60.0)).toDF("k", "s", "v")      // added; 5 deleted
    val got = Diff.snapshotDiff(older, newer, Seq("k"), Seq("s", "v"))
      .select("k", "change_type").as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((2L, "changed"), (3L, "changed"), (5L, "deleted"), (6L, "added")))
  }

  test("NULL→value and value→NULL are changes; NULL→NULL is not") {
    val older = Seq((1L, Option.empty[String]), (2L, Some("x")),
      (3L, Option.empty[String])).toDF("k", "s")
    val newer = Seq((1L, Some("now")), (2L, Option.empty[String]),
      (3L, Option.empty[String])).toDF("k", "s")
    val got = Diff.snapshotDiff(older, newer, Seq("k"), Seq("s"))
      .select("k", "change_type").as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((1L, "changed"), (2L, "changed")))
  }

  test("diff → merge round trip reproduces the new snapshot") {
    val older = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "s", "v")
    val newer = Seq((1L, "a", 10.0), (2L, "B2", 21.0), (5L, "e", 50.0))
      .toDF("k", "s", "v")
    val diff = Diff.snapshotDiff(older, newer, Seq("k"), Seq("s", "v"))
    // re-shape the diff as a change stream and apply it with Merge
    val changes = diff.select(col("k"), coalesce(col("new_s"), lit("")).as("s"),
      coalesce(col("new_v"), lit(0.0)).as("v"), lit(1L).as("ver"),
      (col("change_type") === "deleted").as("del"))
    val base = older.withColumn("ver", lit(0L)).withColumn("del", lit(false))
    val merged = Merge.applyChanges(base, changes, Seq("k"), Seq("ver"), "del")
      .select("k", "s", "v").as[(Long, String, Double)].collect().sorted.toSeq
    val want = newer.select("k", "s", "v").as[(Long, String, Double)].collect().sorted.toSeq
    assert(merged == want)
  }
}
