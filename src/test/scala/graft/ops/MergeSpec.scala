package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** CDC merge semantics: latest-change-wins, deletes, inserts,
  * pass-through, and arrival-order independence. */
class MergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0, 0L, 0L, false),
    (2L, "b", 20.0, 0L, 0L, false),
    (3L, "c", 30.0, 0L, 0L, false)
  ).toDF("k", "name", "bal", "__ts", "__tie", "__del")

  private def merged(changes: Seq[(Long, String, Double, Long, Long, Boolean)]) =
    Merge.applyChanges(base,
        changes.toDF("k", "name", "bal", "__ts", "__tie", "__del"),
        Seq("k"), Seq("__ts", "__tie"), "__del")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap

  test("latest change wins; untouched keys pass through; new keys insert") {
    val got = merged(Seq(
      (1L, "a1", 11.0, 5L, 1L, false),
      (1L, "a2", 12.0, 9L, 1L, false), // later ts wins
      (4L, "d", 40.0, 3L, 1L, false))) // insert
    assert(got == Map(1L -> ("a2", 12.0), 2L -> ("b", 20.0),
      3L -> ("c", 30.0), 4L -> ("d", 40.0)))
  }

  test("winning delete drops the key; a later upsert resurrects it") {
    val got = merged(Seq(
      (2L, "x", 0.0, 5L, 1L, true),        // delete k=2
      (3L, "x", 0.0, 5L, 1L, true),        // delete k=3 ...
      (3L, "c2", 33.0, 6L, 1L, false)))    // ... then re-insert
    assert(got == Map(1L -> ("a", 10.0), 3L -> ("c2", 33.0)))
  }

  test("same-ts ties resolve by the tie column; arrival order is irrelevant") {
    val changes = Seq(
      (1L, "late", 15.0, 5L, 2L, false),
      (1L, "early", 14.0, 5L, 1L, false))
    assert(merged(changes) == merged(changes.reverse))
    assert(merged(changes)(1L) == ("late", 15.0))
  }

  test("full tie on version+tieBreak: the tombstone wins (deleteCol is the last order rung)") {
    // a change agreeing with another on (ts, tie) AND every tieBreak
    // column, differing only in the delete flag, must resolve to the
    // tombstone deterministically — not engine-arbitrarily (advice r11)
    val changes = Seq(
      (2L, "x", 9.0, 5L, 1L, false),
      (2L, "x", 9.0, 5L, 1L, true))
    val got = Merge.applyChanges(base,
        changes.toDF("k", "name", "bal", "__ts", "__tie", "__del"),
        Seq("k"), Seq("__ts", "__tie"), "__del",
        tieBreakCols = Seq("name", "bal"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L), "k=2 must be deleted on the full tie")
    assert(Merge.applyChanges(base,
        changes.reverse.toDF("k", "name", "bal", "__ts", "__tie", "__del"),
        Seq("k"), Seq("__ts", "__tie"), "__del",
        tieBreakCols = Seq("name", "bal"))
      .collect().map(_.getLong(0)).toSet == got, "arrival order must not matter")
  }

  test("empty change stream is the identity") {
    assert(merged(Seq.empty) == Map(1L -> ("a", 10.0), 2L -> ("b", 20.0),
      3L -> ("c", 30.0)))
  }

  test("scd2History: half-open intervals chain per key; exactly one current row") {
    import org.apache.spark.sql.functions._
    val ch = Seq((1L, 10L, 100L, "v1"), (1L, 20L, 101L, "v2"),
      (1L, 30L, 102L, "v3"), (2L, 15L, 200L, "w1"))
      .toDF("k", "ts", "tie", "payload")
    val hist = Merge.scd2History(ch, Seq(col("k")), col("ts"), col("tie"))
      .select("k", "ts", "valid_from", "valid_to", "is_current")
      .as[(Long, Long, Long, Option[Long], Int)].collect().sortBy(r => (r._1, r._2))
    assert(hist.toSeq == Seq(
      (1L, 10L, 10L, Some(20L), 0), (1L, 20L, 20L, Some(30L), 0),
      (1L, 30L, 30L, None, 1), (2L, 15L, 15L, None, 1)))
    // each key: intervals chain (valid_to == next valid_from), one current
    assert(hist.groupBy(_._1).forall { case (_, rows) => rows.count(_._5 == 1) == 1 })
  }

  test("scd2History: same-instant double update — later tie wins the open interval") {
    import org.apache.spark.sql.functions._
    val ch = Seq((1L, 10L, 1L, "first"), (1L, 10L, 2L, "second"))
      .toDF("k", "ts", "tie", "payload")
    val hist = Merge.scd2History(ch, Seq(col("k")), col("ts"), col("tie"))
      .select("tie", "valid_from", "valid_to", "is_current")
      .as[(Long, Long, Option[Long], Int)].collect().sortBy(_._1)
    // earlier tie gets the ZERO-LENGTH interval [10,10) — unmatched by
    // any half-open probe; later tie is current
    assert(hist.toSeq == Seq((1L, 10L, Some(10L), 0), (2L, 10L, None, 1)))
  }
}
