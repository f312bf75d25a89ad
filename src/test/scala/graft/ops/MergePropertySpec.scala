package graft.ops

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Property tests for the CDC merge: on arbitrary base tables and
  * change streams (random keys, versions, deletes — including version
  * collisions resolved by the tie column), `Merge.applyChanges` must
  * equal a reference in-memory fold, and applying an already-applied
  * batch to the resulting snapshot must be a no-op (the crash-replay
  * idempotence `Streaming.mergeStream` relies on). */
class MergePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private type Row = (Long, String, Double, Long, Long, Boolean)

  private val rowGen: Gen[Row] = for {
    k <- Gen.chooseNum(0L, 12L) // few keys: force collisions
    name <- Gen.identifier.map(_.take(6))
    bal <- Gen.chooseNum(-100.0, 100.0).map(v => math.rint(v * 100) / 100)
    v <- Gen.chooseNum(1L, 20L) // few versions: force ties
    tie <- Gen.chooseNum(0L, 1000000L)
    del <- Gen.prob(0.2)
  } yield (k, name, bal, v, tie, del)

  /** Reference fold: highest (version, tie) per key wins; base rows are
    * version (0, 0); delete-winners vanish from the served view. */
  private def reference(base: Seq[Row], changes: Seq[Row]): Map[Long, (String, Double)] =
    (base ++ changes).groupBy(_._1).flatMap { case (k, rows) =>
      val w = rows.maxBy(r => (r._4, r._5))
      if (w._6) None else Some(k -> ((w._2, w._3)))
    }

  private def run(base: Seq[Row], changes: Seq[Row]): Map[Long, (String, Double)] =
    Merge.applyChanges(
        base.toDF("k", "name", "bal", "__v", "__tie", "__del"),
        changes.toDF("k", "name", "bal", "__v", "__tie", "__del"),
        Seq("k"), Seq("__v", "__tie"), "__del")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap

  test("applyChanges equals the in-memory fold on generated streams") {
    val cases = Gen.listOfN(6, for {
      nb <- Gen.chooseNum(0, 8)
      nc <- Gen.chooseNum(0, 40)
      // base rows: one per key, version (0,0), never deleted
      baseKeys <- Gen.listOfN(nb, Gen.chooseNum(0L, 12L)).map(_.distinct)
      base = baseKeys.map(k => (k, s"base$k", k * 1.5, 0L, 0L, false))
      changes <- Gen.listOfN(nc, rowGen)
    } yield (base, changes)).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { case (base, changes) =>
      // the contract requires a TOTAL version order per key: drop
      // exact (key, version, tie) duplicates, as a real CDC feed would
      val dedup = changes.groupBy(c => (c._1, c._4, c._5)).map(_._2.head).toSeq
      assert(run(base, dedup) == reference(base, dedup),
        s"base=$base changes=$dedup")
    }
  }

  test("batched snapshot application equals one-shot, any out-of-order split") {
    // VERDICT r11 #3: the incremental life cycle — apply changes in
    // arbitrary batches (versions deliberately NOT aligned with batch
    // order, so a tombstone can land a batch before an older upsert)
    // with asSnapshot = true, and the final snapshot must equal the
    // one-shot application. This is exactly the out-of-order
    // resurrection hazard the retained tombstones exist to prevent.
    val cases = Gen.listOfN(6, for {
      nb <- Gen.chooseNum(0, 8)
      baseKeys <- Gen.listOfN(nb, Gen.chooseNum(0L, 12L)).map(_.distinct)
      base = baseKeys.map(k => (k, s"base$k", k * 1.5, 0L, 0L, false))
      nc <- Gen.chooseNum(0, 40)
      changes <- Gen.listOfN(nc, rowGen)
      // batch index per change row, independent of its version: an
      // old-version row can land in a LATER batch than a newer delete
      splits <- Gen.listOfN(nc, Gen.chooseNum(0, 2))
    } yield (base, changes, splits)).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { case (base, changes0, splits) =>
      val changes = changes0.groupBy(c => (c._1, c._4, c._5)).map(_._2.head).toSeq
      def df(rows: Seq[Row]) = rows.toDF("k", "name", "bal", "__v", "__tie", "__del")
      def snapRows(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet
      val oneShot = Merge.applyChanges(df(base), df(changes), Seq("k"),
        Seq("__v", "__tie"), "__del", asSnapshot = true)
      val batches = changes.zip(splits.take(changes.length))
        .groupBy(_._2).toSeq.sortBy(_._1).map(_._2.map(_._1))
      val folded = batches.foldLeft(df(base)) { (acc, b) =>
        Merge.applyChanges(acc, df(b), Seq("k"), Seq("__v", "__tie"), "__del",
          asSnapshot = true)
      }
      assert(snapRows(folded) == snapRows(oneShot),
        s"base=$base changes=$changes splits=$splits")
    }
  }

  test("scd2History equals a driver-side sorted fold on random change streams") {
    // random per-key change streams including same-instant updates
    // (equal ts, distinct tie) and null timestamps; the fold replicates
    // the documented semantics: order by (ts nulls-first, tie),
    // valid_from = own ts, valid_to = successor's ts (half-open; a
    // same-instant pair gives the earlier row a zero-length interval),
    // is_current = no successor.
    val cases = Gen.listOfN(6, for {
      nc <- Gen.chooseNum(0, 30)
      rows <- Gen.listOfN(nc, for {
        k <- Gen.chooseNum(0L, 4L)
        t <- Gen.frequency(1 -> Gen.const(Option.empty[Long]),
          6 -> Gen.chooseNum(0L, 12L).map(m => Some(60000L * m)))
        tie <- Gen.chooseNum(0L, 9L)
        name <- Gen.identifier.map(_.take(4))
      } yield (k, t, tie, name))
    } yield rows.groupBy(r => (r._1, r._2, r._3)).map(_._2.head).toSeq)
      .sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { rows =>
      val df = rows.map { case (k, t, tie, name) =>
        (k, t.map(new java.sql.Timestamp(_)), tie, name)
      }.toDF("k", "ts", "tie", "name")
      val got = Merge.scd2History(df, Seq(col("k")), col("ts"), col("tie"))
        .collect().map(r => (r.getLong(0),
          Option(r.getTimestamp(1)).map(_.getTime), r.getLong(2), r.getString(3),
          Option(r.getTimestamp(4)).map(_.getTime),
          Option(r.getTimestamp(5)).map(_.getTime), r.getInt(6))).toSet
      val want = rows.groupBy(_._1).flatMap { case (_, rs) =>
        val sorted = rs.sortBy(r => (r._2.isDefined, r._2.getOrElse(0L), r._3))
        sorted.zipWithIndex.map { case ((k, t, tie, name), i) =>
          // successor's ts, None when absent — note a PRESENT successor
          // with a null ts (null-ts rows sort first, so only another
          // null-ts row) also yields valid_to = null and is_current = 1:
          // the operator derives both from lead(ts), not row existence
          val next = if (i + 1 < sorted.length) sorted(i + 1)._2 else None
          (k, t, tie, name, t, next, if (next.isEmpty) 1 else 0)
        }
      }.toSet
      assert(got == want, s"rows=$rows")
    }
  }

  test("re-applying an applied batch to the snapshot is a no-op (replay)") {
    val base = Seq((1L, "a", 1.0, 0L, 0L, false), (2L, "b", 2.0, 0L, 0L, false))
    val changes = Seq((1L, "a2", 1.1, 5L, 1L, false), (2L, "x", 0.0, 6L, 1L, true),
      (3L, "c", 3.0, 2L, 1L, false))
    val baseDf = base.toDF("k", "name", "bal", "__v", "__tie", "__del")
    val chDf = changes.toDF("k", "name", "bal", "__v", "__tie", "__del")
    val snap1 = Merge.applyChanges(baseDf, chDf, Seq("k"), Seq("__v", "__tie"),
      "__del", asSnapshot = true)
    val snap2 = Merge.applyChanges(snap1, chDf, Seq("k"), Seq("__v", "__tie"),
      "__del", asSnapshot = true)
    def served(df: org.apache.spark.sql.DataFrame) =
      Merge.served(df, Seq("__v", "__tie"), "__del")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toSet
    assert(served(snap1) == served(snap2))
    assert(served(snap1) == Set(1L -> ("a2", 1.1), 3L -> ("c", 3.0)))
  }
}
