package graft.ops

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
