package graft.ops

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** As-of join semantics on planted data: latest version at-or-before
  * each fact (ties INCLUDE the version at the fact's timestamp),
  * left-join nulls for facts before any version or keys with no
  * versions, version-only keys emit nothing. Cross-checked against a
  * naive per-row scan. */
class AsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(60000L * m)

  private lazy val facts = Seq(
    (101L, 1L, ts(5)),   // before any version -> null
    (102L, 1L, ts(10)),  // AT version ts      -> v1 (tie inclusive)
    (103L, 1L, ts(15)),  // between            -> v1
    (104L, 1L, ts(25)),  // after both         -> v2
    (201L, 2L, ts(50))   // key without versions -> null
  ).toDF("event_id", "user_id", "ts")

  private lazy val versions = Seq(
    (1L, ts(10), 1.0), (1L, ts(20), 2.0),
    (3L, ts(1), 9.0) // version-only key: contributes no output rows
  ).toDF("user_id", "ts", "pvalue")

  test("latest at-or-before version per fact; nulls where none; no version-only rows") {
    val got = AsOf.asOfJoin(facts, versions, "user_id", "ts", Seq("pvalue"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(got == Map(
      101L -> None, 102L -> Some(1.0), 103L -> Some(1.0),
      104L -> Some(2.0), 201L -> None))
    assert(got.size == 5) // exactly the fact rows — nothing from key 3
  }

  test("assertUniqueVersions: duplicate (key, ts) fails loudly with the flag, resolves deterministically without") {
    val dupVersions = Seq(
      (1L, ts(10), 1.0), (1L, ts(10), 7.0), // duplicate version timestamp
      (1L, ts(20), 2.0)
    ).toDF("user_id", "ts", "pvalue")
    val e = intercept[IllegalArgumentException] {
      AsOf.asOfJoin(facts, dupVersions, "user_id", "ts", Seq("pvalue"),
        assertUniqueVersions = true)
    }
    assert(e.getMessage.contains("many_to_one violated"))
    // without the flag: reproducible last-in-sort survivor, no crash
    val got = AsOf.asOfJoin(facts, dupVersions, "user_id", "ts", Seq("pvalue"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(got(104L) == Some(2.0)) // past the dup: unaffected
    assert(Set[Option[Double]](Some(1.0), Some(7.0)).contains(got(102L))) // one of the dups, deterministically
  }

  test("forward: earliest at-or-after version per fact; nulls where none") {
    val got = AsOf.asOfJoinForward(facts, versions, "user_id", "ts", Seq("pvalue"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    // 101 (ts 5) -> v1 (next at 10); 102 AT v1's ts -> v1 (tie inclusive);
    // 103 (15) -> v2 (20); 104 (25) after both -> null; 201 no versions -> null
    assert(got == Map(
      101L -> Some(1.0), 102L -> Some(1.0), 103L -> Some(2.0),
      104L -> None, 201L -> None))
  }

  test("forward agrees with the naive per-fact scan on a larger corpus") {
    val f = (0 until 300).map(i => (i.toLong, (i % 7).toLong, ts(i * 3 % 101)))
      .toDF("event_id", "user_id", "ts")
    val v = (0 until 60).map(i => ((i % 5).toLong, ts(i * 7 % 97), i.toDouble))
      .groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toSeq
      .toDF("user_id", "ts", "pvalue")
    val got = AsOf.asOfJoinForward(f, v, "user_id", "ts", Seq("pvalue"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val vRows = v.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    val fRows = f.collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    fRows.foreach { case (id, k, t) =>
      val want = vRows.filter(x => x._1 == k && !x._2.before(t))
        .sortBy(x => (x._2.getTime, x._3)).headOption.map(_._3)
      assert(got(id) == want, s"fact $id key $k ts $t")
    }
  }

  test("agrees with the naive per-fact scan on a larger random-ish corpus") {
    val f = (0 until 300).map(i => (i.toLong, (i % 7).toLong, ts(i * 3 % 101)))
      .toDF("event_id", "user_id", "ts")
    val v = (0 until 60).map(i => ((i % 5).toLong, ts(i * 7 % 97), i.toDouble))
      .groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toSeq // unique (key, ts)
      .toDF("user_id", "ts", "pvalue")
    val got = AsOf.asOfJoin(f, v, "user_id", "ts", Seq("pvalue"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val vRows = v.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    val fRows = f.collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    fRows.foreach { case (id, k, t) =>
      val want = vRows.filter(x => x._1 == k && !x._2.after(t))
        .sortBy(x => (x._2.getTime, x._3)).lastOption.map(_._3)
      assert(got(id) == want, s"fact $id key $k ts $t")
    }
  }

  test("null timestamps follow SQL comparison semantics in both directions") {
    // a null-ts version satisfies NO <= / >= predicate — without the
    // guard it sorts FIRST (nulls-first asc) and becomes a phantom
    // from-minus-infinity version visible to every fact
    val v = Seq((1L, Option.empty[Timestamp], 99.0),
      (1L, Some(ts(10)), 1.0)).toDF("user_id", "ts", "pvalue")
    val f = Seq((101L, 1L, Some(ts(5))), (102L, 1L, Some(ts(15))),
      (103L, 1L, Option.empty[Timestamp])).toDF("event_id", "user_id", "ts")
    val back = AsOf.asOfJoin(f, v, "user_id", "ts", Seq("pvalue"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(back == Map(
      101L -> None,      // before the only real version; null-ts version invisible
      102L -> Some(1.0), // the real version, not the 99.0 phantom
      103L -> None))     // null-ts fact matches nothing
    val fwd = AsOf.asOfJoinForward(f, v, "user_id", "ts", Seq("pvalue"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(fwd == Map(
      101L -> Some(1.0), // next real version at-or-after
      102L -> None,      // nothing after ts(15)
      103L -> None))     // null-ts fact must NOT receive the earliest version
  }
}
