package graft.ops

import java.sql.Timestamp
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Property tests for the as-of joins (VERDICT r11 #3): on random keyed
  * event streams — null timestamps on both sides, fact/version
  * timestamp ties, version-less keys, fact-less keys, empty sides —
  * both directions must equal a naive per-fact scan applying the
  * documented contract: backward = latest `version.ts <= fact.ts`,
  * forward = earliest `version.ts >= fact.ts`, a version AT the fact's
  * timestamp visible in both directions, and null ts on either side
  * matching nothing (SQL comparison semantics). The hand-picked
  * AsOfSpec cases pin each rule once; this spec pins their
  * interactions over the whole generated space. */
class AsOfPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(60000L * m)

  // ~1 in 7 timestamps null; a narrow minute range forces ties both
  // within the version side and across the fact/version sides
  private val tsGen: Gen[Option[Timestamp]] = Gen.frequency(
    1 -> Gen.const(Option.empty[Timestamp]),
    6 -> Gen.chooseNum(0L, 30L).map(m => Some(ts(m))))

  private case class Case(facts: Seq[(Long, Long, Option[Timestamp])],
                          versions: Seq[(Long, Option[Timestamp], Double)])

  private val caseGen: Gen[Case] = for {
    nf <- Gen.chooseNum(0, 25)
    nv <- Gen.chooseNum(0, 25)
    fs <- Gen.listOfN(nf, for {
      k <- Gen.chooseNum(0L, 5L); t <- tsGen } yield (k, t))
    vs <- Gen.listOfN(nv, for {
      k <- Gen.chooseNum(0L, 5L); t <- tsGen
      p <- Gen.chooseNum(-50.0, 50.0).map(v => math.rint(v * 100) / 100)
    } yield (k, t, p))
  } yield Case(
    fs.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
    // the operator's contract: versions unique per (key, ts) — a real
    // feed resolves duplicate version timestamps upstream
    vs.groupBy(v => (v._1, v._2)).map(_._2.head).toSeq)

  /** The naive per-fact scan the operator's one-shuffle window plan
    * must agree with. */
  private def naive(c: Case, forward: Boolean): Map[Long, Option[Double]] =
    c.facts.map { case (e, k, t) =>
      e -> t.flatMap { ft =>
        val cands = c.versions.filter(v => v._1 == k && v._2.isDefined &&
          (if (forward) !v._2.get.before(ft) else !v._2.get.after(ft)))
        if (cands.isEmpty) None
        else Some((if (forward) cands.minBy(_._2.get.getTime)
                   else cands.maxBy(_._2.get.getTime))._3)
      }
    }.toMap

  private def run(c: Case, forward: Boolean): Map[Long, Option[Double]] = {
    val f = c.facts.toDF("event_id", "k", "ts")
    val v = c.versions.toDF("k", "ts", "pvalue")
    val out = if (forward) AsOf.asOfJoinForward(f, v, "k", "ts", Seq("pvalue"))
              else AsOf.asOfJoin(f, v, "k", "ts", Seq("pvalue"))
    val rows = out.collect()
    assert(rows.length == c.facts.length,
      s"output must be exactly the fact rows (got ${rows.length} of ${c.facts.length})")
    rows.map(r => r.getLong(0) ->
      (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
  }

  test("asOfJoin equals the naive latest-at-or-before scan on random streams") {
    val cases = Gen.listOfN(8, caseGen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { c =>
      assert(run(c, forward = false) == naive(c, forward = false), s"case=$c")
    }
  }

  test("asOfJoinForward equals the naive earliest-at-or-after scan on random streams") {
    val cases = Gen.listOfN(8, caseGen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { c =>
      assert(run(c, forward = true) == naive(c, forward = true), s"case=$c")
    }
  }
}
