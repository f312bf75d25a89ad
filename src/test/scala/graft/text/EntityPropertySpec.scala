package graft.text

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Property tests for blocked fuzzy entity matching: on random name
  * pools over a small alphabet (dense blocks, natural near-misses,
  * exact hits, length-guard boundary cases) — the single-pass winner
  * must equal a driver scan over the SAME block (blocking recall loss
  * is the contract, so the reference blocks identically), and the
  * multi-pass winner must equal the best match over the UNION of the
  * pass blocks under the same (dist, match_id) total order. */
class EntityPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.{col, substring, reverse}

  private val nameGen: Gen[String] = for {
    len <- Gen.chooseNum(2, 6)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val caseGen: Gen[(Seq[(Long, String)], Seq[(Long, String)])] = for {
    nd <- Gen.chooseNum(1, 20)
    nc <- Gen.chooseNum(1, 15)
    ds <- Gen.listOfN(nd, nameGen)
    cs <- Gen.listOfN(nc, nameGen)
  } yield (ds.zipWithIndex.map { case (n, i) => (i.toLong, n) },
    cs.zipWithIndex.map { case (n, i) => (100L + i, n) })

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  private def bestInBlocks(dn: String, clean: Seq[(Long, String)],
                           blocks: Seq[String => String],
                           maxDist: Int): Option[(Long, Long)] = {
    val cands = clean.filter { case (_, cn) =>
        blocks.exists(b => b(dn) == b(cn)) }
      .map { case (cid, cn) => (cid, lev(dn, cn).toLong) }
      .filter(_._2 <= maxDist)
    if (cands.isEmpty) None
    else Some(cands.minBy { case (cid, d) => (d, cid) })
  }

  test("single-pass winner equals the driver scan over the same block") {
    val cases = Gen.listOfN(6, caseGen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { case (dirty, clean) =>
      Seq(1, 2).foreach { maxDist =>
        val got = Entity.fuzzyMatch(dirty.toDF("id", "name"), "id", "name",
            clean.toDF("id", "name"), "id", "name",
            c => substring(c, 1, 2), maxDist)
          .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(4)))).toMap
        val want = dirty.flatMap { case (did, dn) =>
          bestInBlocks(dn, clean, Seq(_.take(2)), maxDist).map(did -> _)
        }.toMap
        assert(got == want, s"maxDist=$maxDist dirty=$dirty clean=$clean:\n$got\nvs $want")
      }
    }
  }

  test("multi-pass winner is the best over the union of pass blocks") {
    val cases = Gen.listOfN(4, caseGen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { case (dirty, clean) =>
      val got = Entity.fuzzyMatchMultiPass(dirty.toDF("id", "name"), "id", "name",
          clean.toDF("id", "name"), "id", "name",
          Seq(c => substring(c, 1, 2), c => substring(reverse(c), 1, 2)),
          maxDist = 2)
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(4)))).toMap
      val want = dirty.flatMap { case (did, dn) =>
        bestInBlocks(dn, clean,
          Seq(_.take(2), (s: String) => s.reverse.take(2)), maxDist = 2)
          .map(did -> _)
      }.toMap
      assert(got == want, s"dirty=$dirty clean=$clean:\n$got\nvs $want")
    }
  }
}
