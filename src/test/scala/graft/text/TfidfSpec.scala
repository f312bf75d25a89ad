package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** TF-IDF top terms: rare terms outrank ubiquitous ones, raw tf scales
  * the score, ties break on the term's total order, and the smoothed
  * IDF keeps every score strictly positive. */
class TfidfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "common rare1 common common"),
    (2L, "common rare2 rare2"),
    (3L, "common alpha beta")
  ).toDF("doc_id", "text")

  test("rare terms outrank the ubiquitous term; tf multiplies in") {
    val got = TextOps.tfidfTopTerms(docs, "doc_id", "text", 3)
      .select("doc_id", "rank", "term", "tfidf")
      .as[(Long, Int, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    // N=3 docs. df: common=3, every other term=1.
    // idf(common) = ln(4/4)+1 = 1; idf(rare) = ln(4/2)+1 ≈ 1.6931
    // doc 1: common tf=3 → 3.0; rare1 tf=1 → 1.6931 — tf beats rarity here
    assert(got(1L).map(_._1) == Seq("common", "rare1"))
    assert(got(1L)(0)._2 == 3.0)
    assert(got(1L)(1)._2 == 1.6931)
    // doc 2: rare2 tf=2 → 3.3863 outranks common tf=1 → 1.0
    assert(got(2L).map(_._1) == Seq("rare2", "common"))
    assert(got(2L)(0)._2 == 3.3863)
    // doc 3: alpha and beta tie at 1.6931 → term asc; common 1.0 third
    assert(got(3L).map(_._1) == Seq("alpha", "beta", "common"))
    // smoothed IDF: every score strictly positive
    assert(got.values.flatten.forall(_._2 > 0.0))
  }

  test("k bounds the per-doc output; docs never bleed into each other") {
    val got = TextOps.tfidfTopTerms(docs, "doc_id", "text", 1)
      .select("doc_id", "term").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "common"), (2L, "rare2"), (3L, "alpha")))
  }
}
