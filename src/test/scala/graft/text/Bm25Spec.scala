package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25 ranking: coverage beats partial matches, rarity outranks
  * ubiquity, saturation tames raw tf, and the stated contracts hold
  * (unique-term scoring, token-less docs out of the stats, k bound,
  * deterministic ties). */
class Bm25Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // "rare" appears in one doc, "common" in all; doc 4 has heavy
  // repetition of "common" (saturation fodder)
  private lazy val docs = Seq(
    (1L, "rare common filler one"),
    (2L, "common filler two words"),
    (3L, "common filler three words"),
    (4L, "common common common common common common common common")
  ).toDF("doc_id", "text")

  private def run(qs: Seq[(Long, String)], k: Int = 10) =
    TextOps.bm25TopDocs(docs, "doc_id", "text",
        qs.toDF("query_id", "query_text"), "query_id", "query_text", k = k)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Int, Long, Double)].collect().toSeq

  test("doc matching both terms outranks single-term docs; rare term dominates") {
    val got = run(Seq((1L, "rare common")))
    assert(got.head._3 == 1L, s"doc 1 holds both terms incl. the rare one: $got")
    // every other doc matches only "common", whose idf is the all-docs floor
    val scores = got.map(r => r._3 -> r._4).toMap
    assert(scores(1L) > scores(2L) && scores(1L) > scores(4L))
  }

  test("tf saturates: 8x repetition beats 1x, but nowhere near 8x the score") {
    val got = run(Seq((1L, "common"))).map(r => r._3 -> r._4).toMap
    assert(got(4L) > got(2L), "higher tf must still rank higher")
    assert(got(4L) < got(2L) * 3.0,
      s"k1 saturation should cap the 8x-tf gain far below linear: $got")
  }

  test("duplicate query terms do not double-count") {
    val once = run(Seq((1L, "common")))
    val twice = run(Seq((1L, "common common common")))
    assert(once.map(r => (r._2, r._3, r._4)) == twice.map(r => (r._2, r._3, r._4)))
  }

  test("null-text docs join neither the ranking nor the corpus stats") {
    val withNull = docs.union(Seq((9L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val base = run(Seq((1L, "common")))
    val got = TextOps.bm25TopDocs(withNull, "doc_id", "text",
        Seq((1L, "common")).toDF("query_id", "query_text"), "query_id", "query_text")
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got == base, "a null-text doc must not shift N/avgdl or appear ranked")
  }

  test("k bounds each query independently; ranks are dense from 1") {
    val got = run(Seq((1L, "common"), (2L, "filler")), k = 2)
    assert(got.count(_._1 == 1L) == 2 && got.count(_._1 == 2L) == 2)
    assert(got.filter(_._1 == 1L).map(_._2).sorted == Seq(1, 2))
    // equal-score ties (docs 2 and 3 are interchangeable for "filler")
    // break by smallest doc id
    val q2 = run(Seq((2L, "filler")))
    val tied = q2.filter(r => Set(2L, 3L).contains(r._3)).sortBy(_._2)
    assert(tied.map(_._3) == Seq(2L, 3L), s"tie must break by doc id: $q2")
  }
}
