package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The curation pipeline on planted data: each stage must drop exactly
  * the rows planted for it and keep everything else. */
class PipelineDemoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("curate drops invalid, low-quality, off-lang, exact-dup, and near-dup docs") {
    val body = "the quick brown fox jumps over the lazy dog and keeps running today"
    val docs = Seq(
      (1L, body + " alpha", "en"),                   // keeper
      (2L, body + " alpha", "en"),                   // exact dup of 1 → dropped
      (3L, body + " alphq", "en"),                   // near-dup of 1 → dropped by LSH
      (4L, "completely different text about spark plans and shuffles here", "en"), // keeper
      (5L, "too short", "en"),                       // quality gate (tokens < 5)
      (6L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))", "en"), // alpha gate
      (7L, body + " beta", "fr"),                    // lang gate
      (8L, body.toUpperCase + " GAMMA DELTA", "de"), // keeper (de allowed)
      (9L, "", "en")                                 // expectation gate (empty text)
    ).toDF("doc_id", "text", "lang")

    val (curated, r) = PipelineDemo.curate(spark, docs, nearDupEstimate = 0.6)
    val kept = curated.select("doc_id").collect().map(_.getLong(0)).toSet

    assert(r.input == 9)
    assert(r.quarantined == 1, s"expectation gate quarantined ${r.quarantined}")
    assert(r.afterQuality == 5, s"quality gate kept ${r.afterQuality}") // 1,2,3,4,8
    assert(r.afterExact == 4, s"exact dedup kept ${r.afterExact}")      // 1,3,4,8
    assert(kept == Set(1L, 4L, 8L), s"kept=$kept")
    assert(r.afterNearDup == 3)
    assert(r.afterCap == 3) // uncapped by default
    assert(r.tokensKept > 0)
    // curated frame carries the token accounting column
    assert(curated.columns.contains("bpeish_tokens"))
  }

  test("PII is masked and the per-language cap applies") {
    val body = "the quick brown fox jumps over the lazy dog and keeps running today"
    val docs = (1L to 6L).map(i =>
      (i, s"$body variant$i email user$i@mail.example.com end", "en")).toDF(
      "doc_id", "text", "lang")
    val (curated, r) = PipelineDemo.curate(spark, docs,
      nearDupEstimate = 0.99, maxPerLang = 4)
    assert(r.afterCap == 4)
    val texts = curated.select("text").collect().map(_.getString(0))
    assert(texts.forall(_.contains("<EMAIL>")))
    assert(texts.forall(!_.contains("@mail.example.com")))
  }
}
