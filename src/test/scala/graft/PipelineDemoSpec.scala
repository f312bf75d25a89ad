package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The curation pipeline on planted data: each stage must drop exactly
  * the rows planted for it and keep everything else. */
class PipelineDemoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("curate drops low-quality, off-lang, exact-dup, and near-dup docs") {
    val body = "the quick brown fox jumps over the lazy dog and keeps running today"
    val docs = Seq(
      (1L, body + " alpha", "en"),                   // keeper
      (2L, body + " alpha", "en"),                   // exact dup of 1 → dropped
      (3L, body + " alphq", "en"),                   // near-dup of 1 → dropped by LSH
      (4L, "completely different text about spark plans and shuffles here", "en"), // keeper
      (5L, "too short", "en"),                       // quality gate (tokens < 5)
      (6L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))", "en"), // alpha gate
      (7L, body + " beta", "fr"),                    // lang gate
      (8L, body.toUpperCase + " GAMMA DELTA", "de")  // keeper (de allowed)
    ).toDF("doc_id", "text", "lang")

    val (curated, r) = PipelineDemo.curate(spark, docs, nearDupEstimate = 0.6)
    val kept = curated.select("doc_id").collect().map(_.getLong(0)).toSet

    assert(r.input == 8)
    assert(r.afterQuality == 5, s"quality gate kept ${r.afterQuality}") // 1,2,3,4,8
    assert(r.afterExact == 4, s"exact dedup kept ${r.afterExact}")      // 1,3,4,8
    assert(kept == Set(1L, 4L, 8L), s"kept=$kept")
    assert(r.afterNearDup == 3)
    assert(r.tokensKept > 0)
    // curated frame carries the token accounting column
    assert(curated.columns.contains("bpeish_tokens"))
  }
}
