package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Gopher-style repetition stats: the sorted-run fold reproduces
  * hand-counted token/bigram/trigram multiplicities, repetitive spam
  * scores above prose on every metric, and the ≥3-token contract
  * holds. */
class RepetitionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def stats(docs: org.apache.spark.sql.DataFrame) =
    TextOps.repetitionStats(docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "top_token_frac", "top_bigram_frac",
        "dup_trigram_frac")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("hand-counted multiplicities on small docs") {
    // d1 "a a a b": tokens 4, top token a=3/4; bigrams [a a, a a, a b]
    // → top 2/3 = .6667; trigrams [a a a, a a b] both unique → dup 0.
    // d2 "x y x y x y": tokens 6, top 3/6; bigrams [x y ×3, y x ×2]
    // → 3/5 = .6; trigrams [x y x ×2, y x y ×2] → all 4 duplicated → 1.
    val m = stats(Seq((1L, "a a a b"), (2L, "x y x y x y")).toDF("doc_id", "text"))
    assert(m(1L) == ((4L, 0.75, 0.6667, 0.0)), s"got ${m(1L)}")
    assert(m(2L) == ((6L, 0.5, 0.6, 1.0)), s"got ${m(2L)}")
  }

  test("template spam scores above prose on all three metrics") {
    val m = stats(Seq(
      (1L, "click here to win click here to win click here to win"),
      (2L, "the quick brown fox jumps over a lazy dog near the river"))
      .toDF("doc_id", "text"))
    val (_, spamTok, spamBi, spamTri) = m(1L)
    val (_, prosTok, prosBi, prosTri) = m(2L)
    assert(spamTok > prosTok && spamBi > prosBi && spamTri > prosTri,
      s"spam $m(1L) must dominate prose $m(2L)")
  }

  test("an all-distinct doc scores the floor on every metric") {
    val m = stats(Seq((1L, "one two three four five")).toDF("doc_id", "text"))
    assert(m(1L) == ((5L, 0.2, 0.25, 0.0)), s"got ${m(1L)}")
  }

  test("docs with fewer than three tokens are absent by contract") {
    val m = stats(Seq((1L, "just two"), (2L, "solo"), (3L, ""),
      (4L, "three whole tokens")).toDF("doc_id", "text"))
    assert(m.keySet == Set(4L), s"got ${m.keySet}")
  }

  test("whitespace runs and padding do not change the counts") {
    val a = stats(Seq((1L, "a b a b a")).toDF("doc_id", "text"))
    val b = stats(Seq((1L, "  a\tb   a  b a ")).toDF("doc_id", "text"))
    assert(a(1L) == b(1L), s"$a vs $b")
  }
}
