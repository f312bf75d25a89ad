package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** PMI collocation scoring on a hand-countable corpus: the formula to
  * the emitted rounding, the count gate, and the sign behavior
  * (collocated pair positive, independent-ish pair lower). */
class PmiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand-computed PMI on a tiny corpus; minCount gates rare pairs") {
    // tokens: p x5, q x5, r x1 -> N = 11; bigrams: (p,q) x5, (q,r) x1 -> B = 6
    val docs = (Seq.fill(4)("p q") :+ "p q r").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextOps.pmiBigrams(docs, "text", minCount = 5L)
      .as[(String, String, Long, Double)].collect()
    assert(got.length == 1, s"got ${got.toSeq}") // (q, r) gated out
    val (a, b, n, pmi) = got.head
    assert((a, b, n) == (("p", "q", 5L)))
    val want = math.floor(
      math.log(5.0 * 11.0 * 11.0 / (6.0 * 5.0 * 5.0)) * 10000.0 + 0.5) / 10000.0
    assert(pmi == want, s"pmi $pmi != $want")
  }

  test("frequent-but-independent pairs score below collocated pairs") {
    // "s t" always together; "u"/"v" mixed with everything
    val docs = (Seq.fill(6)("s t u v") ++ Seq.fill(6)("v u s t") ++
      Seq.fill(6)("u s t v")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m = TextOps.pmiBigrams(docs, "text", minCount = 5L)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(m(("s", "t")) > m(("u", "v")), s"got $m")
  }

  test("minCount validated") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextOps.pmiBigrams(df, "text", minCount = 0L)
    }
  }
}
