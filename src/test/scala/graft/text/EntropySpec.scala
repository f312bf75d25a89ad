package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Character-entropy quality signal: hand-computed values on known
  * distributions, ordering between degenerate / natural / uniform
  * texts, and the null/empty contract. */
class EntropySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ent(rows: Seq[(Long, String)]): Map[Long, (Long, Long, Double)] =
    TextOps.charEntropy(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  private def round4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4

  test("hand-computed: constant, two-symbol, and uniform strings") {
    val m = ent(Seq((1L, "aaaa"), (2L, "abab"), (3L, "abcd")))
    assert(m(1L) == ((4L, 1L, 0.0)), s"got ${m(1L)}")              // H = 0
    assert(m(2L) == ((4L, 2L, round4(math.log(2)))), s"got ${m(2L)}") // ln 2
    assert(m(3L) == ((4L, 4L, round4(math.log(4)))), s"got ${m(3L)}") // ln 4
  }

  test("skew lowers entropy below the uniform ceiling") {
    // "aaab": H = ln 4 − (3 ln 3)/4 < ln 2 symbols' uniform ln 2.
    val m = ent(Seq((1L, "aaab")))
    val want = round4(math.log(4) -
      math.floor(3.0 * math.log(3.0) * 1e7 + 0.5) / 1e7 / 4.0)
    assert(m(1L) == ((4L, 2L, want)), s"got ${m(1L)}")
    assert(m(1L)._3 < round4(math.log(2)))
  }

  test("matches a direct frequency computation on mixed text") {
    val s = "the quick brown fox jumps over the lazy dog"
    val m = ent(Seq((1L, s)))
    val counts = s.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = s.length.toDouble
    val sQ = counts.values.toSeq
      .map(c => math.floor(c * math.log(c.toDouble) * 1e7 + 0.5).toLong).sum
    val want = round4(math.log(n) - (sQ.toDouble / 1e7) / n)
    assert(m(1L) == ((s.length.toLong, counts.size.toLong, want)), s"got ${m(1L)}")
  }

  test("single character, null, and empty texts") {
    val df = Seq((1L, Some("x")), (2L, None), (3L, Some("")))
      .toDF("doc_id", "text")
    val got = TextOps.charEntropy(df, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1L, 1L, 0.0)), s"got $got") // 2 and 3 absent
  }
}
