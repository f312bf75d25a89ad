package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Jensen–Shannon divergence: hand-computed value, the 0 and ln 2
  * endpoints, symmetry, and the guarded empty-side contract. */
class DivergenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def jsd(a: Seq[String], b: Seq[String]): (Long, Long, Long, Long, Long, Double) = {
    val da = a.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val db = b.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val r = TextOps.jsDivergence(da, db, "text")
      .select("n_tokens_a", "n_tokens_b", "vocab_a", "vocab_b", "vocab_shared", "jsd")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(r.length == 1, s"expected one summary row, got ${r.toSeq}")
    r.head
  }

  test("hand-computed JSD on a two-token distribution") {
    // A = 'a a b' (p_a=2/3), B = 'a b b' (q_a=1/3): per token
    // 0.5·(2/3·ln(4/3)) + 0.5·(1/3·ln(2/3)) = 0.0283165, ×2 tokens
    // = 0.056633.
    val (ta, tb, va, vb, vs, d) = jsd(Seq("a a b"), Seq("a b b"))
    assert((ta, tb, va, vb, vs) == ((3L, 3L, 2L, 2L, 2L)))
    assert(math.abs(d - 0.056633) < 1e-5, s"got $d")
  }

  test("identical corpora diverge by zero") {
    val (_, _, _, _, _, d) = jsd(Seq("x y z x"), Seq("x y z x"))
    assert(d == 0.0, s"got $d")
  }

  test("disjoint vocabularies hit the ln 2 ceiling") {
    val (_, _, _, _, vs, d) = jsd(Seq("a b c"), Seq("x y z"))
    assert(vs == 0L)
    assert(math.abs(d - math.log(2.0)) < 1e-4, s"got $d")
  }

  test("divergence is symmetric") {
    val (_, _, _, _, _, d1) = jsd(Seq("a a a b c"), Seq("c c b"))
    val (_, _, _, _, _, d2) = jsd(Seq("c c b"), Seq("a a a b c"))
    assert(d1 == d2, s"$d1 vs $d2")
  }

  test("an empty side degenerates to half ln 2 by the guarded formula") {
    val empty = spark.emptyDataFrame
      .withColumn("id", org.apache.spark.sql.functions.lit(0L))
      .withColumn("text", org.apache.spark.sql.functions.lit("x"))
      .limit(0)
    val da = Seq((1L, "a b a")).toDF("id", "text")
    val r = TextOps.jsDivergence(da, empty.select("id", "text"), "text")
      .select("n_tokens_a", "n_tokens_b", "jsd")
      .as[(Long, Long, Double)].collect()
    assert(r.length == 1)
    assert(r.head._1 == 3L && r.head._2 == 0L)
    assert(math.abs(r.head._3 - 0.5 * math.log(2.0)) < 1e-4, s"got ${r.head}")
  }

  test("both sides empty still yields the ONE documented summary row") {
    // the scaladoc contract: a monitoring caller's .first() must not
    // throw on a degenerate window — the row degenerates to all zeros
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    val r = TextOps.jsDivergence(empty, empty, "text")
      .select("n_tokens_a", "n_tokens_b", "vocab_a", "vocab_b", "vocab_shared", "jsd")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(r.toSeq == Seq((0L, 0L, 0L, 0L, 0L, 0.0)))
  }
}
