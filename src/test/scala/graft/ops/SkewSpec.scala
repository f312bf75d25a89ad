package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Salting must never change results — only the exchange layout. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // one hot key (90% of rows) + a long tail
  private lazy val fact = ((1 to 900).map(i => (1L, i.toDouble)) ++
    (1 to 100).map(i => (1L + i % 7, i * 0.5)))
    .toDF("k", "v")
  private lazy val dim = (1L to 8L).map(k => (k, s"name_$k")).toDF("k", "name")

  test("saltedJoin equals the plain join, any salt width") {
    val plain = fact.join(dim, Seq("k")).orderBy("k", "v", "name")
      .collect().toSeq
    for (salt <- Seq(2, 8)) {
      val salted = Skew.saltedJoin(fact, dim, Seq("k"), salt)
        .orderBy("k", "v", "name").collect().toSeq
      assert(salted == plain, s"salt=$salt")
    }
  }

  test("saltedAgg equals the plain aggregate for sum/count") {
    val plain = fact.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val salted = Skew.saltedAgg(fact, Seq("k"), salt = 4,
      partial = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      finalAgg = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(plain.keySet == salted.keySet)
    plain.foreach { case (k, (s, n)) =>
      assert(salted(k)._2 == n)
      assert(math.abs(salted(k)._1 - s) < 1e-9) // double sum, order differs
    }
  }
}
