package graft.ops

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Property tests for the domain-level gate: on random corpora —
  * negative values, null values (excluded from both means and the
  * output), exact-tie groups (the integer-exactness contract: a group
  * mean EXACTLY at the threshold is kept), single-row groups — the
  * kept set must equal a BigInt cross-product reference, for several
  * rational thresholds. */
class DomainGatePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private type R = (Long, Long, Option[Long]) // (id, group, value)

  private val caseGen: Gen[Seq[R]] = for {
    n <- Gen.chooseNum(0, 50)
    rows <- Gen.listOfN(n, for {
      g <- Gen.chooseNum(0L, 4L)
      v <- Gen.frequency(1 -> Gen.const(Option.empty[Long]),
        6 -> Gen.chooseNum(-10L, 10L).map(Some(_))) // small: exact ties likely
    } yield (g, v))
  } yield rows.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }

  private def reference(rows: Seq[R], num: Long, den: Long): Set[Long] = {
    val nn = rows.collect { case (id, g, Some(v)) => (id, g, v) }
    if (nn.isEmpty) Set.empty
    else {
      val sg = BigInt(nn.map(_._3).sum); val cg = BigInt(nn.size)
      nn.groupBy(_._2).collect { case (_, rs)
          if BigInt(rs.map(_._3).sum) * cg * den >= sg * BigInt(rs.size) * num =>
        rs.map(_._1)
      }.flatten.toSet
    }
  }

  test("kept rows equal the BigInt cross-product reference at several thresholds") {
    val cases = Gen.listOfN(6, caseGen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { rows =>
      val df = rows.toDF("id", "g", "v").repartition(3)
      Seq((1L, 1L), (1L, 2L), (3L, 2L)).foreach { case (num, den) =>
        val got = DomainGate.keepGroupsAboveMean(df, col("g"), col("v"), num, den)
          .collect().map(_.getLong(0)).toSet
        val want = reference(rows, num, den)
        assert(got == want, s"num/den=$num/$den rows=$rows:\n$got\nvs $want")
      }
    }
  }
}
