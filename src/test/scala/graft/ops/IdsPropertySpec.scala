package graft.ops

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Property tests for contiguous surrogate ids: on random frames —
  * duplicate order values (broken by the unique key the contract
  * requires), null order values (nulls-first under the default asc),
  * single rows, skewed value distributions — the assigned ids must be
  * EXACTLY the driver-side sort rank: 0-based, dense, and equal to the
  * position in the total order, independent of input partitioning.
  * The two-pass offset scheme's hand-picked cases live in IdsSpec;
  * this pins the end-to-end numbering over the generated space. */
class IdsPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private val caseGen: Gen[Seq[(Long, Option[Long])]] = for {
    n <- Gen.chooseNum(1, 80)
    vs <- Gen.listOfN(n, Gen.frequency(
      1 -> Gen.const(Option.empty[Long]),
      6 -> Gen.chooseNum(0L, 9L).map(Some(_)))) // narrow: force ties
  } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  test("ids equal the driver-side sort rank on random frames") {
    val cases = Gen.listOfN(6, caseGen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { rows =>
      val got = Ids.contiguousIds(
          rows.toDF("k", "v").repartition(5), "id",
          Seq(col("v").asc, col("k").asc))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      // driver rank under the same total order: v asc NULLS FIRST
      // (Spark's asc default), then the unique key
      val want = rows.sortBy { case (k, v) => (v.isDefined, v.getOrElse(0L), k) }
        .zipWithIndex.map { case ((k, _), i) => k -> i.toLong }.toMap
      assert(got == want, s"rows=$rows:\n$got\nvs $want")
    }
  }
}
