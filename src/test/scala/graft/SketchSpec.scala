package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch aggregates (a14) are oracle-exempt — their internals are
  * engine-specific — so this spec bounds them against the exact answers
  * on the same data: HLL++ relative error within its configured rsd,
  * GK quantiles within rank error 1/accuracy. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct within 3×rsd of exact per group") {
    val li = Tables.lineitem(spark, sf)
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, approx) = (r.getLong(1), r.getLong(2))
      val relErr = math.abs(approx - exact).toDouble / exact
      assert(relErr <= 0.06, s"${r.getString(0)}: exact=$exact approx=$approx rel=$relErr")
    }
  }

  test("percentile_approx within rank error 1/accuracy of the exact quantile") {
    val li = Tables.lineitem(spark, sf)
    val acc = 1000
    val got = li.groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(acc)).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the GK guarantee is on *rank*: the returned element's true rank is
    // within n/acc of the target rank
    got.foreach { case (flag, p50) =>
      val vals = li.filter(col("l_returnflag") === flag)
        .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
      val n = vals.length
      val rank = vals.count(_ <= p50)
      assert(math.abs(rank - 0.5 * n) <= n.toDouble / acc + 1,
        s"$flag: rank $rank of $n for p50=$p50")
    }
  }
}
