package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Property tests for the grouped weighted median: on random groups —
  * duplicate values (tie groups), zero/negative/null weights (dropped
  * by contract), null values, heavy single weights, single-row groups
  * — BOTH execution paths (the two-pass offset scheme and the
  * RANGE-frame window fallback, forced via `maxTwoPassGroups = 0`)
  * must equal a driver reference spelling the documented contract:
  * weights quantized at 1e-7, values sorted, the first value whose
  * doubled running weight reaches the group total. */
class WeightedMedianPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions.col

  private type R = (Long, Option[Double], Option[Double]) // (k, v, w)

  private val caseGen: Gen[Seq[R]] = for {
    n <- Gen.chooseNum(1, 60)
    rows <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(0L, 4L)
      v <- Gen.frequency(1 -> Gen.const(Option.empty[Double]),
        8 -> Gen.chooseNum(0, 20).map(i => Some(i.toDouble)))
      w <- Gen.frequency(1 -> Gen.const(Option.empty[Double]),
        1 -> Gen.const(Some(0.0)), 1 -> Gen.const(Some(-1.5)),
        1 -> Gen.const(Some(50.0)), // heavy: drags the median alone
        8 -> Gen.chooseNum(1, 400).map(i => Some(i / 100.0)))
    } yield (k, v, w))
  } yield rows

  /** The documented contract, one thread: quantize, drop non-positive/
    * null, sort, first value with 2·cum ≥ total. */
  private def reference(rows: Seq[R]): Map[Long, Double] =
    rows.collect { case (k, Some(v), Some(w))
        if math.floor(w * 1e7 + 0.5).toLong > 0 =>
        (k, v, math.floor(w * 1e7 + 0.5).toLong) }
      .groupBy(_._1).map { case (k, rs) =>
        val sorted = rs.sortBy(_._2)
        val total = sorted.map(r => BigInt(r._3)).sum
        var cum = BigInt(0)
        k -> sorted.find { r => cum += r._3; cum * 2 >= total }.get._2
      }

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", DoubleType, nullable = true),
    StructField("w", DoubleType, nullable = true)))

  test("two-pass and window-fallback paths equal the driver reference") {
    val cases = Gen.listOfN(6, caseGen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { rows =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map { case (k, v, w) =>
            Row(k, v.map(Double.box).orNull, w.map(Double.box).orNull) }, 3),
        schema)
      val want = reference(rows)
      // default cap => two-pass offsets; 0 => forced window fallback
      Seq(Aggs.MaxTwoPassGroups, 0).foreach { cap =>
        val got = Aggs.weightedMedian(df, col("k"), col("v"), col("w"),
            maxTwoPassGroups = cap)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(got == want, s"cap=$cap rows=$rows:\n$got\nvs $want")
      }
    }
  }
}
