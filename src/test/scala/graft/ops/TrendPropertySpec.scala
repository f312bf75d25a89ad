package graft.ops

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Property tests for the per-key OLS trend: on random keyed series —
  * null y rows (dropped BEFORE indexing, so later x shift down),
  * constant series (slope 0), sub-2-point keys (absent by contract) —
  * the fitted lines must be BIT-IDENTICAL to a single-threaded
  * reference spelling the same exact arithmetic: integer Σx/Σx²,
  * 1e-7-quantized decimal Σy/Σxy, the one double expression per
  * coefficient, and the floor-form 4-dp rounding. */
class TrendPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  // (key, seq, y) — seq is the unique total order within a key
  private val caseGen: Gen[Seq[(Long, Long, Option[Double])]] = for {
    n <- Gen.chooseNum(0, 50)
    rows <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(0L, 4L)
      y <- Gen.frequency(1 -> Gen.const(Option.empty[Double]),
        6 -> Gen.chooseNum(-5000, 5000).map(i => Some(i / 100.0)))
    } yield (k, y))
  } yield rows.zipWithIndex.map { case ((k, y), i) => (k, i.toLong, y) }

  private def q7(v: Double): BigInt = BigInt(math.floor(v * 1e7 + 0.5).toLong)
  private def exactSum(vs: Seq[Double]): Double = vs.map(q7).sum.toDouble / 1e7
  private def r4(v: Double): Double = {
    val t = v * 10000.0 + 0.5
    if (math.abs(t) < 9.007199254740992e15) math.floor(t) / 10000.0
    else t / 10000.0
  }

  private def reference(rows: Seq[(Long, Long, Option[Double])]): Map[Long, (Long, Double, Double)] =
    rows.collect { case (k, s, Some(y)) => (k, s, y) }
      .groupBy(_._1).collect { case (k, rs) if rs.size >= 2 =>
        val ys = rs.sortBy(_._2).map(_._3)
        val n = ys.size.toLong
        val xs = (1L to n).toSeq
        val sx = xs.sum.toDouble
        val sxx = xs.map(x => x * x).sum.toDouble
        val sy = exactSum(ys)
        val sxy = exactSum(xs.map(_.toDouble).zip(ys).map { case (x, y) => x * y })
        val num = n.toDouble * sxy - sx * sy
        val den = n.toDouble * sxx - sx * sx
        k -> ((n, r4(num / den), r4((sy - num / den * sx) / n.toDouble)))
      }

  test("fitLine is bit-identical to the single-threaded exact reference") {
    val cases = Gen.listOfN(8, caseGen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { rows =>
      val got = Trend.fitLine(rows.toDF("k", "seq", "y").repartition(4),
          "k", Seq(col("seq")), "y")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
        .toMap
      assert(got == reference(rows), s"rows=$rows:\n$got\nvs ${reference(rows)}")
    }
  }
}
