package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property check: for seeded random points/intervals and several bin
  * widths (including widths far smaller and far larger than the typical
  * interval span), the binned range join equals the brute-force cross
  * product — the bin grid must never change semantics, only the plan. */
class RangeJoinPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("binned join == brute force for random inputs across bin widths") {
    val rnd = new Random(20260812L)
    for (round <- 1 to 3) {
      val pts = (1 to 300).map(i =>
        (i.toLong, math.floor((rnd.nextDouble() * 400 - 100) * 1000) / 1000))
      val ivs = (1 to 60).map { i =>
        val lo = math.floor((rnd.nextDouble() * 400 - 120) * 1000) / 1000
        // mix of empty, tiny, typical, and huge spans
        val span = rnd.nextInt(4) match {
          case 0 => 0.0
          case 1 => rnd.nextDouble() * 0.5
          case 2 => rnd.nextDouble() * 40
          case _ => rnd.nextDouble() * 500
        }
        (i.toLong + 1000, lo, math.floor((lo + span) * 1000) / 1000)
      }
      val p = pts.toDF("pid", "v")
      val iv = ivs.toDF("iid", "lo", "hi")
      val want = p.crossJoin(iv)
        .filter(col("v") >= col("lo") && col("v") < col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      for (w <- Seq(0.37, 5.0, 50.0, 2000.0)) {
        val got = RangeJoin.pointInInterval(p, "v", iv, "lo", "hi", w)
          .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
        assert(got == want, s"round=$round binWidth=$w diverged from brute force")
        assert(got.distinct == got, s"round=$round binWidth=$w duplicate pairs")
      }
    }
  }
}
