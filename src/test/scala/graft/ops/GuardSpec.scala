package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The uniform driver-materialization guard: under-cap collects keep
  * every row, over-cap probes decline, over-cap literals fail loudly
  * with the name, the cap, and the remedy in one message. */
class GuardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("probe returns all rows under the cap, None over it") {
    val ds = (1L to 100L).toDS()
    assert(Guard.probe(ds, 100L).map(_.sorted.toSeq).contains((1L to 100L).toSeq))
    assert(Guard.probe(ds, 99L).isEmpty)
    assert(Guard.probe(spark.emptyDataset[Long], 1L).map(_.toSeq).contains(Seq.empty))
  }

  test("driverLiteral keeps rows under the cap, names the overflow above it") {
    val ds = (1L to 10L).toDS()
    assert(Guard.driverLiteral(ds, "tiny set", 10L, "unused").sorted.toSeq == (1L to 10L).toSeq)
    val e = intercept[IllegalArgumentException] {
      Guard.driverLiteral(ds, "tiny set", 9L, "raise the cap deliberately")
    }
    assert(e.getMessage.contains("tiny set"), e.getMessage)
    assert(e.getMessage.contains("9"), e.getMessage)
    assert(e.getMessage.contains("raise the cap deliberately"), e.getMessage)
  }

  test("nonsensical caps are rejected before any job runs") {
    val ds = (1L to 3L).toDS()
    intercept[IllegalArgumentException] { Guard.probe(ds, 0L) }
    intercept[IllegalArgumentException] { Guard.probe(ds, Int.MaxValue.toLong) }
  }
}
