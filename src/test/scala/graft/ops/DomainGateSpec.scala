package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Domain-level gate: hand-checked keep/drop sets, the exact-tie edge
  * (a group AT the global mean is kept), rational thresholds, null
  * handling, and the empty contract. */
class DomainGateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // g1 mean 10, g2 mean 30, g3 mean 20 == global mean 20 exactly
  // (values 10,10, 30,30, 20,20 → global 120/6 = 20).
  private def base = Seq(
    ("g1", 1L, 10L), ("g1", 2L, 10L), ("g2", 3L, 30L),
    ("g2", 4L, 30L), ("g3", 5L, 20L), ("g3", 6L, 20L))
    .toDF("src", "id", "v")

  private def keptSrcs(df: org.apache.spark.sql.DataFrame,
                       num: Long = 1L, den: Long = 1L): Set[String] =
    DomainGate.keepGroupsAboveMean(df, col("src"), col("v"), num, den)
      .select("src").distinct().as[String].collect().toSet

  test("below-mean group dropped; at-mean group kept (exact tie)") {
    assert(keptSrcs(base) == Set("g2", "g3"))
  }

  test("rational threshold 3/2 keeps only the top group") {
    // cutoff = 30: g2 (mean 30) ties the scaled mean and is kept.
    assert(keptSrcs(base, num = 3L, den = 2L) == Set("g2"))
  }

  test("rational threshold 1/2 keeps every group") {
    assert(keptSrcs(base, num = 1L, den = 2L) == Set("g1", "g2", "g3"))
  }

  test("all rows of a kept group survive; dropped group fully gone") {
    val out = DomainGate.keepGroupsAboveMean(base, col("src"), col("v"))
      .select("id").as[Long].collect().toSet
    assert(out == Set(3L, 4L, 5L, 6L))
  }

  test("null values are excluded from means and output") {
    // g1's null row is ignored: mean stays 10 and the row never
    // reappears even when its group would be kept at threshold 1/2.
    val df = (base.select(col("src"), col("id"), col("v").cast("long").as("v"))
      .unionByName(Seq(("g1", 7L)).toDF("src", "id")
        .withColumn("v", lit(null).cast("long"))))
    val out = DomainGate.keepGroupsAboveMean(df, col("src"), col("v"), 1L, 2L)
      .select("id").as[Long].collect().toSet
    assert(!out.contains(7L) && out.contains(1L))
  }

  test("empty input yields empty output; bad threshold rejected") {
    val empty = Seq.empty[(String, Long, Long)].toDF("src", "id", "v")
    assert(DomainGate.keepGroupsAboveMean(empty, col("src"), col("v")).count() == 0L)
    intercept[IllegalArgumentException] {
      DomainGate.keepGroupsAboveMean(base, col("src"), col("v"), 0L, 1L)
    }
  }
}
