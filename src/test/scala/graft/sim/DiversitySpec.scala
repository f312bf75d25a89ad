package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Cluster-stratified diversity sampling: per-cell caps bound the
  * dense region, sparse cells survive whole, selection is
  * deterministic, and the index-backed form equals the re-quantizing
  * form given the same quantizer. */
class DiversitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // two planted clusters: a DENSE one (40 points near the origin) and
  // a SPARSE one (4 points far away) — k=2 separates them cleanly
  private lazy val emb = {
    val dense = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(j => (i % 5).toFloat * 0.01f + j * 0.001f)))
    val sparse = (100L until 104L).map(i =>
      (i, Array.tabulate(8)(j => 50f + (i % 4).toFloat * 0.01f + j * 0.001f)))
    (dense ++ sparse).toDF("vec_id", "embedding")
  }
  private lazy val model = Ivf.fitCentroids(emb, "embedding", k = 2, seed = 7L)

  test("dense cell capped, sparse cell kept whole; rows ride their cell") {
    val kept = Diversity.diversitySample(emb, "vec_id", "embedding", model, perCell = 5)
      .select(col("vec_id"), col("cell")).collect()
    val byOrigin = kept.map(_.getLong(0)).partition(_ < 100L)
    assert(byOrigin._1.length == 5, s"dense cluster must cap at 5, got ${byOrigin._1.length}")
    assert(byOrigin._2.length == 4, s"sparse cluster must survive whole, got ${byOrigin._2.length}")
    // every kept row carries a valid cell id
    assert(kept.map(_.getInt(1)).forall(c => c >= 0 && c < 2))
  }

  test("selection is deterministic across invocations") {
    def ids() = Diversity.diversitySample(emb, "vec_id", "embedding", model, 3)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(ids() == ids())
  }

  test("index-backed form equals the re-quantizing form") {
    val indexed = Ivf.assignedFrame(emb, "vec_id", "embedding", model)
      .select(col("cell"), col("neighbor_id"), col("c_vec").as("vec"),
        col("c_norm").as("norm"))
    val a = Diversity.diversitySample(emb, "vec_id", "embedding", model, 4)
      .select("vec_id").as[Long].collect().sorted.toSeq
    val b = Diversity.diversitySampleIndexed(emb, "vec_id", indexed, 4)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(a == b, s"indexed=$b inline=$a")
  }

  test("perCell must be positive") {
    intercept[IllegalArgumentException] {
      Diversity.diversitySample(emb, "vec_id", "embedding", model, 0)
    }
  }
}
