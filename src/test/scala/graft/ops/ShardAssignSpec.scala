package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic shard layout: range/density invariants, exact
  * reproducibility, append-stability of shard ids, and knob
  * validation. */
class ShardAssignSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def keys(n: Int) = (1 to n).map(_.toLong).toDF("k")

  test("shards in range, positions dense 1..count per shard") {
    val out = Sampling.shardAssign(keys(500), col("k"), 8)
      .select("k", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(out.forall(r => r._2 >= 0 && r._2 < 8))
    out.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length),
        s"shard $s positions not dense")
    }
    assert(out.map(_._2).distinct.length > 1, "all rows in one shard")
  }

  test("two runs produce the identical layout") {
    def run() = Sampling.shardAssign(keys(300), col("k"), 16)
      .select("k", "shard", "pos").as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    assert(run() == run())
  }

  test("appending keys never moves an existing key's shard") {
    val before = Sampling.shardAssign(keys(200), col("k"), 16)
      .select("k", "shard").as[(Long, Int)].collect().toMap
    val after = Sampling.shardAssign(keys(400), col("k"), 16)
      .select("k", "shard").as[(Long, Int)].collect().toMap
    assert(before.forall { case (k, s) => after(k) == s })
  }

  test("nShards = 1 degenerates to one globally ordered stream") {
    val out = Sampling.shardAssign(keys(50), col("k"), 1)
      .select("shard", "pos").as[(Int, Int)].collect()
    assert(out.forall(_._1 == 0))
    assert(out.map(_._2).sorted.toSeq == (1 to 50))
  }

  test("nShards outside [1, 65536] rejected") {
    intercept[IllegalArgumentException] {
      Sampling.shardAssign(keys(5), col("k"), 0)
    }
    intercept[IllegalArgumentException] {
      Sampling.shardAssign(keys(5), col("k"), 65537)
    }
  }
}
