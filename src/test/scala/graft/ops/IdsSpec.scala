package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contiguous-id assignment: dense 0..n-1, follows the total order,
  * holds across many partitions (the offsets actually compose), and
  * the plan never funnels through a global window. */
class IdsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ids are dense, 0-based, and follow the order across partitions") {
    // enough rows and partitions that per-partition offsets matter
    val df = (0 until 1000).map(i => ((i * 7919) % 1000, s"v$i")).toDF("k", "v")
      .repartition(13)
    val got = Ids.contiguousIds(df, "id", Seq(col("k")))
      .select("k", "id").as[(Int, Long)].collect().sortBy(_._2)
    assert(got.map(_._2).toSeq == (0L until 1000L))       // dense, 0-based
    assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq) // follows order
  }

  test("ties under a non-total order would be ambiguous — a unique tiebreak fixes them") {
    val df = Seq((1, "a"), (1, "b"), (0, "c")).toDF("k", "u")
    val got = Ids.contiguousIds(df, "id", Seq(col("k"), col("u")))
      .select("u", "id").as[(String, Long)].collect().toMap
    assert(got == Map("c" -> 0L, "a" -> 1L, "b" -> 2L))
  }

  test("empty input yields an empty frame with the id column") {
    val df = Seq.empty[(Int, String)].toDF("k", "v")
    val out = Ids.contiguousIds(df, "id", Seq(col("k")))
    assert(out.columns.toSeq == Seq("k", "v", "id"))
    assert(out.count() == 0)
  }
}
