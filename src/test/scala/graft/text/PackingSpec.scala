package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("packContiguous lays docs end-to-end per group and cuts at the budget") {
    // group g1: sizes 3,4,5 with budget 6 → offsets 0,3,7 → bins 0,0,1
    val df = Seq(("g1", 1L, 3L), ("g1", 2L, 4L), ("g1", 3L, 5L), ("g2", 1L, 6L))
      .toDF("g", "id", "n")
    val got = Packing.packContiguous(df, Seq(col("g")), col("id"), col("n"), 6)
      .select("g", "id", "bin", "bin_offset", "spans_boundary")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(("g1", 1L)) == ((0L, 0L, false)))   // tokens 0..2
    assert(got(("g1", 2L)) == ((0L, 3L, true)))    // tokens 3..6 crosses 6
    assert(got(("g1", 3L)) == ((1L, 1L, false)))   // tokens 7..11 ends AT the boundary
    assert(got(("g2", 1L)) == ((0L, 0L, false)))   // exactly fills the bin
  }

  test("packContiguous invariants on a larger pseudo-random group set") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 300L).map(i => (s"g${i % 5}", i, 1L + rnd.nextInt(40).toLong))
    val df = rows.toDF("g", "id", "n")
    val got = Packing.packContiguous(df, Seq(col("g")), col("id"), col("n"), 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    // recompute per group locally
    val byGroup = rows.groupBy(_._1)
    got.groupBy(_._1).foreach { case (g, rs) =>
      var off = 0L
      byGroup(g).sortBy(_._2).foreach { case (_, id, n) =>
        val r = rs.find(_._2 == id).get
        assert(r._4 == off / 64, s"bin for $g/$id")
        assert(r._5 == off % 64, s"offset for $g/$id")
        assert(r._6 == (off % 64 + n > 64), s"boundary for $g/$id")
        off += n
      }
    }
  }

  test("packContiguous refuses a global (ungrouped) pack") {
    val df = Seq((1L, 3L)).toDF("id", "n")
    intercept[IllegalArgumentException] {
      Packing.packContiguous(df, Seq.empty, col("id"), col("n"), 6)
    }
  }

  test("chunkTokenWindows covers every token with the expected overlap") {
    val text = (1 to 50).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text)).toDF("id", "text")
    val got = Packing.chunkTokenWindows(df, "id", "text", window = 20, stride = 15)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    // starts 0,15,30,45 → sizes 20,20,20,5
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(got.map(_._3).toSeq == Seq(20L, 20L, 20L, 5L))
    assert(got(0)._2.startsWith("w1 w2 ") && got(0)._2.endsWith(" w20"))
    assert(got(1)._2.startsWith("w16 ") && got(1)._2.endsWith(" w35"))
    assert(got(3)._2 == "w46 w47 w48 w49 w50")
  }

  test("chunkTokenWindows emits one chunk for docs shorter than the window") {
    val df = Seq((1L, "a b c")).toDF("id", "text")
    val got = Packing.chunkTokenWindows(df, "id", "text", 32, 24).collect()
    assert(got.length == 1)
    assert(got.head.getString(2) == "a b c" && got.head.getLong(3) == 3L)
  }
}
