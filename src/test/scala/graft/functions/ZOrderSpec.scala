package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Z-order kernel: bit-level parity with a naive reference interleave,
  * curve locality, and the actual layout win — a 2-D box predicate
  * touches fewer files under writeZOrdered than under a linear sort. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def naive(x: Long, y: Long): Long = {
    var r = 0L
    var i = 0
    while (i < 32) {
      r |= ((x >> i) & 1L) << (2 * i)
      r |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    r
  }

  test("interleave matches the naive per-bit reference on random longs") {
    val rnd = new scala.util.Random(5)
    (0 until 2000).foreach { _ =>
      val (x, y) = (rnd.nextLong() & 0xFFFFFFFFL, rnd.nextLong() & 0xFFFFFFFFL)
      assert(ZOrderKey.interleave(x, y) == naive(x, y), s"x=$x y=$y")
    }
    assert(ZOrderKey.interleave(0L, 0L) == 0L)
    assert(ZOrderKey.interleave(0xFFFFFFFFL, 0L) == 0x5555555555555555L)
    assert(ZOrderKey.interleave(0L, 0xFFFFFFFFL) == 0xAAAAAAAAAAAAAAAAL)
  }

  test("expression form matches the scala kernel and runs in codegen") {
    // spark.range, not a local Seq: ConvertToLocalRelation would fold a
    // projection over LocalRelation eagerly and leave no plan to assert
    val df = spark.range(500)
      .select((col("id") * 7 % 256).as("x"), (col("id") * 13 % 256).as("y"))
      .select(col("x"), col("y"), ZOrderKey.zkey(col("x"), col("y")).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) == ZOrderKey.interleave(r.getLong(0), r.getLong(1)))
    }
    val p = df.queryExecution.executedPlan.toString
    val line = p.linesIterator.find(_.contains("z_order_key")).getOrElse("")
    assert(line.contains("*("), s"z_order_key not in a codegen stage: $line")
  }

  test("same-quadrant points share the leading z-bits (curve locality)") {
    // 16-bit domain: the top bit of each dimension is output bits 31/30
    val inQ11 = ZOrderKey.interleave(0x8000L + 5, 0x8000L + 9)
    val inQ00 = ZOrderKey.interleave(5L, 9L)
    assert((inQ11 >> 30) == 3L && (inQ00 >> 30) == 0L)
  }

  test("2-D box predicate touches fewer files z-ordered than linear-sorted") {
    val rnd = new scala.util.Random(17)
    val pts = Seq.fill(20000)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    graft.Ioops.writeZOrdered(pts, s"$dir/z", col("x"), col("y"), Some(16))
    graft.Ioops.writeSorted(pts, s"$dir/linear", Seq("x"), Some(16))

    // per-FILE y bounding ranges — the stats a min/max-pruning scan
    // sees. The decisive case for z-order is a predicate on the
    // dimension the linear sort does NOT order by: every linear file
    // spans all of y (touches 16/16), while the z-layout bounds y per
    // file.
    def touchedByY(path: String): (Int, Int) = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
      val hit = files.count { f =>
        val r = spark.read.parquet(f).agg(min(col("y")), max(col("y"))).head()
        r.getLong(0) <= 160 && r.getLong(1) >= 100 // y in [100, 160]
      }
      (hit, files.length)
    }
    val (zHit, zAll) = touchedByY(s"$dir/z")
    val (linHit, linAll) = touchedByY(s"$dir/linear")
    assert(linHit == linAll, s"linear layout should span y in every file: $linHit/$linAll")
    assert(zHit * 2 <= zAll, s"z-order should bound y: touched $zHit of $zAll files")
    // and the layouts hold the same rows
    assert(spark.read.parquet(s"$dir/z").count() == 20000)
  }
}
