package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Sweep-line max-concurrency on planted intervals: overlaps stack,
  * half-open adjacency does not, degenerate/null intervals drop, and
  * the result matches a brute-force scan on random intervals. */
class SweepSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def peak(rows: Seq[(String, Long, Long)]): Map[String, Long] =
    Sweep.maxConcurrent(rows.toDF("k", "s", "e"), col("k"), col("s"), col("e"))
      .as[(String, Long)].collect().toMap

  test("stacked, chained, and disjoint intervals") {
    val m = peak(Seq(
      ("a", 0L, 10L), ("a", 2L, 5L), ("a", 3L, 4L),  // nested -> 3
      ("b", 0L, 5L), ("b", 5L, 10L),                 // half-open chain -> 1
      ("c", 0L, 1L), ("c", 2L, 3L)))                 // disjoint -> 1
    assert(m == Map("a" -> 3L, "b" -> 1L, "c" -> 1L), s"got $m")
  }

  test("degenerate and null intervals contribute nothing") {
    val df = Seq(
      ("a", Some(1L), Some(1L)),   // empty [1,1)
      ("a", Some(5L), Some(3L)),   // inverted
      ("a", None, Some(3L)),       // null start
      ("b", Some(1L), Some(2L))
    ).toDF("k", "s", "e")
    val m = Sweep.maxConcurrent(df, col("k"), col("s"), col("e"))
      .as[(String, Long)].collect().toMap
    assert(m == Map("b" -> 1L), s"got $m") // key a vanishes entirely
  }

  private def cover(rows: Seq[(String, Long, Long)]): Map[String, Long] =
    Sweep.coveredDuration(rows.toDF("k", "s", "e"), col("k"), col("s"), col("e"))
      .as[(String, Long)].collect().toMap

  test("coverage counts overlap once; half-open chains have no seams") {
    val m = cover(Seq(
      ("a", 0L, 5L), ("a", 3L, 8L),   // union [0,8) -> 8
      ("b", 0L, 5L), ("b", 5L, 10L),  // adjacent -> 10
      ("c", 0L, 1L), ("c", 5L, 6L),   // disjoint -> 2
      ("d", 0L, 10L), ("d", 2L, 4L))) // nested -> 10
    assert(m == Map("a" -> 8L, "b" -> 10L, "c" -> 2L, "d" -> 10L), s"got $m")
  }

  test("coverage matches brute force on random-ish intervals") {
    val rows = (0 until 400).map { i =>
      val s = (i * 37) % 100
      (s"k${i % 3}", s.toLong, (s + 1 + (i * 13) % 20).toLong)
    }
    val got = cover(rows)
    rows.groupBy(_._1).foreach { case (k, ivs) =>
      val want = (0L until 130L).count(t => ivs.exists(iv => iv._2 <= t && t < iv._3)).toLong
      assert(got(k) == want, s"key $k")
    }
  }

  test("matches brute force on random-ish intervals") {
    val rows = (0 until 400).map { i =>
      val s = (i * 37) % 100
      (s"k${i % 3}", s.toLong, (s + 1 + (i * 13) % 20).toLong)
    }
    val got = peak(rows)
    rows.groupBy(_._1).foreach { case (k, ivs) =>
      val want = (0L until 130L).map { t =>
        ivs.count(iv => iv._2 <= t && t < iv._3)
      }.max.toLong
      assert(got(k) == want, s"key $k")
    }
  }
}
