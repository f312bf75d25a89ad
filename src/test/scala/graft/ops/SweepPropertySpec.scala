package graft.ops

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Property tests for the interval sweep: on random interval sets —
  * touching endpoints (half-open: no overlap), containment, exact
  * duplicates, degenerate (end ≤ start, dropped), point-adjacent
  * stacks — per-key peak concurrency and covered duration must equal
  * a driver sweep applying the same half-open convention. */
class SweepPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private val caseGen: Gen[Seq[(Long, Long, Long)]] = for {
    n <- Gen.chooseNum(0, 50)
    rows <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(0L, 3L)
      s <- Gen.chooseNum(0L, 20L)
      len <- Gen.chooseNum(-2L, 8L) // negatives/zeros: degenerate rows
    } yield (k, s, s + len))
  } yield rows

  private def live(rows: Seq[(Long, Long, Long)]): Map[Long, Seq[(Long, Long)]] =
    rows.filter(r => r._3 > r._2).groupBy(_._1)
      .map { case (k, rs) => k -> rs.map(r => (r._2, r._3)) }

  private def refMax(rows: Seq[(Long, Long, Long)]): Map[Long, Long] =
    live(rows).map { case (k, ivs) =>
      // sweep: at each boundary, closes apply before opens (half-open)
      val events = ivs.flatMap { case (s, e) => Seq((s, +1), (e, -1)) }
        .sortBy { case (t, d) => (t, d) } // -1 sorts before +1 at a tie
      var open = 0L; var peak = 0L
      events.foreach { case (_, d) => open += d; if (open > peak) peak = open }
      k -> peak
    }

  private def refCovered(rows: Seq[(Long, Long, Long)]): Map[Long, Long] =
    live(rows).map { case (k, ivs) =>
      k -> ivs.flatMap { case (s, e) => s until e }.distinct.size.toLong
    }

  test("maxConcurrent equals the driver sweep on random intervals") {
    val cases = Gen.listOfN(6, caseGen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { rows =>
      val got = Sweep.maxConcurrent(rows.toDF("k", "s", "e").repartition(3),
          col("k"), col("s"), col("e"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refMax(rows), s"rows=$rows:\n$got\nvs ${refMax(rows)}")
    }
  }

  test("coveredDuration equals the unit-interval union size on random intervals") {
    val cases = Gen.listOfN(6, caseGen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { rows =>
      val got = Sweep.coveredDuration(rows.toDF("k", "s", "e").repartition(3),
          col("k"), col("s"), col("e"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refCovered(rows), s"rows=$rows:\n$got\nvs ${refCovered(rows)}")
    }
  }
}
