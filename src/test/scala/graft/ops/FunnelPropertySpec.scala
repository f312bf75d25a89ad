package graft.ops

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Property tests for the ordered funnel: on random event streams —
  * stages hit out of order (must not count), repeated stages, events
  * completing at the same row position for different entities, stage
  * predicates never hit — per-entity depth must equal a driver scan
  * applying the documented semantics: stage k counts iff its predicate
  * holds on a row STRICTLY AFTER some row that completed stage k−1,
  * and one event cannot complete two stages. */
class FunnelPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private val caseGen: Gen[Seq[(Long, Long, String)]] = for {
    n <- Gen.chooseNum(0, 60)
    rows <- Gen.listOfN(n, for {
      e <- Gen.chooseNum(0L, 3L)
      t <- Gen.oneOf("A", "B", "C", "X") // X matches no stage
    } yield (e, t))
  } yield rows.zipWithIndex.map { case ((e, t), i) => (e, i.toLong, t) }

  private val stageTypes = Seq("A", "B", "C")

  /** Driver scan: for each entity in order, reached(k) at a row iff the
    * row matches stage k and some STRICTLY prior row reached k−1. */
  private def reference(rows: Seq[(Long, Long, String)]): Map[Long, Long] =
    rows.groupBy(_._1).map { case (e, rs) =>
      val sorted = rs.sortBy(_._2).map(_._3)
      val everReached = Array.fill(stageTypes.size)(false)
      sorted.foreach { t =>
        // evaluate gates against the PRE-row state (strictly prior),
        // highest stage first so one row cannot chain two stages
        val gates = everReached.clone()
        stageTypes.zipWithIndex.reverse.foreach { case (st, k) =>
          if (t == st && (k == 0 || gates(k - 1))) everReached(k) = true
        }
      }
      e -> everReached.count(identity).toLong
    }

  test("stageDepth equals the driver scan on random event streams") {
    val cases = Gen.listOfN(8, caseGen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { rows =>
      val df = rows.toDF("e", "seq", "t").repartition(4)
      val got = Funnel.stageDepth(df, col("e"), Seq(col("seq")),
          stageTypes.map(st => col("t") === st))
        .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
      val want = reference(rows)
      assert(got == want, s"rows=$rows:\n$got\nvs $want")
    }
  }
}
