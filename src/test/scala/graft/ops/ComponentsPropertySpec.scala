package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Property tests for connected components: on random edge lists —
  * self-loops, duplicate and reversed-duplicate edges, null endpoints,
  * chains, empty graphs — BOTH execution paths (the probe-collected
  * driver union-find and the distributed alternating-star rounds,
  * forced via `localSolveMaxEdges = 0`) must emit the identical
  * min-member labeling of an independent reference union-find. The
  * hand-picked ComponentsSpec cases pin each rule once; this spec pins
  * the path-identity claim ("both paths emit the identical min-id
  * labeling") over the generated space, where a divergence would
  * corrupt dedup keep-decisions silently. */
class ComponentsPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private type E = (Option[Long], Option[Long])

  private val edgeGen: Gen[E] = for {
    u <- Gen.frequency(9 -> Gen.chooseNum(0L, 25L).map(Some(_)),
      1 -> Gen.const(Option.empty[Long]))
    v <- Gen.frequency(9 -> Gen.chooseNum(0L, 25L).map(Some(_)),
      1 -> Gen.const(Option.empty[Long]))
  } yield (u, v)

  private val caseGen: Gen[Seq[E]] = for {
    n <- Gen.chooseNum(0, 60)
    es <- Gen.listOfN(n, edgeGen)
  } yield es

  /** Independent union-find, relabeled to each set's minimum member —
    * the documented output contract. Null endpoints carry no
    * connectivity (the operator drops them up front). */
  private def reference(edges: Seq[E]): Map[Long, Long] = {
    val es = edges.collect { case (Some(u), Some(v)) => (u, v) }
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    es.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    nodes.groupBy(find).flatMap { case (_, ms) =>
      val label = ms.min; ms.map(_ -> label)
    }.toMap
  }

  private val schema = StructType(Seq(
    StructField("id_a", LongType, nullable = true),
    StructField("id_b", LongType, nullable = true)))

  private def df(edges: Seq[E]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        edges.map { case (u, v) => Row(u.orNull, v.orNull) }, 2), schema)

  test("driver and star-round paths equal the reference union-find on random graphs") {
    val cases = Gen.listOfN(8, caseGen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { edges =>
      val want = reference(edges)
      // default cap => probe-collected driver union-find; 0 => the cap
      // is disabled and the distributed star rounds run
      Seq(2000000L, 0L).foreach { cap =>
        val got = Components.connectedComponents(df(edges), "id_a", "id_b",
            localSolveMaxEdges = cap)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want,
          s"path(cap=$cap) diverged from reference on edges=$edges:\n$got\nvs $want")
      }
    }
  }
}
