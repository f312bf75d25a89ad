package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Star-algorithm connected components vs a local union-find oracle. */
class ComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Distributed star-rounds path, forced (localSolveMaxEdges = 0 keeps
    * the size guard from short-circuiting these graphs to the driver). */
  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b",
        localSolveMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Size-guarded driver-side union-find path (the default for graphs
    * this size). */
  private def ccLocal(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Local union-find: component = min node id of each set. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(x => x -> find(x)).toMap
  }

  test("long path graph (forces multiple star rounds)") {
    val path = (0L until 40L).map(i => (i, i + 1))
    val got = cc(path)
    assert(got.size == 41 && got.values.forall(_ == 0L))
  }

  test("disjoint cliques keep distinct min-id components") {
    val cliqueA = for (i <- 0 to 4; j <- i + 1 to 4) yield (10L + i, 10L + j)
    val cliqueB = for (i <- 0 to 3; j <- i + 1 to 3) yield (50L + i, 50L + j)
    val got = cc(cliqueA ++ cliqueB)
    assert((10 to 14).forall(i => got(i.toLong) == 10L))
    assert((50 to 53).forall(i => got(i.toLong) == 50L))
  }

  test("self-loops, duplicate and reversed edges are tolerated") {
    val got = cc(Seq((1L, 1L), (2L, 3L), (3L, 2L), (2L, 3L), (7L, 7L)))
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 7L -> 7L))
  }

  test("empty edge set yields empty assignment") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("matches union-find on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val got = cc(edges)
      val want = unionFind(edges)
      assert(got == want, s"trial $trial")
    }
  }

  test("local-solve path matches the distributed star path exactly") {
    val rnd = new scala.util.Random(7)
    val chain = (100L until 130L).map(i => (i, i + 1)) // long path
    val rand = Seq.fill(80)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val loops = Seq((200L, 200L), (201L, 201L)) // self-loop-only nodes
    val edges = chain ++ rand ++ loops
    assert(ccLocal(edges) == cc(edges), "local vs star path")
    assert(ccLocal(edges) == unionFind(edges), "local path vs union-find oracle")
  }

  test("local-solve: self-loops and empties behave like the star path") {
    assert(ccLocal(Seq((1L, 1L), (2L, 3L), (3L, 2L), (7L, 7L))) ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 7L -> 7L))
    assert(ccLocal(Seq.empty).isEmpty)
  }

  test("null endpoints are dropped identically on both paths") {
    // pre-guard, the LOCAL path crashed collecting a null into a
    // primitive (Long, Long) while the star path silently swallowed
    // the same rows — same input, two behaviors
    val edges = Seq((Some(1L), Some(2L)), (None, Some(3L)), (Some(4L), None),
      (Option.empty[Long], Option.empty[Long]), (Some(2L), Some(5L)))
      .toDF("a", "b")
    val want = Map(1L -> 1L, 2L -> 1L, 5L -> 1L) // only real edges connect
    val local = Components.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = Components.connectedComponents(edges, "a", "b",
        localSolveMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == want, s"local path: $local")
    assert(star == want, s"star path: $star")
  }
}
