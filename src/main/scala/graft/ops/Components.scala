package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the operator
  * that turns near-duplicate PAIRS into duplicate CLUSTERS (so a corpus
  * can keep exactly one canonical document per cluster, instead of the
  * pair-local "drop the larger id" heuristic that over- or under-deletes
  * whenever duplicates chain: a~b, b~c must collapse to ONE keeper even
  * if a~c was never emitted as a pair).
  *
  * Scale algorithm: alternating large-star / small-star (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * published shuffle-native CC formulation. Each half-round is one
  * groupBy(min) + one co-keyed join, so an iteration is a constant
  * number of hash shuffles on node ids, with no vertex programs and no
  * driver-side graph state. Rounds needed: O(log² n) worst case, and
  * in practice 2–3 for dedup graphs (near-dup clusters are dense and
  * shallow). Per-round results are materialized via [[Exec.materialize]]
  * — iterative plans otherwise stack every round into one exponential
  * lineage tree. Graphs under the size guard short-circuit to a
  * driver-side union-find instead (see [[connectedComponents]]).
  *
  * Convergence is detected by an order-insensitive edge-set fingerprint
  * (count + bit-XOR of per-edge hashes): one 1-row aggregate per round,
  * no driver-side edge collection.
  */
object Components {

  /** Component assignment for every node that appears in `edges`:
    * returns (node, component) where component = the minimum node id
    * reachable from the node (the canonical cluster representative).
    * Self-loops and duplicate/reversed edges are tolerated;
    * null-endpoint edges are dropped (no connectivity to express).
    *
    * Ids must be integral (cast to long internally). `maxIter` bounds
    * the star rounds and fails loudly if exceeded — a silently partial
    * clustering would delete the wrong documents downstream.
    *
    * Two execution paths behind a size guard (the decontaminate
    * broadcast-guard pattern): a dedup graph is usually TINY relative
    * to its corpus — edges exist only among near-duplicates — so a
    * `limit(localSolveMaxEdges + 1)` probe-collect first runs the edge
    * plan ONCE; when everything came back, components are solved in a
    * driver-side union-find pass (milliseconds, no checkpoint, no
    * extra jobs) instead of O(log n) iterated star rounds of cluster
    * shuffles. When the probe overflows — a genuinely huge pair
    * graph — the edge list is materialized and the shuffle-native star
    * iteration runs. Both paths emit the identical min-id labeling
    * (union-find roots are relabeled to each set's minimum member, so
    * the output is independent of edge order or which prefix a probe
    * would have seen — the probe is all-or-nothing, never partial). */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25,
                          localSolveMaxEdges: Long = 2000000L): DataFrame = {
    // null endpoints carry no connectivity — drop them up front (the
    // PageRank edge-hygiene rule). Without this the two paths DIVERGE:
    // the local probe's Dataset[(Long, Long)] collect throws on a null
    // field while the star rounds silently swallow the same rows in
    // canon's null-propagating filter — same input, two behaviors.
    val cast = edges.select(
        col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull)

    // Probe for the local path (Guard.probe, limit(cap + 1)): ONE job executes
    // the (typically expensive) upstream pair-generation exactly once
    // and hands back every edge when the graph fits — no checkpoint
    // write, no separate count. An over-cap graph does NOT pay a full
    // wasted pass: CollectLimit scans partitions incrementally (1, 4,
    // 16, …) and aborts as soon as cap + 1 rows surface, then the
    // materialize-then-iterate path below runs from scratch.
    if (localSolveMaxEdges > 0 && localSolveMaxEdges < Int.MaxValue - 1) {
      val spark = cast.sparkSession
      import spark.implicits._
      Guard.probe(cast.as[(Long, Long)], localSolveMaxEdges) match {
        case Some(probe) => return localSolve(spark, probe)
        case None        => // over cap: fall through to the distributed star rounds
      }
    }

    // Materialize the INPUT edge list: it is consumed twice (the
    // canonical edge set and the trailing all-nodes union), and
    // recomputing the upstream pair-generation would multiply the
    // query's cost.
    val eIn = Exec.materialize(cast)

    var cur = Exec.materialize(canon(eIn))
    var fp = fingerprint(cur)
    var converged = fp._1 == 0L // no edges → nothing to iterate
    var rounds = 0
    while (!converged && rounds < maxIter) {
      val next = Exec.materialize(canon(smallStar(largeStar(cur))))
      val nfp = fingerprint(next)
      converged = nfp == fp
      // the superseded round is dead the moment `next`'s eager
      // materialize has read it — without the release an R-round run
      // pins R edge-sized checkpoints for the session, only the last
      // ever read again (r15 review: the PageRank truncation rule)
      Exec.release(cur)
      cur = next; fp = nfp; rounds += 1
    }
    require(converged,
      s"connectedComponents did not converge within $maxIter star rounds")

    // Converged state is a star forest stored canonically as
    // (root, member) with root < member: each member node appears with
    // exactly one root (groupBy(min) keeps the invariant even if an
    // adversarial fixpoint left a duplicate), and each root maps to
    // itself. Nodes of the INPUT with no surviving edge (self-loop-only
    // nodes) are their own component via the left join.
    val members = cur.groupBy(col("v").as("node")).agg(min(col("u")).as("root"))
    val nodes = eIn.select(col("u").as("node"))
      .union(eIn.select(col("v").as("node"))).distinct()
    nodes.join(members, Seq("node"), "left")
      .select(col("node"), coalesce(col("root"), col("node")).as("component"))
  }

  /** Driver-side union-find over a bounded, already-collected edge
    * list (≤ `localSolveMaxEdges` rows — 2M edges ≈ 100 MB of boxed
    * tuples transiently on the driver): path-halving find + union, then
    * every set relabeled to its minimum member id, exactly the star
    * fixpoint's labeling. */
  private def localSolve(spark: org.apache.spark.sql.SparkSession,
                         collected: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) {
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp) // path halving
        x = gp
        p = parent.getOrDefault(x, x)
      }
      x
    }
    collected.foreach { case (u, v) =>
      parent.putIfAbsent(u, u)
      parent.putIfAbsent(v, v)
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent.put(math.max(ru, rv), math.min(ru, rv))
    }
    val minOfRoot = new java.util.HashMap[Long, Long]()
    parent.keySet().forEach { n =>
      val r = find(n)
      minOfRoot.merge(r, n.longValue(), math.min(_, _))
    }
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size())
    parent.keySet().forEach { n => out += ((n.longValue(), minOfRoot.get(find(n)))) }
    out.toSeq.toDF("node", "component")
  }

  /** Canonical undirected edge set: u < v, self-loops dropped, exact
    * duplicates collapsed — the normal form both star steps emit into,
    * and what the convergence fingerprint compares. */
  private def canon(e: DataFrame): DataFrame =
    e.filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()

  /** Large-star: every node u connects its LARGER neighbors to the
    * minimum of its closed neighborhood m = min(N(u) ∪ {u}) — emits
    * (v, m) for v ∈ N(u), v > u. Neighborhoods are both orientations of
    * the canonical edges. */
  private def largeStar(e: DataFrame): DataFrame = {
    val nbrs = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = nbrs.groupBy(col("u"))
      .agg(least(min(col("v")), col("u")).as("m"))
    nbrs.join(mins, Seq("u"))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
  }

  /** Small-star: orient every edge toward its larger endpoint, then each
    * node h links its (all smaller) neighbors — and itself — to
    * m = min(N(h) ∪ {h}): emits (v, m) for v ∈ N(h) and (h, m). */
  private def smallStar(e: DataFrame): DataFrame = {
    val or = e.select(greatest(col("u"), col("v")).as("h"), least(col("u"), col("v")).as("v"))
    val joined = or.join(
      or.groupBy(col("h")).agg(min(col("v")).as("m")), Seq("h"))
    joined.select(col("v").as("u"), col("m").as("v"))
      .union(joined.select(col("h").as("u"), col("m").as("v")).distinct())
  }

  /** Order-insensitive edge-set fingerprint: (row count, XOR of per-row
    * 64-bit hashes). Collision probability 2⁻⁶⁴ per comparison —
    * negligible against maxIter comparisons, and a collision only
    * stops iteration one round early on an almost-converged graph. */
  private def fingerprint(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Cluster-representative selection — the step AFTER components that
    * actually deduplicates: for every row of `docs`, which cluster it
    * belongs to and which single member the corpus keeps. The keeper is
    * the cluster's argmax by (`quality` desc, id asc) — "keep the best
    * copy", where min-id pair-local keeping keeps an arbitrary one.
    * Rows absent from `assign` (never in any near-dup pair) are their
    * own singleton cluster and their own keeper.
    *
    * Returns (`idCol`, dup_group, keeper_id, keep ∈ {0, 1}).
    *
    * Scale shape: `assign` (= [[connectedComponents]] output) is
    * pair-graph-sized — tiny next to the corpus — so only the
    * clustered SLICE of the corpus flows through the argmax aggregate
    * and the verdict join (both AQE-broadcast-able); the full corpus
    * is touched exactly twice, by the inner and anti join on the id,
    * and never shuffles on the cluster key. `quality` must be
    * non-null integral on clustered rows (the argmax struct orders
    * exactly like the oracle's `ORDER BY quality DESC, id ASC`). */
  def representatives(docs: DataFrame, assign: DataFrame, idCol: String,
                      quality: Column): DataFrame = {
    val id = col(idCol)
    val clustered = docs
      .join(assign, id === col("node"))
      .select(id, col("component").as("dup_group"),
        quality.cast("long").as("__q"))
    val reps = clustered.groupBy(col("dup_group"))
      .agg(max(struct(col("__q"), (-id).as("__nid"))).as("__best"))
      .select(col("dup_group"), (-col("__best.__nid")).cast("long").as("keeper_id"))
    val dups = clustered.join(reps, Seq("dup_group"))
      .select(id, col("dup_group"), col("keeper_id"),
        (id === col("keeper_id")).cast("int").as("keep"))
    val singles = docs.join(assign, id === col("node"), "left_anti")
      .select(id, id.cast("long").as("dup_group"),
        id.cast("long").as("keeper_id"), lit(1).as("keep"))
    dups.unionByName(singles)
  }
}
