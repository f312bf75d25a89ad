package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the iterative
  * join/aggregate shape next to [[Components]]' connected components:
  * where CC answers "which rows are the same thing", PageRank answers
  * "which nodes matter", the link-authority signal corpus curation
  * uses to weight sources (a page linked by many well-linked pages
  * outranks a link farm of equal degree).
  *
  * Semantics: the classic non-normalized formulation,
  * `rank'(v) = (1 − d) + d · Σ_{u→v} rank(u)/outdeg(u)`, run for a
  * FIXED number of iterations. Dangling mass is not redistributed
  * (nodes with no out-edges absorb rank; on an undirected edge list
  * there are none) — the standard SQL-expressible variant, and fixed
  * iterations keep the plan finite and the result a pure function of
  * the input.
  *
  * Determinism: each iteration's per-target sum goes through
  * [[Exprs.sumExact]] (1e-7 fixed-point integer sum), so ranks are
  * bit-identical under any partitioning and reproducible by a
  * single-threaded oracle that spells the same quantization. The
  * divisions and the damping update are single IEEE double ops,
  * identical on any engine.
  *
  * Scale shape: the degree-annotated edge list is materialized ONCE
  * and reused by every iteration (it is the loop invariant — at 100 TB
  * this is the artifact you'd persist bucketed by src so each
  * iteration's join is co-located and shuffle-free); each iteration is
  * then one src-keyed left join of the (nodes-sized) contribution-sum
  * frame plus one dst-keyed aggregate — the rank update folds into the
  * join projection, so no rank frame is ever materialized and the full
  * node set is joined exactly once, at emission. 2 shuffles per
  * iteration on node-cardinality data, never a second pass over the
  * raw input. A Zipfian in-degree hot spot lands in the aggregate,
  * where map-side partials absorb it. */
object PageRank {

  /** Ranks after `iterations` rounds from a uniform 1.0 start. Emits
    * (node, rank) for every node appearing as a source or target.
    * Self-loops and duplicate edges are deduplicated; null endpoints
    * are dropped. */
  def pagerank(edges: DataFrame, srcCol: Column, dstCol: Column,
               iterations: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    val e = edges
      .select(srcCol.as("src"), dstCol.as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // Loop invariant, clustered by the iteration-join key (r20): a bare
    // materialize captures UnknownPartitioning, so EVERY iteration
    // re-exchanged + re-sorted the edge frame by src for its SMJ —
    // measured at sf0.1 as 1 exchange + 1 sort of the biggest frame per
    // round. materializeClustered pays that exchange+sort ONCE at setup
    // and re-declares the layout on the checkpoint leaf; each iteration
    // then moves only the node-sized sums frame (this is the "persist
    // bucketed by src" deployment shape the scaladoc promises, expressed
    // within a single run).
    val ed = Exec.materializeClustered(e.join(deg, "src"), "src")
    // Iterate on the per-target CONTRIBUTION SUMS, never on a
    // materialized rank frame (r19 optimization): the rank update
    // `rank(u) = (1−d) + d·s(u)` is a scalar function of the previous
    // sums, so it folds INTO the next iteration's join projection
    // instead of costing a nodes-sized LEFT JOIN per round. The old
    // shape paid, per iteration, one inner join (ed ⋈ ranks) PLUS one
    // left-outer join (nodes ⋈ sums) — measured at sf0.1 as 3
    // exchanges + 2 SMJ sorts per round; this shape pays one left join
    // (ed ⋈ sums) + the aggregate, and the aggregate's hash
    // partitioning on the sum key feeds the next round's SMJ without
    // re-exchanging (2 exchanges + 1 SMJ per round), with the full
    // node frame joined exactly ONCE at emission. A src node with no
    // in-edges is absent from sums and coalesces to rank 1−d — exactly
    // the value the old left join assigned it — and every IEEE op
    // (coalesce → fma-free 1−d + d·s → /outdeg) is spelled in the same
    // order, so ranks are bit-identical (PageRankSpec pins the
    // fixed points; the x32 oracle pins the full board). The
    // per-iteration broadcast variant was measured and REJECTED in r15
    // (dev/PAGERANK_BCAST_AB_r15.md): it removed exchanges but paid
    // driver collect barriers; this removes the join without adding
    // any barrier.
    def rankOf(s: Column): Column =
      lit(1.0 - damping) + lit(damping) * coalesce(s, lit(0.0))
    // round 1 from the uniform 1.0 start: contribution is 1.0/outdeg
    var sums = ed
      .select(col("dst"), (lit(1.0) / col("outdeg")).as("__c"))
      .groupBy(col("dst"))
      .agg(Exprs.sumExact(col("__c")).as("__s"))
      .select(col("dst").as("__node"), col("__s"))
    var prevMat: Option[DataFrame] = None
    for (i <- 2 to iterations) {
      sums = ed.join(sums, col("src") === col("__node"), "left")
        .select(col("dst"), (rankOf(col("__s")) / col("outdeg")).as("__c"))
        .groupBy(col("dst"))
        .agg(Exprs.sumExact(col("__c")).as("__s"))
        .select(col("dst").as("__node"), col("__s"))
      // Truncate the plan chain periodically (the Components per-round
      // rule, amortized): operators accrete per iteration, and at
      // the 50-iteration cap one unmaterialized chain means superlinear
      // re-analysis per action and a lineage whose lost-partition
      // recompute replays every round. Every-8 keeps plan depth bounded
      // while the common short runs (the 3-iteration default, and the
      // bench query) pay ZERO extra jobs — sums values are unchanged
      // either way (each iteration is a pure deterministic function of
      // the previous frame). The PREVIOUS materialized frame is
      // released once the new one is built (its eager count has
      // already read it): without the unpersist a 50-iteration durable
      // run pins ~6 node-sized DISK_ONLY copies to executor storage
      // for the application lifetime, only the newest ever read again.
      if (i % 8 == 0 && i < iterations) {
        val m = Exec.materialize(sums)
        // Exec.release, not bare unpersist: unpersist misses the
        // localCheckpoint RDD entirely (it only matches cache-manager
        // entries), so local-mode truncations leaked every superseded
        // frame (r15 review; Exec.release's scaladoc states exactly
        // this asymmetry)
        prevMat.foreach(Exec.release)
        prevMat = Some(m)
        sums = m
      }
    }
    // Emit every node exactly once: src-only nodes (no in-edges) are
    // absent from sums and coalesce to 1−d. nodes is consumed ONCE, so
    // it stays a lazy derivation of the materialized ed (the old shape
    // consumed it per iteration and paid an eager checkpoint for it).
    val nodes = ed.select(col("src").as("node"))
      .unionByName(ed.select(col("dst").as("node"))).distinct()
    nodes.join(sums, col("node") === col("__node"), "left")
      .select(col("node"), rankOf(col("__s")).as("rank"))
  }
}
