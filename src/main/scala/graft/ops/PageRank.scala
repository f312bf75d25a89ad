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
  * then one src-keyed broadcast-or-shuffle join of the (nodes-sized)
  * rank frame plus one dst-keyed aggregate — 2 shuffles per iteration
  * on node-cardinality data, never a second pass over the raw input.
  * A Zipfian in-degree hot spot lands in the aggregate, where map-side
  * partials absorb it. */
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
    val ed = Exec.materialize(e.join(deg, "src")) // loop invariant
    val nodes = Exec.materialize(
      ed.select(col("src").as("node"))
        .unionByName(ed.select(col("dst").as("node"))).distinct())
    var ranks = nodes.withColumn("rank", lit(1.0))
    var prevMat: Option[DataFrame] = None
    for (i <- 1 to iterations) {
      val sums = ed.join(ranks, ed("src") === ranks("node"))
        .select(col("dst"), (col("rank") / col("outdeg")).as("__c"))
        .groupBy(col("dst"))
        .agg(Exprs.sumExact(col("__c")).as("__s"))
      ranks = nodes.join(sums, nodes("node") === sums("dst"), "left")
        .select(col("node"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("__s"), lit(0.0)))
            .as("rank"))
      // Truncate the plan chain periodically (the Components per-round
      // rule, amortized): ~5 operators accrete per iteration, and at
      // the 50-iteration cap one unmaterialized chain means superlinear
      // re-analysis per action and a lineage whose lost-partition
      // recompute replays every round. Every-8 keeps plan depth bounded
      // while the common short runs (the 3-iteration default, and the
      // bench query) pay ZERO extra jobs — ranks values are unchanged
      // either way (each iteration is a pure deterministic function of
      // the previous frame). The PREVIOUS materialized frame is
      // released once the new one is built (its eager count has
      // already read it): without the unpersist a 50-iteration durable
      // run pins ~6 node-sized DISK_ONLY copies to executor storage
      // for the application lifetime, only the newest ever read again.
      if (i % 8 == 0 && i < iterations) {
        val m = Exec.materialize(ranks)
        // Exec.release, not bare unpersist: unpersist misses the
        // localCheckpoint RDD entirely (it only matches cache-manager
        // entries), so local-mode truncations leaked every superseded
        // frame (r15 review; Exec.release's scaladoc states exactly
        // this asymmetry)
        prevMat.foreach(Exec.release)
        prevMat = Some(m)
        ranks = m
      }
    }
    ranks
  }
}
