package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join: match every point row to every
  * interval row with `lo <= point < hi`, with NO equi-key to carry the
  * join. The naive plan for this shape is a broadcast-nested-loop /
  * cartesian join — O(points × intervals) comparisons — which is the
  * classic scale cliff the moment the interval side outgrows a
  * broadcast (SURVEY.md §2.3 names range join alongside as-of as the
  * join shapes the reference's pandas layer sidesteps by sorting).
  *
  * Spark-first plan — bin equalization: overlay a fixed grid of width
  * `binWidth` on the value domain, give each point its single covering
  * bin and explode each interval to EVERY bin it overlaps, then
  * equi-join on the bin id and re-check the exact bounds as a residual
  * predicate. The cross product collapses to a hash join keyed by bin:
  * cost O(points + intervals · span/binWidth + true matches), shuffle
  * and AQE semantics identical to any other equi-join (small interval
  * side → broadcast-hash on the bin key; huge interval side →
  * shuffle-hash/SMJ, which the nested-loop plan could never do).
  *
  * Each (point, interval) match is found in EXACTLY one bin — the
  * point's own — because only the interval side is exploded, so no
  * post-join dedup is needed (the duplicate-elimination trap of
  * exploding BOTH sides).
  *
  * Tuning: `binWidth` trades interval replication (span/binWidth rows
  * per interval) against residual selectivity (points sharing a bin
  * with a non-matching interval edge). Set it near the MEDIAN interval
  * span so typical intervals explode to ~1–2 bins. Skewed point bins
  * (one hot value range) follow ordinary join-skew remedies — AQE's
  * runtime split when the bin join shuffles, [[Skew.saltedJoin]] when
  * it does not.
  *
  * Intervals are half-open `[lo, hi)`; rows with `lo > hi` (empty) or a
  * null bound match nothing, matching the SQL predicate's semantics.
  * Negative values are fine — `floor` bins them consistently on both
  * sides. */
object RangeJoin {

  /** Join `points` to `intervals` on `lo <= points(pointCol) < hi`.
    * Output columns: all of `points`' then all of `intervals`' (the
    * helper bin key is internal). Column names must not collide.
    *
    * `maxBinsPerInterval` fail-fast guard (inside the query's own
    * action, the Guard.scala convention — no extra job): ONE interval
    * spanning vastly more than `binWidth` — an open-ended band encoded
    * as hi = Double.MaxValue/Infinity, or a mis-set binWidth — would
    * otherwise make `sequence()` build a multi-million-element array
    * per row and kill the job with an executor OOM or an opaque
    * "too long sequence" error. Such a row now raises a diagnosable
    * error naming the bounds; raise the cap only with a binWidth to
    * match (replication cost is real, not just the error). */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double,
                      maxBinsPerInterval: Long = 1000000L): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive, got $maxBinsPerInterval")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "points and intervals must not share column names")
    val bin = "__graft_bin"
    val p = points.withColumn(bin, floor(col(pointCol) / binWidth).cast("long"))
    // hi is exclusive, but a point exactly at a bin boundary shares the
    // boundary bin with the interval ending there; the residual filter
    // rejects it. Including floor(hi/w) unconditionally costs at most
    // one replica per interval and keeps the bin math branch-free.
    // floor() BEFORE the long casts: the bin-count compare runs on
    // doubles, so an astronomic hi fails THIS guard with its message
    // rather than the ANSI long-overflow cast error.
    val loBinD = floor(col(loCol) / binWidth)
    val hiBinD = floor(col(hiCol) / binWidth)
    val i = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn(bin, explode(
        when(hiBinD - loBinD < lit(maxBinsPerInterval.toDouble),
          sequence(loBinD.cast("long"), hiBinD.cast("long")))
          .otherwise(raise_error(format_string(
            s"pointInInterval: interval [%s, %s) spans more than " +
              s"$maxBinsPerInterval bins at binWidth $binWidth — widen " +
              "binWidth or raise maxBinsPerInterval",
            col(loCol), col(hiCol))).cast("array<long>"))))
    p.join(i, p(bin) === i(bin) &&
        col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop(bin)
  }
}
