package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group robust feature scaling — the numeric-normalization step of
  * a training-data pipeline: winsorize (clamp to in-group percentile
  * fences, taming the heavy tails that dominate raw means) and z-score
  * (center/scale per group so features from different strata are
  * comparable).
  *
  * Cross-engine determinism: the percentile fences use Spark's EXACT
  * `percentile` (continuous interpolation — matches DuckDB
  * `quantile_cont`, proven by a13); mean/variance derive from
  * decimal-exact Σv and Σv² ([[Exprs.sumExact]]) so partition order
  * cannot move a ulp; every subsequent double op is one expression the
  * oracle restates verbatim. Degenerate groups never divide by zero
  * (ANSI throws on double /0): singleton groups and constant groups
  * (σ = 0) emit z = 0 by contract, and the variance is clamped at 0
  * before the sqrt (the exact-sum algebra can land at −ε for
  * near-constant groups).
  *
  * Plan: one aggregation pass for the per-group stats (exact
  * percentiles are one-pass aggregates, no sort-per-group), joined
  * back to the rows on the group key — group-cardinality-sized, so
  * AQE broadcasts it in practice; at worst a co-keyed linear shuffle.
  * Null values drop before stats AND scaling (they have no place on
  * either side of the fence). */
object Scaling {

  def robustScale(df: DataFrame, groupCol: String, valueCol: String,
                  pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0.0 && pHi <= 1.0 && pLo < pHi,
      s"percentile fences must satisfy 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val v = col(valueCol).cast("double")
    val rows = df.filter(col(valueCol).isNotNull)
    val stats = rows.groupBy(col(groupCol)).agg(
      count(lit(1)).as("__n"),
      Exprs.sumExact(v).as("__s"),
      Exprs.sumExact(v * v).as("__s2"),
      percentile(v, lit(pLo)).as("__lo"),
      percentile(v, lit(pHi)).as("__hi"))
    val nD = col("__n").cast("double")
    val mean = col("__s") / nD
    val variance = when(col("__n") >= 2,
      greatest((col("__s2") - col("__s") * col("__s") / nD) / (nD - 1.0), lit(0.0)))
      .otherwise(lit(0.0))
    val sd = sqrt(variance)
    rows.join(stats, Seq(groupCol))
      .select(rows.columns.toIndexedSeq.map(col) :+
        Exprs.r4(least(greatest(v, col("__lo")), col("__hi"))).as("winsorized") :+
        when(sd > 0.0, Exprs.r4((v - mean) / sd)).otherwise(lit(0.0)).as("zscore"): _*)
  }

  /** ECDF-bucket calibration against a REFERENCE distribution: each
    * row gets the percentile bucket its value occupies in the
    * reference's empirical distribution (`ref_bucket` ∈
    * [0, buckets−1]) — "where does this doc's quality score sit
    * relative to LAST month's corpus / the baseline cohort / the
    * accepted set". Unlike [[robustScale]] (which normalizes within
    * the frame itself), the reference is a separate frame, so the
    * calibration is stable while the scored data drifts — the point
    * of calibrating.
    *
    * Plan at scale: the reference collapses to ONE row of
    * `buckets − 1` exact-percentile boundaries (a single one-pass
    * aggregate — never a sort of the reference), broadcast to every
    * row; bucket assignment is a fixed-size array fold in the scan
    * projection — zero shuffle on the scored side. Boundaries are
    * compared at the floor-form 4-decimal rounding so the bucket
    * edges are engine-stable (raw interpolated boundaries are the one
    * place a last-ulp difference would flip a whole bucket). A null
    * or empty reference yields null buckets — undefined, loudly so,
    * rather than a silently wrong 0. */
  def referencePercentile(df: DataFrame, valueCol: String,
                          reference: DataFrame, refValueCol: String,
                          buckets: Int = 100): DataFrame = {
    require(buckets >= 2 && buckets <= 10000,
      s"buckets must be in [2, 10000], got $buckets")
    val probs = array((1 until buckets).map(i => lit(i.toDouble / buckets)): _*)
    // round the boundaries HERE, in the 1-row aggregate, not in the
    // per-row fold: the bounds are row-invariant, and rounding them
    // inside the scored side's transform re-evaluated r4's full
    // when-chain buckets×rows times (interpreted HOF — lambdas don't
    // codegen). The per-row work is now just the comparison filter.
    val bounds = reference.filter(col(refValueCol).isNotNull)
      .agg(percentile(col(refValueCol).cast("double"), probs).as("__raw"))
      .select(transform(col("__raw"), b => Exprs.r4(b)).as("__bounds"))
    val rows = df.filter(col(valueCol).isNotNull)
    rows.crossJoin(broadcast(bounds))
      .select(rows.columns.toIndexedSeq.map(col) :+
        size(filter(col("__bounds"),
          b => b <= col(valueCol).cast("double"))).as("ref_bucket"): _*)
  }
}
