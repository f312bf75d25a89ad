package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key ordinary-least-squares trend over an ordered sequence —
  * "is this entity's metric drifting, and how fast": per-user
  * engagement slopes, per-source quality drift, per-feed volume
  * trends. Closed-form simple regression of y against the ROW INDEX
  * 1..n (not the raw timestamp: int64 epoch micros squared overflow
  * every exact representation, while the index is small, exact, and
  * makes the slope "change per event" — resample first when you need
  * change-per-hour).
  *
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *   intercept = (Σy − slope·Σx) / n
  *
  * Determinism: x is assigned by `row_number` over a caller-supplied
  * TOTAL order (ties in the order would make x — and the fit —
  * partition-order-dependent); Σx and Σx² are exact integer sums;
  * Σy and Σxy route through the decimal-exact [[Exprs.sumExact]] so
  * partition order cannot flip a last-ulp; the final slope/intercept
  * are one double expression each, restated verbatim by the oracle.
  *
  * Plan: ONE shuffle — the window partitions by key, and the
  * following per-key aggregate reuses that partitioning (the
  * sessionize pattern; no second exchange). Null y rows are dropped
  * BEFORE indexing (a null contributes no sum but would shift every
  * later row's x). Keys with fewer than two points have no defined
  * line and are absent by contract (also keeps the denominator
  * nonzero — ANSI mode throws on double division by zero rather than
  * yielding NaN). */
object Trend {

  def fitLine(df: DataFrame, keyCol: String, orderBy: Seq[Column], yCol: String): DataFrame = {
    require(orderBy.nonEmpty, "fitLine needs a total order to index the sequence")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderBy: _*)
    val xy = df.filter(col(yCol).isNotNull)
      .withColumn("__x", row_number().over(w).cast("long"))
      .select(col(keyCol), col("__x"), col(yCol).cast("double").as("__y"))
    val agg = xy.groupBy(col(keyCol)).agg(
        count(lit(1)).as("n_points"),
        sum(col("__x")).as("__sx"),
        sum(col("__x") * col("__x")).as("__sxx"),
        Exprs.sumExact(col("__y")).as("__sy"),
        Exprs.sumExact(col("__x").cast("double") * col("__y")).as("__sxy"))
      .filter(col("n_points") >= 2)
    val n = col("n_points").cast("double")
    val sx = col("__sx").cast("double")
    val num = n * col("__sxy") - sx * col("__sy")
    val den = n * col("__sxx").cast("double") - sx * sx
    agg.select(col(keyCol), col("n_points"),
      Exprs.r4(num / den).as("slope"),
      Exprs.r4((col("__sy") - num / den * sx) / n).as("intercept"))
  }
}
