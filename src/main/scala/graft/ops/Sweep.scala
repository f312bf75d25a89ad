package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sweep-line interval analytics: maximum number of simultaneously
  * open intervals per key — peak concurrent sessions, max in-flight
  * orders per supplier, peak GPU-hours in a training schedule. The
  * classic O(n log n) sweep, expressed relationally.
  *
  * Intervals are HALF-OPEN `[start, end)`: an interval ending exactly
  * where another starts does not overlap it. Degenerate intervals
  * (`end <= start`) contribute nothing and are dropped before the
  * sweep (they would otherwise leave a spurious −1/+1 pair).
  *
  * Scale shape: each interval explodes into a +1 (start) and a −1
  * (end) delta row in the scan projection — no join, no
  * per-key collect; ONE shuffle brings a key's deltas into its
  * window, where a running sum ordered by (boundary, delta) — closes
  * sort before opens at the same boundary, which is exactly the
  * half-open convention — yields the open-interval count at every
  * boundary, and the per-key aggregate that takes its max reuses the
  * window's partitioning. A hot key serializes its own window, the
  * shared per-key sequence bound ([[Funnel]], [[Sessionize]]). */
object Sweep {

  /** Per-key peak concurrency: (key, max_open). `start`/`end` may be
    * any orderable type (date, timestamp, long). Rows where either
    * boundary is null are dropped (an unbounded interval would pin
    * max_open forever; model those with an explicit far-future end). */
  def maxConcurrent(df: DataFrame, key: Column, start: Column,
                    end: Column): DataFrame = {
    sweep(df, key, start, end)
      .groupBy(col("__k").as("key"))
      .agg(max(col("__open")).as("max_open"))
  }

  /** Per-key covered duration: total length of the UNION of a key's
    * intervals — "days with at least one order in transit", "seconds
    * of the trace with an active session" — the companion measure to
    * [[maxConcurrent]] (peak says how deep the overlap got; coverage
    * says how long ANY of it was open, counting overlaps once).
    *
    * Boundaries must be NUMERIC (long/int — e.g. `unix_micros(ts)`),
    * because the covered length is the sum of `next_boundary − boundary`
    * gaps where the running open-count is positive: integer gap sums
    * are exact and associative at any scale, where a timestamp
    * difference would route through intervals and a double sum would
    * be partition-order-dependent. Same single-shuffle shape as the
    * peak: the gap `lead` and the running sum share one (key)-window
    * sort, and the per-key aggregate reuses the partitioning. Tied
    * boundaries are safe: tied rows carry identical gap 0 against
    * each other, and equal (boundary, delta) rows are interchangeable
    * in the prefix sum. */
  def coveredDuration(df: DataFrame, key: Column, start: Column,
                      end: Column): DataFrame = {
    val ord = Window.partitionBy(col("__k"))
      .orderBy(col("__b").asc, col("__d").asc)
    sweep(df, key, start, end)
      .withColumn("__nb", lead(col("__b"), 1).over(ord))
      .groupBy(col("__k").as("key"))
      .agg(sum(when(col("__open") > 0 && col("__nb").isNotNull,
        col("__nb") - col("__b")).otherwise(lit(0L))).as("covered"))
  }

  /** Shared sweep core: explode to ±1 boundary deltas, running
    * open-interval count ordered by (boundary, delta) — closes before
    * opens at a shared boundary = half-open `[start, end)` semantics. */
  private def sweep(df: DataFrame, key: Column, start: Column,
                    end: Column): DataFrame = {
    val valid = df.filter(start.isNotNull && end.isNotNull && end > start)
    val deltas = valid.select(key.as("__k"),
      explode(array(
        struct(start.as("__b"), lit(1).as("__d")),
        struct(end.as("__b"), lit(-1).as("__d")))).as("__e"))
      .select(col("__k"), col("__e.__b").as("__b"), col("__e.__d").as("__d"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__b").asc, col("__d").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.withColumn("__open", sum(col("__d")).over(w))
  }
}
