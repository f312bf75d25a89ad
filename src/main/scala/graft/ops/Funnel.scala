package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: how deep into a stage sequence each entity
  * progressed — signup → view → purchase, install → activate → retain,
  * the product-analytics staple and (as "reached stage k") a label
  * generator for conversion models.
  *
  * Semantics: stage k counts as reached iff an event matching stage k
  * occurs STRICTLY AFTER (in the caller's total order) some event that
  * completed stage k−1 — out-of-order events don't count, and one
  * event cannot complete two stages. Formally, with the entity's rows
  * in total order, `reached_k(row) = stage_k(row) ∧ ∃ prior row with
  * reached_{k-1}` — a running max over the strictly-preceding frame.
  *
  * Scale shape: ONE shuffle. Each stage adds a window column over the
  * SAME (entity, order) window spec, so Catalyst plans one exchange
  * and one sort with k chained Window operators over it; the final
  * per-entity aggregate reuses the window's hash partitioning (no
  * second exchange). No joins, no self-union, no per-stage pass over
  * the input. A hot entity serializes its own window — the same bound
  * every per-entity sequence operator here shares (sessionize, as-of).
  *
  * `order` must be a TOTAL order within each entity (tie-break with a
  * unique id) or stage attribution at equal timestamps is
  * partition-order-dependent. */
object Funnel {

  /** Per-entity funnel depth: 0 (nothing) … stages.length. `stages`
    * are boolean predicates in funnel order, e.g.
    * `Seq(col("t") === "signup", col("t") === "view")`. */
  def stageDepth(df: DataFrame, entity: Column, order: Seq[Column],
                 stages: Seq[Column]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(order.nonEmpty, "funnel needs a total event order")
    val before = Window.partitionBy(entity).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // completed(k) column per row: stage k's predicate gated on a
    // strictly-earlier row having completed stage k-1. Each stage
    // MATERIALIZES as a column before the next references it — the
    // gate is max-over-preceding of the previous stage's column, and
    // windows can't nest as raw expressions. Chained Window operators
    // over one spec share the exchange and the sort.
    val withCols = stages.zipWithIndex.foldLeft(df) {
      case (acc, (stage, i)) =>
        val c =
          if (i == 0) stage.cast("int")
          else stage.cast("int") *
            coalesce(max(col(s"__stage_${i - 1}")).over(before), lit(0))
        acc.withColumn(s"__stage_$i", c)
    }
    withCols.groupBy(entity)
      .agg(stages.indices
        .map(i => coalesce(max(col(s"__stage_$i")), lit(0)))
        .reduce(_ + _).as("funnel_depth"))
  }
}
