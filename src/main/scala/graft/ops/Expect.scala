package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations with quarantine: evaluate named row-level
  * rules and SPLIT the input — clean rows flow on, violating rows are
  * diverted with the list of rules they broke — instead of the two bad
  * alternatives (fail the whole job on one bad row, or silently drop).
  * The standard ingest gate of a training-data pipeline: the quarantine
  * side is small, auditable, and re-processable; the clean side carries
  * a guarantee the downstream features can rely on.
  *
  * Spark-first plan: ALL rules evaluate in one projection (an array of
  * violated-rule names, codegen'd, no UDFs); both outputs are filters
  * over that projection, so a caller writing clean rows and counting
  * violations pays one scan — and a metrics-only caller should prefer
  * `df.observe(...)` to piggyback the counts on the write job itself.
  * A rule that evaluates to NULL (e.g. a comparison on a NULL column)
  * counts as a VIOLATION — expectations are positive assertions, and
  * "unknown" does not satisfy an assertion. */
object Expect {

  /** Evaluate `rules` (name → predicate-that-should-hold). Returns
    * (clean rows — original schema, quarantined rows — original schema
    * plus a `violations` array of broken rule names). */
  def check(df: DataFrame, rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "at least one expectation rule required")
    require(!df.columns.contains("violations"),
      "input already has a 'violations' column — rename it before check() " +
        "(the quarantine side emits its rule list under that name)")
    val viol = array_compact(array(rules.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    }: _*))
    val tagged = df.withColumn("violations", viol)
    (tagged.filter(size(col("violations")) === 0).drop("violations"),
      tagged.filter(size(col("violations")) > 0))
  }

  /** Per-rule violation counts with EVERY configured rule present — a
    * rule with zero violations reports n=0. Deriving the audit only
    * from the exploded quarantine side silently omits quiet rules,
    * making "rule never fired" indistinguishable from "rule never
    * evaluated" (caught by the degenerate-cardinality sweep, r10: a
    * violation-free corpus produced an empty audit). The rule-name
    * side is a driver literal of the configured rules (tiny, local);
    * the exploded counts join against it, absent → 0. */
  def audit(quarantined: DataFrame, ruleNames: Seq[String]): DataFrame = {
    require(ruleNames.nonEmpty, "at least one expectation rule required")
    val s = quarantined.sparkSession
    import s.implicits._
    val names = ruleNames.toDF("rule")
    val counts = quarantined.select(explode(col("violations")).as("rule"))
      .groupBy(col("rule")).agg(count(lit(1)).as("n"))
    names.join(counts, Seq("rule"), "left")
      .select(col("rule"), coalesce(col("n"), lit(0L)).as("n"))
  }
}
