package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-level (domain-level) curation: web-scale pipelines gate whole
  * SOURCES, not just documents — a spam domain's individually-plausible
  * pages survive per-document filters, but the domain's aggregate
  * statistics give it away (the RefinedWeb / C4 blocklist-derivation
  * step). This operator derives the gate from the corpus itself: keep
  * every row whose group's mean `value` clears a rational multiple of
  * the global mean.
  *
  * The comparison is INTEGER-EXACT: group mean ≥ (num/den)·global mean
  * is evaluated as `ss·cg·den ≥ sg·cs·num` over decimal-widened
  * integer sums — no double division anywhere, so the kept set cannot
  * flap on a final-ulp tie between engines, and the cross-products are
  * overflow-safe far beyond the 100-TB point (a long·long product of
  * petabyte-scale sums would wrap int64; decimal(38,0) holds 1e38).
  *
  * Scale shape: one group aggregate (group-cardinality-sized — domains
  * number millions, not trillions), a 1-row global aggregate broadcast
  * onto it, and a broadcast-able semi-join of the verdict back onto
  * the corpus. The corpus itself never shuffles.
  */
object DomainGate {

  /** Rows of `df` whose `group`'s mean `value` is at least
    * (num/den) × the global mean. `value` must be integral (the
    * exactness contract — doubles would reintroduce the tie flap this
    * operator exists to avoid); rows where `value` is null are
    * excluded from both means and from the output. Empty input yields
    * empty output. `num`/`den` must be positive. */
  def keepGroupsAboveMean(df: DataFrame, group: Column, value: Column,
                          num: Long = 1L, den: Long = 1L): DataFrame = {
    require(num > 0 && den > 0, s"threshold must be positive: $num/$den")
    val rows = df.filter(value.isNotNull)
    val stats = rows.groupBy(group.as("__g"))
      .agg(sum(value.cast("long")).as("__ss"), count(lit(1)).as("__cs"))
    val glob = rows.agg(sum(value.cast("long")).as("__sg"),
      count(lit(1)).as("__cg"))
    def d(c: Column): Column = c.cast("decimal(38,0)")
    val kept = stats.join(broadcast(glob))
      .filter(d(col("__ss")) * d(col("__cg")) * d(lit(den)) >=
        d(col("__sg")) * d(col("__cs")) * d(lit(num)))
      .select(col("__g"))
    // No broadcast hint: the verdict side is group-cardinality-sized
    // (usually tiny — AQE broadcasts it), but a billion-domain gate
    // must be allowed to fall back to a shuffled semi-join.
    rows.join(kept, group === col("__g"), "left_semi")
  }
}
