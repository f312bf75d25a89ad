package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J1–J9 join helpers (SURVEY.md §2.3).
  *
  * The reference emulates semi-joins by inner-merging against
  * deduplicated key projections (tracking.py:204-266, plays.py:280-293);
  * on Spark these are native `left_semi` / `left_anti` joins. Dimension
  * joins (players / teams, tracking.py:102-165) become broadcast hash
  * joins.
  */
object Joins {

  /** J2's `validate="many_to_one"` (tracking.py:77-90): fail fast if the
    * dimension side is not key-unique before a left join. Runs one
    * aggregate job; call on dims only (small).
    *
    * Distinctness counts NULL as a key value (pandas semantics: a
    * single NaN-keyed row is a legal unique dim; two are duplicates) —
    * hence `countDistinct` over a STRUCT of the keys, which is itself
    * never null: bare `countDistinct(k)` EXCLUDES null-keyed rows from
    * the distinct count while `count(*)` includes them, falsely
    * flagging a key-unique dim with one null-keyed row. */
  def assertManyToOne(dim: DataFrame, keys: Seq[String]): DataFrame = {
    val row = dim.agg(
      count(lit(1)).as("n"),
      countDistinct(struct(keys.map(col): _*)).as("k")).head()
    require(row.getLong(0) == row.getLong(1),
      s"many_to_one violated: ${row.getLong(0)} rows, ${row.getLong(1)} distinct keys (${keys.mkString(",")})")
    dim
  }

  /** Keyed-input domain gate: rows whose `key` is non-null and occurs
    * exactly once. Operators whose SEMANTICS are per-entity (keyed
    * kernel agreement differentials, fuzzy entity resolution) are
    * undefined over duplicate or null keys — a per-row formulation and
    * a per-key formulation legitimately diverge there, and which
    * duplicate "wins" a resolution is engine-arbitrary. Gating the
    * input makes the domain explicit instead of emitting
    * nondeterministic rows (hostile sweep, r10); the DuckDB oracles
    * carry the same HAVING count(*) = 1 membership. */
  def uniqueKeyed(df: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit}
    // ONE exchange: a per-key window count on the already-shuffled rows
    // replaces the r10-initial groupBy+left-semi formulation (aggregate
    // exchange + a second full-row exchange for the join when the key
    // set outgrows the broadcast threshold — at corpus scale it always
    // does). Same membership: non-null keys occurring exactly once.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(key))
    df.filter(col(key).isNotNull)
      .withColumn("__uk_n", count(lit(1)).over(w))
      .filter(col("__uk_n") === 1).drop("__uk_n")
  }

  /** J5: existence filter — keep rows of `df` whose key appears in
    * `keys` (native semi-join; replaces the reference's
    * dedup-keys-then-inner-merge idiom). */
  def semiFilter(df: DataFrame, keys: DataFrame, on: Seq[String]): DataFrame =
    df.join(keys, on, "left_semi")

  /** Anti-join complement (rows with no match). */
  def antiFilter(df: DataFrame, keys: DataFrame, on: Seq[String]): DataFrame =
    df.join(keys, on, "left_anti")

  /** J3: left join a small dimension with an explicit broadcast hint
    * (players dim, tracking.py:102-121). */
  def leftJoinDim(fact: DataFrame, dim: DataFrame, on: Seq[String]): DataFrame =
    fact.join(broadcast(dim), on, "left")
}
