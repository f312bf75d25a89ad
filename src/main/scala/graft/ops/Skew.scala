package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for hot keys at scale.
  *
  * AQE's skew-join split handles sort-merge joins at runtime; these are
  * the plan-level tools for the cases AQE does not cover — a hash
  * aggregate with one dominant group, or a join where the hot side must
  * be scattered *before* the exchange. Both are deterministic (salt =
  * hash of stable columns, not rand()), so results are reproducible and
  * retries are safe.
  */
object Skew {

  /** Deterministic salt in [0, n) from stable row columns — NOT rand():
    * task retries and speculative execution must re-derive the same
    * salt or rows double-count. */
  def saltCol(n: Int, from: Column*): Column = pmod(hash(from: _*), lit(n))

  /** Salted equi-join: scatter the skewed `fact` side into `salt`
    * sub-keys, replicate every `dim` row `salt` ways (explode of a tiny
    * sequence — dims are the small side by assumption), join on
    * keys + salt. A key holding f of all fact rows then occupies f/salt
    * of the biggest task instead of f. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      saltCol(salt, fact.columns.map(col).toIndexedSeq: _*))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(saltedDim, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Salted two-level aggregation for algebraic aggregates (sum/count/
    * min/max): partial agg on (keys, salt) — the hot group splits into
    * `salt` partial rows across reducers — then final agg on keys.
    * `partials` maps each wanted output to its (partial, final) pair,
    * e.g. sum → (sum, sum), count → (count, sum). */
  def saltedAgg(df: DataFrame, keys: Seq[String], salt: Int,
                partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", saltCol(salt, df.columns.map(col).toIndexedSeq: _*))
      .groupBy((keyCols :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keyCols: _*)
      .agg(finalAgg.head, finalAgg.tail: _*)
  }
}
