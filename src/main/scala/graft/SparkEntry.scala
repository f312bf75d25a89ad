package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Curate, Kernels, Relational, TextSim}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 (plus the
  * LLM-pipeline extension surface) to a demo query over the testdata
  * star schema; `oracleSql` holds the equivalent DuckDB SQL for each
  * SQL-expressible query (kernels and hash-seed-dependent LSH ops are
  * intentionally absent → rows-only check, covered by ScalaTest).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A4 argmin-per-group — the reference's signature closest-defender
    * operator (tracking.py:426-437) re-expressed as window + broadcast join. */
  def entry(spark: SparkSession): DataFrame =
    queries("a4_argmin_per_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Merged from
    * the four query modules with a LOUD disjointness check: `++` would
    * silently shadow a duplicate name (and a different shadowing on
    * the oracle side could then hash-check one module's query against
    * the other's oracle — a regression in the shadowed operator would
    * be invisible). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    disjoint("queries", Seq(
      "Relational" -> Relational.queries, "TextSim" -> TextSim.queries,
      "Kernels" -> Kernels.queries, "Curate" -> Curate.queries))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    disjoint("oracleSql", Seq(
      "Relational" -> Relational.oracles, "TextSim" -> TextSim.oracles,
      "Kernels" -> Kernels.oracles, "Curate" -> Curate.oracles))

  private def disjoint[V](what: String,
                          parts: Seq[(String, Map[String, V])]): Map[String, V] = {
    val dups = parts.flatMap { case (m, kv) => kv.keys.map(_ -> m) }
      .groupBy(_._1).filter(_._2.length > 1)
    require(dups.isEmpty,
      s"duplicate $what names across modules (silently shadowed by ++): " +
        dups.map { case (k, ms) => s"$k in ${ms.map(_._2).mkString("+")}" }
          .mkString("; "))
    parts.iterator.map(_._2).reduce(_ ++ _)
  }
}
