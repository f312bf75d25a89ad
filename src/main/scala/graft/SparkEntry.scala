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

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextSim.queries ++ Kernels.queries ++ Curate.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextSim.oracles ++ Kernels.oracles ++ Curate.oracles
}
