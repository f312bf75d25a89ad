package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Contiguous surrogate-id assignment at scale.
  *
  * The naive formulation — `row_number() OVER (ORDER BY …)` with no
  * partition — is THE classic Spark scale cliff: an un-partitioned
  * window forces the entire dataset through ONE task (Spark even warns
  * "No Partition Defined for Window operation"). `monotonically
  * _increasing_id` stays distributed but leaves gaps between
  * partitions; a `Window.partitionBy(spark_partition_id())` retrofit
  * re-shuffles everything because the optimizer cannot see that rows
  * are already co-located by their own partition id.
  *
  * The scalable algorithm (the same two-pass scheme RDD `zipWithIndex`
  * uses, surfaced with a DataFrame contract): range-partition and sort
  * by a caller-supplied TOTAL order, count rows per partition (one
  * aggregate whose output is one long per partition), prefix-sum those
  * counts into per-partition offsets on the driver, then number each
  * partition independently with its offset. The per-partition counter
  * is genuine imperative per-partition logic — the one place the RDD
  * layer is the right tool (`mapPartitionsWithIndex`); everything
  * before and after stays declarative. No global window, no
  * single-task stage, zero additional shuffles beyond the range
  * partitioning the ordering itself requires.
  *
  * The input is materialized once ([[Exec.materialize]]) so the count
  * pass and the numbering pass see the SAME partitioning — a lazily
  * recomputed range partitioning could re-sample different range
  * boundaries between the passes and skew every offset.
  *
  * `orderCols` must be a total order (e.g. include a unique key):
  * under ties the assignment within a tie group would follow
  * partition-internal order, which is not reproducible run-to-run. */
object Ids {

  /** Add `idCol` (long, 0-based, contiguous, dense) ordered by
    * `orderCols`. */
  def contiguousIds(df: DataFrame, idCol: String, orderCols: Seq[Column]): DataFrame = {
    require(orderCols.nonEmpty, "contiguousIds needs at least one ordering column")
    require(!df.columns.contains(idCol),
      s"input already has a column named '$idCol' — appending a duplicate would " +
        "make every later reference to it ambiguous")
    val spark = df.sparkSession
    val ranged = Exec.materialize(
      df.repartitionByRange(orderCols: _*).sortWithinPartitions(orderCols: _*))
    // pass 1: rows per physical partition → driver prefix sum
    val counts = ranged.groupBy(spark_partition_id().as("__pid"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Int, Long] = counts.scanLeft((0, 0L)) {
      case ((_, acc), (pid, n)) => (pid, acc + n)
    }.tail.zip(counts).map { case ((pid, end), (_, n)) => (pid, end - n) }.toMap
    // pass 2: each partition numbers its own rows from its offset
    // (empty partitions never looked up — they emit no rows)
    val numbered = ranged.rdd.mapPartitionsWithIndex { case (pid, it) =>
      var i = offsets.getOrElse(pid, 0L)
      it.map { row => val out = Row.fromSeq(row.toSeq :+ i); i += 1; out }
    }
    spark.createDataFrame(numbered, ranged.schema.add(idCol, LongType, nullable = false))
  }
}
