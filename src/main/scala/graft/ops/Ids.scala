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
    // pass 1: rows per partition over the SAME ranged.rdd pass 2 walks
    // (one long per partition) — the Aggs.weightedMedian rule: the
    // earlier SQL spark_partition_id() aggregate coupled TWO different
    // plans' partition-index spaces as an implicit invariant, and
    // Exec.materialize's durable mode is a cache, not a checkpoint, so
    // a recomputed partition of a nondeterministic upstream could
    // silently shift every downstream offset
    val counts: Array[Long] = ranged.rdd.mapPartitions { it =>
      var n = 0L; while (it.hasNext) { it.next(); n += 1 }
      Iterator.single(n)
    }.collect()
    val offsets: Array[Long] = counts.scanLeft(0L)(_ + _).init
    // pass 2: each partition numbers its own rows from its offset, and
    // VERIFIES it emits exactly the count pass 1 recorded — a grown or
    // shrunk partition (lineage recompute of a nondeterministic
    // upstream) would otherwise duplicate or gap ids silently
    val numbered = ranged.rdd.mapPartitionsWithIndex { case (pid, it) =>
      val expected = counts(pid)
      val start = offsets(pid)
      var i = 0L
      def diverged(): Nothing = throw new IllegalStateException(
        s"contiguousIds: partition $pid presented different rows across " +
          s"jobs (expected $expected, saw ${i + 1}+) — the input frame is " +
          "nondeterministic across recomputation")
      val mapped = it.map { row =>
        if (i >= expected) diverged()
        val out = Row.fromSeq(row.toSeq :+ (start + i)); i += 1; out
      }
      mapped ++ new Iterator[Row] {
        // runs once mapped is exhausted: a SHRUNK partition is as
        // id-corrupting as a grown one
        def hasNext: Boolean = {
          if (i != expected) throw new IllegalStateException(
            s"contiguousIds: partition $pid presented $i rows where pass 1 " +
              s"counted $expected — the input frame is nondeterministic " +
              "across recomputation")
          false
        }
        def next(): Row = throw new NoSuchElementException("empty")
      }
    }
    spark.createDataFrame(numbered, ranged.schema.add(idCol, LongType, nullable = false))
  }
}
