package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.LogicalRDD

/** Physical-layout re-declaration for eagerly checkpointed frames.
  *
  * `Dataset.localCheckpoint` under AQE captures the checkpointed RDD
  * with `UnknownPartitioning(0)` (the adaptive root hides the final
  * plan's partitioning at capture time), so a frame that was
  * deliberately `repartition(k, key).sortWithinPartitions(key)`-laid-out
  * before the checkpoint loses that layout in the eyes of every later
  * `EnsureRequirements` pass — each downstream key-join re-exchanges
  * and re-sorts data that is ALREADY clustered and sorted. This shim
  * (the [[ColumnBridge]] pattern: `LogicalRDD` and `Dataset.ofRows` are
  * `private[sql]`) rebuilds the leaf with the layout it truthfully has.
  *
  * SAFETY CONTRACT: callers must guarantee the declared layout is the
  * frame's REAL layout — i.e. the checkpointed plan ended in
  * `repartition(k, col(key))` (exact `HashPartitioning`, never an
  * AQE-coalesced exchange, whose merged partitions do NOT follow the
  * hash function) followed by `sortWithinPartitions(col(key))`. A false
  * declaration silently corrupts every downstream join/aggregate that
  * trusts it. [[graft.ops.Exec.materializeClustered]] is the one
  * blessed call site; it owns that guarantee.
  */
object LayoutBridge {

  /** If `df` is a bare checkpoint leaf (`LogicalRDD`), re-declare it as
    * hash-partitioned by `keyCol` across its actual partition count and
    * sorted ascending-nulls-first by `keyCol` within partitions;
    * otherwise (the durable `persist` mode, where lineage is retained
    * and the layout stays visible to the planner through the cached
    * plan) return `df` unchanged. Statistics of the original frame are
    * carried over so join-size estimation is unaffected. */
  def declareHashClusteredSorted(df: DataFrame, keyCol: String): DataFrame = {
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val attr = lr.output.find(_.name == keyCol).getOrElse(
          throw new IllegalArgumentException(
            s"declareHashClusteredSorted: no column '$keyCol' in " +
              lr.output.map(_.name).mkString("[", ", ", "]")))
        val s = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        val stats = df.queryExecution.optimizedPlan.stats
        val relaid = LogicalRDD(
          lr.output, lr.rdd,
          HashPartitioning(Seq(attr), lr.rdd.getNumPartitions),
          SortOrder(attr, Ascending) :: Nil,
          lr.isStreaming, lr.stream)(s, Some(stats), None)
        org.apache.spark.sql.classic.Dataset.ofRows(s, relaid)
      case _ => df
    }
  }
}
