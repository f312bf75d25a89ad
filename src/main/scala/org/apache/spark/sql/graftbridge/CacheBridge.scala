package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Cache-manager bridge for [[graft.ops.Exec.release]]'s durable mode.
  *
  * `Exec.materialize`'s durable path is `persist(DISK_ONLY)`, which
  * KEEPS lineage — so a frame DERIVED from a materialized frame holds
  * its parent's logical plan as a subtree, and releasing the parent
  * means finding that subtree in the cache manager. `Dataset.unpersist`
  * only matches the dataset's own plan, and the cache manager
  * (`org.apache.spark.sql.execution.CacheManager`) is `private[sql]` —
  * hence this one-file shim in the `org.apache.spark.sql` package tree
  * (the [[ColumnBridge]] pattern).
  */
object CacheBridge {

  /** If `plan` has a cache-manager entry (sameResult match), drop it
    * (non-cascading, non-blocking) and return true; false when no
    * entry matched. Dependent cache entries are left valid — Spark
    * re-plans them without the dropped one. */
  def uncacheIfCached(spark: org.apache.spark.sql.SparkSession,
                      plan: LogicalPlan): Boolean = {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val cm = s.sharedState.cacheManager
    if (cm.lookupCachedData(s, plan).isEmpty) false
    else {
      cm.uncacheQuery(s, plan, cascade = false, blocking = false)
      true
    }
  }
}
