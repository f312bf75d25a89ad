package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Execution-policy helpers shared by the multi-consumer operators.
  *
  * The dedup/similarity operators materialize an intermediate frame that
  * several downstream branches consume (both sides of a self-join, a
  * hot-key audit, …). HOW to materialize is a deployment decision, not
  * an operator decision, so it lives behind one switch:
  *
  *   - `local` (the default on a `local[*]` master): `localCheckpoint` —
  *     blocks pinned to executors, lineage truncated. Fastest, but NOT
  *     durable: on a real cluster a lost executor (dynamic allocation,
  *     spot kill) loses blocks that cannot be recomputed, failing the
  *     query mid-flight.
  *   - `durable` (the default on any non-local master, or forced via
  *     `spark.graft.durableMaterialize=true`): eager
  *     `persist(DISK_ONLY)` — lineage is kept, so a lost block is
  *     recomputed from source instead of killing the query, and the
  *     blocks spill to disk rather than competing with shuffle memory.
  *
  * Both modes materialize EAGERLY (the persist is followed by a
  * `count()`): the consumers race otherwise — two concurrent branches
  * computing (and block-manager-contending on) the same partitions of a
  * lazily-cached frame.
  */
object Exec {

  /** Session conf key: force (`true`) or suppress (`false`) the durable
    * path; unset → decided by the master URL. */
  val DurableConf = "spark.graft.durableMaterialize"

  def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val durable = spark.conf.getOption(DurableConf).map(_.toBoolean)
      .getOrElse(!spark.sparkContext.isLocal)
    if (durable) {
      val p = df.persist(StorageLevel.DISK_ONLY)
      p.count() // eager: see scaladoc — concurrent consumers must not race
      p
    } else df.localCheckpoint(true)
  }

  /** Release a frame returned by [[materialize]] once every consumer's
    * action has completed: drops the cache-manager entry (durable mode)
    * AND the pinned checkpoint blocks (local mode — `Dataset.unpersist`
    * alone does not reach an RDD pinned by `localCheckpoint`, which is
    * why Bench sweeps `getPersistentRDDs` between queries; library
    * callers that build artifacts should release explicitly instead of
    * relying on such a sweep). Safe on any frame; non-blocking. */
  def release(df: DataFrame): Unit = {
    df.unpersist(false)
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
      case _ => ()
    }
  }
}
