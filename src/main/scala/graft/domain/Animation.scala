package graft.domain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Play-animation data prep (reference `src/visualization/play.py`) —
  * the last presentation-layer shapes (SURVEY.md §2.11): the rendering
  * itself (matplotlib GIFs) is a declared non-goal, but the DATA steps
  * feeding it are engine work.
  */
object Animation {

  /** play.py:130-133: stitch the before-throw and after-throw tracking
    * segments into one timeline — shift the `after` segment's frame
    * counter past `max(before.frame_id)`, then union.
    *
    * Spark shape: the max is a 1-row aggregate broadcast into the
    * `after` projection (broadcast nested-loop join against one row —
    * no shuffle of the fact side), so the op stays two scans + a union
    * at any scale; pandas did a driver-side scalar add. Empty `before`
    * degenerates to offset 0 rather than a null frame. */
  def frameOffsetUnion(before: DataFrame, after: DataFrame, frameCol: String): DataFrame = {
    val maxB = before.agg(max(col(frameCol)).as("__max_frame"))
    val shifted = after.crossJoin(broadcast(maxB))
      .withColumn(frameCol, col(frameCol) + coalesce(col("__max_frame"), lit(0L)))
      .drop("__max_frame")
    before.unionByName(shifted)
  }
}
