package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff: compare two keyed table versions and emit one row per
  * difference, tagged `added` / `deleted` / `changed` — the inverse of
  * [[Merge.applyChanges]] (merge applies a change stream to a snapshot;
  * diff RECOVERS the change stream from two snapshots). The everyday
  * lake tool for auditing a backfill, validating a migration, or
  * bootstrapping CDC from full dumps when the source system emits no
  * change log.
  *
  * Spark-first plan: one full-outer sort-merge join on the key columns,
  * change classification as a pure projection over the join's
  * null-pattern (left-only ⇒ deleted, right-only ⇒ added, both-but-
  * unequal ⇒ changed), unchanged rows filtered before anything else
  * touches them. ONE shuffle per side — and zero when both snapshots
  * are bucketed on the key ([[graft.Ioops.writeBucketed]]), which is
  * exactly how nightly-dump diffing should be laid out at 100 TB.
  * Equality is per-column null-safe `<=>` (NULL == NULL: a column going
  * NULL→NULL is not a change, NULL→value is), so semantics match the
  * SQL `IS NOT DISTINCT FROM` the oracle states.
  *
  * Both inputs must be unique per key (snapshots are, by definition);
  * duplicate keys multiply join rows rather than failing — run
  * [[Joins.assertManyToOne]] upstream when uniqueness is in doubt. */
object Diff {

  /** Diff `newer` against `older` on `keys`, comparing `compareCols`.
    * Output: key columns, `change_type` ('added'/'deleted'/'changed'),
    * then old_/new_ prefixed compare columns (null on the absent side). */
  def snapshotDiff(older: DataFrame, newer: DataFrame,
                   keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && compareCols.nonEmpty, "keys and compareCols required")
    val o = older.select((keys ++ compareCols).map(col): _*)
      .withColumn("__old_present", lit(true))
    val n = newer.select((keys ++ compareCols).map(col): _*)
      .withColumn("__new_present", lit(true))
    val joined = o.as("o").join(n.as("n"),
      keys.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _), "full_outer")
    val oldPresent = col("o.__old_present").isNotNull
    val newPresent = col("n.__new_present").isNotNull
    val anyChanged = compareCols
      .map(c => !(col(s"o.$c") <=> col(s"n.$c"))).reduce(_ || _)
    val changeType = when(!oldPresent, "added")
      .when(!newPresent, "deleted")
      .when(anyChanged, "changed")
    val keyCols = keys.map(k => coalesce(col(s"n.$k"), col(s"o.$k")).as(k))
    val valCols = compareCols.flatMap(c =>
      Seq(col(s"o.$c").as(s"old_$c"), col(s"n.$c").as(s"new_$c")))
    joined.filter(changeType.isNotNull)
      .select((keyCols :+ changeType.as("change_type")) ++ valCols: _*)
  }
}
