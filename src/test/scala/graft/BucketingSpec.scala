package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing contract: two tables bucketed identically on the join key
  * must sort-merge-join with NO exchange — the pay-shuffle-once-at-write
  * property that makes recurring fact⋈fact joins cheap at scale. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed-bucketed equi-join plans without an exchange") {
    val left = (1 to 10000).map(i => (i.toLong % 128, i.toLong)).toDF("k", "v")
    val right = (1 to 5000).map(i => (i.toLong % 128, s"n$i")).toDF("k", "name")
    Ioops.writeBucketed(left, "bkt_left", 8, Seq("k"))
    Ioops.writeBucketed(right, "bkt_right", 8, Seq("k"))

    // disable broadcast so the join exercises the bucketed SMJ path
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketing failed to avoid shuffle:\n$plan")
      // and the result is still the plain join
      val expect = left.join(right, "k").count()
      assert(j.count() == expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucket pruning: an equality filter on the bucket column reads one bucket") {
    val df = (1 to 4096).map(i => (i.toLong % 64, i.toLong)).toDF("k", "v")
    Ioops.writeBucketed(df, "bkt_pruned", 16, Seq("k"))
    // autoBucketedScan drops the bucketed layout for plans with no
    // interesting partitioning requirement (filter-only) — disable it so
    // the scan keeps buckets and the equality filter can prune to one
    val prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val q = spark.table("bkt_pruned").filter(col("k") === 7L)
      val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
      assert(scan.contains("SelectedBucketsCount: 1 out of 16"),
        s"no bucket pruning:\n$scan")
      assert(q.count() == 64)
    } finally spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
  }
}
