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

  test("j15 scoreboard query: bucketed SMJ with no exchange and no sort below the join") {
    val d = "/root/testdata/sf0.001"
    val (ot, ct) = Ioops.ensureBucketedPair(spark, d)
    val o = spark.table(ot).select(col("o_custkey"), col("o_totalprice"))
    val c = spark.table(ct).select(col("c_custkey"), col("c_mktsegment"))
    val j = o.hint("merge").join(c, o("o_custkey") === c("c_custkey"))
    val planStr = j.queryExecution.executedPlan.toString
    assert(planStr.contains("SortMergeJoin"), s"expected SMJ:\n$planStr")
    assert(!planStr.contains("Exchange"), s"bucketed join still shuffles:\n$planStr")
    // and the bucketed copy agrees with the source tables
    val expect = Tables.orders(spark, d).join(Tables.customer(spark, d),
      col("o_custkey") === col("c_custkey")).count()
    assert(j.count() == expect)
    // one file per bucket (pre-partitioned write) → under the legacy
    // bucketed-scan-ordering flag the scan also reports the written sort
    // order and the SMJ drops its SortExecs too (off by default since
    // Spark 3.0 because multi-file buckets would make it unsound; our
    // write layout is exactly the sound case)
    val flag = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val prev = spark.conf.get(flag)
    try {
      spark.conf.set(flag, "true")
      val o2 = spark.table(ot).select(col("o_custkey"), col("o_totalprice"))
      val c2 = spark.table(ct).select(col("c_custkey"), col("c_mktsegment"))
      val sorted = o2.hint("merge").join(c2, o2("o_custkey") === c2("c_custkey"))
        .queryExecution.executedPlan.toString
      assert(!sorted.contains("Sort ") && !sorted.contains("Exchange"),
        s"one-file-per-bucket layout should need neither sort nor shuffle:\n$sorted")
    } finally spark.conf.set(flag, prev)
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

  test("stale bucketed layout (fingerprint mismatch) is rebuilt, not re-registered") {
    val d = "/root/testdata/sf0.001"
    val (ot, ct) = Ioops.ensureBucketedPair(spark, d)
    val srcRows = Tables.t(spark, d, "orders").count()
    val base = System.getProperty("java.io.tmpdir") +
      s"/graft_bucketed_${d.replaceAll("[^A-Za-z0-9]", "_")}"
    val fp = java.nio.file.Paths.get(s"$base/orders/_GRAFT_SRC_ROWS")
    assert(java.nio.file.Files.readString(fp).trim.toLong == srcRows)
    // simulate a regenerated source: corrupt the stamp, drop the
    // catalog entries (fresh-JVM view), re-ensure → must REBUILD and
    // re-stamp the true count instead of trusting _SUCCESS
    java.nio.file.Files.writeString(fp, (srcRows + 1).toString)
    spark.sql(s"DROP TABLE $ot"); spark.sql(s"DROP TABLE $ct")
    val (ot2, _) = Ioops.ensureBucketedPair(spark, d)
    assert(java.nio.file.Files.readString(fp).trim.toLong == srcRows)
    assert(spark.table(ot2).count() == srcRows)
  }
}
