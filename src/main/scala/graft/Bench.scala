package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every `SparkEntry.queries`
  * entry on `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with
  * per-query wall-clock. An untimed warmup pass touches every table and
  * runs one trivial job first so JVM/codegen/file-listing startup cost
  * is not attributed to whichever query happens to run first. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: schema + footer reads for every table, one real scan job
    // (events.ts is TIMESTAMP(NANOS) — needs the legacy conf before any
    // footer read, same as Tables.events)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.names.foreach(n => Tables.t(spark, sfDir, n).schema)
    Tables.lineitem(spark, sfDir).count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop blocks pinned by eager localCheckpoints inside operators —
      // leaking them degrades every later query in the run
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
