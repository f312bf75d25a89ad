package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r19 optimization round): per-query physical-shape census —
  * `runMain graft.PlanCensus [sfDir] [out.tsv] [namesCsv]`.
  *
  * Executes every `SparkEntry.queries` entry (or the csv subset) with the
  * Bench session confs, then reads the AQE-final executed plan and emits
  * one TSV row per query: wall seconds, result rows, Spark jobs run,
  * `Exchange` count, parquet/files scan count, scan → table list, and
  * WholeStageCodegen span count. This is the measurement backbone for
  * OPTIMIZATION_r19.md: it ranks structural targets (duplicated scans,
  * unexpected exchanges) by evidence instead of by eyeball. With a 4th
  * arg it ALSO writes each query's `.explain("formatted")` to
  * `<plansDir>/<name>.txt` — the plans/r19 before/after evidence files.
  * Census only — never a gate, never part of the driver contract. */
object PlanCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/plan_census.tsv"
    val only = if (args.length > 2)
      Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet)
        .filter(_.nonEmpty) else None
    val plansDir = if (args.length > 3) Some(args(3)) else None
    plansDir.foreach(p => java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(p)))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // same artifact prebuild as Bench so measured shapes match bench legs
    try {
      graft.queries.TextSim.prebuildIndexes(spark, sfDir)
      Ioops.ensureBucketedPair(spark, sfDir)
    } catch { case e: Exception =>
      System.err.println(s"[census] prebuild failed (continuing): ${e.getMessage}")
    }
    val jobCounter = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCounter.incrementAndGet(); ()
      }
    })
    val sb = new StringBuilder
    sb ++= "name\twall_s\trows\tjobs\texchanges\tscans\tcodegen_spans\ttables\n"
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          jobCounter.set(0)
          val t0 = System.nanoTime()
          val rows = df.count()
          val wall = (System.nanoTime() - t0) / 1e9
          val jobs = jobCounter.get()
          // count() plans a different query than the frame itself: run a
          // noop write so the AQE-final plan of the REAL query is read
          // (verify-skill gotcha).
          df.write.format("noop").mode("overwrite").save()
          plansDir.foreach { p =>
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
              .replaceAll("0x[0-9A-Fa-f]{64,}", "0x<binary literal elided>")
            java.nio.file.Files.write(
              java.nio.file.Paths.get(p, s"$name.txt"), txt.getBytes("UTF-8"))
          }
          val plan = df.queryExecution.executedPlan.toString
          def cnt(re: String): Int = re.r.findAllIn(plan).length
          val exchanges = cnt("""Exchange (hash|range|Single|rebalance)""")
          val scans = cnt("""Scan parquet|Scan csv|Scan json|Scan orc|FileScan""")
          val spans = cnt("""WholeStageCodegen \(\d+\)""")
          val tables = """parquet [^\s\[]*|Location[^\n]*""".r.findAllIn(plan)
            .map(_.replaceAll(".*/", "").take(40)).toSeq.distinct.take(8).mkString(",")
          sb ++= f"$name\t$wall%.3f\t$rows\t$jobs\t$exchanges\t$scans\t$spans\t$tables\n"
        } catch { case e: Exception =>
          sb ++= s"$name\tERR\t${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(80)}\n"
        }
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    java.nio.file.Files.write(java.nio.file.Paths.get(out), sb.toString.getBytes("UTF-8"))
    println(s"[census] wrote $out")
    spark.stop()
  }
}
