package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over the driver-provided Parquet testdata
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md §B).
  *
  * Schema-on-read: Parquet carries the authoritative schema, so no
  * inference pass is needed (unlike the reference's
  * `pd.read_csv(low_memory=False)` whole-file type inference,
  * reference `src/io/datasets.py:14-29`). Reads stay lazy; Catalyst
  * pushes projections/filters into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Catalog memo: `spark.read.parquet` eagerly lists files and reads
    * footers to resolve the schema, so a 69-query Bench/Verify run that
    * re-reads each table per query pays that fixed cost ~69×. One
    * resolved DataFrame per (session, dir, table) — immutable plan,
    * safe to share; exactly what a persistent catalog (metastore) does
    * for a real deployment. */
  private val catalog =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]

  /** S1 scan: one logical table from `dir`. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    catalog.computeIfAbsent((spark, dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))

  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as a long (legacy conf) and floor-convert
    * to a microsecond timestamp — matching DuckDB's own nanos→micros
    * truncation, so oracle comparisons agree. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** SQL surface: register every catalog table as a temp view (events
    * via its nanos-safe reader), so `spark.sql` users get the whole
    * engine — tables, built-ins, and the GraftExtensions-injected
    * kernels (`pelt_deception`, `vec_dot`, `vec_lsh_bucket`,
    * `vec_eq_count`) — without touching the Column API. */
  def registerAll(s: SparkSession, dir: String): Unit =
    names.foreach {
      case "events" => events(s, dir).createOrReplaceTempView("events")
      case n        => t(s, dir, n).createOrReplaceTempView(n)
    }
}
