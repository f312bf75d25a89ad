package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-adaptive `events` reader: the lake has shipped `ts` as both
  * TIMESTAMP(NANOS) (resolved as long via the legacy conf, needing the
  * div-1000 shim) and TIMESTAMP(MICROS). The reader must branch on the
  * resolved type and yield identical epoch-micros either way, and the
  * catalog memo must be invalidatable after in-place regeneration. */
class TablesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_tables").toString

  /** Write an events.parquet whose ts column is micros TIMESTAMP_NTZ
    * (pyarrow timestamp[us] — the current lake layout). */
  private def writeMicrosEvents(dir: String, micros: Seq[Long]): Unit = {
    val schema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("ts", TimestampNTZType),
      StructField("value", DoubleType)))
    val rows = micros.zipWithIndex.map { case (us, i) =>
      Row(i.toLong % 3, java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, ((us % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC), i.toDouble)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  /** Write an events.parquet whose ts column is a raw long of
    * nanoseconds — what the legacy nanos layout resolves to under
    * `spark.sql.legacy.parquet.nanosAsLong` (parquet has no unsigned
    * nanos long type writable from Spark, so we model the *resolved*
    * long layout, which is the exact code path the shim branches on). */
  private def writeNanosLongEvents(dir: String, micros: Seq[Long]): Unit = {
    val schema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("ts", LongType),
      StructField("value", DoubleType)))
    val rows = micros.zipWithIndex.map { case (us, i) =>
      Row(i.toLong % 3, us * 1000L, i.toDouble)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private val sampleMicros =
    Seq(0L, 1500000L, 1738368000123456L, 1738368005999999L)

  test("events reader adapts: micros TIMESTAMP and nanos-as-long resolve to identical values") {
    val dMicros = tmpDir(); val dNanos = tmpDir()
    writeMicrosEvents(dMicros, sampleMicros)
    writeNanosLongEvents(dNanos, sampleMicros)
    val a = Tables.events(spark, dMicros)
    val b = Tables.events(spark, dNanos)
    // both analyze to the canonical session-zoned timestamp
    assert(a.schema("ts").dataType == TimestampType)
    assert(b.schema("ts").dataType == TimestampType)
    val ua = a.selectExpr("unix_micros(ts)").collect().map(_.getLong(0)).toSeq.sorted
    val ub = b.selectExpr("unix_micros(ts)").collect().map(_.getLong(0)).toSeq.sorted
    assert(ua == sampleMicros.sorted)
    assert(ub == sampleMicros.sorted)
  }

  test("invalidate drops the memo so an in-place regeneration resolves the new schema") {
    val d = tmpDir()
    writeNanosLongEvents(d, sampleMicros)
    assert(Tables.t(spark, d, "events").schema("ts").dataType == LongType)
    // regenerate in place with the other layout; memo still serves old
    writeMicrosEvents(d, sampleMicros)
    assert(Tables.t(spark, d, "events").schema("ts").dataType == LongType)
    Tables.invalidate(d)
    assert(Tables.t(spark, d, "events").schema("ts").dataType == TimestampNTZType)
    assert(Tables.events(spark, d).schema("ts").dataType == TimestampType)
  }

  test("schema-drift canary: every catalog reader analyzes against the live testdata") {
    // Analysis-only (no action): the next upstream layout change fails
    // this named test instead of 26 scoreboard rows.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      if (new java.io.File(dir).isDirectory) {
        Tables.names.foreach { n =>
          val df = if (n == "events") Tables.events(spark, dir)
                   else Tables.t(spark, dir, n)
          assert(df.schema.nonEmpty, s"$sf/$n resolved an empty schema")
        }
        assert(Tables.events(spark, dir).schema("ts").dataType == TimestampType,
          s"$sf events.ts must canonicalize to TimestampType")
      }
    }
  }
}
