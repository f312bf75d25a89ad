package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** HostileGen must track whatever physical `events.ts` layout the
  * driver ships (the r7 outage class): on a TIMESTAMP/NTZ generation
  * the hostile timestamp literals cast straight through, and on a
  * nanos generation (ts resolves as LongType under the legacy conf)
  * they must land as epoch-NANOS — a naive CAST(TIMESTAMP AS bigint)
  * would store epoch-SECONDS and collapse every hostile event to
  * ~1970 after the consumer's div-1000 micros shim (review sweep,
  * r10). */
class HostileGenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def eventsSchema(tsType: DataType) = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def emptySrc(tsType: DataType) =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], eventsSchema(tsType))

  test("hostile events ts lands as epoch-nanos on a nanos-long generation, same instants as the NTZ generation") {
    import org.apache.spark.sql.functions._
    val nanosRows = HostileGen.hostileDf(spark, emptySrc(LongType), "events")
      .select(col("event_id"), col("ts")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else Long.box(r.getLong(1)))).toMap
    val ntzRows = HostileGen.hostileDf(spark, emptySrc(TimestampNTZType), "events")
      .select(col("event_id"), unix_micros(col("ts").cast(TimestampType)))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else Long.box(r.getLong(1)))).toMap
    assert(nanosRows.keySet == ntzRows.keySet)
    // row 9000001 is the null-ts as-of phantom in both layouts
    assert(nanosRows(9000001L) == null && ntzRows(9000001L) == null)
    // the epoch-boundary row pins the absolute scale (0 in any unit),
    // and every non-null ts must be the NTZ instant in nanos — NOT
    // epoch seconds (which would be off by 1e9)
    nanosRows.foreach { case (id, nanos) =>
      (nanos, ntzRows(id)) match {
        case (null, null) => ()
        case (n, us) =>
          assert(n == us * 1000L, s"event $id: nanos=$n vs micros=$us")
      }
    }
    val future = nanosRows.values.filter(_ != null).map(_.toLong)
    assert(future.exists(_ > 4_000_000_000_000_000_000L),
      "the 2100 far-future row must exceed 4e18 nanos — epoch-seconds " +
        "or micros scaling would be orders of magnitude smaller")
  }
}
