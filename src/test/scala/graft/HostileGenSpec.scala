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
    // Seq of pairs, NOT a Map keyed on event_id: the hostile block
    // deliberately duplicates event_id 9000007 with different ts — a
    // Map would shadow one of the two rows out of the assertions
    // (review sweep r10). Rows are generated in spec order, identical
    // for both layouts, so index-wise zip is the row pairing.
    def rows(tsType: DataType, proj: org.apache.spark.sql.Column) =
      HostileGen.hostileDf(spark, emptySrc(tsType), "events")
        .select(col("event_id"), proj).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else Long.box(r.getLong(1)))).toSeq
    val nanosRows = rows(LongType, col("ts"))
    val ntzRows = rows(TimestampNTZType, unix_micros(col("ts").cast(TimestampType)))
    assert(nanosRows.map(_._1) == ntzRows.map(_._1))
    assert(nanosRows.length == 9) // every spec row, duplicate id included
    // row 9000001 is the null-ts as-of phantom in both layouts
    assert(nanosRows.find(_._1 == 9000001L).get._2 == null)
    // duplicate event_id 9000007 must appear TWICE with distinct ts
    assert(nanosRows.count(_._1 == 9000007L) == 2 &&
      nanosRows.filter(_._1 == 9000007L).map(_._2).distinct.size == 2)
    // the epoch-boundary row pins the absolute scale (0 in any unit),
    // and every non-null ts must be the NTZ instant in nanos — NOT
    // epoch seconds (which would be off by 1e9)
    nanosRows.zip(ntzRows).foreach { case ((id, nanos), (_, us)) =>
      (nanos, us) match {
        case (null, null) => ()
        case (n, u) =>
          assert(n == u * 1000L, s"event $id: nanos=$n vs micros=$u")
      }
    }
    val future = nanosRows.map(_._2).filter(_ != null).map(_.toLong)
    assert(future.exists(_ > 4_000_000_000_000_000_000L),
      "the 2100 far-future row must exceed 4e18 nanos — epoch-seconds " +
        "or micros scaling would be orders of magnitude smaller")
  }
}
