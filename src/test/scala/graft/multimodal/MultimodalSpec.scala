package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Multimodal plumbing spec: binary payload round-trip through the
  * partition-batched stub decoder. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("payload → batch kernel → typed features") {
    val df = Seq((10L, "hello world", "img", "s1"), (11L, "", "aud", "s2"))
      .toDF("id", "text", "kind", "src")
    val media = Multimodal.withPayload(df, "id", "text", "kind", "src")
    assert(media.schema("payload").dataType.typeName == "binary")
    val feats = Multimodal.extractFeatures(spark, media)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getLong(3))).toMap
    assert(feats(10L)._1 == 11L)           // byte length of "hello world"
    assert(feats(10L)._2.length == 8)      // 8-hex fingerprint
    assert(feats(10L)._3 == 1L)            // 11/64 + 1
    assert(feats(11L)._1 == 0L)
  }
}
