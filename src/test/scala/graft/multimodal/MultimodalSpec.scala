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

  test("frame sampling explodes every stride-th 64-byte window per blob") {
    // 130 ASCII bytes → frames 0,1,2; stride 2 keeps 0 and 2
    val text = "x" * 130
    val df = Seq((1L, text, "vid", "s1")).toDF("id", "text", "kind", "src")
    val media = Multimodal.withPayload(df, "id", "text", "kind", "src")
    val frames = Multimodal.sampleFrames(spark, media, stride = 2L)
      .orderBy("frame_idx")
      .collect().map(r => (r.getLong(1), r.getString(2)))
    assert(frames.map(_._1).toSeq == Seq(0L, 2L))
    val md = java.security.MessageDigest.getInstance("MD5")
    def fp(s: String) = md.digest(s.getBytes).map("%02x".format(_)).mkString.take(8)
    assert(frames(0)._2 == fp("x" * 64))  // full first window
    assert(frames(1)._2 == fp("x" * 2))   // 2-byte tail window
  }
}
