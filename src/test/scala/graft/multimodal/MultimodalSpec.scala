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

  test("resize maps any payload to exactly w*h bytes, deterministically") {
    val df = Seq(
      (1L, "abcdefghij", "img", "s1"),   // downsample 10 → 6
      (2L, "xy", "img", "s1"),           // upsample 2 → 6
      (3L, "", "img", "s1")              // empty payload → zero bytes
    ).toDF("id", "text", "kind", "src")
    val media = Multimodal.withPayload(df, "id", "text", "kind", "src")
    val out = Multimodal.resizeStub(spark, media, 3, 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(out.values.forall(_.length == 6))
    // nearest-neighbor over "abcdefghij": floor(i*10/6) = 0,1,3,5,6,8 → a,b,d,f,g,i
    assert(new String(out(1L)) == "abdfgi")
    assert(new String(out(2L)) == "xxxyyy")
    assert(out(3L).forall(_ == 0))
    // deterministic across runs
    val again = Multimodal.resizeStub(spark, media, 3, 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(out.keySet.forall(k => java.util.Arrays.equals(out(k), again(k))))
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
