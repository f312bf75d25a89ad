package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, processed by a partition-batched decode kernel.
  *
  * The decode step itself is a STUB (deterministic fake — this
  * environment has no image/audio codecs); everything around it is the
  * real Spark shape: binary column + metadata struct in, typed feature
  * rows out, executed per-partition with no driver involvement, so it
  * scales exactly like a real decoder would (CPU-bound per partition,
  * no shuffle).
  */
object Multimodal {

  /** One media blob plus metadata. */
  case class MediaRow(id: Long, payload: Array[Byte], kind: String, source: String)

  /** Stub "decoded" features: byte length, an 8-hex-char content
    * fingerprint, and a fake frame count (1 frame per 64 bytes). */
  case class MediaFeatures(id: Long, byte_len: Long, fp8: String, n_frames: Long)

  /** Deterministic fake decode of one blob — the `???` seam where a real
    * image/audio decoder (pixel stats, resize, frame-sample) would go. */
  def decodeStub(payload: Array[Byte]): (Long, String, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString.substring(0, 8)
    (payload.length.toLong, hex, payload.length.toLong / 64 + 1)
  }

  /** Attach a binary payload column to a text table (the testdata stand-in
    * for real media bytes). */
  def withPayload(df: DataFrame, idCol: String, textCol: String,
                  kindCol: String, sourceCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(textCol).cast("binary").as("payload"),
      col(kindCol).as("kind"), col(sourceCol).as("source"))

  /** The batch kernel: mapPartitions over typed rows — one decoder
    * instance per partition (the expensive-init shape of real codecs),
    * streaming through the batch iterator. */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val ds: Dataset[MediaRow] = media.as[MediaRow]
    ds.mapPartitions { rows =>
      // per-partition init of the (stub) decoder would go here
      rows.map { r =>
        val (len, fp, frames) = decodeStub(r.payload)
        MediaFeatures(r.id, len, fp, frames)
      }
    }.toDF()
  }

  /** A "resized" media row: binary out, target dims in the metadata. */
  case class ResizedRow(id: Long, resized: Array[Byte], w: Int, h: Int)

  /** Resize kernel: binary in → binary out at a fixed target size —
    * the transform-shaped multimodal op (decode/extract are
    * projection-shaped, frame-sample is explode-shaped). The stub maps
    * the payload to exactly w·h bytes by nearest-neighbor sampling over
    * the byte array as a 1-D signal; a real implementation swaps the
    * sampling loop for a codec resize with identical plumbing: typed
    * rows, per-partition kernel init, output bytes bounded by (w, h)
    * regardless of input size — which is what makes the op safe to run
    * before a shuffle (the shuffled bytes are the *resized* payloads). */
  def resizeStub(spark: SparkSession, media: DataFrame, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    val ds: Dataset[MediaRow] = media.as[MediaRow]
    ds.mapPartitions { rows =>
      val out = new Array[Byte](w * h) // per-partition buffer (decoder-init shape)
      rows.map { r =>
        val n = r.payload.length
        var i = 0
        while (i < out.length) {
          out(i) = if (n == 0) 0 else r.payload((i.toLong * n / out.length).toInt)
          i += 1
        }
        ResizedRow(r.id, out.clone(), w, h)
      }
    }.toDF()
  }

  /** One sampled frame: index within the blob plus a per-frame content
    * fingerprint (the stub stand-in for a decoded/resized frame). */
  case class FrameRow(id: Long, frame_idx: Long, frame_fp: String)

  /** Frame sampling: explode each blob into every `stride`-th "frame"
    * (stub: one 64-byte window per frame index). Output cardinality is
    * rows × frames/stride — the same explode shape a real video
    * frame-sampler has, so the partitioning/memory behavior is honest:
    * one blob's frames never leave its partition and the iterator stays
    * lazy (no per-partition materialization of all frames). */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Long = 2L): DataFrame = {
    import spark.implicits._
    val ds: Dataset[MediaRow] = media.as[MediaRow]
    ds.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5") // per-partition decoder init
      rows.flatMap { r =>
        val nFrames = r.payload.length.toLong / 64 + 1
        (0L until nFrames by stride).iterator.map { f =>
          val from = (f * 64).toInt min r.payload.length
          val until = ((f + 1) * 64).toInt min r.payload.length
          md.reset()
          val fp = md.digest(java.util.Arrays.copyOfRange(r.payload, from, until))
            .map("%02x".format(_)).mkString.substring(0, 8)
          FrameRow(r.id, f, fp)
        }
      }
    }.toDF()
  }
}
