package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Persisted corpus-bloom artifact ([[CorpusSketches.bloomOrLoad]]):
  * build-then-save and load must probe identically (the admission
  * verdict cannot depend on which path ran), a corrupt artifact
  * rebuilds instead of being trusted, and the artifact-backed
  * incrementalNew overload equals the inline-build path exactly. */
class SketchArtifactSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpPath(name: String): String =
    java.nio.file.Files.createTempDirectory("graft_sketch").resolve(name).toString

  private val corpus = (0L until 40L)
    .map(i => (i, s"corpus document number $i with stable body"))
    .toDF("doc_id", "text")

  test("bloomOrLoad: cold build writes the artifact; a fresh load probes identically") {
    val path = tmpPath("bloom_a")
    val built = CorpusSketches.bloomOrLoad(corpus, "text", 1000L, 0.01, path)
    assert(new java.io.File(path).isFile, "artifact file must exist after build")
    // read the artifact back directly (bypasses the memo — exercises
    // the exact deserialization the warm-load path runs)
    val in = new java.io.FileInputStream(path)
    val loaded = try org.apache.spark.util.sketch.BloomFilter.readFrom(in)
                 finally in.close()
    // identical probe behavior over present keys and a disjoint probe set
    val keys = corpus.select(
      xxhash64(TextOps.fingerprint(col("text"))).as("h"))
      .as[Long].collect()
    keys.foreach(k => assert(built.mightContainLong(k) && loaded.mightContainLong(k),
      s"present key $k must probe true on both"))
    (1L to 200L).map(i => Long.MaxValue - i * 7919).foreach { k =>
      assert(built.mightContainLong(k) == loaded.mightContainLong(k),
        s"probe parity broken for $k")
    }
  }

  test("bloomOrLoad: a corrupt artifact rebuilds instead of being trusted") {
    val path = tmpPath("bloom_b")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      Array[Byte](1, 2, 3, 4)) // garbage: readFrom throws IOException
    val rebuilt = CorpusSketches.bloomOrLoad(corpus, "text", 1000L, 0.01, path)
    val keys = corpus.select(
      xxhash64(TextOps.fingerprint(col("text"))).as("h"))
      .as[Long].collect()
    keys.foreach(k => assert(rebuilt.mightContainLong(k),
      "rebuilt filter must contain every corpus key"))
  }

  test("artifact-backed incrementalNew equals the inline-build path") {
    val path = tmpPath("bloom_c")
    val batch = ((20L until 40L).map(i => (100 + i, s"corpus document number $i with stable body")) ++
      (0L until 10L).map(i => (200 + i, s"genuinely new crawl item $i"))).toDF("doc_id", "text")
    val bloom = CorpusSketches.bloomOrLoad(corpus, "text", 1000L, 0.01, path)
    val viaArtifact = Dedup.incrementalNew(corpus, batch, "doc_id", "text",
      bloom, 1000L, 0.01).select("doc_id").as[Long].collect().sorted.toSeq
    val inline = Dedup.incrementalNew(corpus, batch, "doc_id", "text",
      expected = 1000L, fpp = 0.01).select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaArtifact == inline && viaArtifact == (200L until 210L),
      s"artifact=$viaArtifact inline=$inline")
  }
}
