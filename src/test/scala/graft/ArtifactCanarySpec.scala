package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Artifact-pollution canaries — the TablesSpec schema-drift canary
  * generalized to the persisted-artifact layer (VERDICT r8 #8): for
  * every artifact family, plant a FOREIGN artifact (wrong schema, wrong
  * shape, or plain garbage) at the exact path the loader probes and
  * assert the documented contract: unreadable/wrong-layout artifacts
  * REBUILD (never trusted, never served), while shape mismatches that
  * indicate a caller error (wrong k / wrong (m,k) against a HEALTHY
  * artifact) fail LOUDLY instead of refitting over a mis-keyed path.
  * The r7 testdata-regeneration outage was exactly this class: a
  * loader trusting a surviving marker over changed content. */
class ArtifactCanarySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_canary_$tag").toString

  private def emb = (0L until 24L).map { i =>
    (i, Array.tabulate(8)(j => (((i * 31 + j * 17) % 23).toFloat - 11f) / 5f))
  }.toDF("vec_id", "embedding")

  private def docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon zeta"),
    (3L, "one two three four five six seven"),
    (4L, "entirely different words appear here now"),
    (5L, "one two three four five six seven")
  ).toDF("doc_id", "text")

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Plant a wrong-schema parquet directory (with its _SUCCESS) at `path`. */
  private def pollute(path: String): Unit =
    Seq(("junk", 1)).toDF("wrong", "layout")
      .write.mode("overwrite").parquet(path)

  test("quantizer: unreadable foreign dir rebuilds; healthy wrong-k artifact is loud") {
    // (a) a directory that is not a KMeansModel at all (no metadata/)
    // reads as "no artifact" and rebuilds
    val p1 = freshDir("ivf") + "/q1"
    pollute(p1)
    val m1 = graft.sim.Ivf.fitOrLoad(emb, "embedding", 3, p1)
    assert(m1.getK == 3)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$p1/metadata")))
    // (b) a HEALTHY artifact fit for k=3 probed with k=4 is a mis-keyed
    // path (stamps cover data, not parameters) — loud, never refit
    val e = intercept[IllegalArgumentException](
      graft.sim.Ivf.fitOrLoad(emb, "embedding", 4, p1))
    assert(e.getMessage.contains("k=3"))
  }

  test("pq codebook: headerless artifact rebuilds with a header; wrong-shape header is loud") {
    // (a) pre-header generation: parseArtifact now REQUIRES the '#pq'
    // header (the text-parsing oracle reads line 1 as the header
    // unconditionally) — a surviving headerless file must rebuild, not
    // be served while the oracle misparses it
    val p1 = freshDir("pq") + "/cb1"
    val pp1 = new org.apache.hadoop.fs.Path(p1)
    fs.mkdirs(pp1.getParent)
    val out = fs.create(pp1, true)
    out.write("0.1,0.2;0.3,0.4\n0.5,0.6;0.7,0.8\n".getBytes("UTF-8"))
    out.close()
    val cb = graft.sim.Pq.fitOrLoad(emb, "embedding", m = 2, k = 4, p1)
    assert(cb.length == 2 && cb.forall(_.nonEmpty))
    val in = fs.open(pp1)
    val firstLine = try scala.io.Source.fromInputStream(in).getLines().next()
      finally in.close()
    assert(firstLine.startsWith("#pq m=2 k=4"))
    // (b) healthy artifact probed with a different shape: loud
    val e = intercept[IllegalArgumentException](
      graft.sim.Pq.fitOrLoad(emb, "embedding", m = 2, k = 8, p1))
    assert(e.getMessage.contains("m=2, k=4"))
  }

  test("ivf-pq index: wrong-schema directory behind a surviving _SUCCESS rebuilds") {
    val base = freshDir("idx")
    val model = graft.sim.Ivf.fitOrLoad(emb, "embedding", 3, s"$base/q")
    val cb = graft.sim.Pq.fitOrLoad(emb, "embedding", m = 2, k = 4, s"$base/cb")
    val p = s"$base/idx"
    pollute(p)
    val idx = graft.sim.IvfPq.ensureIndex(emb, "vec_id", "embedding", model, cb, p)
    assert(idx.columns.toSet == Set("cell", "neighbor_id", "vec", "norm", "pq_codes"))
    assert(idx.count() == 24L)
  }

  test("pair graphs: polluted pairs half rebuilds both halves consistently") {
    val p = freshDir("pg") + "/g"
    pollute(s"$p/pairs")
    val (pairs, comps) = graft.text.Dedup.ensurePairGraph(
      docs, "doc_id", "text", n = 3, threshold = 0.5, p)
    assert(pairs.columns.toSeq == Seq("id_a", "id_b", "jaccard"))
    assert(comps.columns.toSeq == Seq("node", "component"))
    // the planted exact duplicates must pair; components cover them
    val ps = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(ps.contains((1L, 2L)) && ps.contains((3L, 5L)))
  }

  test("corpus bloom: garbage bytes at the artifact path rebuild a working filter") {
    val p = freshDir("bloom") + "/b"
    val pp = new org.apache.hadoop.fs.Path(p)
    fs.mkdirs(pp.getParent)
    val out = fs.create(pp, true)
    out.write(Array.fill[Byte](64)(0x5a))
    out.close()
    val bloom = graft.text.CorpusSketches.bloomOrLoad(
      docs, "text", expected = 100L, fpp = 0.01, p)
    // no false negatives: every corpus fingerprint hash must probe true
    val fps = docs.select(
        xxhash64(graft.text.TextOps.fingerprint(col("text"))).as("fp_h"))
      .as[Long].collect()
    assert(fps.forall(bloom.mightContainLong))
  }

  test("bigram LM: wrong-schema count table rebuilds") {
    val p = freshDir("lm") + "/m"
    pollute(p)
    val lm = graft.text.TextOps.ensureBigramModel(docs, "text", p)
    assert(lm.columns.toSeq == Seq("a", "b", "n_ab"))
    assert(lm.count() > 0)
  }

  test("span blocklist: wrong-schema table rebuilds") {
    val p = freshDir("spans") + "/s"
    pollute(p)
    val spans = graft.text.Dedup.ensureSpanBlocklist(
      docs, "text", window = 4, minDocs = 2L, p)
    assert(spans.columns.toSeq == Seq("span", "n_docs"))
    // the duplicated sentences share every 4-gram across >= 2 docs
    assert(spans.count() > 0)
  }

  test("invalidateTables drops the single-table memo: a regenerated artifact is re-read") {
    val p = freshDir("inv") + "/sh"
    val n1 = graft.text.Dedup.ensureShingleSet(docs, "doc_id", "text", n = 3, p).count()
    // regenerate in place (delete + rebuild from a smaller doc set):
    // without the invalidate, the per-JVM memo would keep serving the
    // old frame over the old files
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    graft.text.Dedup.invalidateTables(p)
    val n2 = graft.text.Dedup.ensureShingleSet(
      docs.filter(col("doc_id") <= 2), "doc_id", "text", n = 3, p).count()
    assert(n2 < n1, s"expected a fresh, smaller shingle set; got $n2 vs $n1")
  }

  test("shingle set: wrong-schema table rebuilds to the distinct hash set") {
    val p = freshDir("shset") + "/sh"
    pollute(p)
    val sh = graft.text.Dedup.ensureShingleSet(docs, "doc_id", "text", n = 3, p)
    assert(sh.columns.toSeq == Seq("shingle_h"))
    val n = sh.count()
    assert(n == sh.distinct().count() && n > 0)
  }
}
