package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Corpus-level sketches for incremental ingest at 100-TB scale — the
  * point is what they REPLACE: a join against the historical corpus.
  *
  *   - Bloom filter over document fingerprints: "have we seen this
  *     text before?" against yesterday's corpus becomes one broadcast
  *     bitset probe per new document instead of an anti-join whose
  *     build side is the whole corpus. No false negatives (a true
  *     duplicate is never admitted); false positives (a new doc
  *     wrongly dropped) bounded by the configured fpp.
  *   - Count-min sketch over tokens: approximate token frequencies /
  *     heavy hitters in bounded memory, mergeable across partitions
  *     (both sketches aggregate distributively — Spark builds them
  *     with one pass + a treeAggregate-style merge).
  *
  * Both use Spark's public sketch API (`org.apache.spark.util.sketch`),
  * the same implementations backing `DataFrameStatFunctions`.
  */
object CorpusSketches {

  /** Bloom filter of 64-bit fingerprint hashes (TextOps fingerprint
    * semantics: near-identical-after-normalization ⇒ same key; the
    * xxhash64 layer adds a ~d²/2⁶⁵ chance of two distinct fingerprints
    * colliding — the same accepted bound as the shingle fingerprints in
    * [[Dedup.shingleHashes]]). Keyed on longs, not strings, so the probe
    * side can run through Spark's native codegen'd
    * `BloomFilterMightContain` (long-keyed, like the runtime row-level
    * filters it was built for) and the filter itself is ~40% smaller to
    * build and broadcast. `expected` sizes the filter;
    * bits ≈ -n·ln(fpp)/ln2². */
  def fingerprintBloom(df: DataFrame, textCol: String,
                       expected: Long, fpp: Double = 0.01): BloomFilter = {
    // Zero-row corpus (the first-ever ingest in bloomOrLoad's
    // maintained-artifact life cycle) → a driver-constructed EMPTY
    // filter at the same parameters, not the zero-row bloomFilter NPE
    // and not a sentinel key: this build feeds [[filterUnseen]], where
    // a sentinel-colliding document would be a SILENT drop with no
    // exact confirm to recover it (unlike [[fpColumnBloom]]'s reverse
    // gate). The emptiness probe is one limit-1 job, paid on the
    // ingest/build path only — warm loads never reach it.
    // null-text rows carry NO key: Spark's xxhash64 SKIPS null inputs
    // and returns its seed (42), so an unfiltered null-text corpus row
    // would insert 42 — and every null-text probe row hashes to that
    // same 42, turning "null is never seen" into "every null is seen"
    // (a silent drop through [[filterUnseen]], with no exact confirm
    // to recover it)
    val keyed = df.filter(col(textCol).isNotNull)
      .select(xxhash64(TextOps.fingerprint(col(textCol))).as("fp_h"))
    if (keyed.isEmpty) BloomFilter.create(expected, fpp)
    else keyed.stat.bloomFilter("fp_h", expected, fpp)
  }

  private val loadedBlooms =
    new java.util.concurrent.ConcurrentHashMap[String, BloomFilter]

  /** Drop memoized filters whose path starts with `pathPrefix` — the
    * [[graft.Tables.invalidate]] counterpart so a long-lived ingest
    * service doesn't pin every old stamp generation forever. */
  def invalidateBlooms(pathPrefix: String): Unit = {
    val it = loadedBlooms.keySet.iterator()
    while (it.hasNext) if (it.next().startsWith(pathPrefix)) it.remove()
  }

  /** Build-or-load the corpus fingerprint bloom as a PERSISTED
    * artifact — the maintained sketch [[fingerprintBloom]]'s doc
    * promises ("built once and updated per ingest, not recomputed"),
    * made real: an incremental-ingest job loads yesterday's filter
    * instead of re-scanning yesterday's corpus. Callers key `path` by
    * a source content stamp ([[graft.Ioops.sourceStamp]]) exactly like
    * the ANN artifacts, so a regenerated corpus rebuilds instead of
    * serving a stale filter. Crash-safe write: serialize to a
    * job-unique `<path>.tmp-<uuid>`, then rename — a half-written file
    * is never trusted (an unreadable artifact rebuilds), and a
    * complete artifact is never deleted by a racing rebuild. Build-then-save and load produce identical
    * probe behavior (the sketch serialization round-trips the bitset
    * verbatim — pinned in SketchArtifactSpec). */
  def bloomOrLoad(df: DataFrame, textCol: String, expected: Long,
                  fpp: Double, path: String): BloomFilter =
    loadedBlooms.computeIfAbsent(path, _ => {
      val conf = df.sparkSession.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      def tryLoad(): Option[BloomFilter] =
        if (!fs.exists(p)) None
        else {
          val in = fs.open(p)
          // any unreadable artifact (truncated stream, checksum
          // mismatch, unknown version header — IllegalArgumentException,
          // not IOException) reads as "no artifact" → rebuild: the safe
          // direction for a staleness/corruption gate
          try Some(BloomFilter.readFrom(in))
          catch { case scala.util.control.NonFatal(_) => None }
          finally in.close()
        }
      tryLoad().getOrElse {
        val bloom = fingerprintBloom(df, textCol, expected, fpp)
        // the shared file-publish protocol
        // ([[graft.Ioops.commitFileAtomic]]): entry-broken capture,
        // job-unique temp (a FIXED `.tmp` name would let two
        // cold-starting JVMs truncate/interleave one inode into
        // published garbage), failed-write cleanup, and
        // adopt-the-winner with a POST-RENAME verification — a rename
        // failing for a non-race reason is loud instead of silently
        // leaving every later cold JVM to rebuild from a corpus scan
        graft.Ioops.commitFileAtomic(fs, p)(out => bloom.writeTo(out))
        bloom
      }
    })

  /** Incremental-dedup pre-filter: keep only documents whose
    * fingerprint is NOT (probably) in `seen`. The serialized filter
    * embeds as a binary literal probed by the native
    * `BloomFilterMightContain` expression — the same codegen'd kernel
    * Spark's runtime bloom join-filters use — so the probe runs inside
    * whole-stage codegen with zero UDFs (the public sketch format and
    * the catalyst expression share `BloomFilterImpl`'s serialization).
    * Exactness contract: every true duplicate is dropped (no false
    * negatives — build and probe hash identically); a false positive
    * drops a genuinely-new doc with probability ≤ fpp — for
    * training-data dedup that trade is almost always right, and the
    * residual can be recovered by routing the dropped stream through
    * exact dedup if it matters. Null-text documents are KEPT — guarded
    * EXPLICITLY, not by probe nullability: xxhash64 skips a null input
    * and returns its seed, so the probe expression itself is never
    * null (a bare probe would test key 42 and drop every null-text
    * row whenever any null ever entered a build — see the matching
    * filter in [[fingerprintBloom]]). Gate null texts upstream if they
    * should not pass at all. */
  def filterUnseen(df: DataFrame, textCol: String, seen: BloomFilter): DataFrame =
    df.filter(col(textCol).isNull || !seenProbe(textCol, seen))

  /** The raw might-contain probe [[filterUnseen]] filters on — exposed
    * so two-phase consumers ([[Dedup.incrementalNew]]) can route the
    * bloom-POSITIVE side into an exact confirm instead of dropping it. */
  def seenProbe(textCol: String, seen: BloomFilter): org.apache.spark.sql.Column =
    fpProbe(TextOps.fingerprint(col(textCol)), seen)

  /** Bloom over an ALREADY-COMPUTED fingerprint column — identical
    * hash domain to [[fingerprintBloom]] (xxhash64 of the
    * fingerprint), for consumers that materialized fingerprints
    * upstream and need the reverse-direction gate (e.g.
    * [[Dedup.incrementalNew]]'s positive-set bloom that restricts the
    * corpus scan). */
  def fpColumnBloom(df: DataFrame, fpCol: org.apache.spark.sql.Column,
                    expected: Long, fpp: Double = 0.01): BloomFilter =
    // one sentinel row keeps the aggregate total: Spark's bloomFilter
    // NPEs on a zero-row input (null buffer), and an empty positive
    // set is the NORMAL case for a dup-free batch. The sentinel key
    // (Long.MinValue) only ever ADMITS hash-colliding rows through the
    // gate — conservative direction, exactness unaffected, because
    // every fpColumnBloom consumer routes positives into an exact
    // confirm (incrementalNew) rather than dropping them. Do NOT feed
    // these filters to [[filterUnseen]]-style drop gates; build those
    // with [[fingerprintBloom]], which is sentinel-free.
    df.select(xxhash64(fpCol).as("fp_h"))
      .unionByName(df.sparkSession.range(1)
        .select(lit(Long.MinValue).as("fp_h")))
      .stat.bloomFilter("fp_h", expected, fpp)

  /** Might-contain probe on an already-computed fingerprint column —
    * the [[seenProbe]] twin for [[fpColumnBloom]]-built filters. */
  def fpProbe(fpCol: org.apache.spark.sql.Column,
              seen: BloomFilter): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val bos = new java.io.ByteArrayOutputStream()
    seen.writeTo(bos)
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray),
      ColumnBridge.expression(xxhash64(fpCol))))
  }

  /** Count-min sketch of token frequencies: `eps` bounds the
    * overestimate (≤ eps · total-token-count with confidence
    * 1 − 1/e^d), memory is width × depth counters regardless of corpus
    * size. Query with `sketch.estimateCount(token)`. */
  def tokenCountMin(df: DataFrame, textCol: String,
                    eps: Double = 0.001, confidence: Double = 0.99,
                    seed: Int = 42): CountMinSketch =
    df.select(explode(TextOps.tokens(col(textCol))).as("token"))
      .stat.countMinSketch("token", eps, confidence, seed)
}
