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

  /** Bloom filter of normalized-document fingerprints (TextOps
    * fingerprint semantics: near-identical-after-normalization ⇒ same
    * key). `expected` sizes the filter; bits ≈ -n·ln(fpp)/ln2². */
  def fingerprintBloom(df: DataFrame, textCol: String,
                       expected: Long, fpp: Double = 0.01): BloomFilter =
    df.select(TextOps.fingerprint(col(textCol)).as("fp"))
      .stat.bloomFilter("fp", expected, fpp)

  /** Incremental-dedup pre-filter: keep only documents whose
    * fingerprint is NOT (probably) in `seen`. The filter broadcasts
    * with the closure — one serialized bitset, not a corpus join side.
    * Exactness contract: every true duplicate is dropped (no false
    * negatives); a false positive drops a genuinely-new doc with
    * probability ≤ fpp — for training-data dedup that trade is almost
    * always right, and the residual can be recovered by routing the
    * dropped stream through exact dedup if it matters. */
  def filterUnseen(df: DataFrame, textCol: String, seen: BloomFilter): DataFrame = {
    // a JVM UDF is the deliberate exception to the no-UDF rule here:
    // the public sketch API has no Column-level probe (the catalyst
    // BloomFilterMightContain expression is internal to runtime row
    // filtering), and the probe body is a handful of hash ops against
    // a closure-broadcast bitset — not a per-row interpreter hop worth
    // a custom expression
    val mightContain = udf((fp: String) => seen.mightContainString(fp))
    df.withColumn("__fp", TextOps.fingerprint(col(textCol)))
      .filter(!mightContain(col("__fp")))
      .drop("__fp")
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
