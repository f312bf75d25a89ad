package graft.sim

import org.apache.spark.ml.clustering.KMeansModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Exec, Exprs}

/** IVF-PQ: the deployed shape of product-quantized ANN search —
  * [[Ivf]]'s coarse quantizer prunes the corpus to the `nprobe` cells
  * nearest each query, and [[Pq]] ADC scores ONLY the codes inside
  * those cells, then exact cosine reranks the per-query shortlist.
  *
  * Why the composition (vs flat [[Pq.adcTopK]]): flat ADC's cost stays
  * LINEAR in the corpus per query batch — every corpus row's codes are
  * decoded and scored against every query. That is the correct PQ
  * primitive, but past broadcast scale nobody deploys it; IVF-PQ cuts
  * the scored fraction to ≈ nprobe/k_cells while the PQ codes cut the
  * bytes per scored row (m bytes vs dim·4). The two knobs are
  * independent: cells bound WHICH rows are touched, codes bound what
  * touching a row COSTS.
  *
  * Scale shape: the index build (cell + codes per row) is a WRITE-path
  * pass — one scan, two pure projections (broadcast centroids, literal
  * codebooks), no shuffle — and is what a 100 TB deployment stores,
  * partitioned/bucketed by `cell` so a probed-cell read is partition
  * pruning, not a filter. The search side joins the tiny probes frame
  * (|queries| × nprobe rows, BROADCAST) against the index on `cell`,
  * so non-probed rows fall out of the hash join before any decode
  * arithmetic runs; ADC scoring and the shortlist window see only the
  * probed fraction. Exact vectors are read once more for the
  * broadcast-shortlist rerank ([[Pq.exactRerank]]).
  *
  * Recall contract: a true neighbor OUTSIDE the probed cells is never
  * seen (the IVF tradeoff — raise `nprobe`), and within probed cells
  * the ADC ordering is approximate (the PQ tradeoff — raise
  * `shortlist`); IvfPqSpec pins both regimes on planted clusters.
  * May return fewer than k rows per query (see [[Pq.exactRerank]]). */
object IvfPq {

  /** Canonical index row: `cell` (IVF partition key), `neighbor_id`,
    * `vec` (raw vector, for exact scoring/rerank), `norm` (its L2,
    * precomputed at build — one sqrt per row paid once instead of per
    * search), `pq_codes`. The search paths column-prune what they
    * don't read (PQ scoring never loads `vec`; exact-IVF scoring never
    * loads `pq_codes`). */
  def buildIndex(corpus: DataFrame, idCol: String, vecCol: String,
                 model: KMeansModel, cb: Pq.Codebooks): DataFrame =
    Pq.encode(Ivf.assignCells(corpus, vecCol, model), vecCol, cb)
      .select(col("cell"), col(idCol).as("neighbor_id"),
        col(vecCol).as("vec"), Similarity.l2Norm(col(vecCol)).as("norm"),
        col("pq_codes"))

  private val indexMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), DataFrame]

  /** Build-or-load the MATERIALIZED index table — the artifact a
    * deployment stores at ingest (the module doc's write-path pass),
    * not a per-query recomputation: one scan + two pure projections,
    * written partitioned by `cell` so a probed-cell read is partition
    * pruning. Callers key `path` by source content stamp (same
    * staleness rule as the quantizer artifacts); the per-JVM memo
    * skips even the re-read. Fresh-build-then-read and warm load serve
    * byte-identical rows (parquet round trip), so search results
    * cannot depend on which path ran. */
  def ensureIndex(corpus: DataFrame, idCol: String, vecCol: String,
                  model: KMeansModel, cb: Pq.Codebooks, path: String): DataFrame =
    indexMemo.computeIfAbsent((corpus.sparkSession, path), _ => {
      val spark = corpus.sparkSession
      val success = new org.apache.hadoop.fs.Path(s"$path/_SUCCESS")
      val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // integrity probe with rebuild-on-mismatch — the ensureBigramModel
      // / ensurePairGraph doctrine: an unreadable or wrong-schema
      // directory behind a surviving _SUCCESS (truncated part file,
      // external tamper, the residual crash window of a lost local-FS
      // publish race nesting a temp dir inside the artifact) REBUILDS
      // instead of being trusted — and the rebuild's commitDirAtomic
      // entry rule replaces the broken directory, so pollution
      // self-heals on the next load instead of failing every read.
      // Column SET, not sequence: `cell` is a partition column and its
      // resolved position is a layout detail.
      val want = Set("cell", "neighbor_id", "vec", "norm", "pq_codes")
      def tryLoad(): Option[DataFrame] =
        if (!fs.exists(success)) None
        else try {
          val df = spark.read.parquet(path)
          if (df.columns.toSet == want) Some(df) else None
        } catch { case scala.util.control.NonFatal(_) => None }
      tryLoad().getOrElse {
        // atomic publish (Ioops.commitDirAtomic): two JVMs racing the
        // same stamp cannot interleave part files under one _SUCCESS —
        // a mixed index directory duplicates shortlist candidates
        graft.Ioops.commitDirAtomic(spark, path)(tmp =>
          buildIndex(corpus, idCol, vecCol, model, cb)
            .write.mode("overwrite").partitionBy("cell").parquet(tmp))
        tryLoad().getOrElse(throw new IllegalStateException(
          s"IVF-PQ index artifact unreadable immediately after build: $path"))
      }
    })

  /** Drop memoized index frames whose path starts with `pathPrefix` —
    * the [[graft.Tables.invalidate]] counterpart for long-lived
    * sessions over a regenerated corpus (same hook contract as
    * [[graft.text.Dedup.invalidatePairGraphs]]). */
  def invalidateIndexes(pathPrefix: String): Unit = {
    val it = indexMemo.keySet.iterator()
    while (it.hasNext) if (it.next()._2.startsWith(pathPrefix)) it.remove()
  }

  /** ANN top-k through both pruning stages. `model` and `cb` follow the
    * same train-once/probe-many S5 life cycle as their single-stage
    * queries ([[Ivf.fitOrLoad]], [[Pq.fitOrLoad]] — fit on a bounded
    * sample, persist, load everywhere else). This overload builds the
    * index inline (tests / one-shot jobs); production passes the
    * persisted index via the `indexed` overload below. */
  def topK(corpus: DataFrame, idCol: String, vecCol: String,
           queries: DataFrame, model: KMeansModel, cb: Pq.Codebooks,
           k: Int = 3, nprobe: Int = 2, shortlist: Int = 50): DataFrame = {
    // Materialized for the same reason as Pq.adcTopK — decode's lambda
    // references pq_codes and CollapseProject would otherwise inline the
    // whole argmin encode into it, re-running the m·k distance scan per
    // subspace reference.
    val indexed = Exec.materialize(
      buildIndex(corpus, idCol, vecCol, model, cb)
        .select(col("cell"), col("neighbor_id"), col("pq_codes")))
    topKIndexed(corpus, idCol, vecCol, queries, indexed, model, cb,
      k, nprobe, shortlist)
  }

  /** Search against a pre-built index frame ([[ensureIndex]] /
    * [[buildIndex]] schema). */
  def topKIndexed(corpus: DataFrame, idCol: String, vecCol: String,
                  queries: DataFrame, indexedFull: DataFrame,
                  model: KMeansModel, cb: Pq.Codebooks,
                  k: Int = 3, nprobe: Int = 2, shortlist: Int = 50): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val indexed = indexedFull.select(col("cell"), col("neighbor_id"), col("pq_codes"))
    val probes = Ivf.probeCells(queries, idCol, vecCol, model, nprobe)
      .select(col("query_id"),
        Pq.normalizedBy(col("q_vec"), col("q_norm")).as("q_nvec"), col("cell"))
    // equi-join on cell, probes broadcast: corpus rows in non-probed
    // cells are discarded by the hash join before decode runs
    val scored = broadcast(probes).join(indexed, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Exprs.r4(Similarity.dot(col("q_nvec"),
          Pq.decode(col("pq_codes"), cb))).as("approx_cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_cos").desc, col("neighbor_id").asc)
    val short = scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    Pq.exactRerank(corpus, idCol, vecCol, queries, short, k)
  }
}
