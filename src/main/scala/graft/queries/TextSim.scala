package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Exprs.{r2, r4}
import graft.text.{Dedup, TextOps}
import graft.sim.{Ivf, Similarity}
import graft.multimodal.Multimodal

/** Extension-surface queries: dedup, text analysis, similarity search,
  * multimodal plumbing — the training-data-pipeline operators over the
  * `documents` / `embeddings` testdata tables (BASELINE.json north star;
  * SURVEY.md §7.2 step 7).
  */
object TextSim {
  import Relational.Q

  /** One stamp read per query construction ([[graft.Ioops.sourceStamp]]
    * over the embeddings table): the stamp keys every ANN artifact path
    * below so an in-place regeneration resolves to NEW artifacts
    * instead of silently serving stale centroids/codebooks/index rows
    * (tmp-dir scoped: the artifacts are a cache — a lake deployment
    * would point these at the warehouse and stamp at ingest). The
    * stamp also rides the in-memory memo keys (it is part of each
    * path), so a long-lived session refits after regeneration too.
    * Callers that touch SEVERAL artifacts must read the stamp ONCE and
    * thread it through ([[annIndex]]): independent reads racing a
    * regeneration could persist a mixed-generation composite (a
    * stamp-A model inside a stamp-B index) that every later session
    * would trust. */
  private def embStamp(s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.Ioops.sourceStamp(s, s"$d/embeddings.parquet")

  /** ANN index shape — ONE definition each (the Minhash* constants
    * pattern): the fit sites, the artifact path names, and
    * [[oracleSubstitutions]]'s path derivation all read these, so a
    * retuned cell count or codebook shape moves the oracle's artifact
    * path together with the engine's instead of desyncing them
    * (parameters-next-to-artifacts). */
  private[graft] val IvfCells = 16
  private[graft] val PqM = 8
  private[graft] val PqK = 32

  /** The testdata embedding dimensionality the ANN oracles PIN (sign
    * matrices, PQ subspace slicing). The engine itself is
    * dim-agnostic; the oracles are not — an off-design corpus with a
    * different dim fails them loudly (mismatched codebook header /
    * zip-length) rather than silently. */
  private[graft] val EmbDim = 64
  private val PqSub = EmbDim / PqM

  /** Hashing-trick TF-vector dimensionality — ONE definition for the
    * `ensureTfVectors` call, the artifact path (dim is encoded in the
    * name, so a retune generates a fresh artifact instead of serving a
    * stale one whose schema probe still passes), and the sign-matrix
    * width of the `text_tf_cosine_neardup` oracle (a width mismatch
    * would NULL-pad DuckDB's list_zip and silently zero every bucket).
    * Equal to [[EmbDim]] today by coincidence, not by contract. */
  private[graft] val TfDim = 64

  /** SimHash banding budget — ONE definition for the engine call and
    * the oracle's chunk arithmetic (chunks = maxHamming + 1; the
    * oracle's even-width chunk extraction requires 64 % chunks == 0,
    * which the require pins at init). */
  private[graft] val SimhashMaxHamming = 3
  private val SimhashChunks = SimhashMaxHamming + 1
  private val SimhashWidth = 64 / SimhashChunks
  require(64 % SimhashChunks == 0,
    s"simhash oracle assumes even chunk widths: 64 % $SimhashChunks != 0")

  /** Quantizer artifact location, keyed by source dir + k (different
    * scale factors never share an index) + the source stamp. */
  private def ivfQuantizerPath(d: String, k: Int, stamp: String): String =
    System.getProperty("java.io.tmpdir") + "/graft-models/ivf_k" + k + "_" +
      d.replaceAll("[^A-Za-z0-9.]", "_") + "_" + stamp

  /** PQ codebook artifact location — same life cycle and keying rules
    * as [[ivfQuantizerPath]]; shared by every PQ-consuming query so
    * the fit happens once per (source, shape). */
  private def pqCodebookPath(d: String, stamp: String): String =
    System.getProperty("java.io.tmpdir") +
      s"/graft_pq_${d.replaceAll("[^A-Za-z0-9]", "_")}/cb_m${PqM}k${PqK}_" + stamp

  /** Materialized IVF-PQ index table location — same keying rules. */
  private def ivfPqIndexPath(d: String, stamp: String): String =
    System.getProperty("java.io.tmpdir") + s"/graft-models/ivfpq_idx_k${IvfCells}m${PqM}_" +
      d.replaceAll("[^A-Za-z0-9.]", "_") + "_" + stamp

  /** One stamp read over the DOCUMENTS table — same read-once-and-
    * thread rule as [[embStamp]]: a query touching several
    * documents-derived artifacts must not let a racing regeneration
    * mix generations. */
  private def docStamp(s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.Ioops.sourceStamp(s, s"$d/documents.parquet")

  /** Bigram-LM count-table artifact ([[TextOps.ensureBigramModel]]) —
    * `slice` names the training subset ("all", "src012"). */
  private def bigramLmPath(d: String, slice: String, stamp: String): String =
    System.getProperty("java.io.tmpdir") + s"/graft-models/bigram_lm_${slice}_" +
      d.replaceAll("[^A-Za-z0-9.]", "_") + "_" + stamp

  /** Corpus fingerprint-bloom artifact for the incremental-ingest
    * admission query — stamped on the DOCUMENTS table (its source),
    * with the corpus-slice discriminator in the name. */
  private def corpusBloomPath(d: String, stamp: String): String =
    System.getProperty("java.io.tmpdir") + "/graft-models/corpus_bloom_even_" +
      d.replaceAll("[^A-Za-z0-9.]", "_") + "_" + stamp

  /** n-gram Jaccard pair-graph artifact ([[Dedup.ensurePairGraph]]) —
    * parameters in the name (a different n or threshold is a different
    * artifact), stamped on the documents table. */
  private def pairGraphPath(d: String, stamp: String): String =
    System.getProperty("java.io.tmpdir") + "/graft-models/ngram_pairs_n3_t05_" +
      d.replaceAll("[^A-Za-z0-9.]", "_") + "_" + stamp

  /** Cross-document span blocklist artifact
    * ([[Dedup.ensureSpanBlocklist]]) — window/minDocs in the name,
    * stamped on the documents table. */
  private def spanBlocklistPath(d: String, stamp: String): String =
    System.getProperty("java.io.tmpdir") + "/graft-models/spans_w4_m2_" +
      d.replaceAll("[^A-Za-z0-9.]", "_") + "_" + stamp

  /** Benchmark (eval-set) distinct shingle-hash artifact
    * ([[Dedup.ensureShingleSet]]) — the planted-benchmark selector
    * (doc_id % 20 = 0) and n in the name, stamped on the documents
    * table. */
  private def benchShinglesPath(d: String, stamp: String): String =
    System.getProperty("java.io.tmpdir") + "/graft-models/bench_sh_mod20_n3_" +
      d.replaceAll("[^A-Za-z0-9.]", "_") + "_" + stamp

  /** The persisted benchmark shingle set `text_decontaminate` and
    * `text_contamination_score` probe: an eval set changes once per
    * benchmark release while the corpus is scored continuously, so its
    * explode+distinct(+collect) prep is ingest work, not
    * per-decision-query work — formerly both queries re-derived and
    * re-collected the set per invocation (the one driver-vs-cold bench
    * outlier in round 8: 3.05s driver vs 0.54s cold on
    * `text_contamination_score`, almost all of it this prep). */
  private[graft] def benchShingles(s: org.apache.spark.sql.SparkSession,
                                   d: String): org.apache.spark.sql.DataFrame =
    Dedup.ensureShingleSet(
      Tables.documents(s, d).filter(col("doc_id") % 20 === 0),
      "doc_id", "text", n = 3, benchShinglesPath(d, docStamp(s, d)))

  /** SimHash signature artifact ([[Dedup.ensureSimhashSigs]]) —
    * parameter-free 64-bit signatures, stamped on the documents
    * table. */
  private def simhashSigsPath(d: String, stamp: String): String =
    System.getProperty("java.io.tmpdir") + "/graft-models/simhash_sigs_" +
      d.replaceAll("[^A-Za-z0-9.]", "_") + "_" + stamp

  /** The persisted SimHash signature table `dedup_simhash_neardup`
    * bands — signatures are ingest work (stored next to the corpus in
    * any deployed simhash dedup), and the oracle re-derives banding,
    * hamming, and the threshold from this same table. */
  private[graft] def simhashSigs(s: org.apache.spark.sql.SparkSession,
                                 d: String): org.apache.spark.sql.DataFrame =
    Dedup.ensureSimhashSigs(Tables.documents(s, d), "doc_id", "text",
      simhashSigsPath(d, docStamp(s, d)))

  /** TF-vector artifact ([[TextOps.ensureTfVectors]]) — dim in the
    * name, stamped on the documents table. */
  private def tfVecsPath(d: String, stamp: String): String =
    System.getProperty("java.io.tmpdir") + s"/graft-models/tf_vecs_d${TfDim}_" +
      d.replaceAll("[^A-Za-z0-9.]", "_") + "_" + stamp

  /** The persisted TF-vector table `text_tf_cosine_neardup` bands —
    * same ingest-artifact rule as [[simhashSigs]]; the oracle
    * re-derives buckets/blocking/cosine/threshold from this table. */
  private[graft] def tfVecs(s: org.apache.spark.sql.SparkSession,
                            d: String): org.apache.spark.sql.DataFrame =
    TextOps.ensureTfVectors(Tables.documents(s, d), "doc_id", "text",
      dim = TfDim, tfVecsPath(d, docStamp(s, d)))

  /** The persisted boilerplate span table `text_span_crossdup` emits
    * and `text_span_coverage` probes — one span-keyed corpus shuffle
    * per generation, at ingest. */
  private[graft] def spanBlocklist(s: org.apache.spark.sql.SparkSession,
                                   d: String): org.apache.spark.sql.DataFrame =
    Dedup.ensureSpanBlocklist(Tables.documents(s, d), "text",
      window = 4, minDocs = 2L, spanBlocklistPath(d, docStamp(s, d)))

  /** The shared (pairs, components) pair-graph artifact every exact
    * n-gram dedup DECISION query loads — `dedup_ngram_jaccard` (the
    * pair report), `dedup_components` (cluster assignment), and
    * `dedup_cluster_rep` (per-cluster keeper choice) formerly each
    * re-ran the shingle-blocked self-join + star rounds from scratch;
    * now the graph is built once per corpus generation (Bench builds
    * it in setup, next to the ANN index) and the three rows are
    * loads + cheap joins. */
  private[graft] def ngramPairGraph(s: org.apache.spark.sql.SparkSession,
                                      d: String):
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    Dedup.ensurePairGraph(Tables.documents(s, d), "doc_id", "text",
      n = 3, threshold = 0.5, pairGraphPath(d, docStamp(s, d)))

  /** The MinHash/LSH family's shared generator parameters — one
    * definition for the candidate queries AND their soundness
    * witnesses, so a retune cannot drift them apart. */
  private[graft] val MinhashNumHashes = 16
  private[graft] val MinhashBands = 4
  private[graft] val MinhashMinEstimate = 0.5

  /** MinHash/LSH pair-graph artifact ([[Dedup.ensureMinhashPairGraph]])
    * — parameters DERIVED from the Minhash* constants (not a hardcoded
    * copy: the stamp only covers the documents table, so a retuned
    * constant must change the PATH or an old-parameter artifact would
    * be silently served), stamped on the documents table. */
  private def minhashPairGraphPath(d: String, stamp: String): String =
    System.getProperty("java.io.tmpdir") +
      s"/graft-models/mh_pairs_h${MinhashNumHashes}_b${MinhashBands}" +
      s"_e${math.round(MinhashMinEstimate * 100)}_" +
      d.replaceAll("[^A-Za-z0-9.]", "_") + "_" + stamp

  /** The persisted (pairs, components) MinHash pair graph — the same
    * build-once-at-ingest rule as [[ngramPairGraph]], applied to the
    * generator that actually runs at 100 TB: `dedup_minhash_lsh`,
    * `dedup_lsh_sound`, `dedup_minhash_components`, and
    * `dedup_minhash_comp_sound` formerly each re-ran the banded
    * self-join (and the component queries the star rounds) from
    * scratch per scoreboard row. */
  private[graft] def minhashPairGraph(s: org.apache.spark.sql.SparkSession,
                                      d: String):
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    Dedup.ensureMinhashPairGraph(Tables.documents(s, d), "doc_id", "text",
      MinhashNumHashes, MinhashBands, MinhashMinEstimate,
      minhashPairGraphPath(d, docStamp(s, d)))

  /** The persisted index rows (cell, neighbor_id, vec, norm, pq_codes)
    * every index-consuming search query probes. One stamp read covers
    * all three artifacts, so the composite is generation-consistent by
    * construction. Note the coupling: the index carries PQ codes, so
    * pure-IVF consumers transitively require the PQ shape (dim % 8 ==
    * 0 here) — standalone [[graft.sim.Ivf]] remains available for
    * corpora where that doesn't hold. */
  private def annArtifacts(s: org.apache.spark.sql.SparkSession, d: String):
      (org.apache.spark.ml.clustering.KMeansModel, graft.sim.Pq.Codebooks,
        org.apache.spark.sql.DataFrame) = {
    val stamp = embStamp(s, d)
    val emb = Tables.embeddings(s, d)
    val model = Ivf.fitOrLoad(emb, "embedding", IvfCells, ivfQuantizerPath(d, IvfCells, stamp))
    val cb = graft.sim.Pq.fitOrLoad(emb, "embedding", m = PqM, k = PqK,
      pqCodebookPath(d, stamp))
    val idx = graft.sim.IvfPq.ensureIndex(emb, "vec_id", "embedding", model, cb,
      ivfPqIndexPath(d, stamp))
    (model, cb, idx)
  }

  /** Build (or load) every ANN index artifact the scoreboard queries
    * probe — the IVF coarse quantizer (k=16), the PQ codebooks
    * (m=8, k=32), and the materialized index table (cell + codes +
    * norms per row) — WITHOUT running any query. Index build is
    * write-path work (`sim/IvfPq.scala` doctrine): a deployment pays
    * it at ingest, so Bench pays it in setup (next to the bucketed
    * table writes) rather than inside whichever measured query happens
    * to probe first in a cold environment. Idempotent: warm artifacts
    * load in milliseconds. */
  def prebuildIndexes(s: org.apache.spark.sql.SparkSession, d: String): Unit = {
    annArtifacts(s, d)
    // corpus bloom for the incremental-ingest admission (same
    // write-path doctrine: a deployment updates it per ingest).
    // Documents is optional in a source dir (embeddings-only fixtures
    // exist): skip the sketch when the table is absent.
    val docsPath = new org.apache.hadoop.fs.Path(s"$d/documents.parquet")
    val fs = docsPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(docsPath)) {
      val docs = Tables.documents(s, d)
      val stamp = docStamp(s, d)
      graft.text.CorpusSketches.bloomOrLoad(
        docs.filter(col("doc_id") % 2 === 0), "text",
        expected = 200000L, fpp = 0.01, corpusBloomPath(d, stamp))
      // bigram-LM count tables (text_bigram_nll / text_dsir_weight)
      TextOps.ensureBigramModel(docs, "text", bigramLmPath(d, "all", stamp))
      TextOps.ensureBigramModel(
        docs.filter(col("source").isin("src0", "src1", "src2")), "text",
        bigramLmPath(d, "src012", stamp))
      // n-gram pair graph + components (the exact-dedup decision rows)
      ngramPairGraph(s, d)
      // MinHash/LSH pair graph + components (the at-scale generator)
      minhashPairGraph(s, d)
      // boilerplate span table (the C4-style strip/coverage blocklist)
      spanBlocklist(s, d)
      // benchmark shingle set (decontaminate / contamination-score)
      benchShingles(s, d)
      // simhash signature table (dedup_simhash_neardup)
      simhashSigs(s, d)
      // TF-vector table (text_tf_cosine_neardup)
      tfVecs(s, d)
    }
    ()
  }

  /** Attribution profile for the `dedup_incremental` benchmark row
    * (VERDICT r13 #1, dev/BENCH_NORM_r14.md): the same work the
    * scoreboard query does, split into its artifact-load and
    * admission-compute phases with per-phase wall printed to stderr.
    * Dev instrumentation behind Bench's SPARK_GRAFT_BENCH_PHASES knob —
    * running it warms the query's whole path, so never on a gate
    * leg. */
  def dedupIncrementalPhases(s: org.apache.spark.sql.SparkSession, d: String): Unit = {
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(
        f"[bench] phases dedup_incremental/$name%-10s ${(System.nanoTime() - t0) / 1e9}%7.3fs")
      r
    }
    val docs = Tables.documents(s, d)
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val bloom = t("bloom_load")(graft.text.CorpusSketches.bloomOrLoad(
      corpus, "text", expected = 200000L, fpp = 0.01,
      corpusBloomPath(d, docStamp(s, d))))
    t("admission")(graft.text.Dedup.incrementalNew(
      corpus, docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
      bloom, expected = 200000L, fpp = 0.01).count())
    ()
  }

  /** Artifact-path substitutions for the persisted-index oracles: the
    * `sim_ivf_topk` oracle re-derives the probed-cell top-k in DuckDB
    * from the SAME persisted artifacts the engine probes (quantizer
    * centers + index rows — both plain parquet), but the stamped paths
    * are only known once a source dir is fixed. [[graft.Verify]]
    * replaces these tokens in every oracle value before dumping
    * `oracle_sql.json`, so the driver's DuckDB run resolves the right
    * generation at any scale factor. Independence is preserved: DuckDB
    * recomputes centroid distances, cosines, rounding, and ranking
    * with its own fold — only the KMeans geometry (unreproducible in
    * SQL) is read from the artifact, and the index rows it reads are
    * exactly what a corrupt/stale-index bug would poison, so the
    * oracle still catches cell-join and staleness defects. */
  private[graft] def oracleSubstitutions(
      s: org.apache.spark.sql.SparkSession, d: String): Map[String, String] = {
    val stamp = embStamp(s, d)
    val dstamp = docStamp(s, d)
    Map(
      "__IVF_QUANT_DATA__" -> (ivfQuantizerPath(d, IvfCells, stamp) + "/data/*.parquet"),
      "__IVFPQ_IDX__" -> (ivfPqIndexPath(d, stamp) + "/*/*.parquet"),
      "__PQ_CB__" -> pqCodebookPath(d, stamp),
      "__MH_SIGS__" -> (minhashPairGraphPath(d, dstamp) + "/signatures/*.parquet"),
      "__SH_SIGS__" -> (simhashSigsPath(d, dstamp) + "/*.parquet"),
      "__TF_VECS__" -> (tfVecsPath(d, dstamp) + "/*.parquet"))
  }

  /** The LSH plane-sign matrix as a DuckDB VALUES literal — the one
    * murmur3-derived input the LSH near-dup oracles cannot recompute
    * in SQL. For a fixed (planes, dim) the signs are constants
    * ([[Similarity.lshSignMatrix]] — pinned against the live Spark
    * `hash()` in SimilaritySpec), so the oracle embeds them and
    * re-folds the bucket bits itself: bucket membership, blocking,
    * cosine, rounding, and the threshold all re-derived by DuckDB. */
  private def lshSignsValues(planes: Int, dim: Int): String =
    graft.sim.Similarity.lshSignMatrix(planes, dim).zipWithIndex.map { case (row, p) =>
      s"($p, [${row.map(v => if (v > 0) "1.0" else "-1.0").mkString(", ")}])"
    }.mkString(", ")

  /** `sim_ivf_neardup` uses the engine default planes=8;
    * `sim_lsh_neardup` uses planes=4 — both over the embedding dim.
    * `text_tf_cosine_neardup` folds TF vectors, so its matrix width is
    * [[TfDim]] (same value today, separate definition by design). */
  private lazy val LshSignsValues: String = lshSignsValues(8, EmbDim)
  private lazy val LshSigns4Values: String = lshSignsValues(4, EmbDim)
  private lazy val LshSignsValuesTf: String = lshSignsValues(8, TfDim)

  /** Shared pairing-eligibility CTE for the exact-cosine near-dup
    * oracles — mirrors the engine's materialized projection: fold-form
    * norm so a NULL vector or NULL element yields a NULL norm (DuckDB's
    * list_dot_product raises instead), and `norm > 0` for the zero-norm
    * never-pairs contract. */
  private val EmbNormCte: String =
    """v AS (
      |  SELECT * FROM (
      |    SELECT vec_id, label, embedding::DOUBLE[] AS vec,
      |      sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
      |        (a, b) -> a + b)) AS norm
      |    FROM embeddings)
      |  WHERE norm > 0)""".stripMargin

  /** Shared CTE chain re-deriving the MinHash pair graph in DuckDB
    * from the PERSISTED signature table (`__MH_SIGS__`, resolved by
    * Verify): band keys by SUB-SIGNATURE EQUALITY (the engine hashes
    * the sub-signature to a 32-bit band key — identical grouping up
    * to hash collisions between distinct sub-signatures, the banding
    * join's own accepted bound), candidate pairs, the
    * agreement-fraction estimate, and the threshold. Parameters
    * derived from the Minhash* constants. Used by the
    * `dedup_minhash_lsh` oracle and (via the recursive components
    * head) `dedup_minhash_components` in [[Curate]]. */
  private[queries] lazy val MhPairsCte: String = {
    val perBand = MinhashNumHashes / MinhashBands
    s"""sig AS (SELECT doc_id, signature FROM '__MH_SIGS__'),
       |banded AS (
       |  SELECT doc_id, b AS band,
       |    list_slice(signature, b * $perBand + 1, b * $perBand + $perBand) AS bkey
       |  FROM sig, generate_series(0, ${MinhashBands - 1}) t(b)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |pairs AS (
       |  SELECT id_a, id_b, est_jaccard FROM (
       |    SELECT id_a, id_b,
       |      floor(CAST(len(list_filter(list_zip(sa.signature, sb.signature),
       |        z -> z[1] = z[2])) AS DOUBLE) / ${MinhashNumHashes}
       |        * 10000.0 + 0.5) / 10000.0 AS est_jaccard
       |    FROM cand JOIN sig sa ON sa.doc_id = cand.id_a
       |    JOIN sig sb ON sb.doc_id = cand.id_b)
       |  WHERE est_jaccard >= $MinhashMinEstimate)""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    // Exact dedup by content hash (hash-groupBy; one shuffle).
    "dedup_exact" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d), "doc_id", "text")),

    // Exact n-gram Jaccard near-dup pairs (shingle blocking self-join,
    // served from the persisted pair-graph artifact — see
    // [[ngramPairGraph]]; the blocked self-join runs once per corpus
    // generation at ingest, not per decision query).
    "dedup_ngram_jaccard" -> ((s, d) => ngramPairGraph(s, d)._1),

    // Incremental-ingest admission (Dedup.incrementalNew): even doc_ids
    // play yesterday's corpus, odd ids today's batch; the corpus bloom
    // gates the batch scan-locally and only bloom positives reach the
    // exact anti-join — result bit-identical to the plain anti-join the
    // oracle runs.
    "dedup_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.filter(col("doc_id") % 2 === 0)
      // corpus bloom = maintained artifact (bloomOrLoad): built at
      // ingest, loaded by every later admission run — the corpus is
      // then touched only by the reverse-gated exact confirm
      Dedup.incrementalNew(
        corpus,
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text",
        graft.text.CorpusSketches.bloomOrLoad(corpus, "text",
          expected = 200000L, fpp = 0.01,
          corpusBloomPath(d, docStamp(s, d))),
        expected = 200000L, fpp = 0.01)
    }),

    // MinHash+LSH candidate pairs, served from the persisted pair
    // graph. Full value oracle: the artifact now persists the
    // SIGNATURE table too (the murmur3 minhash kernel stays
    // engine-side, pinned by dedup_minhash_agree), and DuckDB
    // re-derives banding (by sub-signature equality), the candidate
    // join, the agreement-fraction estimate, and the threshold from
    // those signatures. Property-tested in DedupSpec.
    "dedup_minhash_lsh" -> ((s, d) => minhashPairGraph(s, d)._1),

    // SimHash 64-bit signatures — exposed as a driver-witnessed
    // self-consistency differential: the zero-shuffle native kernel vs
    // the explode+groupBy executable spec, compared per doc. The raw
    // signatures are xxhash64-dependent (no DuckDB oracle), but the
    // AGREEMENT bit is oracle-checkable (all 1s over token-bearing
    // docs), so the scoreboard — not just SigKernelsSpec — catches any
    // kernel/spec divergence.
    "dedup_simhash" -> ((s, d) => {
      // uniqueKeyed: the per-row kernel and the per-key grouped spec
      // only agree where doc_id is a real key (see Joins.uniqueKeyed)
      val docs = graft.ops.Joins.uniqueKeyed(Tables.documents(s, d), "doc_id")
      val native = Dedup.simhash(docs, "doc_id", "text")
      val spec = Dedup.simhashGrouped(docs, "doc_id", "text")
        .withColumnRenamed("simhash", "simhash_spec")
      native.join(spec, Seq("doc_id"))
        .select(col("doc_id"),
          (col("simhash") === col("simhash_spec")).cast("int").as("sigs_agree"))
    }),

    // SimHash near-dup pairs via pigeonhole chunk banding over the
    // PERSISTED signature table (signatures are ingest work; banding
    // is the per-decision cost). Full value oracle: the xxhash64
    // token hashing stays engine-side in the artifact (kernel-vs-spec
    // pinned by `dedup_simhash`), and DuckDB re-derives chunk
    // banding, the bucket join, hamming, and the threshold from the
    // same persisted signatures. DedupSpec additionally proves
    // banding == brute-force hamming.
    "dedup_simhash_neardup" -> ((s, d) =>
      Dedup.simhashNearDupFromSigs(simhashSigs(s, d), "doc_id", maxHamming = SimhashMaxHamming)),

    // Benchmark decontamination: drop corpus docs sharing >= 5 distinct
    // 3-gram fingerprints with the planted "eval set" (doc_id % 20 = 0).
    // Broadcast benchmark shingles; corpus never shuffles on content.
    "text_decontaminate" -> ((s, d) =>
      Dedup.decontaminateAgainst(Tables.documents(s, d), benchShingles(s, d),
        "doc_id", "text", n = 3, minCommon = 5)
        .select(col("doc_id"), col("lang"))),

    // Graded decontamination (Dedup.contaminationScore): per-doc
    // fraction of distinct 3-gram shingles found in the benchmark —
    // threshold/rank/monitor instead of binary drop. Broadcast-probe
    // marker join + ONE doc-keyed aggregate; the oracle recomputes
    // the fraction over textual shingles.
    "text_contamination_score" -> ((s, d) =>
      Dedup.contaminationScoreAgainst(Tables.documents(s, d),
        benchShingles(s, d), "doc_id", "text", n = 3)),

    // Exact corpus heavy hitters: top-20 tokens by frequency with a
    // deterministic tie-break — explode + partial-aggregated count +
    // TakeOrderedAndProject (no full sort; the top-k heap merges
    // map-side). The count-min sketch (CorpusSketches.tokenCountMin) is
    // the bounded-memory scale path when the vocabulary itself is huge.
    "text_top_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(20)),

    // Heavy-hitter GUARANTEE witness: freqItems (lossy counting — fixed
    // memory regardless of vocabulary size, the scale path exact top-k
    // can't take) promises NO false negatives above the support
    // threshold. The query surfaces exactly that: every token whose
    // exact frequency exceeds support·N, with a bit asserting the
    // sketch's candidate set contained it. The candidate SET itself is
    // merge-order-dependent (extra false positives allowed); the
    // guarantee bit is deterministic, so the scoreboard can pin it.
    "text_heavy_hitters_gate" -> ((s, d) => {
      val support = 0.001
      val tok = Tables.documents(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("token"))
      val candidates = tok.stat.freqItems(Seq("token"), support)
        .head().getSeq[String](0).toSet
      val exact = tok.groupBy(col("token")).agg(count(lit(1)).as("n"))
      // SUM over an empty aggregate is NULL — getLong on it throws
      // ROW_VALUE_IS_NULL (degenerate-cardinality sweep, r10); an
      // empty corpus has zero total and no hitters
      val total = exact.agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0)
      // candidate membership as a codegen'd InSet literal — no UDF
      // (lossy counting bounds the candidate list at 1/support items)
      exact.filter(col("n") > lit(support * total))
        .select(col("token"), col("n"),
          col("token").isin(candidates.toSeq: _*).cast("int").as("in_sketch"))
    }),

    // Token counting (whitespace tokenizer).
    "text_token_count" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"))),

    // BPE-ish regex token counting (LLM-budget proxy; letter/digit/punct
    // runs with optional leading space).
    "text_bpeish_count" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextOps.bpeishTokenCount(col("text")).as("n_bpeish"),
        TextOps.tokenCount(col("text")).as("n_words"))),

    // Quality scoring: length + stopword ratio + alpha ratio.
    // DSIR-style importance weight (TextOps.dsirWeight): score every
    // document under the corpus bigram LM and under a TARGET-domain LM
    // (sources src0-2 play the target); the NLL gap ranks documents by
    // domain affinity — the data-selection signal for building a
    // domain-weighted training mix.
    "text_dsir_weight" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // both LMs are persisted count-table artifacts (train at ingest,
      // score everywhere — ensureBigramModel life cycle); ONE stamp
      // read keeps the pair generation-consistent under a racing
      // in-place regeneration
      val stamp = docStamp(s, d)
      TextOps.dsirWeightWithModels(docs,
        TextOps.ensureBigramModel(docs, "text", bigramLmPath(d, "all", stamp)),
        TextOps.ensureBigramModel(
          docs.filter(col("source").isin("src0", "src1", "src2")), "text",
          bigramLmPath(d, "src012", stamp)),
        "doc_id", "text")
    }),

    // Character-entropy quality signal (TextOps.charEntropy): run-length
    // fold over sorted characters in the scan projection — zero shuffle;
    // fixed-point c·ln c terms make the sum order-free and oracle-exact.
    "text_char_entropy" -> ((s, d) =>
      TextOps.charEntropy(Tables.documents(s, d), "doc_id", "text")),

    "text_quality_score" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val nTok = TextOps.tokenCount(col("text"))
      docs.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars_measured"),
        nTok.as("n_tokens"),
        r4(TextOps.vocabHits(col("text"), TextOps.EnStop).cast("double") /
          greatest(nTok, lit(1L)).cast("double")).as("stopword_ratio"),
        r4(TextOps.alphaRatio(col("text"))).as("alpha_ratio"))
    }),

    // Language-ID heuristic: per-language stopword scores + argmax.
    "text_lang_id" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val en = TextOps.vocabHits(col("text"), TextOps.EnStop)
      val de = TextOps.vocabHits(col("text"), TextOps.DeStop)
      val es = TextOps.vocabHits(col("text"), TextOps.EsStop)
      docs.select(col("doc_id"), en.as("en_score"), de.as("de_score"), es.as("es_score"),
        TextOps.predictedLang(en, de, es).as("predicted_lang"),
        col("lang").as("labeled_lang"))
    }),

    // Document fingerprinting (normalize + hash).
    "text_fingerprint" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextOps.fingerprint(col("text")).as("fingerprint"))),

    // PII masking — emails / IPv4 / phone-shaped digit runs replaced
    // with typed placeholders (the redaction pass every pretraining
    // corpus runs). The PII-laden text is CONSTRUCTED deterministically
    // from customer fields so the oracle builds the identical input and
    // restates the identical regex chain (common Java/RE2 subset,
    // global replacement).
    "text_pii_mask" -> ((s, d) => {
      val txt = concat(
        lit("contact "), lower(regexp_replace(col("c_name"), "#", "")),
        lit("@example.com or call +1 (555) 010-"),
        format_string("%04d", col("c_custkey") % 10000),
        lit(" ip 10.0."), (col("c_custkey") % 256).cast("string"),
        lit(".7 ref "), col("c_mktsegment"))
      Tables.customer(s, d)
        .select(col("c_custkey"), TextOps.maskPii(txt).as("masked"))
    }),

    // Multi-pass blocked fuzzy matching (Entity.fuzzyMatchMultiPass):
    // also the scoreboard's single-pass witness — each pass IS
    // Entity.fuzzyMatch (suffix blocks here, mixed key in pass 2), so
    // the retired standalone single-pass row (r7's
    // `text_fuzzy_entity`) is subsumed: same operator, same block-key
    // family, same oracle shape, at half the bench cost (EntitySpec
    // keeps the single-pass unit coverage: guard firing, tie order,
    // length pre-filter).
    // the recall contract made executable. The corruption mix is
    // chosen so NO single block key sees everything — tail
    // substitutions (%3==0, last char → 'Q') cross the suffix block
    // and only pass 2 finds them; head substitutions (%3==1) change
    // the first character, crossing pass 2's key, so only the suffix
    // pass finds them. Pass 2's key (first char + the 3 chars BEFORE
    // the last) is deliberately not a bare prefix: every customer
    // name shares the literal "Cus" prefix, so a prefix block is one
    // corpus-sized hot block — the guard proved it by refusing to run
    // exactly that shape at sf0.1 (75M pairs in block 'Cus'). The
    // union-of-winners keeps the single-pass total order (dist, then
    // match_id), which the oracle restates as one window over the
    // UNION of both candidate sets (best-of-per-pass-bests ==
    // best-over-union under a total order).
    "text_fuzzy_multipass" -> ((s, d) => {
      // uniqueKeyed: entity resolution emits one match per entity id —
      // duplicate/null ids have no defined resolution (Joins.uniqueKeyed).
      // Materialized: the gated frame feeds the dirty derivation AND
      // both match passes — without the barrier each consumer replays
      // the count+semijoin (measured on the sf0.1 bench).
      val clean = graft.ops.Exec.materialize(
        graft.ops.Joins.uniqueKeyed(Tables.customer(s, d), "c_custkey")
          .filter(col("c_name").isNotNull)
          .select(col("c_custkey"), col("c_name")))
      val dirty = clean.select(col("c_custkey").as("d_id"),
        when(col("c_custkey") % 3 === 0,
          concat(expr("substring(c_name, 1, length(c_name)-1)"), lit("Q")))
          .when(col("c_custkey") % 3 === 1,
            concat(lit("K"), expr("substring(c_name, 2)")))
          .otherwise(concat(substring(col("c_name"), 1, 1), expr("substring(c_name, 3)")))
          .as("d_name"))
      graft.text.Entity.fuzzyMatchMultiPass(dirty, "d_id", "d_name",
        clean, "c_custkey", "c_name",
        Seq(n => substring(n, -3, 3),
          n => concat(substring(n, 1, 1), substring(n, -4, 3))), maxDist = 2)
    }),

    // BM25 retrieval (TextOps.bm25TopDocs): rank the corpus against a
    // fixed 3-query eval set — the lexical-retrieval baseline next to
    // the embedding ANN path. Scores are Okapi BM25 (k1=1.2, b=0.75,
    // Lucene-style always-positive idf) with the per-(query, doc) sum
    // routed through the decimal-exact sum and rounded at emission;
    // the oracle restates the formula with the SAME association order
    // so every double op is bit-identical. Top-5 per query, ties by
    // doc id.
    "text_bm25_topdocs" -> ((s, d) => {
      import s.implicits._
      val qs = Seq((1L, "spark join"), (2L, "window agg batch"),
        (3L, "hash merge table")).toDF("query_id", "query_text")
      TextOps.bm25TopDocs(Tables.documents(s, d), "doc_id", "text",
        qs, "query_id", "query_text", k = 5)
    }),

    // Bigram LM quality scoring (TextOps.bigramNll): per-doc average
    // −ln P(w_i | w_{i−1}) under corpus-trained add-one-smoothed
    // bigram counts — the statistical-LM quality filter. One row per
    // document with ≥2 tokens; the oracle replays the exact count /
    // smoothing / decimal-sum chain.
    "text_bigram_nll" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextOps.bigramNllWithModel(docs,
        TextOps.ensureBigramModel(docs, "text", bigramLmPath(d, "all", docStamp(s, d))),
        "doc_id", "text")
    }),

    // Gopher-style repetition stats (TextOps.repetitionStats): per-doc
    // top-token / top-bigram share and duplicated-trigram share — the
    // web-scale repetition quality gate. Sorted-run folds inside the
    // scan projection: zero shuffle at any corpus size (the oracle
    // replays the counts via explode + group-by, proving the fold).
    "text_repetition_stats" -> ((s, d) =>
      TextOps.repetitionStats(Tables.documents(s, d), "doc_id", "text")),

    // Cross-document boilerplate spans (Dedup.crossDocSpans): every
    // 4-token span occurring verbatim in ≥2 distinct docs, with its
    // document frequency — the C4-style boilerplate blocklist that
    // doc-level near-dup never sees. Scan-local explode+array_distinct;
    // one count shuffle.
    "text_span_crossdup" -> ((s, d) =>
      // served from the persisted span-blocklist artifact
      // ([[spanBlocklist]]): the span-keyed corpus shuffle runs once
      // per generation at ingest
      spanBlocklist(s, d)),

    // Boilerplate coverage (Dedup.spanCoverageWithBlocklist): per-doc
    // fraction of distinct spans that are corpus boilerplate — the
    // strip/drop DECISION on the blocklist above, probing the SAME
    // persisted artifact (generation-consistent by the shared stamp);
    // AQE broadcasts the loaded blocklist into the scan-local probe
    // side (shuffle-join fallback if it's ever huge).
    "text_span_coverage" -> ((s, d) =>
      Dedup.spanCoverageWithBlocklist(Tables.documents(s, d), "doc_id", "text",
        window = 4, blocklist = spanBlocklist(s, d))),

    // PMI collocations (TextOps.pmiBigrams): pointwise mutual
    // information of adjacent token pairs with count gate 5 — the
    // tokenizer-merge / phrase-vocabulary signal. Two corpus count
    // shuffles, then candidate-sized scoring joins.
    "text_pmi_bigrams" -> ((s, d) =>
      TextOps.pmiBigrams(Tables.documents(s, d), "text", minCount = 5L)),

    // Corpus drift: Jensen–Shannon divergence between the token
    // distributions of two cohorts (even vs odd doc ids here; in
    // production, old crawl vs new). One row; bounded [0, ln 2];
    // per-token contributions decimal-summed for order-free parity.
    "text_js_divergence" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextOps.jsDivergence(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "text")
    }),

    // Embedding norms — array math baseline (all-double, rounded).
    "emb_norms" -> ((s, d) =>
      Tables.embeddings(s, d).select(col("vec_id"), col("label"),
        r4(Similarity.l2Norm(col("embedding"))).as("l2_norm"))),

    // Embedding pooling: per-label element-wise mean (class centroids)
    // via decimal-exact per-position sums. The scoreboard row emits the
    // EXPLODED (label, pos, centroid_val) form — scalar columns only —
    // while the operator returns assembled array<double> centroids
    // (SimilaritySpec covers the array form; emitting arrays through
    // the driver compare is an untested surface, scalars are not).
    "sim_label_centroid" -> ((s, d) => {
      val cent = Similarity.labelCentroids(Tables.embeddings(s, d), "label", "embedding")
      cent.select(col("label"), col("n_vectors"), posexplode(col("centroid")))
        .select(col("label"), col("pos"), col("col").as("centroid_val"),
          col("n_vectors"))
    }),

    // TF-IDF top terms per document — smoothed IDF, raw tf, rounded
    // score, total-order ties (score desc, term asc). One tokenized
    // shuffle + WindowGroupLimit top-k; N broadcasts as a 1-row agg.
    "text_tfidf_top_terms" -> ((s, d) =>
      TextOps.tfidfTopTerms(Tables.documents(s, d), "doc_id", "text", 3)),

    // Brute-force cosine top-k: 10 broadcast query vectors vs the corpus.
    "sim_cosine_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 10), 3)
    }),

    // SQ8-quantized cosine top-k — the memory-bound scale path for
    // sim_cosine_topk: vectors travel as 8-bit codes (4× fewer bytes in
    // every shuffle/broadcast/cache), score = dot of the dequantized
    // normalized vectors. Quantization is deterministic double
    // arithmetic, so the oracle reproduces the codes bit-for-bit.
    "sim_sq8_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.sq8TopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 10), 3)
    }),

    // Label-blocked cosine near-dup pairs (IVF-style blocking).
    "sim_blocked_neardup" -> ((s, d) =>
      Similarity.blockedNearDup(Tables.embeddings(s, d), "vec_id", "embedding",
        "label", 0.35)),

    // Embedding-cosine near-dup pairs → duplicate CLUSTERS via
    // distributed connected components — the embedding-side analogue of
    // dedup_components (pair-local keeping over- or under-deletes when
    // near-dups chain). Pairs come from the oracle-checked blocked
    // exact-cosine operator, so the whole clustering is hash-checkable.
    "dedup_embedding_components" -> ((s, d) => {
      val pairs = Similarity.blockedNearDup(Tables.embeddings(s, d),
        "vec_id", "embedding", "label", 0.35)
      graft.ops.Components.connectedComponents(pairs, "id_a", "id_b")
        .select(col("node").as("vec_id"), col("component").as("dup_group"))
    }),

    // LSH-sub-bucketed near-dup pairs — the skew-safe scale path for
    // sim_blocked_neardup. Full value oracle: bucket assignment is
    // murmur3-dependent but the plane signs are CONSTANTS for a fixed
    // (planes, dim), so the oracle embeds them (LshSigns4Values,
    // pinned in SimilaritySpec) and re-folds buckets, blocking,
    // cosine, rounding, and the threshold itself; recall vs exact
    // pairs additionally checked in SimilaritySpec.
    // planes=4 (16 sub-buckets per block): the testdata has no true
    // near-dups (max within-label cosine ≈0.47), so the demo targets the
    // moderate-similarity regime where 8 planes' (1−θ/π)^8 recall would
    // round to zero pairs
    "sim_lsh_neardup" -> ((s, d) =>
      Similarity.lshNearDup(Tables.embeddings(s, d), "vec_id", "embedding",
        "label", 0.35, 4)),

    // Sign-LSH bucket assignment — driver-witnessed self-consistency
    // differential (same pattern as dedup_simhash): the native codegen
    // kernel vs the higher-order-function executable spec, per vector.
    // Bucket ids are murmur3-dependent; the agreement bit is exact.
    // <=> (null-safe equality): the agreement bit must be TOTAL — a
    // NULL vector gives both formulations a NULL bucket, which agrees
    "sim_lsh_bucket" -> ((s, d) =>
      Tables.embeddings(s, d).select(col("vec_id"),
        (Similarity.lshBucket(col("embedding"), 8) <=>
          Similarity.lshBucketLambda(col("embedding"), 8))
          .cast("int").as("buckets_agree"))),

    // IVF-bucketed ANN top-k — the coarse-quantizer scale path for
    // sim_cosine_topk (no oracle — KMeans centroids aren't reproducible
    // in DuckDB; recall vs brute force checked in IvfSpec).
    // Text→vector bridge: hashing-trick TF vectors fed straight into
    // the cosine near-dup operator — embedding-free near-dup
    // detection, banded over the PERSISTED TF-vector table (vectors
    // are ingest work). Full value oracle: the xxhash64 token
    // bucketing stays engine-side in the artifact (text_tf_sound +
    // SigKernelsSpec pin it), and DuckDB re-derives buckets (from the
    // embedded sign constants), lang blocking, cosine, rounding, and
    // the threshold from the same table.
    // TextSimSpec/SimilaritySpec cover the planted-near-dup behavior.
    "text_tf_cosine_neardup" -> ((s, d) => {
      val tf = tfVecs(s, d)
        .join(Tables.documents(s, d).select(col("doc_id"), col("lang")), Seq("doc_id"))
      // lshNearDup (not blockedNearDup): templated corpora make whole
      // lang-blocks mutually TF-similar, so the exact all-pairs block
      // scan is the skew bomb the LSH sub-buckets exist to defuse
      Similarity.lshNearDup(tf, "doc_id", "tf", "lang", threshold = 0.98)
    }),

    // Soundness witness for the TF-cosine near-dup generator (same
    // contract shape as sim_lsh_sound): every emitted pair is ordered,
    // on-threshold, and carries a cos_sim that an INDEPENDENT
    // recomputation reproduces exactly — here through the grouped
    // explode/sum TF formulation (a different algorithm than the
    // native tf_vector kernel the generator used; their bit-parity is
    // separately pinned by SigKernelsSpec, so a divergence in either
    // the kernel or the pair join flips this bit). One row per
    // document; documents in no pair witness vacuously.
    "text_tf_sound" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tf = TextOps.tfVectors(docs, "doc_id", "text")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      val pairs = Similarity.lshNearDup(tf, "doc_id", "tf", "lang", threshold = 0.98)
      val ref = TextOps.tfVectorsGrouped(docs, "doc_id", "text")
      val va = ref.select(col("doc_id").as("id_a"), col("tf").as("__va"))
      val vb = ref.select(col("doc_id").as("id_b"), col("tf").as("__vb"))
      val perPair = pairs.join(va, "id_a").join(vb, "id_b")
        .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"),
          (col("id_a") < col("id_b") &&
            col("cos_sim") >= 0.98 &&
            col("cos_sim") === r4(Similarity.cosine(col("__va"), col("__vb"))))
            .cast("int").as("ok"))
      docs.select(col("doc_id"))
        .join(perPair.groupBy(col("doc_id")).agg(min(col("ok")).as("ok")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("ok"), lit(1)).as("tf_pairs_sound"))
    }),

    // Both IVF queries probe ONE persisted quantizer (S5 life cycle:
    // the first run fits + saves, every later run — and the sibling
    // query in the same run — loads; fit-then-save == load, so results
    // are identical either way).
    "sim_ivf_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val (model, _, idx) = annArtifacts(s, d)
      Ivf.ivfTopKFromAssigned(Ivf.indexAssigned(idx),
        "vec_id", "embedding",
        emb.filter(col("vec_id") < 10), model, k = 3, nprobe = 4)
    }),

    // IVF cells composed with LSH sub-buckets for ANN near-dup pairs.
    // Cells come from the PERSISTED index rows (cell =
    // Ivf.assignCells at build — the same MLlib predict a fresh
    // assignment would run, so values are identical and the per-query
    // transform disappears; the deployment shape, and the artifact the
    // full value oracle re-reads). Buckets/cosine recompute from the
    // index's raw vectors (float round-trip exact). Oracle: DuckDB
    // re-folds buckets from the embedded murmur3 sign-matrix constant
    // and re-derives blocking + cosine + threshold itself.
    "sim_ivf_neardup" -> ((s, d) => {
      val (_, _, idx) = annArtifacts(s, d)
      Similarity.lshNearDup(
        idx.select(col("cell"), col("neighbor_id").as("vec_id"),
          col("vec").as("embedding")),
        "vec_id", "embedding", "cell", threshold = 0.35, planes = 8)
    }),

    // PQ/ADC top-k with exact rerank — the code-compression scale path
    // of the ANN family: the full-corpus pass reads 8 codes per 64-dim
    // vector (32× smaller than float32), ADC shortlists per query, and
    // exact cosine reranks only the survivors (the two-stage scheme
    // every deployed PQ index uses). Same S5 train-once/probe-many
    // life cycle as the IVF quantizer. Full value oracle: the KMeans
    // GEOMETRY comes from the persisted text codebook, and DuckDB
    // re-derives everything downstream of it — including the argmin
    // ENCODE itself — from that artifact; PqSpec additionally pins
    // encoder argmin optimality, reconstruction quality, and shortlist
    // recall vs brute force.
    "sim_pq_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cb = graft.sim.Pq.fitOrLoad(emb, "embedding", m = PqM, k = PqK, pqCodebookPath(d, embStamp(s, d)))
      graft.sim.Pq.adcRerankTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 10), cb, k = 3, shortlist = 50)
    }),

    // IVF-PQ — the DEPLOYED ANN shape at 100 TB: the persisted coarse
    // quantizer prunes to nprobe probed cells per query (cells bound
    // WHICH corpus rows are touched), PQ codes bound what touching a
    // row COSTS (m bytes vs dim·4), exact cosine reranks the shortlist.
    // Replaces sim_pq_topk's linear-in-corpus flat ADC scan with a
    // probes-broadcast equi-join on cell. No oracle — KMeans centroids
    // + codebooks aren't reproducible in DuckDB; IvfPqSpec pins recall,
    // probed-cell containment, and exact-convergence when both knobs
    // are widened.
    "sim_ivfpq_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val (model, cb, idx) = annArtifacts(s, d)
      graft.sim.IvfPq.topKIndexed(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 10), idx, model, cb,
        k = 3, nprobe = 4, shortlist = 50)
    }),

    // Soundness witness for the simhash pigeonhole-banding pair
    // generator: every emitted pair is ordered, within the hamming
    // budget, and its hamming distance is reproduced by bit_count(xor)
    // over signatures computed through the INDEPENDENT explode+groupBy
    // formulation (not the native kernel the production path uses) —
    // so the bit crosses both the banding machinery and the
    // kernel-vs-spec signature parity in one row. Completeness (the
    // banding finds every within-budget pair) is DedupSpec's
    // brute-force equality; per-doc, docs in no pair witness vacuous
    // soundness via the left join.
    "dedup_simhash_sound" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.simhashNearDup(docs, "doc_id", "text", maxHamming = SimhashMaxHamming)
      val sigs = Dedup.simhashGrouped(docs, "doc_id", "text")
      val sa = sigs.select(col("doc_id").as("id_a"), col("simhash").as("__sa"))
      val sb = sigs.select(col("doc_id").as("id_b"), col("simhash").as("__sb"))
      val perPair = pairs.join(sa, Seq("id_a")).join(sb, Seq("id_b"))
        .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"),
          (col("id_a") < col("id_b") &&
            col("hamming") <= 3 &&
            col("hamming") === bit_count(col("__sa").bitwiseXOR(col("__sb"))))
            .cast("int").as("ok"))
      docs.select(col("doc_id"))
        .join(perPair.groupBy(col("doc_id")).agg(min(col("ok")).as("ok")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("ok"), lit(1)).as("simhash_pairs_sound"))
    }),

    // Soundness witness for the LSH candidate generator — the half of
    // the near-dup contract an oracle CAN pin: every emitted pair is
    // ordered (id_a < id_b), above threshold, and carries a cos_sim
    // that an independent recomputation (Similarity.cosine over the
    // raw vectors — same arithmetic, separate expression instance)
    // reproduces exactly. Completeness/recall is the LSH tradeoff by
    // design, spec-checked against exact pairs instead. One row per
    // VECTOR (oracle-expressible cardinality); vectors in no pair
    // witness vacuous soundness (bit 1 via the left join).
    "sim_lsh_sound" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val pairs = Similarity.lshNearDup(emb, "vec_id", "embedding", "label", 0.35, 4)
      val va = emb.select(col("vec_id").as("id_a"), col("embedding").as("__va"))
      val vb = emb.select(col("vec_id").as("id_b"), col("embedding").as("__vb"))
      val perPair = pairs.join(va, "id_a").join(vb, "id_b")
        .select(explode(array(col("id_a"), col("id_b"))).as("vec_id"),
          (col("id_a") < col("id_b") &&
            col("cos_sim") >= 0.35 &&
            col("cos_sim") === r4(Similarity.cosine(col("__va"), col("__vb"))))
            .cast("int").as("ok"))
      emb.select(col("vec_id"))
        .join(perPair.groupBy(col("vec_id")).agg(min(col("ok")).as("ok")),
          Seq("vec_id"), "left")
        .select(col("vec_id"), coalesce(col("ok"), lit(1)).as("lsh_pairs_sound"))
    }),

    // Same soundness witness for the MinHash+LSH banding generator:
    // every candidate pair is ordered, its est_jaccard equals the
    // agreeing-position fraction recomputed through an independent
    // zip_with/aggregate fold over the (oracle-checked, see
    // dedup_minhash_agree) signatures, and sits on or above the
    // emission threshold. k/16 and the r4 of it are exact in binary
    // (16 is a power of two), so the equality bit is exact.
    "dedup_lsh_sound" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // ONE set of generator parameters (the Minhash* constants) for
      // the artifact's generator and this witness — the earlier form
      // called minhashCandidates with its defaults while hardcoding
      // /16.0 and >=0.5 as bare constants, so a retuned default would
      // silently flip every soundness bit (witness drift, not a
      // clustering bug); pairs load from the persisted artifact the
      // candidate row also serves
      val numHashes = MinhashNumHashes
      val minEstimate = MinhashMinEstimate
      val pairs = minhashPairGraph(s, d)._1
      // the PERSISTED signatures half — the same generation the pairs
      // were derived from (the ensure above guarantees it exists), and
      // the same table the DuckDB oracle reads (__MH_SIGS__). A fresh
      // minhashSignatures() recompute here would re-resolve the r13
      // auto df-guard independently: on a boilerplate corpus whose
      // uncapped artifact was legitimately adopted, the recompute
      // would engage the cap on one side only and flip every cohort
      // pair's soundness bit — a false kernel/LSH divergence (review
      // r13; the dedup_minhash_agree fix's sibling).
      val sigs = s.read.parquet(
        minhashPairGraphPath(d, docStamp(s, d)) + "/signatures")
      val sa = sigs.select(col("doc_id").as("id_a"), col("signature").as("__sa"))
      val sb = sigs.select(col("doc_id").as("id_b"), col("signature").as("__sb"))
      val refold = aggregate(
        zip_with(col("__sa"), col("__sb"),
          (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v)
      val perPair = pairs.join(sa, "id_a").join(sb, "id_b")
        .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"),
          (col("id_a") < col("id_b") &&
            col("est_jaccard") >= minEstimate &&
            col("est_jaccard") === r4(refold.cast("double") / numHashes))
            .cast("int").as("ok"))
      docs.select(col("doc_id"))
        .join(perPair.groupBy(col("doc_id")).agg(min(col("ok")).as("ok")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("ok"), lit(1)).as("minhash_pairs_sound"))
    }),

    // Driver-witnessed agreement differential for the IVF-PQ
    // COMPOSITION: with nprobe covering every cell, IVF-PQ's ADC sees
    // the same candidate set as flat PQ through IDENTICAL expression
    // trees (same normalize, same decode, same dot, same tie-break), so
    // the two top-k results must be EXACTLY equal per (query, rank) —
    // any divergence isolates a composition bug: a corpus row lost or
    // duplicated by the cell assignment, the materialized index, or the
    // probes broadcast join. The raw neighbors have no DuckDB oracle
    // (KMeans); the agreement bit is exact.
    "sim_ivfpq_agree" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val (model, cb, idx) = annArtifacts(s, d)
      val q = emb.filter(col("vec_id") < 10)
      val a = graft.sim.IvfPq.topKIndexed(emb, "vec_id", "embedding", q,
        idx, model, cb, k = 3, nprobe = 16, shortlist = 50)
      val b = graft.sim.Pq.adcRerankTopK(emb, "vec_id", "embedding", q, cb,
        k = 3, shortlist = 50)
        .select(col("query_id").as("qid_b"), col("rank").as("rank_b"),
          col("neighbor_id").as("nid_b"), col("cos_sim").as("cos_b"))
      a.join(b, col("query_id") === col("qid_b") && col("rank") === col("rank_b"))
        .select(col("query_id"), col("rank"),
          (col("neighbor_id") === col("nid_b") &&
            col("cos_sim") === col("cos_b")).cast("int").as("ivfpq_flat_agree"))
    }),

    // Driver-witnessed agreement differential for the IVF top-k
    // machinery (k2_pelt_agree pattern): the production row_number
    // window vs the aggregation-formulated twin
    // (array_sort(collect_list) in a hash agg). Scoring arithmetic is
    // SHARED, so the bit isolates ranking/tie-break divergence; the
    // raw neighbors have no DuckDB oracle (KMeans cells), but the
    // agreement bit per (query, rank) is exact.
    "sim_ivf_agree" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val (model, _, rawIdx) = annArtifacts(s, d)
      val q = emb.filter(col("vec_id") < 10)
      val idx = Ivf.indexAssigned(rawIdx)
      val a = Ivf.ivfTopKFromAssigned(idx, "vec_id", "embedding", q, model,
        k = 3, nprobe = 4)
      val b = Ivf.ivfTopKAggFromAssigned(idx, "vec_id", "embedding", q, model,
        k = 3, nprobe = 4)
        .select(col("query_id").as("qid_b"), col("rank").as("rank_b"),
          col("neighbor_id").as("nid_b"), col("cos_sim").as("cos_b"))
      a.join(b, col("query_id") === col("qid_b") && col("rank") === col("rank_b"))
        .select(col("query_id"), col("rank"),
          (col("neighbor_id") === col("nid_b") &&
            col("cos_sim") === col("cos_b")).cast("int").as("ivf_topk_agree"))
    }),

    // Exact-recall witness for the IVF candidate machinery: the
    // production path reaches probed-cell corpus rows through a
    // cell-keyed EQUI-JOIN against the PERSISTED index (cells + norms
    // computed at build, loaded from parquet); the witness reaches
    // them through a brute-force query × corpus join with cells
    // re-assigned INLINE and membership tested by array_contains over
    // each query's probed-cell SET — no cell equi-join, no index
    // artifact — then ranks with the same (cos desc, id asc) order and
    // the same rounded-cosine arithmetic. Exact per-(query, rank)
    // equality: a corpus row lost or duplicated by the cell join, a
    // stale/corrupt index row, or a scoring/tie-break divergence flips
    // the bit. Deterministic given the persisted quantizer (both sides
    // share it), so the oracle pins all bits to 1 over the full
    // (query × rank) cardinality.
    "sim_ivf_sound" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, d)
      val (model, _, rawIdx) = annArtifacts(s, d)
      val q = emb.filter(col("vec_id") < 10)
      val a = Ivf.ivfTopKFromAssigned(Ivf.indexAssigned(rawIdx),
        "vec_id", "embedding", q, model, k = 3, nprobe = 4)
      val probedSets = Ivf.probeCells(q, "vec_id", "embedding", model, nprobe = 4)
        .groupBy(col("query_id")).agg(collect_set(col("cell")).as("__cells"))
      val qv = q.select(col("vec_id").as("query_id"), col("embedding").as("__qv"))
        .join(probedSets, Seq("query_id"))
      val cv = Ivf.assignCells(emb, "embedding", model)
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("__cv"),
          col("cell").as("__ccell"))
      val brute = qv.join(cv,
          array_contains(col("__cells"), col("__ccell")) &&
            col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          r4(Similarity.dot(col("__qv"), col("__cv")) /
            (Similarity.l2Norm(col("__qv")) * Similarity.l2Norm(col("__cv"))))
            .as("cos_b"))
      val rankW = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_b").desc, col("neighbor_id").asc)
      val bTop = brute.withColumn("rank_b", row_number().over(rankW))
        .filter(col("rank_b") <= 3)
        .select(col("query_id").as("qid_b"), col("rank_b"),
          col("neighbor_id").as("nid_b"), col("cos_b"))
      a.join(bTop, col("query_id") === col("qid_b") && col("rank") === col("rank_b"))
        .select(col("query_id"), col("rank"),
          (col("neighbor_id") === col("nid_b") &&
            col("cos_sim") === col("cos_b")).cast("int").as("ivf_brute_agree"))
    }),

    // Driver-witnessed agreement differential for ADC scoring: the
    // reconstruction form (decode + one dot over all dims) vs the
    // lookup-table form (per-subspace partial dots — what a deployed
    // scanner precomputes). Same math, different float summation
    // order, so the bit is agreement at 1e-9 (observed gap ~1e-14),
    // aggregated to one bit per query over EVERY corpus pairing.
    "sim_pq_agree" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cb = graft.sim.Pq.fitOrLoad(emb, "embedding", m = PqM, k = PqK, pqCodebookPath(d, embStamp(s, d)))
      val q = broadcast(emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"),
          graft.sim.Pq.normalized(col("embedding")).as("q_nvec")))
      val c = graft.ops.Exec.materialize(graft.sim.Pq.encode(emb, "embedding", cb)
        .select(col("vec_id").as("neighbor_id"), col("pq_codes")))
      q.join(c, col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"),
          (abs(Similarity.dot(col("q_nvec"), graft.sim.Pq.decode(col("pq_codes"), cb)) -
            graft.sim.Pq.adcLutScore(col("q_nvec"), col("pq_codes"), cb)) < 1e-9)
            .cast("int").as("adc_forms_agree"))
        .groupBy(col("query_id"))
        .agg(min(col("adc_forms_agree")).as("adc_forms_agree"))
    }),

    // Driver-witnessed agreement differential for MinHash signatures:
    // the zero-shuffle native kernel vs the explode+groupBy executable
    // spec — bit-identical by construction (same murmur3 chain), so
    // the per-document bit is exact equality over the full signature
    // array. Turns the SigKernelsSpec parity assertion into a
    // scoreboard row the driver witnesses at sf0.01 AND sf0.1.
    "dedup_minhash_agree" -> ((s, d) => {
      // uniqueKeyed: see dedup_simhash
      val docs = graft.ops.Joins.uniqueKeyed(Tables.documents(s, d), "doc_id")
      // explicit maxShingleDf = off: this row is the kernel-vs-spec
      // parity witness, and the grouped executable spec has no cap
      // parameter — under the r13 auto default a boilerplate corpus
      // would cap side `a` only and report a FALSE kernel/spec
      // divergence. Uncapped-vs-uncapped is the row's contract (the
      // auto guard's own parity has its own specs: auto == manual cap
      // in DedupSpec/DedupPropertySpec).
      val a = Dedup.minhashSignatures(docs, "doc_id", "text", 16, Long.MaxValue)
      val b = Dedup.minhashSignaturesGrouped(docs, "doc_id", "text")
        .select(col("doc_id").as("id_b"), col("signature").as("sig_b"))
      a.join(b, col("doc_id") === col("id_b"))
        .select(col("doc_id"),
          (col("signature") === col("sig_b")).cast("int").as("minhash_agree"))
    }),

    // Multimodal IMAGE path — REAL codec both ways: synthetic BMPs
    // encoded and decoded through the JDK's javax.imageio, per-partition
    // codec instances, features emitted before any shuffle. BMP is
    // lossless and the synthetic colors are deterministic functions of
    // (doc_id, text length), so the DuckDB oracle predicts the decoded
    // pixel statistics EXACTLY.
    "mm_decode_image" -> ((s, d) =>
      Multimodal.decodeImages(s,
        Multimodal.syntheticImages(s, Tables.documents(s, d), "doc_id", "text"))
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("n_pixels"), col("mean_r"), col("mean_g"), col("mean_b"))),

    // Multimodal resize: binary in → binary out at a fixed target size
    // through a REAL codec pair (decode → Graphics2D rescale →
    // re-encode), then the decode kernel reads the RESIZED payloads
    // back — proving the resized bytes are themselves decodable, the
    // contract that lets resize run before a shuffle. The synthetic
    // images are solid-color, and a resize of a constant image is the
    // same constant under any interpolation, so the oracle predicts the
    // resized pixel statistics EXACTLY.
    "mm_resize_image" -> ((s, d) => {
      val imgs = Multimodal.syntheticImages(s, Tables.documents(s, d), "doc_id", "text")
      val resized = Multimodal.resizeImages(s, imgs, 8, 8)
        .select(col("id"), col("resized").as("payload"),
          lit("image").as("kind"), lit("resized").as("source"))
      Multimodal.decodeImages(s, resized)
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("n_pixels"), col("mean_r"), col("mean_g"), col("mean_b"))
    }),

    // Multimodal: binary payload + metadata → partition-batched
    // byte-level kernel (the stand-in shape for audio/video codecs this
    // container doesn't ship; the image path above is the real thing).
    "mm_decode_stub" -> ((s, d) => {
      val media = Multimodal.withPayload(
        Tables.documents(s, d), "doc_id", "text", "lang", "source")
      Multimodal.extractFeatures(s, media)
        .select(col("id").as("doc_id"), col("byte_len"), col("fp8"), col("n_frames"))
    }),

    // Multimodal: frame sampling — explode each blob into every 2nd
    // 64-byte "frame" with a per-frame fingerprint (the explode shape of
    // a real video frame-sampler; payloads are ASCII so the DuckDB
    // varchar-substring oracle sees the same bytes).
    "mm_frame_sample" -> ((s, d) => {
      val media = Multimodal.withPayload(
        Tables.documents(s, d), "doc_id", "text", "lang", "source")
      Multimodal.sampleFrames(s, media, 2L)
        .select(col("id").as("doc_id"), col("frame_idx"), col("frame_fp"))
    })
  )

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS keeper_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    // The two-phase bloom+confirm admission collapses to the plain
    // NOT EXISTS on normalized-text fingerprints (no false negatives
    // in the gate; positives exactly confirmed).
    "dedup_incremental" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
        |      AS fingerprint
        |  FROM documents)
        |SELECT b.doc_id, b.fingerprint
        |FROM fp b
        |WHERE b.doc_id % 2 = 1 AND NOT EXISTS (
        |  SELECT 1 FROM fp c
        |  WHERE c.doc_id % 2 = 0 AND c.fingerprint = b.fingerprint)""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        |  FROM toks),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  floor((CAST(common AS DOUBLE) / (ca.n_sh + cb.n_sh - common)) * 10000.0 + 0.5) / 10000.0 AS jaccard
        |FROM pairs
        |JOIN cnt ca ON ca.doc_id = id_a
        |JOIN cnt cb ON cb.doc_id = id_b
        |WHERE floor((CAST(common AS DOUBLE) / (ca.n_sh + cb.n_sh - common)) * 10000.0 + 0.5) / 10000.0 >= 0.5""".stripMargin,
    "text_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        |  FROM toks),
        |bsh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0),
        |cont AS (
        |  SELECT doc_id FROM sh JOIN bsh USING (shingle)
        |  GROUP BY doc_id HAVING count(*) >= 5)
        |SELECT d.doc_id, d.lang FROM documents d
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM cont c WHERE c.doc_id IS NOT DISTINCT FROM d.doc_id)""".stripMargin,
    // Self-consistency differentials: the engine asserts kernel == spec
    // per row; the oracle pins the row set and the all-agree invariant.
    // A kernel/spec divergence flips a 1 to 0 and the hash goes red.
    "dedup_simhash" ->
      """SELECT doc_id, CAST(1 AS INTEGER) AS sigs_agree FROM documents
        |WHERE len(string_split_regex(trim(text), '\s+')) > 0
        |  AND doc_id IS NOT NULL AND doc_id IN (
        |    SELECT doc_id FROM documents GROUP BY doc_id HAVING count(*) = 1)""".stripMargin,
    "sim_lsh_bucket" ->
      """SELECT vec_id, CAST(1 AS INTEGER) AS buckets_agree FROM embeddings""".stripMargin,
    // Agreement differentials (k2_pelt_agree pattern): the raw values
    // are KMeans/murmur3-dependent, the agreement bit is exact and the
    // oracle pins it to 1 over the full expected cardinality.
    "sim_ivf_agree" ->
      """SELECT vec_id AS query_id, CAST(r AS INTEGER) AS rank,
        |  CAST(1 AS INTEGER) AS ivf_topk_agree
        |FROM embeddings, generate_series(1, 3) t(r) WHERE vec_id < 10""".stripMargin,
    "sim_pq_agree" ->
      """SELECT vec_id AS query_id, CAST(1 AS INTEGER) AS adc_forms_agree
        |FROM embeddings WHERE vec_id < 10""".stripMargin,
    "sim_ivf_sound" ->
      """SELECT vec_id AS query_id, CAST(r AS INTEGER) AS rank,
        |  CAST(1 AS INTEGER) AS ivf_brute_agree
        |FROM embeddings, generate_series(1, 3) t(r) WHERE vec_id < 10""".stripMargin,
    // Full value oracle for the IVF top-k over the PERSISTED artifacts
    // (VERDICT r7 #8): DuckDB reads the quantizer centers and the
    // cell-partitioned index rows (both parquet) and re-derives probe
    // ranking, cosine, rounding, and top-k with its OWN arithmetic.
    // Bit-parity is by construction, not luck: the engine's vec_dot /
    // l2Norm / centroid distance all accumulate left-to-right onto 0.0
    // in double (functions/VecDot.scala contract), and list_reduce
    // folds the same product list in the same order ((0.0+p1)==p1), so
    // every double on both sides goes through an identical IEEE op
    // sequence; r4 is the engine-portable floor form both engines
    // spell out. Path tokens resolved by Verify (oracleSubstitutions).
    "sim_ivf_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q_vec,
        |    sqrt(list_reduce(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS q_norm
        |  FROM embeddings WHERE vec_id < 10),
        |cents AS (
        |  SELECT clusterIdx AS cell, clusterCenter."values" AS centroid
        |  FROM '__IVF_QUANT_DATA__'),
        |probed AS (
        |  SELECT query_id, q_vec, q_norm, cell FROM (
        |    SELECT q.query_id, q.q_vec, q.q_norm, cents.cell,
        |      row_number() OVER (PARTITION BY q.query_id ORDER BY
        |        sqrt(list_reduce(list_transform(list_zip(q.q_vec, cents.centroid),
        |          p -> (p[1] - p[2]) * (p[1] - p[2])), (a, b) -> a + b)) ASC,
        |        cents.cell ASC) AS pr
        |    FROM q CROSS JOIN cents)
        |  WHERE pr <= 4),
        |scored AS (
        |  SELECT p.query_id, i.neighbor_id,
        |    floor(list_reduce(list_transform(list_zip(p.q_vec, i.vec),
        |        z -> z[1] * CAST(z[2] AS DOUBLE)), (a, b) -> a + b)
        |      / (p.q_norm * i.norm) * 10000.0 + 0.5) / 10000.0 AS cos_sim
        |  FROM probed p
        |  JOIN parquet_scan('__IVFPQ_IDX__', hive_partitioning=1) i
        |    ON p.cell = i.cell
        |  WHERE p.query_id <> i.neighbor_id)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos_sim
        |FROM (
        |  SELECT query_id, neighbor_id, cos_sim,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
        |  FROM scored) WHERE rank <= 3""".stripMargin,
    // Full value oracle for the deployed IVF-PQ search (VERDICT r7 #8,
    // second half): DuckDB re-derives BOTH pruning stages — probe the
    // quantizer cells, ADC-score the probed index rows against the
    // text-artifact codebook (parsed with read_text; Double.toString
    // round-trips exactly through CAST AS DOUBLE), shortlist top-50,
    // exact-rerank the survivors — with its own arithmetic. Parity
    // points beyond the sim_ivf_topk oracle: the reconstruction dot
    // folds over the FULL 64-element concat in subspace order (per-
    // subspace partial sums would round differently), and the rerank
    // cosine is the per-element normalized dot (q[i]/|q|)·(c[i]/|c|)
    // — exactRerank's form, NOT dot/(|q||c|). m=8, k=32, dim=64
    // pinned as constants (DuckDB generate_series rejects lateral
    // args; the codebook path itself encodes m/k).
    "sim_ivfpq_topk" ->
      s"""WITH q AS (
        |  SELECT vec_id AS query_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q_vec,
        |    sqrt(list_reduce(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS q_norm
        |  FROM embeddings WHERE vec_id < 10),
        |cents AS (
        |  SELECT clusterIdx AS cell, clusterCenter."values" AS centroid
        |  FROM '__IVF_QUANT_DATA__'),
        |probed AS (
        |  SELECT query_id, cell FROM (
        |    SELECT q.query_id, cents.cell,
        |      row_number() OVER (PARTITION BY q.query_id ORDER BY
        |        sqrt(list_reduce(list_transform(list_zip(q.q_vec, cents.centroid),
        |          p -> (p[1] - p[2]) * (p[1] - p[2])), (a, b) -> a + b)) ASC,
        |        cents.cell ASC) AS pr
        |    FROM q CROSS JOIN cents)
        |  WHERE pr <= 4),
        |qn AS (
        |  SELECT query_id, list_transform(q_vec, x -> x / q_norm) AS q_nvec FROM q),
        |cblines AS (
        |  SELECT string_split(content, chr(10)) AS ls FROM read_text('__PQ_CB__')),
        |cbsubs AS (
        |  SELECT j - 2 AS sub, string_split(ls[j], ';') AS cl
        |  FROM cblines, generate_series(2, ${PqM + 1}) t(j)),
        |cb AS (
        |  SELECT sub, c - 1 AS code,
        |    list_transform(string_split(cl[c], ','), x -> CAST(x AS DOUBLE)) AS cvec
        |  FROM cbsubs, generate_series(1, $PqK) t(c)),
        |idxt AS (
        |  SELECT cell, neighbor_id, pq_codes
        |  FROM parquet_scan('__IVFPQ_IDX__', hive_partitioning=1)),
        |recon AS (
        |  SELECT i.neighbor_id, flatten(list(cb.cvec ORDER BY cb.sub)) AS rvec
        |  FROM idxt i CROSS JOIN generate_series(1, $PqM) t(j)
        |  JOIN cb ON cb.sub = j - 1 AND cb.code = i.pq_codes[j]
        |  GROUP BY i.neighbor_id),
        |shortl AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT p.query_id, i.neighbor_id,
        |      row_number() OVER (PARTITION BY p.query_id ORDER BY
        |        floor(list_reduce(list_transform(list_zip(qn.q_nvec, r.rvec),
        |          z -> z[1] * z[2]), (a, b) -> a + b) * 10000.0 + 0.5) / 10000.0 DESC,
        |        i.neighbor_id ASC) AS rn
        |    FROM probed p
        |    JOIN idxt i ON p.cell = i.cell
        |    JOIN qn ON qn.query_id = p.query_id
        |    JOIN recon r ON r.neighbor_id = i.neighbor_id
        |    WHERE p.query_id <> i.neighbor_id)
        |  WHERE rn <= 50),
        |cnorm AS (
        |  SELECT vec_id AS neighbor_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |      sqrt(list_reduce(list_transform(embedding,
        |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), (a, b) -> a + b))) AS c_nvec
        |  FROM embeddings)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos_sim FROM (
        |  SELECT s.query_id, s.neighbor_id,
        |    floor(list_reduce(list_transform(list_zip(qn.q_nvec, c.c_nvec),
        |        z -> z[1] * z[2]), (a, b) -> a + b) * 10000.0 + 0.5) / 10000.0 AS cos_sim,
        |    row_number() OVER (PARTITION BY s.query_id ORDER BY
        |      floor(list_reduce(list_transform(list_zip(qn.q_nvec, c.c_nvec),
        |          z -> z[1] * z[2]), (a, b) -> a + b) * 10000.0 + 0.5) / 10000.0 DESC,
        |      s.neighbor_id ASC) AS rank
        |  FROM shortl s JOIN cnorm c ON c.neighbor_id = s.neighbor_id
        |  JOIN qn ON qn.query_id = s.query_id)
        |WHERE rank <= 3""".stripMargin,
    // Full value oracle for flat PQ/ADC search (VERDICT r8 #2) — the
    // sim_ivfpq_topk machinery minus cell pruning, plus one stage it
    // left to the engine: the ENCODER. DuckDB re-derives the per-
    // subspace argmin codes itself from the text codebook (normalized
    // corpus vector sliced per subspace, left-fold squared distance
    // per centroid, first-min tie to the lowest code — exactly
    // Pq.encode's array_position(d2, array_min(d2))), reconstructs,
    // ADC-shortlists the full corpus, and exact-reranks. Shape (m, k,
    // sub) interpolated from the PqM/PqK/EmbDim constants, as is the
    // IVF-PQ oracle's — a retune moves engine and oracle together.
    "sim_pq_topk" ->
      s"""WITH q AS (
        |  SELECT vec_id AS query_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q_vec,
        |    sqrt(list_reduce(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS q_norm
        |  FROM embeddings WHERE vec_id < 10),
        |qn AS (
        |  SELECT query_id, list_transform(q_vec, x -> x / q_norm) AS q_nvec FROM q),
        |cn AS (
        |  SELECT neighbor_id, list_transform(c_vec, x -> x / c_norm) AS c_nvec
        |  FROM (
        |    SELECT vec_id AS neighbor_id,
        |      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c_vec,
        |      sqrt(list_reduce(list_transform(embedding,
        |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), (a, b) -> a + b)) AS c_norm
        |    FROM embeddings)
        |  WHERE c_norm > 0),
        |cblines AS (
        |  SELECT string_split(content, chr(10)) AS ls FROM read_text('__PQ_CB__')),
        |cbsubs AS (
        |  SELECT j - 2 AS sub, string_split(ls[j], ';') AS cl
        |  FROM cblines, generate_series(2, ${PqM + 1}) t(j)),
        |cb AS (
        |  SELECT sub, c - 1 AS code,
        |    list_transform(string_split(cl[c], ','), x -> CAST(x AS DOUBLE)) AS cvec
        |  FROM cbsubs, generate_series(1, $PqK) t(c)),
        |enc AS (
        |  SELECT neighbor_id, sub, cvec FROM (
        |    SELECT n.neighbor_id, cb.sub, cb.code, cb.cvec,
        |      row_number() OVER (PARTITION BY n.neighbor_id, cb.sub ORDER BY
        |        list_reduce(list_transform(
        |          list_zip(list_slice(n.c_nvec, cb.sub * $PqSub + 1, cb.sub * $PqSub + $PqSub), cb.cvec),
        |          z -> (z[1] - z[2]) * (z[1] - z[2])), (a, b) -> a + b) ASC,
        |        cb.code ASC) AS rn
        |    FROM cn n CROSS JOIN cb)
        |  WHERE rn = 1),
        |recon AS (
        |  SELECT neighbor_id, flatten(list(cvec ORDER BY sub)) AS rvec
        |  FROM enc GROUP BY neighbor_id),
        |shortl AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT qn.query_id, r.neighbor_id,
        |      row_number() OVER (PARTITION BY qn.query_id ORDER BY
        |        floor(list_reduce(list_transform(list_zip(qn.q_nvec, r.rvec),
        |          z -> z[1] * z[2]), (a, b) -> a + b) * 10000.0 + 0.5) / 10000.0 DESC,
        |        r.neighbor_id ASC) AS rn
        |    FROM qn CROSS JOIN recon r
        |    WHERE qn.query_id <> r.neighbor_id)
        |  WHERE rn <= 50)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos_sim FROM (
        |  SELECT s.query_id, s.neighbor_id,
        |    floor(list_reduce(list_transform(list_zip(qn.q_nvec, c.c_nvec),
        |        z -> z[1] * z[2]), (a, b) -> a + b) * 10000.0 + 0.5) / 10000.0 AS cos_sim,
        |    row_number() OVER (PARTITION BY s.query_id ORDER BY
        |      floor(list_reduce(list_transform(list_zip(qn.q_nvec, c.c_nvec),
        |          z -> z[1] * z[2]), (a, b) -> a + b) * 10000.0 + 0.5) / 10000.0 DESC,
        |      s.neighbor_id ASC) AS rank
        |  FROM shortl s JOIN cn c ON c.neighbor_id = s.neighbor_id
        |  JOIN qn ON qn.query_id = s.query_id)
        |WHERE rank <= 3""".stripMargin,
    // Full value oracle for the IVF+LSH near-dup generator (VERDICT r8
    // #3): corpus cells come from the SAME persisted index rows
    // `sim_ivf_topk` reads (cell = Ivf.assignCells = the one MLlib
    // predict both paths share); the murmur3 plane signs — the one
    // piece DuckDB cannot recompute — are embedded as the
    // [[LshSignsValues]] constant matrix, and DuckDB re-folds the
    // bucket bits, blocks on (cell, bucket), and re-derives cosine,
    // rounding, and the threshold itself.
    "sim_ivf_neardup" ->
      s"""WITH iv AS (
        |  SELECT neighbor_id AS vec_id, CAST(cell AS INTEGER) AS cell,
        |    list_transform(vec, x -> CAST(x AS DOUBLE)) AS v, norm
        |  FROM parquet_scan('__IVFPQ_IDX__', hive_partitioning=1)
        |  WHERE norm > 0),
        |signs(p, s) AS (VALUES $LshSignsValues),
        |bd AS (
        |  SELECT iv.vec_id, signs.p,
        |    list_reduce(list_transform(list_zip(iv.v, signs.s),
        |      z -> z[1] * z[2]), (acc, x) -> acc + x) AS dp
        |  FROM iv CROSS JOIN signs),
        |buck AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN dp > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
        |  FROM bd GROUP BY vec_id),
        |n AS (SELECT iv.*, buck.bucket FROM iv JOIN buck USING (vec_id))
        |SELECT block, id_a, id_b, cos_sim FROM (
        |  SELECT a.cell AS block, a.vec_id AS id_a, b.vec_id AS id_b,
        |    floor(list_reduce(list_transform(list_zip(a.v, b.v),
        |      z -> z[1] * z[2]), (acc, x) -> acc + x)
        |      / (a.norm * b.norm) * 10000.0 + 0.5) / 10000.0 AS cos_sim
        |  FROM n a JOIN n b ON a.cell = b.cell AND a.bucket = b.bucket
        |    AND a.vec_id < b.vec_id)
        |WHERE cos_sim >= 0.35""".stripMargin,
    // Same technique for the label-blocked LSH generator (planes=4):
    // everything — bucket fold from the embedded sign constants,
    // blocking, cosine, rounding, threshold — re-derived by DuckDB
    // straight from the embeddings table (no artifact needed).
    "sim_lsh_neardup" ->
      s"""WITH v AS (
        |  SELECT * FROM (
        |    SELECT vec_id, label,
        |      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec,
        |      sqrt(list_reduce(list_transform(embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS norm
        |    FROM embeddings)
        |  WHERE norm > 0),
        |signs(p, s) AS (VALUES $LshSigns4Values),
        |bd AS (
        |  SELECT v.vec_id, signs.p,
        |    list_reduce(list_transform(list_zip(v.vec, signs.s),
        |      z -> z[1] * z[2]), (acc, x) -> acc + x) AS dp
        |  FROM v CROSS JOIN signs),
        |buck AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN dp > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
        |  FROM bd GROUP BY vec_id),
        |n AS (SELECT v.*, buck.bucket FROM v JOIN buck USING (vec_id))
        |SELECT block, id_a, id_b, cos_sim FROM (
        |  SELECT a.label AS block, a.vec_id AS id_a, b.vec_id AS id_b,
        |    floor(list_reduce(list_transform(list_zip(a.vec, b.vec),
        |      z -> z[1] * z[2]), (acc, x) -> acc + x)
        |      / (a.norm * b.norm) * 10000.0 + 0.5) / 10000.0 AS cos_sim
        |  FROM n a JOIN n b ON a.label = b.label AND a.bucket = b.bucket
        |    AND a.vec_id < b.vec_id)
        |WHERE cos_sim >= 0.35""".stripMargin,
    // Full value oracle for the TF-cosine near-dup generator: vectors
    // come from the persisted TF table (the xxhash64 bucketing stays
    // engine-side, pinned by text_tf_sound/SigKernelsSpec); buckets
    // re-fold from the embedded 8-plane sign constants, blocking on
    // lang, cosine/rounding/threshold re-derived. The tf doubles
    // round-trip parquet exactly, and VecDot over an already-double
    // array is the same per-element op sequence as the oracle's fold.
    "text_tf_cosine_neardup" ->
      s"""WITH v AS (
        |  SELECT * FROM (
        |    SELECT t.doc_id, d.lang, t.tf AS vec,
        |      sqrt(list_reduce(list_transform(t.tf, x -> x * x), (a, b) -> a + b)) AS norm
        |    FROM '__TF_VECS__' t JOIN documents d USING (doc_id))
        |  WHERE norm > 0),
        |signs(p, s) AS (VALUES $LshSignsValuesTf),
        |bd AS (
        |  SELECT v.doc_id, signs.p,
        |    list_reduce(list_transform(list_zip(v.vec, signs.s),
        |      z -> z[1] * z[2]), (acc, x) -> acc + x) AS dp
        |  FROM v CROSS JOIN signs),
        |buck AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN dp > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
        |  FROM bd GROUP BY doc_id),
        |n AS (SELECT v.*, buck.bucket FROM v JOIN buck USING (doc_id))
        |SELECT block, id_a, id_b, cos_sim FROM (
        |  SELECT a.lang AS block, a.doc_id AS id_a, b.doc_id AS id_b,
        |    floor(list_reduce(list_transform(list_zip(a.vec, b.vec),
        |      z -> z[1] * z[2]), (acc, x) -> acc + x)
        |      / (a.norm * b.norm) * 10000.0 + 0.5) / 10000.0 AS cos_sim
        |  FROM n a JOIN n b ON a.lang = b.lang AND a.bucket = b.bucket
        |    AND a.doc_id < b.doc_id)
        |WHERE cos_sim >= 0.98""".stripMargin,
    // Full value oracle for the MinHash/LSH pair generator: banding,
    // candidates, estimate, and threshold re-derived from the
    // persisted signature table (see [[MhPairsCte]]).
    "dedup_minhash_lsh" ->
      s"""WITH $MhPairsCte
        |SELECT id_a, id_b, est_jaccard FROM pairs""".stripMargin,
    // Full value oracle for the SimHash near-dup generator: pigeonhole
    // chunk banding (unsigned 16-bit extracts via the HUGEINT two's-
    // complement lift — DuckDB's >> on BIGINT is arithmetic), the
    // bucket join, hamming = bit_count(xor), and the threshold all
    // re-derived from the persisted signature table.
    "dedup_simhash_neardup" ->
      s"""WITH sig AS (SELECT doc_id, simhash FROM '__SH_SIGS__'),
        |u AS (
        |  SELECT doc_id, simhash,
        |    CAST(simhash AS HUGEINT) + CASE WHEN simhash < 0
        |      THEN CAST(18446744073709551616 AS HUGEINT) ELSE 0 END AS us
        |  FROM sig),
        |ch AS (
        |  SELECT doc_id, simhash, c AS chunk,
        |    (us >> (c * $SimhashWidth)) & ${(1L << SimhashWidth) - 1} AS chunk_val
        |  FROM u, generate_series(0, ${SimhashChunks - 1}) t(c))
        |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        |FROM ch a JOIN ch b ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val
        |  AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= $SimhashMaxHamming""".stripMargin,
    "dedup_simhash_sound" ->
      """SELECT doc_id, CAST(1 AS INTEGER) AS simhash_pairs_sound
        |FROM documents""".stripMargin,
    "sim_ivfpq_agree" ->
      """SELECT vec_id AS query_id, CAST(r AS INTEGER) AS rank,
        |  CAST(1 AS INTEGER) AS ivfpq_flat_agree
        |FROM embeddings, generate_series(1, 3) t(r) WHERE vec_id < 10""".stripMargin,
    "sim_lsh_sound" ->
      """SELECT vec_id, CAST(1 AS INTEGER) AS lsh_pairs_sound FROM embeddings""".stripMargin,
    "dedup_lsh_sound" ->
      """SELECT doc_id, CAST(1 AS INTEGER) AS minhash_pairs_sound FROM documents""".stripMargin,
    "text_tf_sound" ->
      """SELECT doc_id, CAST(1 AS INTEGER) AS tf_pairs_sound FROM documents""".stripMargin,
    // one row per document that shingles at n=3 — the same cardinality
    // contract minhashSignatures' size(__sh) > 0 filter enforces
    "dedup_minhash_agree" ->
      """SELECT doc_id, CAST(1 AS INTEGER) AS minhash_agree FROM documents
        |WHERE len(string_split_regex(trim(text), '\s+')) >= 3
        |  AND doc_id IS NOT NULL AND doc_id IN (
        |    SELECT doc_id FROM documents GROUP BY doc_id HAVING count(*) = 1)""".stripMargin,
    // element-wise exact-decimal mean per (label, position); pos is
    // 0-based to match posexplode
    "sim_label_centroid" ->
      """SELECT label, CAST(i - 1 AS INTEGER) AS pos,
        |  floor((CAST(sum(CAST(floor((CAST(embedding[i] AS DOUBLE)) * 10000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000000.0 / count(embedding[i])) * 10000.0 + 0.5) / 10000.0 AS centroid_val,
        |  count(*) AS n_vectors
        |FROM embeddings, generate_series(1, 64) t(i)
        |WHERE embedding IS NOT NULL
        |GROUP BY label, i""".stripMargin,
    "text_tfidf_top_terms" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term,
        |    floor((tf * (ln(CAST(n_docs + 1 AS DOUBLE) / (df + 1)) + 1.0)) * 10000.0 + 0.5) / 10000.0 AS tfidf
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        |SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, tfidf FROM (
        |  SELECT doc_id, term, tfidf,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
        |  FROM scored) WHERE rank <= 3""".stripMargin,
    "text_token_count" ->
      """SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_tokens
        |FROM documents""".stripMargin,
    // The guarantee bit is 1 for every true heavy hitter by the lossy
    // counting contract; the oracle pins the exact row set and the bit.
    "text_heavy_hitters_gate" ->
      """WITH tok AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents),
        |cnt AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
        |tot AS (SELECT sum(n) AS t FROM cnt)
        |SELECT token, n, CAST(1 AS INTEGER) AS in_sketch
        |FROM cnt, tot WHERE n > 0.001 * t""".stripMargin,
    "text_top_tokens" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents)
        |GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""".stripMargin,
    "text_bpeish_count" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')) AS n_bpeish,
        |  len(string_split_regex(trim(text), '\s+')) AS n_words
        |FROM documents""".stripMargin,
    // Two bigram-LM chains (text_bigram_nll's formula verbatim: corpus
    // model, then the src0-2 target model over the same bigrams),
    // rounded per chain exactly as the engine rounds, then the rounded
    // difference.
    "text_dsir_weight" ->
      """WITH toks AS (
        |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents
        |  WHERE len(string_split_regex(trim(text), '\s+')) >= 2),
        |big AS (
        |  SELECT doc_id, t[i] AS a, t[i + 1] AS b FROM (
        |    SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
        |    FROM toks)),
        |nab AS (SELECT a, b, count(*) AS n_ab FROM big GROUP BY a, b),
        |na AS (SELECT a, sum(n_ab) AS n_a FROM nab GROUP BY a),
        |v AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(t) AS w FROM toks)),
        |per AS (
        |  SELECT big.doc_id,
        |    -ln((CAST(coalesce(n_ab, 0) AS DOUBLE) + 1.0) /
        |      (CAST(coalesce(n_a, 0) AS DOUBLE) + CAST(v.v AS DOUBLE))) AS q
        |  FROM big LEFT JOIN nab USING (a, b) LEFT JOIN na USING (a), v),
        |s AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |    floor((CAST(sum(CAST(floor(q * 10000000.0 + 0.5) AS HUGEINT)) AS DOUBLE)
        |      / 10000000.0 / count(*)) * 10000.0 + 0.5) / 10000.0 AS nll_self
        |  FROM per GROUP BY doc_id),
        |tnab AS (
        |  SELECT a, b, count(*) AS n_ab FROM big JOIN toks USING (doc_id)
        |  WHERE source IN ('src0', 'src1', 'src2') GROUP BY a, b),
        |tna AS (SELECT a, sum(n_ab) AS n_a FROM tnab GROUP BY a),
        |tv AS (SELECT count(DISTINCT w) AS v FROM (
        |  SELECT unnest(t) AS w FROM toks
        |  WHERE source IN ('src0', 'src1', 'src2'))),
        |per2 AS (
        |  SELECT big.doc_id,
        |    -ln((CAST(coalesce(n_ab, 0) AS DOUBLE) + 1.0) /
        |      (CAST(coalesce(n_a, 0) AS DOUBLE) + CAST(tv.v AS DOUBLE))) AS q
        |  FROM big LEFT JOIN tnab USING (a, b) LEFT JOIN tna USING (a), tv),
        |tgt AS (
        |  SELECT doc_id,
        |    floor((CAST(sum(CAST(floor(q * 10000000.0 + 0.5) AS HUGEINT)) AS DOUBLE)
        |      / 10000000.0 / count(*)) * 10000.0 + 0.5) / 10000.0 AS nll_target
        |  FROM per2 GROUP BY doc_id)
        |SELECT s.doc_id, s.n_bigrams, s.nll_self, tgt.nll_target,
        |  floor((s.nll_self - tgt.nll_target) * 10000.0 + 0.5) / 10000.0
        |    AS dsir_weight
        |FROM s JOIN tgt USING (doc_id)""".stripMargin,
    // Group-by-character formulation of the same fixed-point formula:
    // per-char counts, quantized c·ln c terms summed as HUGEINT, then
    // H = ln n − (s/1e7)/n at the shared floor-form rounding.
    // Grouped by a synthetic row id, not doc_id: the engine computes
    // text stats per document ROW (doc_id is a label), so duplicate
    // doc_ids must stay distinct rows and a NULL doc_id must survive —
    // a doc_id GROUP BY merges the former and row-multisets diverge.
    "text_char_entropy" ->
      """WITH docs AS (
        |  SELECT doc_id, text, row_number() OVER () AS __rid FROM documents),
        |ch AS (
        |  SELECT __rid, doc_id, unnest(string_split(text, '')) AS c
        |  FROM docs WHERE text IS NOT NULL AND len(text) > 0),
        |cnt AS (
        |  SELECT __rid, doc_id, c, count(*) AS k FROM ch GROUP BY 1, 2, 3),
        |agg AS (
        |  SELECT __rid, doc_id,
        |    CAST(sum(k) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS d,
        |    CAST(sum(CAST(floor(CAST(k AS DOUBLE) * ln(CAST(k AS DOUBLE))
        |      * 1e7 + 0.5) AS HUGEINT)) AS DOUBLE) / 1e7 AS s
        |  FROM cnt GROUP BY 1, 2)
        |SELECT doc_id, n AS n_ch, d AS n_distinct_ch,
        |  floor((ln(n) - s / n) * 10000.0 + 0.5) / 10000.0 AS char_entropy
        |FROM agg""".stripMargin,
    "text_quality_score" ->
      """SELECT doc_id,
        |  length(text) AS n_chars_measured,
        |  len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |  floor((CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> x IN ('the','a','and','of','to','in','is'))) AS DOUBLE)
        |    / greatest(len(string_split_regex(trim(text), '\s+')), 1)) * 10000.0 + 0.5) / 10000.0 AS stopword_ratio,
        |  floor((CAST(length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
        |    / greatest(length(text), 1)) * 10000.0 + 0.5) / 10000.0 AS alpha_ratio
        |FROM documents""".stripMargin,
    "text_lang_id" ->
      """SELECT doc_id, en_score, de_score, es_score,
        |  CASE WHEN en_score >= de_score AND en_score >= es_score THEN 'en'
        |       WHEN de_score >= es_score THEN 'de' ELSE 'es' END AS predicted_lang,
        |  lang AS labeled_lang
        |FROM (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> x IN ('the','a','and','of','to','in','is'))) AS en_score,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> x IN ('der','die','das','und','ist','ein'))) AS de_score,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> x IN ('el','la','los','y','es','un'))) AS es_score
        |  FROM documents)""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint
        |FROM documents""".stripMargin,
    "text_pii_mask" ->
      """WITH raw AS (
        |  SELECT c_custkey,
        |    'contact ' || lower(regexp_replace(c_name, '#', '', 'g'))
        |    || '@example.com or call +1 (555) 010-'
        |    || printf('%04d', c_custkey % 10000)
        |    || ' ip 10.0.' || CAST(c_custkey % 256 AS VARCHAR) || '.7 ref '
        |    || c_mktsegment AS txt
        |  FROM customer)
        |SELECT c_custkey,
        |  regexp_replace(regexp_replace(regexp_replace(txt,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
        |    '[0-9][0-9 ()+-]{6,}[0-9]', '<PHONE>', 'g') AS masked
        |FROM raw""".stripMargin,
    // `cust` mirrors the engine's uniqueKeyed + non-null-name gate
    "text_fuzzy_multipass" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_name FROM customer
        |  WHERE c_custkey IS NOT NULL AND c_name IS NOT NULL
        |    AND c_custkey IN (
        |      SELECT c_custkey FROM customer GROUP BY c_custkey HAVING count(*) = 1)),
        |dirty AS (
        |  SELECT c_custkey AS d_id,
        |    CASE WHEN c_custkey % 3 = 0 THEN substr(c_name, 1, length(c_name) - 1) || 'Q'
        |         WHEN c_custkey % 3 = 1 THEN 'K' || substr(c_name, 2)
        |         ELSE substr(c_name, 1, 1) || substr(c_name, 3) END AS d_name
        |  FROM cust),
        |cand AS (
        |  SELECT d.d_id AS dirty_id, d.d_name AS dirty_name,
        |    c.c_custkey AS match_id, c.c_name AS match_name,
        |    CAST(levenshtein(d.d_name, c.c_name) AS BIGINT) AS dist
        |  FROM dirty d JOIN cust c
        |    ON substr(d.d_name, length(d.d_name) - 2, 3)
        |     = substr(c.c_name, length(c.c_name) - 2, 3)
        |  WHERE levenshtein(d.d_name, c.c_name) <= 2
        |  UNION
        |  SELECT d.d_id, d.d_name, c.c_custkey, c.c_name,
        |    CAST(levenshtein(d.d_name, c.c_name) AS BIGINT)
        |  FROM dirty d JOIN cust c
        |    ON substr(d.d_name, 1, 1) || substr(d.d_name, length(d.d_name) - 3, 3)
        |     = substr(c.c_name, 1, 1) || substr(c.c_name, length(c.c_name) - 3, 3)
        |  WHERE levenshtein(d.d_name, c.c_name) <= 2),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY dirty_id
        |    ORDER BY dist, match_id) AS rn FROM cand)
        |SELECT dirty_id, dirty_name, match_id, match_name, dist
        |FROM ranked WHERE rn = 1""".stripMargin,
    "text_bm25_topdocs" ->
      """WITH dl AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS dl
        |  FROM documents
        |  WHERE len(string_split_regex(trim(text), '\s+')) > 0),
        |tf AS (
        |  SELECT doc_id, dl, term, count(*) AS tf FROM (
        |    SELECT doc_id, dl, unnest(toks) AS term FROM dl)
        |  GROUP BY doc_id, dl, term),
        |q AS (
        |  SELECT * FROM (VALUES
        |    (CAST(1 AS BIGINT), 'spark'), (1, 'join'),
        |    (2, 'window'), (2, 'agg'), (2, 'batch'),
        |    (3, 'hash'), (3, 'merge'), (3, 'table')) AS t(query_id, term)),
        |dfreq AS (
        |  SELECT term, count(*) AS df FROM tf
        |  WHERE term IN (SELECT term FROM q) GROUP BY term),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
        |per AS (
        |  SELECT q.query_id, tf.doc_id,
        |    ln(1.0 + (CAST(s.n_docs - f.df AS DOUBLE) + 0.5) / (CAST(f.df AS DOUBLE) + 0.5)) *
        |      (CAST(tf.tf AS DOUBLE) * (1.2 + 1.0)) /
        |      (CAST(tf.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 +
        |        0.75 * CAST(tf.dl AS DOUBLE) * CAST(s.n_docs AS DOUBLE) / CAST(s.sum_dl AS DOUBLE)))
        |      AS s1
        |  FROM tf JOIN q ON tf.term = q.term JOIN dfreq f ON tf.term = f.term, stats s),
        |scored AS (
        |  SELECT query_id, doc_id,
        |    floor((CAST(sum(CAST(floor(s1 * 10000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 10000000.0)
        |      * 10000.0 + 0.5) / 10000.0 AS score
        |  FROM per GROUP BY query_id, doc_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, doc_id ASC) AS rn FROM scored)
        |SELECT query_id, CAST(rn AS INTEGER) AS rank, doc_id, score
        |FROM ranked WHERE rn <= 5""".stripMargin,
    "text_contamination_score" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        |  FROM toks),
        |bsh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0),
        |tot AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
        |hit AS (
        |  SELECT doc_id, count(*) AS n_common FROM sh JOIN bsh USING (shingle)
        |  GROUP BY doc_id)
        |SELECT t.doc_id, t.n_shingles, coalesce(h.n_common, 0) AS n_common,
        |  floor((CAST(coalesce(h.n_common, 0) AS DOUBLE) / CAST(t.n_shingles AS DOUBLE))
        |    * 10000.0 + 0.5) / 10000.0 AS contamination
        |FROM tot t LEFT JOIN hit h USING (doc_id)""".stripMargin,
    // Same counts, same left-associated double products in the ratio
    // (integer products would wrap at corpus scale), same single ln.
    "text_pmi_bigrams" ->
      """WITH toks AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS t FROM documents
        |  WHERE len(string_split_regex(trim(text), '\s+')) >= 2),
        |nw AS (
        |  SELECT w, count(*) AS n_w
        |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
        |tot AS (SELECT CAST(sum(n_w) AS BIGINT) AS n_tokens FROM nw),
        |big AS (
        |  SELECT t[i] AS a, t[i + 1] AS b FROM (
        |    SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks)),
        |nab AS (SELECT a, b, count(*) AS n_ab FROM big GROUP BY a, b),
        |bt AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n_bigrams FROM nab)
        |SELECT nab.a, nab.b, nab.n_ab,
        |  floor(ln(
        |    (CAST(n_ab AS DOUBLE) * CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)) /
        |    (CAST(n_bigrams AS DOUBLE) * CAST(na.n_w AS DOUBLE) * CAST(nb.n_w AS DOUBLE))
        |  ) * 10000.0 + 0.5) / 10000.0 AS pmi
        |FROM nab
        |JOIN nw na ON nab.a = na.w
        |JOIN nw nb ON nab.b = nb.w, tot, bt
        |WHERE n_ab >= 5""".stripMargin,
    "text_bigram_nll" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |  WHERE len(string_split_regex(trim(text), '\s+')) >= 2),
        |big AS (
        |  SELECT doc_id, t[i] AS a, t[i + 1] AS b FROM (
        |    SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks)),
        |nab AS (SELECT a, b, count(*) AS n_ab FROM big GROUP BY a, b),
        |na AS (SELECT a, sum(n_ab) AS n_a FROM nab GROUP BY a),
        |v AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(t) AS w FROM toks)),
        |per AS (
        |  SELECT big.doc_id,
        |    -ln((CAST(coalesce(n_ab, 0) AS DOUBLE) + 1.0) /
        |      (CAST(coalesce(n_a, 0) AS DOUBLE) + CAST(v.v AS DOUBLE))) AS q
        |  FROM big LEFT JOIN nab USING (a, b) LEFT JOIN na USING (a), v)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  floor((CAST(sum(CAST(floor(q * 10000000.0 + 0.5) AS HUGEINT)) AS DOUBLE)
        |    / 10000000.0 / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_nll
        |FROM per GROUP BY doc_id""".stripMargin,
    // The oracle replays the three per-doc multiplicity counts the
    // engine's sorted-run fold computes, via explode + group-by (exact
    // integer counts; fractions are one double divide + round).
    // Keyed on a synthetic row id (see text_char_entropy): per-ROW
    // stats, duplicate doc_ids stay distinct, and the final three-way
    // join is on the never-null __rid (a USING (doc_id) join silently
    // drops a NULL-doc_id document). The row_number MUST be ordered:
    // `toks` is referenced four times and DuckDB INLINES the CTE into
    // four independent ROW_NUMBER computations (verified via EXPLAIN),
    // so an OVER () id is aligned across them only by insertion order —
    // a scan-order change (preserve_insertion_order=false) would join
    // stats from DIFFERENT documents. Ordered by (doc_id, text): ties
    // are identical rows, whose stats are identical under any rid
    // permutation, so determinism up to ties is alignment enough.
    "text_repetition_stats" ->
      """WITH toks AS (
        |  SELECT row_number() OVER (ORDER BY doc_id, text) AS __rid, doc_id,
        |    string_split_regex(trim(text), '\s+') AS t FROM documents
        |  WHERE len(string_split_regex(trim(text), '\s+')) >= 3),
        |uni AS (SELECT __rid, unnest(t) AS g FROM toks),
        |bi AS (
        |  SELECT __rid, unnest(list_transform(generate_series(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i + 1])) AS g FROM toks),
        |tri AS (
        |  SELECT __rid, unnest(list_transform(generate_series(1, len(t) - 2),
        |    i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS g FROM toks),
        |cu AS (SELECT __rid, g, count(*) AS c FROM uni GROUP BY __rid, g),
        |cb AS (SELECT __rid, g, count(*) AS c FROM bi GROUP BY __rid, g),
        |ct AS (SELECT __rid, g, count(*) AS c FROM tri GROUP BY __rid, g),
        |su AS (SELECT __rid, max(c) AS mx, sum(c) AS tot FROM cu GROUP BY __rid),
        |sb AS (SELECT __rid, max(c) AS mx, sum(c) AS tot FROM cb GROUP BY __rid),
        |st AS (SELECT __rid,
        |         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup, sum(c) AS tot
        |       FROM ct GROUP BY __rid)
        |SELECT t.doc_id, CAST(su.tot AS BIGINT) AS n_tokens,
        |  floor((CAST(su.mx AS DOUBLE) / CAST(su.tot AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS top_token_frac,
        |  floor((CAST(sb.mx AS DOUBLE) / CAST(sb.tot AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS top_bigram_frac,
        |  floor((CAST(st.dup AS DOUBLE) / CAST(st.tot AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS dup_trigram_frac
        |FROM toks t JOIN su USING (__rid) JOIN sb USING (__rid) JOIN st USING (__rid)""".stripMargin,
    // DuckDB list slicing t[i:i+3] is inclusive → 4 tokens, matching
    // Spark's slice(t, i, 4).
    "text_span_crossdup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |  WHERE len(string_split_regex(trim(text), '\s+')) >= 4),
        |sp AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, len(t) - 3),
        |      i -> array_to_string(t[i:i+3], ' '))) AS span
        |  FROM toks)
        |SELECT span, count(*) AS n_docs FROM sp
        |GROUP BY span HAVING count(*) >= 2""".stripMargin,
    // Same span CTEs; the blocklist joins back against the per-doc
    // spans and the coverage fraction uses the floor-form rounding.
    "text_span_coverage" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |  WHERE len(string_split_regex(trim(text), '\s+')) >= 4),
        |sp AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, len(t) - 3),
        |      i -> array_to_string(t[i:i+3], ' '))) AS span
        |  FROM toks),
        |blk AS (
        |  SELECT span FROM sp GROUP BY span HAVING count(*) >= 2)
        |SELECT sp.doc_id, count(*) AS n_spans, count(blk.span) AS n_boiler,
        |  floor((CAST(count(blk.span) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS boiler_frac
        |FROM sp LEFT JOIN blk ON sp.span = blk.span
        |GROUP BY sp.doc_id""".stripMargin,
    // Same guarded p·ln(p/m) terms, same 1e-7 fixed-point summation —
    // the oracle replays the formula token for token.
    "text_js_divergence" ->
      """WITH ca AS (
        |  SELECT w, count(*) AS na FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents WHERE doc_id % 2 = 0) GROUP BY w),
        |cb AS (
        |  SELECT w, count(*) AS nb FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents WHERE doc_id % 2 = 1) GROUP BY w),
        |j AS (
        |  SELECT coalesce(ca.w, cb.w) AS w, coalesce(na, 0) AS na,
        |         coalesce(nb, 0) AS nb
        |  FROM ca FULL OUTER JOIN cb ON ca.w = cb.w),
        |tot AS (
        |  SELECT sum(na) AS ta, sum(nb) AS tb,
        |    sum(CASE WHEN na > 0 THEN 1 ELSE 0 END) AS va,
        |    sum(CASE WHEN nb > 0 THEN 1 ELSE 0 END) AS vb,
        |    sum(CASE WHEN na > 0 AND nb > 0 THEN 1 ELSE 0 END) AS vs
        |  FROM j),
        |pq AS (
        |  SELECT ta, tb, va, vb, vs,
        |    CASE WHEN na > 0 THEN CAST(na AS DOUBLE) / CAST(ta AS DOUBLE) ELSE 0.0 END AS p,
        |    CASE WHEN nb > 0 THEN CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE) ELSE 0.0 END AS q
        |  FROM j, tot),
        |per AS (
        |  SELECT ta, tb, va, vb, vs,
        |    (CASE WHEN p > 0 THEN 0.5 * (p * ln(p / ((p + q) / 2.0))) ELSE 0.0 END +
        |     CASE WHEN q > 0 THEN 0.5 * (q * ln(q / ((p + q) / 2.0))) ELSE 0.0 END) AS c
        |  FROM pq),
        |jsd AS (
        |  SELECT coalesce(
        |    floor((CAST(sum(CAST(floor(c * 10000000.0 + 0.5) AS HUGEINT)) AS DOUBLE)
        |      / 10000000.0) * 1000000.0 + 0.5) / 1000000.0,
        |    CAST(0.0 AS DOUBLE)) AS jsd
        |  FROM per)
        |SELECT CAST(coalesce(ta, 0) AS BIGINT) AS n_tokens_a,
        |  CAST(coalesce(tb, 0) AS BIGINT) AS n_tokens_b,
        |  CAST(coalesce(va, 0) AS BIGINT) AS vocab_a,
        |  CAST(coalesce(vb, 0) AS BIGINT) AS vocab_b,
        |  CAST(coalesce(vs, 0) AS BIGINT) AS vocab_shared, jsd.jsd
        |FROM tot, jsd""".stripMargin,
    // ^ total form (scalar aggregates, coalesced zeros), NOT a GROUP BY
    // over the five totals: the engine's jsDivergence emits exactly ONE
    // row even over two empty corpora — a deliberate monitoring
    // contract (see TextOps.jsDivergence) — while the grouped form
    // would emit zero rows there. Identical on any non-empty corpus
    // (the five totals are constants — one group either way).
    // Degenerate-cardinality sweep, r10.
    // fold form, not list_dot_product: a NULL vector or NULL element
    // must yield a NULL norm (the engine kernel null-propagates);
    // DuckDB's list_dot_product raises on NULL elements instead.
    "emb_norms" ->
      """SELECT vec_id, label,
        |  floor((sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
        |    (a, b) -> a + b))) * 10000.0 + 0.5) / 10000.0 AS l2_norm
        |FROM embeddings""".stripMargin,
    // both sides from the eligibility CTE (engine: norm > 0 on query
    // AND corpus in bruteForceTopK)
    "sim_cosine_topk" ->
      s"""WITH $EmbNormCte
        |SELECT query_id, rank, neighbor_id, cos_sim FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    floor((list_cosine_similarity(q.vec, c.vec)) * 10000.0 + 0.5) / 10000.0
        |      AS cos_sim,
        |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |      floor((list_cosine_similarity(q.vec, c.vec)) * 10000.0 + 0.5) / 10000.0
        |        DESC, c.vec_id ASC) AS rank
        |  FROM v q JOIN v c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 10)
        |WHERE rank <= 3""".stripMargin,
    // The oracle mirrors sq8/sq8Dequant's exact operation order (IEEE
    // doubles are deterministic when the expression tree matches).
    "sim_sq8_topk" ->
      s"""WITH $EmbNormCte,
        |dq AS (
        |  SELECT vec_id,
        |    list_transform(
        |      list_transform(vec, x -> floor((x / norm + 1) / 2 * 255 + 0.5)),
        |      cd -> cd * 2.0 / 255.0 - 1.0) AS dq
        |  FROM v)
        |SELECT query_id, rank, neighbor_id, approx_cos FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    floor((list_dot_product(q.dq, c.dq)) * 10000.0 + 0.5) / 10000.0 AS approx_cos,
        |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |      floor((list_dot_product(q.dq, c.dq)) * 10000.0 + 0.5) / 10000.0 DESC, c.vec_id ASC) AS rank
        |  FROM dq q JOIN dq c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 10)
        |WHERE rank <= 3""".stripMargin,
    // The v CTE mirrors the engine's materialized projection:
    // fold-form norm (NULL vector / NULL element -> NULL norm, never
    // pairs) and `norm > 0` (the zero-norm never-pairs contract,
    // Similarity.blockedNearDup norm filter).
    "sim_blocked_neardup" ->
      s"""WITH $EmbNormCte
        |SELECT a.label AS block, a.vec_id AS id_a, b.vec_id AS id_b,
        |  floor((list_cosine_similarity(a.vec, b.vec)) * 10000.0 + 0.5) / 10000.0
        |    AS cos_sim
        |FROM v a JOIN v b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE floor((list_cosine_similarity(a.vec, b.vec)) * 10000.0 + 0.5) / 10000.0
        |  >= 0.35""".stripMargin,
    // Transitive closure by recursive min-label propagation over the
    // same blocked exact-cosine pairs as sim_blocked_neardup.
    "dedup_embedding_components" ->
      s"""WITH RECURSIVE $EmbNormCte,
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM v a JOIN v b
        |    ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE floor((list_cosine_similarity(a.vec, b.vec)) * 10000.0 + 0.5) / 10000.0
        |    >= 0.35),
        |e AS (SELECT id_a AS u, id_b AS v FROM pairs
        |      UNION SELECT id_b, id_a FROM pairs),
        |n AS (SELECT DISTINCT u AS node FROM e),
        |reach(node, r) AS (
        |  SELECT node, node FROM n
        |  UNION
        |  SELECT e.v, reach.r FROM reach JOIN e ON e.u = reach.node)
        |SELECT node AS vec_id, min(r) AS dup_group FROM reach GROUP BY node""".stripMargin,
    "mm_decode_image" ->
      """SELECT doc_id,
        |  8 + doc_id % 9 AS width,
        |  4 + doc_id % 5 AS height,
        |  (8 + doc_id % 9) * (4 + doc_id % 5) AS n_pixels,
        |  CAST(doc_id % 256 AS DOUBLE) AS mean_r,
        |  CAST(length(text) % 256 AS DOUBLE) AS mean_g,
        |  CAST((doc_id * 7) % 256 AS DOUBLE) AS mean_b
        |FROM documents
        |WHERE doc_id IS NOT NULL AND text IS NOT NULL""".stripMargin,
    "mm_resize_image" ->
      """SELECT doc_id,
        |  CAST(8 AS BIGINT) AS width,
        |  CAST(8 AS BIGINT) AS height,
        |  CAST(64 AS BIGINT) AS n_pixels,
        |  CAST(doc_id % 256 AS DOUBLE) AS mean_r,
        |  CAST(length(text) % 256 AS DOUBLE) AS mean_g,
        |  CAST((doc_id * 7) % 256 AS DOUBLE) AS mean_b
        |FROM documents
        |WHERE doc_id IS NOT NULL AND text IS NOT NULL""".stripMargin,
    "mm_decode_stub" ->
      """SELECT doc_id, strlen(text) AS byte_len, substr(md5(text), 1, 8) AS fp8,
        |  strlen(text) // 64 + 1 AS n_frames
        |FROM documents
        |WHERE doc_id IS NOT NULL AND text IS NOT NULL""".stripMargin,
    "mm_frame_sample" ->
      """WITH fr AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0, strlen(text) // 64, 2)) AS f
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL)
        |SELECT doc_id, f AS frame_idx,
        |  substr(md5(substring(text, CAST(f * 64 + 1 AS BIGINT), 64)), 1, 8) AS frame_fp
        |FROM fr""".stripMargin
  )
}
