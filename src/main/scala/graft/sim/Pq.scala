package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Exprs

/** Product quantization (PQ) for embedding columns — the ANN
  * compression regime BETWEEN [[Similarity.sq8]] (uniform per-component
  * codes, 1 byte/dim) and raw floats: split each L2-normalized vector
  * into `m` subvectors, learn a seeded KMeans codebook of `k` centroids
  * per subspace, and store each vector as just `m` small codes — the
  * shipped demo uses m=8, k=32 on 64-dim vectors: 8 byte-range codes vs
  * 64 float32s, a 32× shrink byte-packed at rest (8× in this demo's
  * plain array<int> in-memory form). Search scores a query against the
  * RECONSTRUCTION
  * (concatenated assigned centroids), the asymmetric-distance scheme:
  * query side stays exact float, corpus side travels as codes.
  *
  * Scale shape: codebooks are tiny (m·k·(dim/m) doubles) — fit once on
  * a bounded sample, persist like any model artifact (S5), embed in the
  * plan as a LITERAL, so encode/decode are pure projections over the
  * scan: no shuffle, no UDF, no per-query fitting. The code column is
  * what shuffles/broadcasts/caches at 100 TB; exact vectors are read
  * only to rerank survivors.
  *
  * Encoding is expression-only: per subspace, squared distances to all
  * k centroids via codegen'd HOFs over the literal codebook, argmin by
  * `array_position(d2, array_min(d2))` (first minimum — deterministic
  * tie-break). The outer per-centroid lambda references its subvector,
  * so the normalize+slice chain evaluates per CENTROID (m·k times per
  * row — the CollapseProject behavior documented on
  * Dedup.shingleHashArray; a constant factor comparable to the
  * distance arithmetic itself, not a blowup). Encode is a WRITE-path
  * op regardless: codes are computed once at ingest and stored; the
  * search path reads stored codes and never re-encodes the corpus. */
object Pq {

  /** [m][k][dim/m] centroid array — the whole index artifact. */
  type Codebooks = Array[Array[Array[Double]]]

  /** L2-normalize a float-array column (the query-side prep every ADC
    * scorer shares). */
  def normalized(vec: Column): Column =
    normalizedBy(vec, sqrt(Similarity.dot(vec, vec)))

  /** [[normalized]] against a PRE-COMPUTED norm column: the eligibility
    * filter (`norm > 0`) already paid one VecDot per row — reusing that
    * norm here keeps the filtered paths at ONE dot-product pass instead
    * of two (the r10 eligibility filters initially doubled the kernel
    * work in encode/rerank; measured on the sf0.1 bench). */
  def normalizedBy(vec: Column, nrm: Column): Column = {
    val vd = transform(vec, x => x.cast("double"))
    zip_with(vd, array_repeat(nrm, size(vec)), (x, n) => x / n)
  }

  /** Fit one seeded KMeans per subspace on (a sample of) `df`.
    * Deterministic for fixed seed and input (seed + j per subspace).
    *
    * All m subspace slices are materialized in ONE cached pass over the
    * (sampled) source, and the m fits run CONCURRENTLY — each fit is a
    * handful of tiny jobs whose wall-clock is scheduler overhead, not
    * compute, so sequential fits would pay that overhead m times in a
    * row. The eager count before the futures stops the concurrent fits
    * racing to compute the same cached partitions. */
  def fit(df: DataFrame, vecCol: String, m: Int, k: Int,
          seed: Long = 42L, trainFraction: Double = 1.0): Codebooks = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    // probe the dimension on a non-null vector: a NULL in the first row
    // would surface as an opaque NPE from getInt instead of a clear error
    val firstRow = df.filter(col(vecCol).isNotNull).select(size(col(vecCol))).head(1)
    require(firstRow.nonEmpty,
      s"cannot fit PQ codebooks on an empty or all-null '$vecCol' frame")
    val dim = firstRow.head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    // Similarity.eligible: normalized() divides by the norm, so a NULL
    // / NULL-element / zero-norm vector is an ANSI DIVIDE_BY_ZERO (or
    // poison centroids) — outside the shared ANN contract
    val src = df.filter(graft.sim.Similarity.eligible(col(vecCol)))
    val sampled =
      if (trainFraction < 1.0) src.sample(withReplacement = false, trainFraction, seed)
      else src
    val sliced = sampled
      .withColumn("__pq_norm", normalized(col(vecCol)))
      .select((0 until m).map(j =>
        array_to_vector(slice(col("__pq_norm"), j * sub + 1, sub)).as(s"__fv$j")): _*)
      .cache()
    // the require lives INSIDE the try: callers are invited to catch
    // this domain error and fall back to brute force, so the throw
    // path must unpersist too or every degenerate fit leaks a cached
    // frame (review sweep r10)
    try {
      // eager count doubles as the domain contract: KMeans on fewer
      // than k training rows dies with an uncontextualized MLlib
      // ArrayIndexOutOfBoundsException (degenerate-cardinality sweep,
      // r10)
      val nTrain = sliced.count()
      require(nTrain >= k,
        s"cannot fit PQ codebooks with k=$k on $nTrain eligible training " +
          s"vector(s) — lower k (or raise trainFraction), or use brute-force " +
          s"search for corpora this small")
      val fits = (0 until m).map(j => Future {
        new KMeans().setK(k).setSeed(seed + j).setMaxIter(5).setInitSteps(1)
          .setFeaturesCol(s"__fv$j").setPredictionCol("__cell")
          .fit(sliced).clusterCenters.map(_.toArray)
      })
      // bounded await: an executor hang must fail the fit with the stuck
      // subspace named, not stall the driver forever with no diagnostic
      fits.zipWithIndex.map { case (f, j) =>
        try Await.result(f, Duration(10, java.util.concurrent.TimeUnit.MINUTES))
        catch { case _: java.util.concurrent.TimeoutException =>
          throw new IllegalStateException(
            s"PQ subspace $j KMeans fit did not complete within 10 minutes")
        }
      }.toArray
    } finally { sliced.unpersist(); () }
  }

  /** Persist / reload the codebooks as a plain JSON-ish text artifact
    * (doubles round-trip via their shortest-repr strings — bit-exact,
    * asserted in PqSpec). Crash-safe publish through the Hadoop FS API
    * (the bloomOrLoad pattern: write `<path>.tmp-<uuid>`, then
    * rename): a half-written file is never visible at `path`, and two
    * racing writers each publish a COMPLETE file — the rename loser
    * adopts the winner (identical content anyway: fixed-seed fits over
    * the same stamped source). java.io/java.nio would silently miss on
    * any non-local defaultFS. */
  def save(cb: Codebooks, path: String,
           conf: org.apache.hadoop.conf.Configuration = activeHadoopConf): Unit = {
    // header derived from the ACTUAL shape (a direct save has no
    // separate "requested" shape, so a later [[fitOrLoad]] with a
    // LARGER requested k will — correctly — reject it; round-trip a
    // direct save through [[load]], or use [[fitOrLoad]] end to end):
    // every artifact carries the '#pq' header, because [[load]]
    // requires it and the text-parsing DuckDB oracle reads line 1 as
    // the header unconditionally — a headerless file would be served
    // by a tolerant engine while the oracle misparses it (subspace 0
    // skipped, rows shifted)
    require(cb.nonEmpty && cb.forall(_.nonEmpty),
      s"PQ save at $path: empty codebook (m=${cb.length}" +
        s"${if (cb.nonEmpty) s", min centroids=${cb.map(_.length).min}" else ""})" +
        " — refusing to stamp a degenerate '#pq' header")
    writeAtomic(s"#pq m=${cb.length} k=${cb.map(_.length).max}\n" + render(cb),
      path, conf)
  }

  /** [[save]] with the REQUESTED fit shape stamped into a header line:
    * a fit may legitimately return fewer than `k` centroids (KMeans on
    * a subspace with fewer distinct points), so the actual codebook
    * shape cannot distinguish "fit for k=16" from "fit for k=32, got
    * 16" — the header can, and [[fitOrLoad]] uses it to reject a
    * stale artifact from a different requested shape LOUDLY. */
  private def saveWithMeta(cb: Codebooks, m: Int, k: Int, path: String,
                           conf: org.apache.hadoop.conf.Configuration): Unit =
    writeAtomic(s"#pq m=$m k=$k\n" + render(cb), path, conf)

  private def render(cb: Codebooks): String =
    cb.map(_.map(_.map(d =>
      java.lang.Double.toString(d)).mkString(",")).mkString(";")).mkString("\n")

  private def writeAtomic(txt: String, path: String,
                          conf: org.apache.hadoop.conf.Configuration): Unit = {
    // the shared file-publish protocol ([[graft.Ioops.commitFileAtomic]]):
    // entry-broken capture, job-unique temp, failed-write cleanup,
    // adopt-the-winner with post-rename verification — a racing loser
    // can never erase a complete codebook, and a non-race rename
    // failure is loud
    val p = new org.apache.hadoop.fs.Path(path)
    graft.Ioops.commitFileAtomic(p.getFileSystem(conf), p)(out =>
      out.write(txt.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  /** One Hadoop conf for EVERY filesystem touch in this module: the
    * probe, the write, and the read must resolve scheme-less paths
    * against the SAME defaultFS — a session that sets fs.defaultFS
    * programmatically (spark.hadoop.*) with no core-site.xml on the
    * classpath would otherwise probe one filesystem and write another,
    * publishing an artifact its own post-publish load cannot find. */
  private def activeHadoopConf: org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  def load(path: String,
           conf: org.apache.hadoop.conf.Configuration = activeHadoopConf): Codebooks =
    parseArtifact(readText(path, conf))._2

  private def readText(path: String,
                       conf: org.apache.hadoop.conf.Configuration): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(conf).open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
  }

  /** (requested shape from the header, codebooks). The header is
    * REQUIRED: `fitOrLoad` always writes one, so a headerless file is a
    * pre-header generation — tolerated loads used to serve it fine
    * while the `sim_ivfpq_topk` DuckDB oracle (which reads the codebook
    * as text and takes line 1 as the header unconditionally) misparsed
    * it, skipping subspace 0 and shifting every row: a FALSE
    * correctness failure. Throwing here routes the legacy artifact
    * through `tryLoad`'s unparseable→rebuild path instead, keeping the
    * engine and the oracle reading one format. */
  private def parseArtifact(txt: String): ((Int, Int), Codebooks) = {
    val lines = txt.split("\n")
    if (!lines.head.startsWith("#pq "))
      throw new IllegalArgumentException(
        "codebook artifact missing '#pq m=.. k=..' header (pre-header generation) — rebuild")
    val mk = "m=(\\d+) k=(\\d+)".r.findFirstMatchIn(lines.head)
      .getOrElse(throw new IllegalArgumentException(
        s"unparseable codebook header: ${lines.head}"))
    ((mk.group(1).toInt, mk.group(2).toInt),
      lines.tail.map(_.split(";").map(_.split(",")
        .map(java.lang.Double.parseDouble))))
  }

  /** Artifact-shape check: a stale path from a fit with a different
    * shape would otherwise load silently and encode/decode garbage.
    * `m` must match EXACTLY (code layout and sub-dimension slicing
    * depend on it); `k` is an UPPER bound, not an equality — KMeans
    * legitimately returns fewer centroids than requested when a
    * subspace has fewer distinct points (tiny or degenerate corpora),
    * and a freshly-fit artifact must pass the same check its future
    * loaders apply. Every subspace needs ≥1 centroid and one
    * consistent sub-dimension. */
  private def validated(cb: Codebooks, m: Int, k: Int, path: String): Codebooks = {
    require(cb.length == m && cb.forall(s => s.length >= 1 && s.length <= k),
      s"codebook artifact at $path has shape (m=${cb.length}, k=${cb.headOption.map(_.length).getOrElse(0)}), expected (m=$m, k<=$k)")
    val sub = cb.head.head.length
    require(cb.forall(_.forall(_.length == sub)),
      s"codebook artifact at $path has ragged centroid dimensions")
    cb
  }

  private val loaded = new java.util.concurrent.ConcurrentHashMap[(String, Int, Int), Codebooks]

  /** Train-once/probe-many entry, mirroring [[Ivf.fitOrLoad]]. The cache
    * key includes (m, k): two calls naming the same path with different
    * shapes must collide loudly in `validated`, not silently share —
    * a SHAPE mismatch still throws (caller error), while an UNPARSEABLE
    * artifact (truncation, external tamper) rebuilds, the safe
    * direction for a corruption gate. Probe via the Hadoop FS API
    * (java.io.File misses on non-local defaultFS). */
  def fitOrLoad(df: DataFrame, vecCol: String, m: Int, k: Int, path: String,
                seed: Long = 42L, trainFraction: Double = 1.0): Codebooks =
    loaded.computeIfAbsent((path, m, k), _ => {
      val conf = df.sparkSession.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      def tryLoad(): Option[Codebooks] =
        if (!fs.exists(p)) None
        else (try Some(parseArtifact(readText(path, conf)))
              catch { case scala.util.control.NonFatal(_) => None })
          .map { case ((am, ak), cb) =>
            // shape mismatch: still loud. The header carries the
            // REQUESTED shape, so a stale artifact fit for a smaller k
            // cannot silently satisfy a larger-k request (the actual
            // centroid counts cannot distinguish those two cases)
            require(am == m && ak == k,
              s"codebook artifact at $path was fit for (m=$am, k=$ak), " +
                s"requested (m=$m, k=$k) — stale or mis-keyed artifact path")
            validated(cb, m, k, path)
          }
      tryLoad().getOrElse {
        saveWithMeta(fit(df, vecCol, m, k, seed, trainFraction), m, k, path, conf)
        tryLoad().getOrElse(throw new IllegalStateException(
          s"codebook artifact unreadable immediately after publish: $path"))
      }
    })

  /** ONE subspace's k×sub centroid table as a literal — every consumer
    * binds per-subspace literals instead of `typedLit(whole codebook)
    * .getItem(j)` repeated per subspace reference, which embedded the
    * FULL m×k×sub table m times over in the expression tree (an m×
    * plan/task-binary bloat at deployment shapes). */
  private def subLit(cb: Codebooks, j: Int): Column =
    typedLit(cb(j).map(_.toSeq).toSeq)

  /** In-action dimension guard: a vector whose length doesn't match the
    * codebook's m·sub would otherwise be SILENTLY sliced against the
    * wrong subspaces (codes/reconstructions/scores computed over a
    * prefix — the stale-artifact failure the (m, k) header cannot see,
    * because the header doesn't know the data's dimensionality). One
    * size() compare per row; raises a diagnosable error naming both.
    * A NULL vector passes through as null (null codes / null score —
    * the pre-guard behavior): it has no dimensionality to mismatch,
    * and aborting a whole index build over one null embedding row —
    * with a "-1 dims" message, no less — is the wrong loudness. */
  private def dimGuarded(vec: Column, m: Int, sub: Int): Column =
    when(vec.isNull, lit(null).cast("array<double>"))
      .when(size(vec) === m * sub, vec)
      .otherwise(raise_error(format_string(
        s"pq: vector of %s dims does not match the codebook's m*sub=${m * sub} " +
          "— stale codebook artifact for a different embedding dimension?",
        size(vec).cast("string"))).cast("array<double>"))

  /** Add `pq_codes` (array<int>, length m) to `df` — one codegen'd
    * projection against the literal codebooks. */
  def encode(df: DataFrame, vecCol: String, cb: Codebooks): DataFrame = {
    val m = cb.length
    val sub = cb.head.head.length
    // Similarity.eligible at the encode gate: one filter covers every
    // caller (index build, flat ADC scan, rerank) — ineligible vectors
    // have no meaningful codes and the normalization would divide by
    // zero. The filter's norm is REUSED for the normalization
    // (normalizedBy), keeping encode at one dot-product per row.
    val withSubs = df.withColumn("__pq_vnorm", Similarity.l2Norm(col(vecCol)))
      .filter(col("__pq_vnorm") > 0)
      .withColumn("__pq_norm",
        dimGuarded(normalizedBy(col(vecCol), col("__pq_vnorm")), m, sub))
      .drop("__pq_vnorm")
      .select(df.columns.toIndexedSeq.map(col) ++ (0 until m).map(j =>
        slice(col("__pq_norm"), j * sub + 1, sub).as(s"__pq_sub$j")): _*)
    val codes = array((0 until m).map { j =>
      val cents = subLit(cb, j)
      val d2 = transform(cents, c =>
        aggregate(zip_with(col(s"__pq_sub$j"), c, (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x))
      (array_position(d2, array_min(d2)) - 1).cast("int")
    }: _*)
    withSubs.withColumn("pq_codes", codes)
      .drop((0 until m).map(j => s"__pq_sub$j"): _*)
  }

  /** Reconstruct the (approximate) normalized vector from codes:
    * concatenation of each subspace's assigned centroid. Statically
    * unrolled `concat` over per-subspace literals (value-identical to
    * a `flatten(transform(sequence(...)))` over the whole-codebook
    * literal, without embedding that literal inside a lambda the
    * optimizer can't prune). */
  def decode(codes: Column, cb: Codebooks): Column =
    concat(cb.indices.map(j =>
      element_at(subLit(cb, j), element_at(codes, j + 1) + 1)): _*)

  /** ADC by the lookup-table formulation — the OTHER standard ADC form:
    * instead of reconstructing the corpus vector and taking one dot
    * over all dims ([[decode]] + dot), score = Σ over subspaces of
    * (query subvector · assigned centroid), the per-subspace partial
    * dots a deployed scanner precomputes into an m×k table per query.
    * Mathematically identical to the reconstruction dot; floating-point
    * summation ORDER differs (per-subspace partials vs one left fold),
    * so the two agree to ~1e-14, not bit-exactly — the
    * `sim_pq_agree` scoreboard differential witnesses agreement at
    * 1e-9. `qNorm` must already be [[normalized]]. */
  def adcLutScore(qNorm: Column, codes: Column, cb: Codebooks): Column = {
    val m = cb.length
    val sub = cb.head.head.length
    // statically unrolled left-to-right sum over per-subspace literals —
    // the same fold order as the former aggregate(sequence(0, m-1))
    // form (0.0 + t0 + t1 + …), so scores are bit-identical; the query
    // side carries its own dimension guard (the corpus side is guarded
    // at encode)
    val q = dimGuarded(qNorm, m, sub)
    (0 until m).map { j =>
      aggregate(
        zip_with(
          slice(q, j * sub + 1, sub),
          element_at(subLit(cb, j), element_at(codes, j + 1) + 1),
          (a, b) => a * b),
        lit(0.0), (x, y) => x + y)
    }.foldLeft(lit(0.0))(_ + _)
  }

  /** ADC top-k: queries stay exact (normalized floats, broadcast); the
    * corpus is scored as its PQ reconstruction — same plan shape as
    * [[Similarity.sq8TopK]] with a far smaller corpus payload (see the
    * object doc for the exact shrink factors).
    *
    * The codes column is MATERIALIZED before decode: decode's
    * per-subspace lambda references it, and CollapseProject would
    * otherwise inline the whole argmin-encode expression into the
    * lambda — re-running the m·k distance scan m times per row (the
    * Dedup.shingleHashArray hazard, observed as a 2× query blowup at
    * sf0.1). Materializing is also the truthful deployment shape:
    * codes are STORED at ingest, search never re-encodes. */
  def adcTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, cb: Codebooks, k: Int = 3): DataFrame = {
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        Similarity.l2Norm(col(vecCol)).as("__qn"))
      .filter(col("__qn") > 0) // Similarity.eligible, norm reused below
      .select(col("query_id"), normalizedBy(col("__qv"), col("__qn")).as("q_norm")))
    val c = graft.ops.Exec.materialize(
        encode(corpus, vecCol, cb).select(col(idCol).as("neighbor_id"), col("pq_codes")))
      .select(col("neighbor_id"), decode(col("pq_codes"), cb).as("c_recon"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Exprs.r4(Similarity.dot(col("q_norm"), col("c_recon"))).as("approx_cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("approx_cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("approx_cos"))
  }

  /** Exact-cosine rerank of a (query_id, neighbor_id) shortlist: the
    * shortlist frame is tiny (queries × shortlist rows), so the rerank
    * join BROADCASTS it and the exact side is one corpus scan — no
    * shuffle. Returns AT MOST k rows per query: a query whose shortlist
    * carried fewer than k distinct neighbors (possible when ADC ties
    * collapse at the shortlist boundary) reranks what it has rather
    * than inventing rows — callers needing exactly-k must widen
    * `shortlist`. Shared tail of [[adcRerankTopK]] and
    * [[IvfPq.topK]]. */
  private[sim] def exactRerank(corpus: DataFrame, idCol: String, vecCol: String,
                               queries: DataFrame, short: DataFrame,
                               k: Int): DataFrame = {
    // corpus side: join the (tiny, broadcast) shortlist against RAW
    // vectors FIRST, normalize only the survivors — shortlist ids come
    // from the eligibility-gated encode/index paths, so every survivor
    // has a positive norm by provenance, and the whole-corpus
    // normalization pass r9 paid here disappears. The explicit
    // `norm > 0` guard still stands between any hostile shortlist and
    // the division. Query side: one dot, norm reused (normalizedBy).
    val survivors = broadcast(short.select(col("query_id"), col("neighbor_id")))
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")),
        "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), col("__cv"),
        Similarity.l2Norm(col("__cv")).as("__cn"))
      .filter(col("__cn") > 0)
      .select(col("query_id"), col("neighbor_id"),
        normalizedBy(col("__cv"), col("__cn")).as("c_norm"))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("__qv"), Similarity.l2Norm(col(vecCol)).as("__qn"))
      .filter(col("__qn") > 0)
      .select(col("query_id"), normalizedBy(col("__qv"), col("__qn")).as("q_norm")))
    val reranked = survivors
      .join(q, "query_id")
      .select(col("query_id"), col("neighbor_id"),
        Exprs.r4(Similarity.dot(col("q_norm"), col("c_norm"))).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    reranked.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
  }

  /** Production PQ search: ADC prunes the corpus to a per-query
    * `shortlist`, exact cosine reranks ONLY the survivors — the
    * two-stage scheme every deployed PQ index uses, because coarse
    * codes rank neighborhoods well but not the fine order within one.
    * Cost model at 100 TB: the codes column (m bytes/vector) carries
    * the full-corpus pass; float vectors are touched for
    * shortlist/corpus of the rows. May return fewer than k rows per
    * query (see [[exactRerank]]'s contract). */
  def adcRerankTopK(corpus: DataFrame, idCol: String, vecCol: String,
                    queries: DataFrame, cb: Codebooks,
                    k: Int = 3, shortlist: Int = 50): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val short = adcTopK(corpus, idCol, vecCol, queries, cb, shortlist)
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(corpus, idCol, vecCol, queries, short, k)
  }
}
