package graft.text

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Property tests for the density-routed dedup path (r11): on random
  * small-vocabulary corpora (high shingle overlap — the regime that
  * routes), for every band width the routed pairs must be a subset of
  * the exact path's pairs CARRYING THE EXACT VALUES (the confirm
  * recomputes Jaccard from the same retained arrays; banding may only
  * lose recall, never change a value), planted exact duplicates
  * (s = 1) must always surface at 1.0, and the confirm stage's
  * broadcast and shuffled shapes must be value-identical. One planted
  * duplicate pair per corpus guarantees nonzero candidate mass, so
  * `maxCandidatePairs = 0` + `routeDense = true` always exercises the
  * banded route rather than degenerating to the exact path. */
class DedupPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")

  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.chooseNum(6, 18)
    docs <- Gen.listOfN(n, for {
      len <- Gen.chooseNum(4, 9)
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
  } yield {
    val ids = docs.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
    // plant one exact duplicate of doc 1 so candidate mass > 0 and the
    // planted pair (1, n+1) is a guaranteed s = 1 recall witness
    ids :+ ((n + 1).toLong, docs.head)
  }

  private def pairs(df: org.apache.spark.sql.DataFrame,
                    route: Boolean, bands: Int = 16): Map[(Long, Long), Double] =
    Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.5,
        maxCandidatePairs = if (route) 0L else Dedup.DefaultMaxCandidatePairs,
        routeDense = route, bandedBands = bands)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

  test("routed pairs are value-equal subsets of exact, any band width; planted dup always found") {
    val cases = Gen.listOfN(4, corpusGen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val exact = pairs(df, route = false)
      val dupKey = (1L, corpus.length.toLong)
      assert(exact.get(dupKey).contains(1.0), s"exact missed the planted dup: $exact")
      Seq(8, 16, 32).foreach { b =>
        val routed = pairs(df, route = true, bands = b)
        routed.foreach { case (k, v) =>
          assert(exact.get(k).contains(v),
            s"bands=$b pair $k=$v not value-equal to exact ${exact.get(k)} (corpus=$corpus)") }
        assert(routed.get(dupKey).contains(1.0),
          s"bands=$b missed the planted s=1 duplicate (corpus=$corpus)")
      }
    }
  }

  test("bandedConfirm: broadcast and shuffled shapes value-identical on random corpora") {
    val cases = Gen.listOfN(3, corpusGen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val base = graft.ops.Exec.materialize(
        Dedup.shingleHashArray(df, "doc_id", "text", 3)
          .select(col("doc_id"), col("__sh").as("__r"))
          .filter(size(col("__r")) > 0))
      val cand = Dedup.minhashCandidatesFromSigs(
          base.select(col("doc_id"),
            graft.functions.MinHashSigs.sigs(col("__r"), 32).as("signature")),
          "doc_id", 32, 16, 0.0)
        .select(col("id_a"), col("id_b"))
      def run(bcast: Boolean, maxIdBytes: Long = Dedup.MaxBroadcastIdBytes) =
        Dedup.bandedConfirm(cand, base, "doc_id", 0.5, broadcastConfirm = bcast,
            maxIdBytes = maxIdBytes)
          .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      // all four shapes: broadcast confirm; dense branch with a
      // broadcast-id prune (default budget), with a SHUFFLED-semi
      // prune (zero id budget), and the two gates' data-driven picks —
      // every route must be value-identical on the same corpus (r13:
      // the dense branch gained the prune tiers)
      val bc = run(true)
      val prunedBcastIds = run(false)
      val prunedShuffledIds = run(false, maxIdBytes = 0L)
      assert(bc == prunedBcastIds,
        s"broadcast/pruned diverged on corpus=$corpus: $bc vs $prunedBcastIds")
      assert(bc == prunedShuffledIds,
        s"broadcast/shuffled-semi diverged on corpus=$corpus: $bc vs $prunedShuffledIds")
    }
  }

  test("hotShinglesBucketed == exact aggregate: random corpora, collision-heavy widths, any partitioning") {
    // r13: the cheap df-stats pass must produce the EXACT blacklist —
    // the pigeonhole-superset + exact-confirm construction proves it;
    // this differential pins it under the stressors the proof leans
    // on: tiny widths (every bucket a multi-shingle collision), random
    // caps straddling the planted cohort's df, and repartitioning
    // (which moves the per-partition threshold and which buckets turn
    // suspect — the RESULT must not move).
    val gen = for {
      n <- Gen.chooseNum(4, 20)           // cohort size (block df)
      singles <- Gen.chooseNum(3, 12)     // clean docs
      cap <- Gen.chooseNum(1, 25)
    } yield (n, singles, cap)
    val cases = Gen.listOfN(6, gen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { case (n, singles, cap) =>
      val docs = ((1 to n).map(i =>
          (i.toLong, s"shared block of boiler text here unique$i tail$i")) ++
        (1 to singles).map(j =>
          ((100 + j).toLong, s"clean doc number$j body$j words$j")))
        .toDF("doc_id", "text")
      def arr(parts: Int) = Dedup.shingleHashArray(
        docs.repartition(parts), "doc_id", "text", distinct = false)
      val want = Dedup.hotShinglesExact(arr(2), cap.toLong).toSet
      for (width <- Seq(2, 8, 64); parts <- Seq(1, 3, 7)) {
        // escalate = false pins the collision-heavy tiny-width regime
        // itself (the escalated run still relies on its correctness at
        // its own N/W ratio)
        val got = Dedup.hotShinglesBucketedOpt(arr(parts), cap.toLong, width,
          escalate = false).get
        assert(got.blacklist.toSet == want,
          s"n=$n singles=$singles cap=$cap width=$width parts=$parts: " +
            s"${got.blacklist.toSet} != $want")
      }
      // and the ESCALATED path end-to-end: width=2 with these corpora
      // always trips the N/width > cap/2 check, so this exercises the
      // sentinel-measured rerun — the blacklist must not move
      val esc = Dedup.hotShinglesBucketedOpt(arr(3), cap.toLong, 2).get
      assert(esc.blacklist.toSet == want,
        s"escalated run diverged: n=$n cap=$cap: ${esc.blacklist.toSet} != $want")
    }
  }

  test("shingleStats sort-fold == aggregate spec: blacklist and routing mass, any partitioning") {
    // r14: the exact-path stats pass (one sorted shuffle + run-length
    // fold) replaced the groupBy whose final-stage hash maps spilled
    // 43 GiB at the 100x scale point (VERDICT r13 #3). The fold must
    // produce the SAME hot blacklist and the SAME routing mass as the
    // aggregate formulation, under any input partitioning (the
    // explicit hash repartition pins per-key co-location; this
    // differential is the executable proof values don't move).
    val gen = for {
      n <- Gen.chooseNum(4, 20)
      singles <- Gen.chooseNum(3, 12)
      cap <- Gen.chooseNum(1, 25)
    } yield (n, singles, cap)
    val cases = Gen.listOfN(6, gen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    def summarize(df: org.apache.spark.sql.DataFrame) = {
      val rows = df.collect()
      (rows.filter(_.getInt(0) == 0).map(_.getLong(1)).toSet,
        rows.filter(_.getInt(0) == 1).map(_.getDouble(2)).sum)
    }
    cases.foreach { case (n, singles, cap) =>
      val docs = ((1 to n).map(i =>
          (i.toLong, s"shared block of boiler text here unique$i tail$i")) ++
        (1 to singles).map(j =>
          ((100 + j).toLong, s"clean doc number$j body$j words$j")))
        .toDF("doc_id", "text")
      for (parts <- Seq(1, 3, 7)) {
        val arr = Dedup.shingleHashArray(docs.repartition(parts), "doc_id", "text", 3)
        val (gotHot, gotMass) = summarize(Dedup.shingleStats(arr, cap.toLong))
        val (wantHot, wantMass) = summarize(Dedup.shingleStatsAgg(arr, cap.toLong))
        assert(gotHot == wantHot,
          s"n=$n singles=$singles cap=$cap parts=$parts: blacklist $gotHot != $wantHot")
        assert(gotMass == wantMass,
          s"n=$n singles=$singles cap=$cap parts=$parts: mass $gotMass != $wantMass")
      }
    }
    // empty corpus: zero hot rows, zero mass (the partial rows sum to 0)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val (eHot, eMass) = summarize(Dedup.shingleStats(
      Dedup.shingleHashArray(empty, "doc_id", "text", 3), 5L))
    assert(eHot.isEmpty && eMass == 0.0)
    // and the kernel's SPILL path inside a real task (r15: the in-task
    // primitive sort spills LZ4 raw-long files past its chunk budget —
    // a 2-long chunk forces maximal spill + k-way merge on every
    // partition; blacklist and mass must not move)
    val docsSp = ((1 to 12).map(i =>
        (i.toLong, s"shared block of boiler text here unique$i tail$i")) ++
      (1 to 5).map(j => ((100 + j).toLong, s"clean doc number$j body$j")))
      .toDF("doc_id", "text")
    val arrSp = Dedup.shingleHashArray(docsSp, "doc_id", "text", 3)
    spark.conf.set("spark.graft.dedup.statsChunkLongs", "2")
    try {
      val (spHot, spMass) = summarize(Dedup.shingleStats(arrSp, 3L))
      val (wHot, wMass) = summarize(Dedup.shingleStatsAgg(arrSp, 3L))
      assert(spHot == wHot && spMass == wMass,
        s"spill-path fold diverged: ($spHot, $spMass) != ($wHot, $wMass)")
    } finally spark.conf.unset("spark.graft.dedup.statsChunkLongs")
  }

  test("minhashCandidateIds sort-fold distinct == .distinct() spec twin, any partitioning") {
    // r15: the cross-band pair-distinct is a run-length fold over an
    // explicit 4x-width repartition + sort (the hash-aggregate shape
    // held ~every candidate pair per task — mostly-unique keys — and
    // spilled 6.1 GiB at the 100x scale point). The fold must emit
    // exactly the distinct pair set of the raw band-collision stream,
    // under any input partitioning, and the id-only path must equal
    // the estimate path's ids at minEstimate = 0 (what the routed
    // confirm consumes).
    val cases = Gen.listOfN(4, corpusGen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { corpus =>
      for (parts <- Seq(1, 5)) {
        val df = corpus.toDF("doc_id", "text").repartition(parts)
        val sigs = graft.ops.Exec.materialize(
          Dedup.minhashSignatures(df, "doc_id", "text", 32, Long.MaxValue))
        def pairSet(d: org.apache.spark.sql.DataFrame) =
          d.collect().map(r => (r.getLong(0), r.getLong(1)))
        val got = pairSet(Dedup.minhashCandidateIds(sigs, "doc_id", 32, 16))
        assert(got.length == got.toSet.size,
          s"fold emitted duplicate pairs (corpus=$corpus parts=$parts)")
        val want = pairSet(
          Dedup.bandPairsRaw(sigs, "doc_id", 32, 16).distinct()).toSet
        assert(got.toSet == want,
          s"sort-fold distinct != .distinct() spec twin (corpus=$corpus parts=$parts)")
        val estIds = pairSet(
          Dedup.minhashCandidatesFromSigs(sigs, "doc_id", 32, 16, 0.0)
            .select(col("id_a"), col("id_b"))).toSet
        assert(got.toSet == estIds,
          s"id-only candidates != estimate-path ids at minEstimate=0 (corpus=$corpus)")
      }
    }
  }

  test("auto cap resolution: engages exactly on the mass threshold; engaged == manual-cap signatures") {
    val cases = Gen.listOfN(4, corpusGen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { corpus =>
      val df = corpus.toDF("doc_id", "text")
      // measure the true hot mass at the default cap via the detector
      // itself (unit-pinned against the exact aggregate above)
      val arr = Dedup.shingleHashArray(df, "doc_id", "text", distinct = false)
      val mass = Dedup.hotShinglesBucketed(arr, Dedup.DefaultMaxShingleDf).hotMass
      // threshold ABOVE the mass → never engage: resolution is uncapped
      val off = Dedup.resolveMinhashCap(df, "doc_id", "text",
        Dedup.AutoShingleDf, engageHotPairs = mass + 1.0)
      assert(off.cap == Long.MaxValue && off.blacklist.isEmpty)
      // threshold at -1 → engage whenever ANY hot mass exists (these
      // tiny corpora have none at df>1000, so engagement yields an
      // EMPTY blacklist — capped semantics, identical values); a
      // negative threshold also bypasses the r14 row-count skip gate,
      // so this exercises the full detector mechanics at any N
      val on = Dedup.resolveMinhashCap(df, "doc_id", "text",
        Dedup.AutoShingleDf, engageHotPairs = -1.0)
      assert(on.cap == Dedup.DefaultMaxShingleDf && on.blacklist.isDefined)
      val engaged = Dedup.minhashSignaturesResolved(df, "doc_id", "text", 16,
        on).collect().map(r => (r.getLong(0), r.getSeq[Int](1).toVector)).toSet
      val manual = Dedup.minhashSignatures(df, "doc_id", "text", 16,
        maxShingleDf = Dedup.DefaultMaxShingleDf)
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toVector)).toSet
      assert(engaged == manual,
        s"engaged-auto signatures diverge from the manual cap on corpus=$corpus")
    }
  }
}
