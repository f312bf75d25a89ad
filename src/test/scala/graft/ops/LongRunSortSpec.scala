package graft.ops

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** [[LongRunSort]] is the in-task sort kernel behind the dedup stats
  * pass — these specs pin it standalone (no Spark) so the spill + merge
  * machinery is exercised deterministically at chunk sizes the scale
  * points never force. */
class LongRunSortSpec extends AnyFunSuite {

  private def reference(xs: Seq[Long]): Seq[(Long, Long)] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)

  test("random multisets at every chunk size == driver groupBy, sorted") {
    val gen = for {
      n <- Gen.chooseNum(0, 5000)
      // a narrow value domain forces long runs; a wide one forces
      // mostly-unique keys (the production regime)
      dom <- Gen.oneOf(3L, 17L, 1000L, Long.MaxValue)
      xs <- Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue)
        .map(v => if (dom == Long.MaxValue) v else math.floorMod(v, dom)))
    } yield xs
    val cases = Gen.listOfN(12, gen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { xs =>
      val want = reference(xs)
      // chunk 2 = maximal spill-file count; 64 = a few files; 1<<20 =
      // the zero-file in-memory fast path
      for (chunk <- Seq(2, 64, 1 << 20)) {
        val got = LongRunSort.sortedRuns(xs.iterator, chunk).toSeq
        assert(got == want, s"chunk=$chunk n=${xs.size}")
        // run-lengths must re-sum to the input size (no element lost
        // at a chunk boundary)
        assert(got.map(_._2).sum == xs.size.toLong, s"chunk=$chunk")
      }
    }
  }

  test("a run spanning several spill files merges into ONE run") {
    // 10 copies of the same value through chunk=3: the run crosses
    // three spill files and the final buffer — the merge must emit a
    // single (v, 10) run, not per-cursor fragments
    val got = LongRunSort.sortedRuns(Iterator.fill(10)(42L), 3).toSeq
    assert(got == Seq((42L, 10L)))
    // and interleaved with neighbors that also span boundaries
    val xs = Seq(5L, 42L, 5L, 42L, 5L, 42L, 5L, 42L, 5L, 42L, 7L)
    val got2 = LongRunSort.sortedRuns(xs.iterator, 2).toSeq
    assert(got2 == Seq((5L, 5L), (7L, 1L), (42L, 5L)))
  }

  test("empty input, single element, extreme values") {
    assert(LongRunSort.sortedRuns(Iterator.empty, 8).isEmpty)
    assert(LongRunSort.sortedRuns(Iterator.single(Long.MinValue), 8).toSeq ==
      Seq((Long.MinValue, 1L)))
    val xs = Seq(Long.MaxValue, Long.MinValue, 0L, Long.MaxValue, Long.MinValue)
    assert(LongRunSort.sortedRuns(xs.iterator, 2).toSeq ==
      Seq((Long.MinValue, 2L), (0L, 1L), (Long.MaxValue, 2L)))
  }

  test("spill files are deleted as the merge drains them") {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    def spillCount = tmp.listFiles((_, n) => n.startsWith("graft-lruns")).length
    val before = spillCount
    val runs = LongRunSort.sortedRuns((1 to 1000).map(_.toLong % 50).iterator, 16)
    assert(spillCount > before, "expected spill files at chunk=16 over 1000 elems")
    runs.foreach(_ => ()) // drain
    assert(spillCount == before, "drained merge must delete its spill files")
  }

  test("rejects a degenerate chunk budget") {
    intercept[IllegalArgumentException] {
      LongRunSort.sortedRuns(Iterator.single(1L), 1)
    }
  }

  test("derived default budget stays inside the documented envelope") {
    // chunkLongs <= 0 means "derive from this JVM": a quarter of the
    // per-core heap share, floored at 1 Mi longs, capped at the 512
    // MiB ceiling — the budget is unmanaged heap, so the derivation
    // (not a flat constant) is what keeps N concurrent tasks from
    // summing past the executor's heap (review r15c)
    val d = LongRunSort.derivedChunkLongs()
    assert(d >= (1 << 20) && d <= LongRunSort.MaxDefaultChunkLongs)
    val cores = math.max(1, Runtime.getRuntime.availableProcessors)
    assert(d.toLong * 8 * cores * 4 <= Runtime.getRuntime.maxMemory ||
      d == (1 << 20), s"derived $d longs x $cores cores exceeds a quarter of heap")
    // and the zero sentinel routes through the derivation
    assert(LongRunSort.sortedRuns(Seq(3L, 1L, 3L).iterator, 0).toSeq ==
      Seq((1L, 1L), (3L, 2L)))
  }
}
