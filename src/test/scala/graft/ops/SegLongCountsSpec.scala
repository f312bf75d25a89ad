package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** [[SegLongCounts]] backs the hot-shingle detector's per-task bucket
  * table — these specs pin the two-level layout against a flat-array
  * reference across the flat/segmented boundary, and the grant
  * accounting inside a real task. */
class SegLongCountsSpec extends AnyFunSuite {

  private val SegLen = 1 << 18

  test("differential vs a flat array across the layout boundary") {
    // widths straddling the single-segment fast path, exact segment
    // multiples, and ragged last segments
    for (width <- Seq(1, 7, SegLen - 1, SegLen, SegLen + 1, 2 * SegLen, 3 * SegLen + 13)) {
      val seg = new SegLongCounts(width)
      val ref = new Array[Long](width)
      val rnd = new scala.util.Random(width) // deterministic per width
      // hammer random buckets plus every boundary index
      val hits = Seq.fill(5000)(rnd.nextInt(width)) ++
        Seq(0, width - 1) ++
        (1 to width / SegLen).flatMap(k => Seq(k * SegLen - 1, math.min(k * SegLen, width - 1)))
      hits.foreach { b => seg.inc(b); ref(b) += 1 }
      val bad = (0 until width).find(b => seg.get(b) != ref(b))
      assert(bad.isEmpty, s"width=$width first mismatch at $bad")
    }
  }

  test("no allocation is ever bigger than one 2 MiB segment") {
    // the point of the class (§17.5 item f): the escalated 2^22 width
    // must decompose into 256 Ki-long segments, never one flat array —
    // pinned structurally via reflection on the private fields
    val t = new SegLongCounts(1 << 22)
    val segsF = classOf[SegLongCounts].getDeclaredField("segs")
    val flatF = classOf[SegLongCounts].getDeclaredField("flat")
    segsF.setAccessible(true); flatF.setAccessible(true)
    assert(flatF.get(t) == null, "a 32 MiB width must not allocate flat")
    val segs = segsF.get(t).asInstanceOf[Array[Array[Long]]]
    assert(segs.length == (1 << 22) / SegLen)
    assert(segs.forall(_.length <= SegLen))
    assert(segs.map(_.length.toLong).sum == (1L << 22))
  }

  test("in-task: the table is charged to the execution grant and released") {
    val spark = graft.SparkTestSession.spark
    // the detector's default width (2²¹ = 16 MiB) AND the escalated
    // rerun's clamp (2²² = 32 MiB) — the width whose 32-task worst
    // case the class doc quantifies at 1 GiB/executor (VERDICT r16 #3)
    for (width <- Seq(1 << 21, 1 << 22)) {
      val segLen = SegLen // local copy: the closure must not capture the suite
      val out = spark.sparkContext.parallelize(Seq(0), 1).mapPartitions { _ =>
        val tmm = org.apache.spark.graftbridge.MemoryBridge
          .taskMemoryManager(org.apache.spark.TaskContext.get())
        val before = tmm.getMemoryConsumptionForThisTask
        val t = new SegLongCounts(width)
        t.inc(0); t.inc(width - 1); t.inc(segLen); t.inc(segLen - 1)
        val during = tmm.getMemoryConsumptionForThisTask
        Iterator((before, during,
          t.get(0) + t.get(width - 1) + t.get(segLen) + t.get(segLen - 1)))
      }.collect()
      val (before, during, sum) = out(0)
      assert(during - before >= width.toLong * 8,
        s"width=$width: the table's bytes must be visible to the memory manager, " +
          s"delta=${during - before}")
      assert(sum == 4L, s"width=$width")
    }
    // the release happens in the task-completion listener; a fresh
    // task on the same scheduler must start from a clean grant
    val residual = spark.sparkContext.parallelize(Seq(0), 1).mapPartitions { _ =>
      Iterator(org.apache.spark.graftbridge.MemoryBridge
        .taskMemoryManager(org.apache.spark.TaskContext.get())
        .getMemoryConsumptionForThisTask)
    }.collect()(0)
    assert(residual == 0L, s"fresh task must start with a zero grant, got $residual")
  }
}
