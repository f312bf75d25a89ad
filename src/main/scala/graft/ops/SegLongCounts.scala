package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.graftbridge.MemoryBridge
import org.apache.spark.memory.{MemoryConsumer, MemoryMode}

/** A task-side `long` count table in GCLocker-safe segments, charged
  * to the task's execution-memory grant.
  *
  * The hot-shingle bucketed detector keeps one `width × 8`-byte count
  * table per task — 16 MiB at the default 2²¹ width, 32 MiB on the
  * escalated rerun. A single flat array of that size is a multi-region
  * humongous allocation on G1 (anything ≥ half a region; 8 MiB regions
  * on the measured heaps), the exact allocation class that raced
  * Spark's JNI-LZ4 GCLocker criticals and OOM'd nondeterministically
  * at the 300× scale point before the r15c kernel redesign
  * (dev/SCALE_r15c.md addendum 2) — and 32 of them land SIMULTANEOUSLY
  * at stage start. This table applies the same remedy the kernel got
  * (§17.5 checklist item: fixed ≤ 2 MiB segments, never one big
  * array): a two-level `Array[Array[Long]]` with 256 Ki-long inner
  * segments, one extra array dereference per access. Widths ≤ one
  * segment stay a single flat array (no indirection where none is
  * needed).
  *
  * The table's bytes are also acquired from the `TaskMemoryManager`
  * as an ON_HEAP grant (the [[LongRunSort]] treatment) so the pool
  * sees `width × 8 × concurrentTasks` instead of it hiding beside the
  * managed consumers. A count table cannot spill without changing the
  * detector's semantics, so the consumer DECLINES pressure (returns
  * 0, like Spark's own non-spillable consumers) and an under-granted
  * acquire proceeds — the table is a fixed, plan-validated size, and
  * the bound lives in the width clamp (2²², enforced by a `require`
  * at the detector's entry AND by the escalation arithmetic —
  * `text/Dedup.MaxBucketWidth`), not the grant. Quantified worst
  * case (the LongRunSort one-segment-slack treatment): an
  * under-granted acquire can over-subscribe the pool by at most
  * `width × 8` bytes per task = 16 MiB at the default 2²¹ width,
  * 32 MiB on the escalated 2²² rerun — ≤ 1 GiB across a 32-task
  * executor in the escalated regime, ~6% of the measured 16 GiB
  * heaps, visible in the pool's accounting for whatever fraction WAS
  * granted. The grant is released by the task-completion listener
  * (the emit iterator reads the table lazily until the task ends).
  * Outside a task the table is plain heap, as before.
  */
private[graft] final class SegLongCounts(width: Int) {
  require(width >= 1, s"width must be >= 1, got $width")

  private val SegShift = 18 // 256 Ki longs = 2 MiB per segment
  private val SegLen = 1 << SegShift
  private val SegMask = SegLen - 1

  locally {
    val ctx = TaskContext.get()
    val tmm = MemoryBridge.taskMemoryManager(ctx)
    if (tmm != null) {
      val consumer = new MemoryConsumer(tmm, tmm.pageSizeBytes(), MemoryMode.ON_HEAP) {
        override def spill(size: Long, trigger: MemoryConsumer): Long = 0L
      }
      val got = consumer.acquireMemory(width.toLong * 8)
      ctx.addTaskCompletionListener[Unit](_ => consumer.freeMemory(got))
    }
  }

  private val flat: Array[Long] = if (width <= SegLen) new Array[Long](width) else null
  private val segs: Array[Array[Long]] =
    if (flat != null) null
    else Array.tabulate((width + SegLen - 1) / SegLen) { i =>
      new Array[Long](math.min(SegLen, width - i * SegLen))
    }

  def inc(b: Int): Unit =
    if (flat != null) flat(b) += 1
    else segs(b >>> SegShift)(b & SegMask) += 1

  def get(b: Int): Long =
    if (flat != null) flat(b)
    else segs(b >>> SegShift)(b & SegMask)
}
