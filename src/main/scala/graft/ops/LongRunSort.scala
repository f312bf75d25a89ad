package graft.ops

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  DataOutputStream, File, FileInputStream, FileOutputStream}

import net.jpountz.lz4.{LZ4BlockInputStream, LZ4BlockOutputStream}
import org.apache.spark.TaskContext

/** In-task sorted run-length streaming over a single `Long` column.
  *
  * The generic row path (`sortWithinPartitions` → UnsafeExternalSorter)
  * carries ~36 bytes per record for an 8-byte payload: a 16-byte
  * single-long UnsafeRow + length word in the data pages plus a 16-byte
  * pointer/prefix entry in the sort array. For the dedup stats pass that
  * overhead is the WHOLE memory story — the 100× scale point spilled
  * 6.6 GiB of sorter memory re-sorting what is physically a stream of
  * longs (dev/SCALE_r15.md §2; the width ladder is exhausted — 6× width
  * regresses into map-side shuffle-writer spill). This kernel sorts the
  * same stream at exactly 8 bytes/element:
  *
  *   - elements accumulate into ONE primitive `long[]` chunk (grown
  *     geometrically to `chunkLongs`, so small partitions never allocate
  *     the full budget) and are sorted in place (`java.util.Arrays.sort`,
  *     primitive dual-pivot — no comparator, no boxing);
  *   - if the input outgrows the chunk, the sealed sorted chunk streams
  *     to an LZ4-framed raw-long temp file (sequential write, 8 B/long
  *     pre-compression) and the buffer is reused — task memory stays
  *     bounded at `chunkLongs × 8` bytes no matter the partition size,
  *     preserving the graceful degradation the generic sorter had;
  *   - runs stream from the final buffer directly (the common, zero-file
  *     case) or from a k-way merge of the spill files + last buffer.
  *
  * Spill files live in `java.io.tmpdir`, are deleted eagerly as each
  * drains, and are registered with the task's completion listener so an
  * abandoned iterator (task kill, downstream early-out) still cleans up.
  *
  * This is deliberately NOT a general sorter: one column, fixed width,
  * no comparator — the narrowness is what buys the 4.5× density. Callers
  * with composite keys (e.g. the candidate-pair distinct) keep the
  * spillable `sortWithinPartitions` fold.
  */
private[graft] object LongRunSort {

  /** Default chunk budget: 64 Mi longs = 512 MiB/task ceiling (the
    * buffer GROWS geometrically, so a task only ever allocates ~2× its
    * actual element count). At the stats pass's 4×-session-width
    * partitioning the 100× scale point runs entirely in memory — zero
    * spill measured where the generic sorter spilled 6.6/4.7 GiB
    * (dev/SCALE_r15c.md). The knob (`spark.graft.dedup.statsChunkLongs`)
    * exists for executors whose per-core memory cannot carry the
    * ceiling — Spark does not account this buffer, so it must fit
    * beside the execution-memory grant. */
  val DefaultChunkLongs: Int = 64 * 1024 * 1024

  /** Allocation-free run stream: `nextRun()` advances to the next
    * (value, count) pair, readable from `runValue` / `runCount` — no
    * per-run boxing. With mostly-unique keys (the production stats
    * regime) a tuple-per-run iterator allocates ~3 objects per INPUT
    * element; at ~10⁹ elements that GC churn costs more than the spill
    * it saves, so the production fold consumes this cursor directly. */
  trait RunCursor {
    var runValue: Long = 0L
    var runCount: Long = 0L
    def nextRun(): Boolean
  }

  /** Sorted (value, runLength) stream of the multiset `it` — the
    * boxed convenience view over [[runCursor]] (spec/differential use;
    * the hot path consumes the cursor). */
  def sortedRuns(it: Iterator[Long], chunkLongs: Int = DefaultChunkLongs): Iterator[(Long, Long)] = {
    val c = runCursor(it, chunkLongs)
    new Iterator[(Long, Long)] {
      private var hasPending = false
      private def advance(): Unit = if (!hasPending) hasPending = c.nextRun()
      def hasNext: Boolean = { advance(); hasPending }
      def next(): (Long, Long) = {
        advance()
        if (!hasPending) throw new NoSuchElementException("runs drained")
        hasPending = false
        (c.runValue, c.runCount)
      }
    }
  }

  /** The primitive-cursor form of [[sortedRuns]]. */
  def runCursor(it: Iterator[Long], chunkLongs: Int = DefaultChunkLongs): RunCursor = {
    require(chunkLongs >= 2, s"chunkLongs must be >= 2, got $chunkLongs")
    val spills = new scala.collection.mutable.ArrayBuffer[File]()
    val ctx = TaskContext.get()
    if (ctx != null) ctx.addTaskCompletionListener[Unit] { _ =>
      spills.foreach(f => if (f.exists()) f.delete())
    }
    var buf = new Array[Long](math.min(chunkLongs, 1 << 14))
    var n = 0
    while (it.hasNext) {
      if (n == buf.length) {
        if (n < chunkLongs) {
          val grown = new Array[Long](math.min(chunkLongs.toLong, n * 2L).toInt)
          System.arraycopy(buf, 0, grown, 0, n)
          buf = grown
        } else {
          java.util.Arrays.sort(buf, 0, n)
          spills += writeSpill(buf, n)
          n = 0
        }
      }
      buf(n) = it.next(); n += 1
    }
    java.util.Arrays.sort(buf, 0, n)
    if (spills.isEmpty) bufferRuns(buf, n)
    else mergedRuns(spills.toArray.map(openSpill) :+ bufferCursor(buf, n))
  }

  private def writeSpill(sorted: Array[Long], n: Int): File = {
    val f = File.createTempFile("graft-lruns", ".lz4")
    val out = new DataOutputStream(new LZ4BlockOutputStream(
      new BufferedOutputStream(new FileOutputStream(f), 1 << 16)))
    try {
      out.writeLong(n.toLong)
      var i = 0
      while (i < n) { out.writeLong(sorted(i)); i += 1 }
    } finally out.close()
    f
  }

  /** A drained-in-order source for the merge: `head` is valid while
    * `hasHead`; `advance()` moves past it (closing/deleting a spill
    * file at its end). */
  private trait Cursor {
    var hasHead: Boolean
    var head: Long
    def advance(): Unit
  }

  private def bufferCursor(buf: Array[Long], n: Int): Cursor = new Cursor {
    private var i = 0
    var hasHead: Boolean = n > 0
    var head: Long = if (n > 0) buf(0) else 0L
    def advance(): Unit = {
      i += 1
      if (i < n) head = buf(i) else hasHead = false
    }
  }

  private def openSpill(f: File): Cursor = new Cursor {
    private val in = new DataInputStream(new LZ4BlockInputStream(
      new BufferedInputStream(new FileInputStream(f), 1 << 16)))
    private var remaining = in.readLong()
    var hasHead: Boolean = false
    var head: Long = 0L
    advance0()
    private def advance0(): Unit =
      if (remaining > 0) { head = in.readLong(); remaining -= 1; hasHead = true }
      else { hasHead = false; in.close(); f.delete() }
    def advance(): Unit = advance0()
  }

  private def bufferRuns(buf: Array[Long], n: Int): RunCursor =
    new RunCursor {
      private var i = 0
      def nextRun(): Boolean = {
        if (i >= n) return false
        val v = buf(i)
        var c = 0L
        while (i < n && buf(i) == v) { c += 1; i += 1 }
        runValue = v; runCount = c
        true
      }
    }

  private def mergedRuns(cursors: Array[Cursor]): RunCursor = {
    val heap = new java.util.PriorityQueue[Cursor](
      math.max(1, cursors.length),
      (a: Cursor, b: Cursor) => java.lang.Long.compare(a.head, b.head))
    cursors.foreach(c => if (c.hasHead) heap.add(c))
    new RunCursor {
      def nextRun(): Boolean = {
        if (heap.isEmpty) return false
        val v = heap.peek().head
        var c = 0L
        while (!heap.isEmpty && heap.peek().head == v) {
          val cur = heap.poll()
          // count v's run within this cursor before re-offering it
          while (cur.hasHead && cur.head == v) { c += 1; cur.advance() }
          if (cur.hasHead) heap.add(cur)
        }
        runValue = v; runCount = c
        true
      }
    }
  }
}
