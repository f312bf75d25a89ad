package graft.ops

import java.io.{BufferedInputStream, BufferedOutputStream, Closeable,
  DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}

import net.jpountz.lz4.{LZ4BlockInputStream, LZ4BlockOutputStream, LZ4Factory}
import net.jpountz.xxhash.XXHashFactory
import org.apache.spark.{SparkEnv, TaskContext}

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
  *   - elements accumulate into FIXED-SIZE primitive `long[]` segments
  *     (≤ 2 MiB each — see [[SegCapLongs]] for why never larger; sizes
  *     climb a doubling ladder so small partitions stay frugal), each
  *     sorted in place when sealed (`java.util.Arrays.sort`, primitive
  *     dual-pivot — no comparator, no boxing, and no grow-and-copy:
  *     segments are append-only);
  *   - if the buffered segments outgrow the chunk budget, they
  *     merge-stream into ONE sorted LZ4-framed raw-long temp file
  *     (sequential write, 8 B/long pre-compression, primitive PQ loop)
  *     and memory returns to zero — task memory stays bounded at
  *     `chunkLongs × 8` bytes no matter the partition size, preserving
  *     the graceful degradation the generic sorter had;
  *   - runs stream from the single segment directly (the common small
  *     case) or from a k-way merge of spill files + in-memory segments.
  *
  * Spill files go to Spark's configured scratch space
  * (`SPARK_LOCAL_DIRS` / `spark.local.dir`, falling back to
  * `java.io.tmpdir` outside a Spark runtime — the generic sorter's
  * spill location, not the possibly RAM-backed /tmp), are deleted
  * eagerly as each drains, and both the open streams and the files are
  * registered with the task's completion listener so a killed task or
  * an abandoned iterator reclaims descriptors AND disk (deleting a
  * file under a live FD keeps its blocks reserved on Linux). Outside a
  * task (driver-side unit use) an abandoned partially-drained merge
  * leaks its remaining files until JVM exit — drain or stay under one
  * chunk there.
  *
  * The chunk budget is UNMANAGED heap — Spark's memory manager cannot
  * see it. The default is therefore derived from the executor itself
  * (a quarter of this JVM's per-core heap share, floored at 1 Mi longs
  * and capped at [[MaxDefaultChunkLongs]]), so N concurrent tasks stay
  * well under heap no matter the machine; the explicit knob
  * (`spark.graft.dedup.statsChunkLongs`) overrides the derivation for
  * operators that know their corpus.
  *
  * This is deliberately NOT a general sorter: one column, fixed width,
  * no comparator — the narrowness is what buys the 4.5× density. Callers
  * with composite keys (e.g. the candidate-pair distinct) keep the
  * spillable `sortWithinPartitions` fold.
  */
private[graft] object LongRunSort {

  /** Ceiling on the derived chunk budget: 64 Mi longs = 512 MiB/task.
    * On the measured boxes the derivation lands well below this (16g
    * heap / 32 cores → 16 Mi longs = 128 MiB/task, which still holds
    * the 100× scale point's ~6 M elements/task fully in memory — zero
    * spill, dev/SCALE_r15c.md); the ceiling exists so a huge-heap
    * low-core driver does not balloon a single task's buffer. */
  val MaxDefaultChunkLongs: Int = 64 * 1024 * 1024

  /** The executor-derived default chunk budget (see class doc): a
    * quarter of this JVM's per-core heap share, in longs. Evaluated
    * where the sort runs, so heterogeneous executors each get their
    * own bound. */
  def derivedChunkLongs(): Int = {
    val cores = math.max(1, Runtime.getRuntime.availableProcessors)
    val perTask = Runtime.getRuntime.maxMemory / 8 / cores / 4
    math.max(1L << 20, math.min(MaxDefaultChunkLongs.toLong, perTask)).toInt
  }

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
  def sortedRuns(it: Iterator[Long], chunkLongs: Int = 0): Iterator[(Long, Long)] = {
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

  /** Per-segment capacity: 256 Ki longs = 2 MiB. The kernel NEVER
    * allocates bigger than this — on a 16 GiB heap G1's regions are
    * 8 MiB and anything ≥ 4 MiB is a humongous allocation needing
    * contiguous regions; JDK 17 G1 retries a failed allocation only
    * twice while the GCLocker is held, and Spark's shuffle reader
    * decompresses through JNI criticals (lz4 JNI pins the buffer and
    * HOLDS the GCLocker) on every sibling core. A 128 MiB growth
    * allocation under that race OOMs with most of the heap free —
    * observed twice at the 300× scale point before this design
    * (dev/SCALE_r15c.md addendum 2). Segments also never copy: a
    * sealed segment is sorted in place and a new one allocated, so
    * there is no grow-and-copy transient either. */
  private val SegCapLongs: Int = 256 * 1024

  /** The primitive-cursor form of [[sortedRuns]]. `chunkLongs <= 0`
    * means "derive from this JVM" ([[derivedChunkLongs]]). */
  def runCursor(it: Iterator[Long], chunkLongs: Int = 0): RunCursor = {
    val chunk = if (chunkLongs <= 0) derivedChunkLongs() else chunkLongs
    require(chunk >= 2, s"chunkLongs must be >= 2, got $chunk")
    val segCap = math.min(SegCapLongs, chunk)
    val spills = new scala.collection.mutable.ArrayBuffer[File]()
    val streams = new scala.collection.mutable.ArrayBuffer[Closeable]()
    val ctx = TaskContext.get()
    if (ctx != null) ctx.addTaskCompletionListener[Unit] { _ =>
      // close BEFORE delete: a deleted file under a live descriptor
      // keeps its blocks reserved (and the FD allocated) until GC
      streams.foreach(s => try s.close() catch { case _: java.io.IOException => () })
      spills.foreach(f => if (f.exists()) f.delete())
    }
    // sealed, individually sorted segments awaiting merge; sizes climb
    // a doubling ladder to segCap (allocation only, never a copy) so
    // small partitions stay frugal
    val segs = new scala.collection.mutable.ArrayBuffer[Array[Long]]()
    val segLens = new scala.collection.mutable.ArrayBuffer[Int]()
    var buffered = 0L
    var buf = new Array[Long](math.min(segCap, 1 << 14))
    var n = 0
    def seal(): Unit = if (n > 0) {
      java.util.Arrays.sort(buf, 0, n)
      segs += buf; segLens += n; buffered += n
      buf = new Array[Long](math.min(segCap.toLong, buf.length * 2L).toInt)
      n = 0
    }
    while (it.hasNext) {
      if (n == buf.length) {
        seal()
        if (buffered + buf.length > chunk) {
          // budget reached: merge-stream every sealed segment into ONE
          // sorted spill file and drop them (memory returns to zero)
          writeSpill(segCursors(segs, segLens), buffered, spills)
          segs.clear(); segLens.clear(); buffered = 0L
        }
      }
      buf(n) = it.next(); n += 1
    }
    seal()
    if (spills.isEmpty && segs.length == 1) bufferRuns(segs(0), segLens(0))
    else if (spills.isEmpty && segs.isEmpty) bufferRuns(buf, 0)
    else mergedRuns(spills.toArray.map(openSpill(_, streams)) ++ segCursors(segs, segLens))
  }

  private def segCursors(segs: collection.Seq[Array[Long]],
      lens: collection.Seq[Int]): Array[Cursor] =
    segs.indices.map(i => bufferCursor(segs(i), lens(i))).toArray


  /** Spark's scratch space if this JVM is a Spark runtime (the same
    * resolution order Spark's own spill path uses: the cluster
    * manager's SPARK_LOCAL_DIRS, then spark.local.dir), else tmpdir. */
  private def spillDir(): File = {
    val configured = sys.env.get("SPARK_LOCAL_DIRS")
      .orElse(Option(SparkEnv.get).map(_.conf.get("spark.local.dir",
        System.getProperty("java.io.tmpdir"))))
      .getOrElse(System.getProperty("java.io.tmpdir"))
    new File(configured.split(',').head.trim)
  }

  /** Pure-Java LZ4 for the spill streams — NEVER the JNI instance.
    * The JNI codec compresses inside GetPrimitiveArrayCritical, which
    * holds the JVM's GCLocker; with every core running this kernel,
    * tasks sitting in JNI criticals while their siblings allocate
    * 128 MiB growth arrays starve the GCLocker's allocation retries
    * and the JVM throws OOM with plenty of collectable heap — observed
    * nondeterministically at the 300× scale point (one clean leg, one
    * OOM leg, same binary and data). The Java codec is ~80% of JNI
    * throughput on these streams, and spill IO is not the bottleneck.
    * Same reason the checksum is the Java xxhash, not the default
    * `fastestInstance` (also JNI). */
  private val Lz4Seed = 0x9747b28c // LZ4BlockOutputStream's default checksum seed

  /** Merge-streams the sorted segment cursors into one sorted spill
    * file of `count` longs — a primitive PQ loop, no per-element
    * boxing on the spill path. */
  private def writeSpill(cursors: Array[Cursor], count: Long,
      spills: scala.collection.mutable.ArrayBuffer[File]): Unit = {
    val f = File.createTempFile("graft-lruns", ".lz4", spillDir())
    spills += f // register BEFORE writing: a disk-full mid-write must not orphan it
    val out = new DataOutputStream(new LZ4BlockOutputStream(
      new BufferedOutputStream(new FileOutputStream(f), 1 << 16), 1 << 16,
      LZ4Factory.fastestJavaInstance().fastCompressor(),
      XXHashFactory.fastestJavaInstance().newStreamingHash32(Lz4Seed).asChecksum(),
      false))
    try {
      out.writeLong(count)
      val heap = new java.util.PriorityQueue[Cursor](
        math.max(1, cursors.length),
        (a: Cursor, b: Cursor) => java.lang.Long.compare(a.head, b.head))
      cursors.foreach(c => if (c.hasHead) heap.add(c))
      while (!heap.isEmpty) {
        val cur = heap.poll()
        out.writeLong(cur.head)
        cur.advance()
        if (cur.hasHead) heap.add(cur)
      }
    } finally out.close()
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

  private def openSpill(f: File,
      streams: scala.collection.mutable.ArrayBuffer[Closeable]): Cursor = new Cursor {
    private val in = new DataInputStream(new LZ4BlockInputStream(
      new BufferedInputStream(new FileInputStream(f), 1 << 16),
      LZ4Factory.fastestJavaInstance().fastDecompressor(),
      XXHashFactory.fastestJavaInstance().newStreamingHash32(Lz4Seed).asChecksum()))
    streams += in
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
