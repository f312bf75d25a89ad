package org.apache.spark.graftbridge

import org.apache.spark.TaskContext
import org.apache.spark.memory.TaskMemoryManager

/** Task-memory-manager bridge for [[graft.ops.LongRunSort]].
  *
  * The kernel's chunk buffer is acquired as an execution-memory grant so
  * Spark's memory manager can see it (and ask the kernel to spill under
  * pressure) instead of the buffer coexisting beside the managed
  * consumers by arithmetic. `TaskContext.taskMemoryManager()` is
  * `private[spark]`, hence this one-method shim in the
  * `org.apache.spark` package tree (the [[org.apache.spark.sql.graftbridge.CacheBridge]]
  * pattern).
  */
object MemoryBridge {

  /** The running task's memory manager, or null outside a task. */
  def taskMemoryManager(ctx: TaskContext): TaskMemoryManager =
    if (ctx == null) null else ctx.taskMemoryManager()
}
