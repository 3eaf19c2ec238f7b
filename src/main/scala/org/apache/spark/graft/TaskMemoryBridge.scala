package org.apache.spark.graft

import org.apache.spark.TaskContext
import org.apache.spark.memory.TaskMemoryManager

/** `TaskContext.taskMemoryManager()` is `private[spark]`; the engine's
  * TopKPerGroupExec needs it to ACCOUNT its bounded-heap state with the
  * task's execution-memory pool (same bridge pattern as
  * org.apache.spark.sql.graft.PlanBridge — accessor only, no behavior). */
object TaskMemoryBridge {
  def taskMemoryManager(tc: TaskContext): TaskMemoryManager =
    tc.taskMemoryManager()
}
