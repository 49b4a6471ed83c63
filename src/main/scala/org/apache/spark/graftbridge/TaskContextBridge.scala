package org.apache.spark.graftbridge

import org.apache.spark.TaskContext

/** Bridge into `protected[spark] TaskContext.setTaskContext` — needed by any
  * helper thread that consumes a task's upstream iterator: Spark's own
  * PipedRDD does exactly this in its stdin-writer thread, because lazily
  * initialized iterators (vectorized parquet readers, shuffle readers,
  * memory-manager-backed spills) call `TaskContext.get()` and misbehave on a
  * thread where it is null. Same access pattern as sql.graftbridge. */
object TaskContextBridge {
  def set(ctx: TaskContext): Unit = TaskContext.setTaskContext(ctx)
  def unset(): Unit = TaskContext.unset()
}
