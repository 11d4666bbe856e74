package graft

/** Overlap INDEPENDENT Spark actions from a bounded thread pool (guide
  * §2.6: the scheduler happily runs several jobs at once inside one
  * application — actions are only sequential because the driver calls
  * them sequentially, and under the default FIFO scheduling a later
  * job's tasks back-fill executors freed by the current job's straggler
  * tail). Used where an operator runs several independent build
  * pipelines (HNSW's three layer graphs) or writes several independent
  * artifacts (an index's packed/quantizer/codebook/meta tables).
  *
  * Results keep input order. Failures propagate with their ORIGINAL
  * exception (unwrapped from the pool's ExecutionException) so callers'
  * error contracts are unchanged. Concurrent materialization of a
  * shared persisted frame is safe: the block manager locks per
  * partition, so one thread computes and the others wait.
  */
object Par {
  def all[A](tasks: Seq[() => A]): Seq[A] = {
    if (tasks.lengthCompare(2) < 0) return tasks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val futs = tasks.map(t => pool.submit(new java.util.concurrent.Callable[A] {
        override def call(): A = t()
      }))
      futs.map { f =>
        try f.get()
        catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
      }
    } finally pool.shutdown()
  }
}
