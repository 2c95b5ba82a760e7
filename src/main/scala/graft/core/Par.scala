package graft.core

/** Overlap INDEPENDENT eager-checkpoint builds (spark_optimization_guide
  * §2.6 "Overlap independent jobs"): a query builder that materializes two
  * `localCheckpoint(true)` chains with no data dependency otherwise runs
  * their Spark jobs strictly back-to-back — the second chain's tasks could
  * be back-filling the executor cores the first chain's stage tails leave
  * idle. Spark's scheduler runs concurrently submitted jobs FIFO, which is
  * exactly the back-fill behaviour wanted; results are unchanged because
  * the branches are independent by precondition.
  *
  * A dedicated two-thread pool (not the global ExecutionContext): builds
  * block on Spark job completion, and blocking tasks on the global pool
  * can starve unrelated users of it.
  */
object Par {
  def inParallel[A, B](a: => A, b: => B): (A, B) = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val fa = pool.submit(new java.util.concurrent.Callable[A] {
      def call(): A = a
    })
    val fb = pool.submit(new java.util.concurrent.Callable[B] {
      def call(): B = b
    })
    try {
      // unwrap ExecutionException so callers/tests see the branch's own
      // exception type, and cancel the sibling on failure — a detached
      // still-running branch could leave orphaned eager-checkpoint blocks
      def get[T](f: java.util.concurrent.Future[T]): T =
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
        }
      try (get(fa), get(fb))
      catch {
        case t: Throwable =>
          fa.cancel(true); fb.cancel(true)
          throw t
      }
    } finally {
      pool.shutdown()
      // bound the wait: branches block on Spark job completion, which is
      // interruptible; a branch that ignores interruption for 60 s is a
      // bug we'd rather surface than hang on
      pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS)
    }
  }
}
