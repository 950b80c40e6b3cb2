package graft.ops

/** Run independent Spark actions (jobs) of ONE session concurrently.
  *
  * A bucketed part write is an 8-task job; on a 32-core executor pool
  * (or a 1000-executor cluster) four such jobs run strictly one after
  * another if issued from a single thread, leaving 3/4 of the
  * machine idle per phase. Spark's scheduler is explicitly
  * multi-job: actions submitted from different threads of one
  * SparkSession interleave at task granularity, cached plans shared
  * between the jobs materialize exactly once (the block manager
  * locks per partition — a second job blocks on the in-flight
  * computation and then reads the cached block), and the in-memory
  * catalog is synchronized, so writes to DISTINCT table names are
  * safe. The caller stays responsible for independence: no task may
  * read a table/directory another task of the same batch writes.
  *
  * Failure contract: the first failing task's cause is rethrown
  * (unwrapped); remaining tasks run to completion first — their
  * writes target throwaway/overwritten locations, so completing them
  * is cheaper than plumbing cancellation through the scheduler.
  */
object Par {

  def jobs(tasks: Seq[() => Unit]): Unit = { collect(tasks); () }

  /** [[jobs]] returning each task's result in input order. */
  def collect[A](tasks: Seq[() => A]): Seq[A] =
    if (tasks.sizeIs <= 1) tasks.map(_.apply())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
      try {
        val fs = tasks.map { t =>
          pool.submit(new java.util.concurrent.Callable[A] {
            def call(): A = t()
          })
        }
        fs.map { f =>
          try f.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              throw e.getCause
          }
        }
      } finally pool.shutdown()
    }
}
