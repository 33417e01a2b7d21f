package graft

/** Run INDEPENDENT Spark actions from a small driver thread pool —
  * optimization guide §2.6 ("overlap independent jobs"): actions are
  * sequential only because the driver calls them sequentially, so a
  * gate that stages N source files or freezes M artifacts pays N+M
  * back-to-back job latencies where one pool-depth's worth suffices.
  * Used ONLY where the actions are provably independent: distinct
  * output directories, shared inputs immutable or already
  * checkpointed. Each action's own plan is unchanged, so results are
  * byte-identical to the sequential order; only the schedule moves.
  * Spark's scheduler runs concurrent driver-submitted jobs FIFO, which
  * is exactly the back-fill behavior wanted here. */
object Par {
  def actions(work: Seq[() => Unit], slots: Int = 4): Unit =
    if (work.sizeIs <= 1) work.foreach(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(slots, work.size))
      try work.map(w => pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = w()
        })).foreach { f =>
          try f.get()
          catch {
            // surface the gate's own require/IO failure, not the wrapper
            case e: java.util.concurrent.ExecutionException =>
              throw e.getCause
          }
        }
      finally pool.shutdown()
    }
}
