package graft.oracle

/** Overlap INDEPENDENT eager constructions (guide §2.6 "Overlap
  * independent jobs"): Spark happily runs several jobs at once inside
  * one application — iterative operators here are only sequential
  * because the driver code calls their eager actions (localCheckpoint
  * per round, census collects) one after another. Where two chains
  * share no data dependency (a warm arm and its cold audit, the rank
  * and spectral arms of a refresh cycle), running one on a helper
  * thread lets its jobs back-fill the executor slots the other chain's
  * stage tails leave idle — and, just as important at fixture scale,
  * overlaps the per-job DRIVER cost (planning, codegen) that JobProfile
  * measured as ~40 ms/job of serial gap.
  *
  * The helper thread is created AT CALL TIME, so Spark's inheritable
  * thread-locals (job group, description) propagate — cancellation and
  * UI attribution behave as if the work ran inline. Exceptions from
  * either side rethrow to the caller. */
object Par {

  /** Evaluate `a` on a fresh thread while `b` runs on the caller;
    * returns both. Use ONLY for sides with no mutual data dependency. */
  def par2[A, B](a: => A, b: => B): (A, B) = {
    val fa = new java.util.concurrent.FutureTask[A](() => a)
    val t = new Thread(fa, s"graft-par-${System.identityHashCode(fa)}")
    t.setDaemon(true)
    t.start()
    val rb = b
    try (fa.get(), rb)
    catch {
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    }
  }
}
