package graft.ml

/** Fit-timing harness (reference E20: time.perf_counter around every fit,
  * higgs_ensemble_analysis.py:89-91,169-177).
  */
object Timing {
  def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }
}
