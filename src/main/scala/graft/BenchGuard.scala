package graft

/** The bench's contention detector, factored out of [[Bench]] as pure
  * functions so the guard is SPEC-TESTED against synthetic load
  * shapes instead of asserted (the r15 defect: a cpus-scaled own-load
  * constant `max(2, cpus/2)` put the effective trip threshold at
  * load > 20 on a 32-cpu sweep, so a foreign load of ~7 inflated
  * published values up to 7× while the artifact self-labeled
  * `contended: false` and the tail guard never fired).
  *
  * Two fixes, both load-model-free or measured:
  *
  *  - the bench's OWN steady-state loadavg contribution is MEASURED,
  *    not estimated: the minimum per-query load sample across the
  *    sweep. The idle-wait guarantees foreign load is below the
  *    threshold at start, loadavg is a 1-minute EMA, and foreign
  *    ramps only RAISE samples — so the minimum converges on the
  *    bench's own load plus at most the (bounded) residual the
  *    idle-wait admitted, on any cpu count, with no calibration
  *    constant to go stale.
  *  - the per-query tail-retry trigger is the t1/t2 SPREAD (two runs
  *    of the same query disagreeing ≥2× means they saw different
  *    machines — JIT noise pays only t1), needing no load model at
  *    all, OR the query's load sample sitting a threshold above the
  *    measured own load.
  */
object BenchGuard {

  /** One timed query's evidence: its two run times and the loadavg
    * sampled right after them.
    */
  final case class Sample(name: String, t1: Double, t2: Double,
                          load: Double) {
    def spread: Double = math.max(t1, t2) / math.min(t1, t2)
    def best: Double = math.min(t1, t2)
  }

  /** The measured own-load: the minimum load sample of the sweep.
    * Foreign load present at some point of the run only raises the
    * OTHER samples; a sweep contended from start to finish is caught
    * by the load_start signal instead (the idle-wait refuses to begin
    * on a busy box within its budget).
    */
  def ownLoadMeasured(samples: Seq[Sample]): Double =
    if (samples.isEmpty) 0.0 else samples.map(_.load).min

  /** The own-load ALLOWANCE the load signals subtract: the measured
    * floor, raised to cpus/4. The measured minimum is taken at the
    * sweep's quietest instant (short queries between heavy ones), but
    * loadavg is a 1-minute EMA — right after a stretch of
    * local[cpus]-saturating queries the bench's OWN decaying load can
    * sit well above that quiet floor with zero foreign work (measured
    * 6.6 at cpus=16 on an idle box, min sample 2.0), so comparing
    * load_end against the bare minimum false-flags every
    * high-parallelism sweep. cpus/4 bounds that EMA lag by the
    * parallelism actually driving it; the MEASURED term still
    * dominates when the sweep's own steady load exceeds it (a 32-cpu
    * sweep idling at load ≈ 11 keeps its 11 — which is how the
    * r15-class foreign ramp of ~7 stays detectable there).
    */
  def ownLoadAllowance(samples: Seq[Sample], cpus: Int): Double =
    math.max(ownLoadMeasured(samples), cpus / 4.0)

  /** The queries the tail guard must re-run: wide t1/t2 spread on a
    * non-trivial query (load-model-free — the primary signal), or a
    * load sample a threshold above the measured own load. Sub-0.5 s
    * queries are exempt from the spread trigger: their relative
    * jitter is dominated by constant overheads and they contribute
    * noise, not signal, to the round-over-round totals.
    */
  def suspects(samples: Seq[Sample], ownLoad: Double,
               threshold: Double): Set[String] =
    samples.collect {
      case s if (s.spread >= 2.0 && s.best >= 0.5) ||
        s.load - ownLoad > threshold => s.name
    }.toSet

  /** The artifact's validity bit: busy before any query ran, foreign
    * load ramped during the run (end load a threshold above the
    * MEASURED own load), or the median t1/t2 spread fingerprints a
    * machine that changed under the sweep. The 1.75 median threshold
    * sits above idle-box JIT noise (measured ~1.49 on this catalog —
    * t1 pays first-run codegen) and below observed contention (2.73).
    */
  def contended(loadStart: Double, loadEnd: Double, ownLoad: Double,
                threshold: Double, spreadMed: Double): Boolean =
    loadStart > threshold ||
      (loadEnd - ownLoad) > threshold ||
      spreadMed > 1.75
}
