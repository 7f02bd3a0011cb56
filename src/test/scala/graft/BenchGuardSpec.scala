package graft

import org.scalatest.funsuite.AnyFunSuite
import BenchGuard.Sample

/** The bench contention guard, driven through synthetic load shapes —
  * including the literal r15 defect shape (cpus=32 sweep, foreign
  * load ~7 over an own load ~11) that the estimated own-load model
  * published as `contended: false` with the tail guard never firing.
  */
class BenchGuardSpec extends AnyFunSuite {

  // cpus=32 host: threshold = max(1, 32/8) = 4
  private val thr32 = 4.0
  // cpus=4 judge box: threshold = 1
  private val thr4 = 1.0

  private def idle(n: Int, load: Double, spread: Double = 1.3) =
    (1 to n).map(i => Sample(s"q_$i", 2.0 * spread, 2.0, load))

  test("r15 shape: foreign ramp on a 32-cpu sweep fires the guard " +
    "and trips the bit") {
    // clean first half at the bench's own steady load (~11), then a
    // ~7-load foreign neighbor lands: inflated t1/t2 disagreement and
    // higher load samples on the tail queries
    val clean = idle(20, 11.0)
    val rampTail = Seq(
      Sample("q_range_join", 8.6, 2.9, 18.0), // r15's published 8.6s
      Sample("q_llm_pipeline", 13.0, 6.5, 18.5),
      Sample("q_dedup_incremental", 5.4, 1.6, 17.9))
    val ev = clean ++ rampTail
    val own = BenchGuard.ownLoadMeasured(ev)
    assert(own == 11.0) // measured, not cpus/2 = 16
    val sus = BenchGuard.suspects(ev, own, thr32)
    assert(sus == Set("q_range_join", "q_llm_pipeline",
      "q_dedup_incremental"),
      s"the guard must fire on exactly the contended tail, got $sus")
    // the bit: load_end 18 − own 11 = 7 > 4 → contended (the r15
    // model needed load_end > 20 and published false)
    assert(BenchGuard.contended(loadStart = 2.0, loadEnd = 18.0,
      ownLoad = own, threshold = thr32, spreadMed = 1.4))
  }

  test("idle 32-cpu sweep: no suspects, not contended") {
    val ev = idle(30, 11.0)
    val own = BenchGuard.ownLoadMeasured(ev)
    assert(BenchGuard.suspects(ev, own, thr32).isEmpty)
    assert(!BenchGuard.contended(2.0, 11.5, own, thr32, 1.3))
  }

  test("spread trigger is load-model-free: a ≥2× disagreement on a " +
    "non-trivial query is a suspect even with flat load samples") {
    val ev = idle(10, 2.0) :+ Sample("q_hot", 5.0, 2.0, 2.0)
    assert(BenchGuard.suspects(ev, BenchGuard.ownLoadMeasured(ev),
      thr4) == Set("q_hot"))
  }

  test("sub-0.5s queries are exempt from the spread trigger") {
    val ev = idle(10, 2.0) :+ Sample("q_tiny", 0.3, 0.1, 2.0)
    assert(BenchGuard.suspects(ev, BenchGuard.ownLoadMeasured(ev),
      thr4).isEmpty)
  }

  test("load trigger still fires without a spread signature") {
    // a uniformly-inflated query (both runs slow, so spread ~1) whose
    // load sample sits over own + threshold is still a suspect
    val ev = idle(10, 2.0) :+ Sample("q_flat", 6.0, 5.9, 7.5)
    assert(BenchGuard.suspects(ev, BenchGuard.ownLoadMeasured(ev),
      thr4) == Set("q_flat"))
  }

  test("contended bit: each signal trips it independently") {
    assert(BenchGuard.contended(5.0, 2.0, 2.0, thr4, 1.2)) // start
    assert(BenchGuard.contended(0.5, 4.0, 2.0, thr4, 1.2)) // ramp
    assert(BenchGuard.contended(0.5, 2.5, 2.0, thr4, 2.0)) // spread
    assert(!BenchGuard.contended(0.5, 2.5, 2.0, thr4, 1.49)) // idle
  }

  test("EMA lag does not false-flag a high-parallelism sweep: the " +
    "allowance raises the measured floor to cpus/4") {
    // measured on an idle box at cpus=16 (the sf1 sweep): quiet-point
    // min sample ~2.0, but right after the heavy tail the bench's OWN
    // decaying 1-minute loadavg sits at ~6.6 — under the bare
    // measured floor that read as a 4.6-unit foreign ramp and flagged
    // the artifact contended on an idle machine
    val ev = idle(30, 2.0) ++ idle(5, 9.0) // heavy stretch inflates
    val allow16 = BenchGuard.ownLoadAllowance(ev, cpus = 16)
    assert(allow16 == 4.0) // max(min sample 2.0, 16/4)
    assert(!BenchGuard.contended(2.99, 6.60, allow16, thr32, 1.32))
    // the r15-class detection SURVIVES the allowance: a 32-cpu sweep
    // idling at own load ~11 keeps its measured floor (11 > 32/4),
    // so a foreign ramp of ~7 still trips
    val ev32 = idle(30, 11.0)
    val allow32 = BenchGuard.ownLoadAllowance(ev32, cpus = 32)
    assert(allow32 == 11.0)
    assert(BenchGuard.contended(2.0, 18.0, allow32, thr32, 1.4))
  }

  test("ownLoadMeasured is the minimum sample; empty sweep is 0") {
    assert(BenchGuard.ownLoadMeasured(Seq(
      Sample("a", 1, 1, 3.0), Sample("b", 1, 1, 2.2),
      Sample("c", 1, 1, 9.0))) == 2.2)
    assert(BenchGuard.ownLoadMeasured(Nil) == 0.0)
  }
}
