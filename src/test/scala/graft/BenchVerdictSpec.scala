package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI pin for the run-level contamination verdict (round 17, per the r16
  * verdict #1): each case replays the header of a REAL banked artifact —
  * the numbers below are copied from committed bench_full.json versions —
  * through the exact predicate `Bench` now emits as `run_quiet`, so the
  * classifier is certified against the runs whose misreading cost judge
  * time, not against synthetic inputs.
  */
class BenchVerdictSpec extends AnyFunSuite {

  // The threshold each historical artifact was RECORDED under (artifacts
  // carry episode_load_threshold, and compare_bench.py reads it from the
  // artifact) — pre-r17 runs were measured when scan stages ran 1-2 tasks.
  private val Threshold = 12.0
  // Round-17 recalibration: the input-parallelism spread made the hot
  // stages genuinely 32-wide, lifting the bench's own self-load band
  // (two quiet-launch, calib-clean runs: per-gate max 19.1, run max 20.5).
  // References Bench.EpisodeLoad directly (r17 ADVICE): a future
  // recalibration must fail these pins instead of silently testing a stale
  // literal. The pre-r17 12.0 stays a literal above — it documents what
  // those artifacts were RECORDED under, not the current constant.
  private val ThresholdR17 = Bench.EpisodeLoad

  test("the r16 clean ruler self-labels quiet") {
    // bench_full.json @ 19572f4: load_start 0.96, load_max 10.67,
    // calib 4.538 -> 4.282, flagged [] — the round-16 verified ruler
    val v = BenchProtocol.runVerdict(0.96, 10.67, 4.538, 4.282, Threshold)
    assert(v.quiet, s"clean ruler misclassified: ${v.reasons}")
    assert(v.reasons.isEmpty)
  }

  test("the r16 driver run self-labels contaminated on all three windows") {
    // BENCH_r16.json / bench_full.json @ f9f74be: load_start 10.25,
    // load_max 17.82, calib 4.719 -> 11.079 — inflated 1.53x across the
    // board with only 3/312 gates flagged (the slow-burn evasion mode this
    // predicate exists to name)
    val v = BenchProtocol.runVerdict(10.25, 17.82, 4.719, 11.079, Threshold)
    assert(!v.quiet)
    assert(v.reasons.size == 3, v.reasons.toString)
    assert(v.reasons.exists(_.startsWith("calib_drift 2.35x")))
    assert(v.reasons.exists(_.startsWith("load_max 17.82")))
    assert(v.reasons.exists(_.startsWith("load_start 10.25")))
  }

  test("the r15 driver run self-labels contaminated") {
    // bench_full.json @ d859589: load_start 15.0, load_max 42.32,
    // calib 4.273 -> 10.52 (total 370.8 s, r15's contaminated artifact)
    val v = BenchProtocol.runVerdict(15.0, 42.32, 4.273, 10.52, Threshold)
    assert(!v.quiet)
    assert(v.reasons.size == 3)
  }

  test("the r14 ruler fails ONLY the launch window (compile residue)") {
    // bench_full.json @ b57115d: load_start 9.45 — the driver ran Bench
    // straight after its own sbt compile, so the 1-min loadavg still
    // carried the compile — but calib 5.339 -> 2.714 and load_max 11.93
    // are clean, and r16 adjudicated the run clean gate by gate. The
    // verdict must carry the distinction: `quiet` is false (the window was
    // never VERIFIED), but the only reason is load_start, which
    // compare_bench.py downgrades to "launch window unverified" instead of
    // "contaminated".
    val v = BenchProtocol.runVerdict(9.45, 11.93, 5.339, 2.714, Threshold)
    assert(!v.quiet)
    assert(v.reasons == Seq("load_start 9.45 > 2.00"), v.reasons.toString)
  }

  test("the r17 recalibration: post-spread self-load is quiet at 22, not 12") {
    // the two round-17 quiet-launch runs (load_start 0.85/0.86, calib
    // drift 1.19x/1.27x, totals BELOW the ruler — contamination inflates):
    // their 32-wide self-load maxima must classify quiet under the
    // recalibrated threshold, while the old 12.0 misfires on load_max
    val run1 = BenchProtocol.runVerdict(0.85, 20.51, 6.344, 7.523, 22.0)
    assert(run1.quiet, run1.reasons.toString)
    val run2 = BenchProtocol.runVerdict(0.86, 16.11, 5.272, 6.723, 22.0)
    assert(run2.quiet, run2.reasons.toString)
    assert(!BenchProtocol.runVerdict(0.85, 20.51, 6.344, 7.523, 12.0).quiet)
    // the r16 driver proof case STILL self-labels under 22.0 — the
    // slow-burn mode is caught by calib_drift + load_start, not load_max
    val r16driver = BenchProtocol.runVerdict(10.25, 17.82, 4.719, 11.079,
      ThresholdR17)
    assert(!r16driver.quiet)
    assert(r16driver.reasons.exists(_.startsWith("calib_drift")))
    assert(r16driver.reasons.exists(_.startsWith("load_start")))
  }

  test("boundary behavior: drift at exactly 1.3x and load at threshold pass") {
    val v = BenchProtocol.runVerdict(2.0, Threshold, 4.0, 4.0 * 1.3,
      Threshold)
    assert(v.quiet, v.reasons.toString)
    // an unreadable /proc/loadavg start (-1) must not flag
    assert(BenchProtocol.runVerdict(-1.0, 10.0, 4.0, 4.0, Threshold).quiet)
  }
}
