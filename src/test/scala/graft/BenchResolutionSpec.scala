package graft

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic pins for the bench's per-query resolution (the
  * host-noise defenses the r7 adjudication asked for): median + min
  * reporting, the 3× stall detector, and the degraded warmup fallback. */
class BenchResolutionSpec extends AnyFunSuite {

  test("median and min of real samples; no stall under honest noise") {
    val r = Bench.resolve(Seq(2.5, 2.4, 2.9), warm = 9.0)
    assert(r.sec === 2.5 && r.min === 2.4 && r.runs === 3)
    assert(!r.degraded && !r.stall)
  }

  test("a host stall beating the median trips the 3x detector") {
    // the r7 signature: consecutive stalled runs dominate the sample set
    val r = Bench.resolve(Seq(91.8, 88.0, 2.4), warm = 10.0)
    assert(r.sec === 88.0 && r.min === 2.4)
    assert(r.stall, "median/min = 36x must flag stall_suspect")
  }

  test("one stalled sample of three does NOT flag (median rejects it)") {
    val r = Bench.resolve(Seq(2.4, 2.5, 30.0), warm = 10.0)
    assert(r.sec === 2.5 && r.min === 2.4 && !r.stall)
  }

  test("exactly 3x is not a stall; just above is") {
    assert(!Bench.resolve(Seq(1.0, 3.0, 3.0), warm = 1.0).stall)
    assert(Bench.resolve(Seq(1.0, 3.01, 3.01), warm = 1.0).stall)
  }

  test("two samples use the lower median, so they never flag and report clean") {
    val r = Bench.resolve(Seq(1.0, 40.0), warm = 1.0)
    assert(r.sec === 1.0 && r.min === 1.0 && !r.stall,
      "lower-median-of-2 IS the clean run; nothing to flag")
  }

  test("a single contaminated sample flags via the warm-backed min") {
    // the r10 signature: one timed sample, landed in a contention
    // window, with a warmup of the identical plan 50× faster — pre-r11
    // this resolved as a clean 50 s row; now warm backs the min and
    // the 3× detector fires
    val r = Bench.resolve(Seq(50.0), warm = 1.0)
    assert(r.min === 1.0 && r.warmMin && r.stall)
    assert(r.sec === 50.0, "median still reports the timed sample")
  }

  test("a single honest sample does not flag (warm is slower, as usual)") {
    val r = Bench.resolve(Seq(2.0), warm = 3.5)
    assert(r.min === 2.0 && !r.warmMin && !r.stall)
  }

  test("warm slightly faster than the timed min keeps the TIMED min (no margin)") {
    // a warmup can legitimately edge out timed passes (page-cache state,
    // no full-surface interleave) — without the /1.5 margin this row
    // would systematically report a non-timed measurement as its min
    val r = Bench.resolve(Seq(2.4, 2.5), warm = 2.0)
    assert(r.min === 2.4 && !r.warmMin && !r.stall,
      "2.0 vs 2.4 is ordinary warm-faster noise; the timed min stands")
  }

  test("warm-backed min engages only past the 1.5x divergence margin") {
    val r = Bench.resolve(Seq(2.4, 2.5), warm = 1.0)
    assert(r.min === 1.0 && r.warmMin && !r.stall,
      "1.0 < 2.4/1.5: every timed sample diverges from warm, fallback engages")
    // exactly at the margin boundary: timedMin/1.5 is exclusive
    val edge = Bench.resolve(Seq(3.0), warm = 2.0)
    assert(edge.min === 3.0 && !edge.warmMin)
  }

  test("NaN warm (warmup errored) never backs the min") {
    val r = Bench.resolve(Seq(5.0), warm = Double.NaN)
    assert(r.min === 5.0 && !r.warmMin && !r.stall)
  }

  test("no samples: warmup fallback, flagged degraded") {
    val r = Bench.resolve(Nil, warm = 7.5)
    assert(r.sec === 7.5 && r.runs === 0 && r.degraded && !r.stall)
  }

  test("an error before any timed sample is terminal") {
    assert(Bench.resolveState(Some("boom on warmup"), Nil, warm = 1.0) ===
      Left("boom on warmup"))
  }

  test("an error AFTER timed samples keeps the timing and surfaces as partial_err") {
    // the late-pass-watchdog case: pass 1+2 succeeded, pass 3 timed out —
    // previously the summary reported err:null and the failure survived
    // only in per-run progress lines
    val Right((r, partial)) =
      Bench.resolveState(Some("exceeded the 180.0 s per-query watchdog"),
        Seq(2.4, 2.5), warm = 9.0): @unchecked
    assert(r.sec === 2.4 && r.runs === 2 && !r.degraded)
    assert(partial === Some("exceeded the 180.0 s per-query watchdog"))
  }

  test("no error resolves with no partial_err") {
    val Right((r, partial)) =
      Bench.resolveState(None, Seq(1.0), warm = 1.0): @unchecked
    assert(r.runs === 1 && partial.isEmpty)
  }
}
