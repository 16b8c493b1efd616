package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-record protection contract (round 9): only the explicit
  * min-of-N methodology (`SPARK_GRAFT_BENCH_REPEAT>=2`) may write the
  * committed `BENCH_DETAIL.json` record; default single-pass runs — the
  * mode the round driver uses, which carries the one-sided spike
  * envelope — write `BENCH_DETAIL_run.json`, and filtered scratch runs
  * write nothing. A driver run can therefore never clobber (and a careless
  * commit never ratchet) the min-of-2 baseline every later run calibrates
  * its retry/escalation thresholds against.
  */
class BenchSpec extends AnyFunSuite {

  test("single-pass runs write the run sidecar, never the record") {
    assert(Bench.detailPathFor(repeat = 1, filtered = false)
      .contains("BENCH_DETAIL_run.json"))
  }

  test("only repeat>=2 writes the committed record file") {
    assert(Bench.detailPathFor(repeat = 2, filtered = false)
      .contains("BENCH_DETAIL.json"))
    assert(Bench.detailPathFor(repeat = 3, filtered = false)
      .contains("BENCH_DETAIL.json"))
    assert(!Bench.detailPathFor(repeat = 1, filtered = false)
      .contains("BENCH_DETAIL.json"))
  }

  test("filtered (SPARK_GRAFT_ONLY) runs write no sidecar at all") {
    assert(Bench.detailPathFor(repeat = 1, filtered = true).isEmpty)
    assert(Bench.detailPathFor(repeat = 2, filtered = true).isEmpty)
  }

  test("hostFactor: identity on an equal-speed host, scales a uniformly " +
      "slower one, clamped to [1, 3], inert without a record probe") {
    assert(Bench.hostFactor(0.5, Some(0.5)) == 1.0)
    // the round-14+ regime: host ~1.3x slower than the record window
    assert(math.abs(Bench.hostFactor(0.65, Some(0.5)) - 1.3) < 1e-9)
    // a FASTER host must not tighten thresholds below the record's
    // own noise floor
    assert(Bench.hostFactor(0.3, Some(0.5)) == 1.0)
    // past 3x the one-number correction is no longer credible
    assert(Bench.hostFactor(5.0, Some(0.5)) == 3.0)
    // no record / degenerate probe: raw thresholds
    assert(Bench.hostFactor(0.7, None) == 1.0)
    assert(Bench.hostFactor(0.7, Some(0.0)) == 1.0)
  }

  test("probeOf: min of the record's start/end calibration probes") {
    val blob = """{"metric":"total","queries":{"q_a":1.5},""" +
      """"calibration":{"sec_start":0.883,"sec_end":0.480,""" +
      """"load_avg_start":1.6,"cpus":32}}"""
    assert(Bench.probeOf(blob).contains(0.480))
    assert(Bench.probeOf("""{"queries":{"q_a":1.5}}""").isEmpty)
  }
}
