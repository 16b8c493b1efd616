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
}
