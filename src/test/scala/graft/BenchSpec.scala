package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench self-gate (VERDICT r07 wrong-#1/#2): BENCH_r07's official
  * record was a load-contaminated run (`idle:false`, steal 1.9%, 12×
  * outliers) that clobbered the committed idle record. The gate has two
  * halves — a pre-flight admission predicate (wait instead of starting a
  * poisoned run) and an output-routing function (a run whose attestation
  * failed can never overwrite `bench_out.json`). Both are pure functions
  * so the contract is provable without loading the host.
  */
final class BenchSpec extends AnyFunSuite {

  test("preflight admits only an idle, steal-free host") {
    assert(Bench.preflightOk(load = 0.1, otherJava = 0, stealPct = 0.2))
    // positive evidence of load on any probe denies admission
    assert(!Bench.preflightOk(load = 24.1, otherJava = 0, stealPct = 0.2),
      "BENCH_r07's own start state (loadavg 24) must be denied")
    assert(!Bench.preflightOk(load = 0.1, otherJava = 1, stealPct = 0.2))
    assert(!Bench.preflightOk(load = 0.1, otherJava = 0, stealPct = 5.0))
    // VERDICT r08 next-#1: the r8 records that disagreed 15%/8× both
    // started near load 0.8 — a recently-busy host must now wait
    assert(!Bench.preflightOk(load = 0.8, otherJava = 0, stealPct = 0.2),
      "load in [0.3, 1.0) passed the r8 gate and produced irreproducible records")
    assert(Bench.preflightOk(load = 0.29, otherJava = 0, stealPct = 0.2))
  }

  test("preflight acts on positive evidence only: unreadable probes pass") {
    // -1 sentinels mean /proc was unreadable, not that the host is busy
    assert(Bench.preflightOk(load = -1.0, otherJava = -1, stealPct = -1.0))
  }

  test("a failed attestation can never clobber the requested record file") {
    val p = "bench_out.json"
    assert(Bench.gatedOutPath(p, idle = true, contended = false, 1700000000L) == p)
    assert(Bench.gatedOutPath(p, idle = false, contended = false, 1700000000L)
      == "bench_out_nonidle_1700000000.json")
    assert(Bench.gatedOutPath(p, idle = true, contended = true, 1700000000L)
      == "bench_out_nonidle_1700000000.json")
    assert(Bench.gatedOutPath(p, idle = false, contended = true, 1700000000L)
      == "bench_out_nonidle_1700000000.json")
  }

  test("routing respects a custom requested path, json suffix or not") {
    assert(Bench.gatedOutPath("x/custom.json", idle = false, contended = false, 5L)
      == "x/custom_nonidle_5.json")
    assert(Bench.gatedOutPath("record", idle = false, contended = false, 5L)
      == "record_nonidle_5.json")
  }

  test("steal sample over a short idle window is a sane percentage") {
    val s = Bench.stealSample(50)
    assert(s == -1.0 || (s >= 0.0 && s <= 100.0))
  }
}
