package graft.ops

import graft.SparkSpec

/** Behavior checks for the scale-pattern queries that the hash-oracle
  * can't fully pin (h01 is rows-only by construction — the sketch has no
  * exact DuckDB twin). */
class ScaleSpec extends SparkSpec {

  test("h01: HLL++ approx distinct within 5% of the exact h02 count per group") {
    val approx = ScaleQueries.h01_approx_distinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val exact = ScaleQueries.h02_exact_distinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(approx.nonEmpty && approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      assert(e > 0)
      val relErr = math.abs(approx(k) - e) / e
      assert(relErr <= 0.05, s"$k: approx ${approx(k)} vs exact $e (err $relErr)")
    }
  }
}
