package graft.ops

import graft.SparkSpec

/** Behavior checks for the scale-pattern queries that the hash-oracle
  * can't fully pin (h01 is rows-only by construction — the sketch has no
  * exact DuckDB twin). */
class ScaleSpec extends SparkSpec {

  test("h01: HLL++ approx distinct within 5% of the exact count per group") {
    val rows = ScaleQueries.h01_approx_distinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(exact > 0)
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact (err $relErr)")
    }
  }
}
