package graft.ops

import graft.SparkSpec

/** Behavior checks for the scale-pattern queries that the hash-oracle
  * can't fully pin (h01 is rows-only by construction — the sketch has no
  * exact DuckDB twin). */
class ScaleSpec extends SparkSpec {

  test("BottomK sketch: reduce/merge keep exactly the K smallest DISTINCT " +
    "values in ascending order, whatever the arrival and merge order") {
    val k = 8
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 50) {
      val n = rnd.nextInt(40)
      // duplicates on purpose: distinctness is part of the contract
      val xs = Seq.fill(n)(rnd.nextInt(20).toLong)
      val want = xs.distinct.sorted.take(k)
      val agg = new graft.agg.SketchAggregators.BottomK(k)
      // sequential reduce
      val seqBuf = xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
      assert(seqBuf.toSeq == want, s"trial $trial reduce: $xs")
      // random split + merge (the map-side-combine path)
      val (l, r) = xs.splitAt(if (n == 0) 0 else rnd.nextInt(n + 1))
      val merged = agg.merge(
        l.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)),
        r.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)))
      assert(merged.toSeq == want, s"trial $trial merge: $l | $r")
      // null input ignored
      assert(agg.reduce(seqBuf.clone(), null).toSeq == seqBuf.toSeq)
    }
  }

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
