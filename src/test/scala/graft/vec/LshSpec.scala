package graft.vec

import org.scalatest.funsuite.AnyFunSuite

/** Pins the d06 bucket-width ladder ([[Lsh.bitsForCount]]) and the
  * tier-independence property of [[Lsh.planesMax]] that the CASE-gated
  * DuckDB oracle depends on (STRESS_r04 F4).
  */
class LshSpec extends AnyFunSuite {

  test("bitsForCount: exact threshold boundaries (integer ladder, no float log)") {
    // smallest k in [3,12] with 250*2^k >= n; at n = 250*2^k exactly the
    // tier does NOT bump — the property a double-ratio log2 can violate.
    assert(Lsh.bitsForCount(1L) == 3)
    assert(Lsh.bitsForCount(2000L) == 3)      // 250*2^3 exactly
    assert(Lsh.bitsForCount(2001L) == 4)
    assert(Lsh.bitsForCount(4000L) == 4)      // 250*2^4 exactly
    assert(Lsh.bitsForCount(4001L) == 5)
    assert(Lsh.bitsForCount(250L << 12) == 12) // 1,024,000: top rung exactly
  }

  test("bitsForCount: saturates at MAX_BITS past the oracled range") {
    assert(Lsh.bitsForCount((250L << 12) + 1) == Lsh.MAX_BITS)
    assert(Lsh.bitsForCount(Long.MaxValue / 2) == Lsh.MAX_BITS)
  }

  test("bitsForCount: monotone in n and mean bucket <= target below saturation") {
    var prev = 0
    var n = 1L
    while (n <= (260L << 12)) {
      val k = Lsh.bitsForCount(n)
      assert(k >= prev, s"ladder not monotone at n=$n")
      if (k < Lsh.MAX_BITS)
        assert(250L * (1L << k) >= n, s"mean bucket above target at n=$n, k=$k")
      prev = k
      n = (n * 13) / 8 + 1 // ~1.6x sweep hits every tier twice
    }
  }

  test("bitsForCount: custom target shifts every rung proportionally") {
    assert(Lsh.bitsForCount(2 * Lsh.TARGET_BUCKET * 8, target = 2 * Lsh.TARGET_BUCKET) == 3)
    assert(Lsh.bitsForCount(2 * Lsh.TARGET_BUCKET * 8 + 1, target = 2 * Lsh.TARGET_BUCKET) == 4)
  }

  test("planesMax is the seeded family the d06 oracle embeds, CASE-gated per tier") {
    // Independent re-derivation of the draw order (seed 11, per-table
    // MAX_BITS×DIM gaussians): a seed, shape, or draw-order change in
    // planesFor shifts every value and fails here.
    val rnd = new java.util.Random(11L)
    val expected = Seq.fill(Lsh.NUM_TABLES)(
      Seq.fill(Lsh.MAX_BITS)(Array.fill(Lsh.DIM)(rnd.nextGaussian())))
    Lsh.planesMax.zip(expected).foreach { case (got, exp) =>
      got.zip(exp).foreach { case (g, e) => assert(g.sameElements(e)) }
    }
    // Table 0's 3-bit prefix IS the fixed Lsh.planes family (same seed,
    // table-0 draws come first) — the overlap n02's probe surface shares.
    Lsh.planes(0).zip(Lsh.planesMax(0).take(3)).foreach { case (p, q) =>
      assert(p.sameElements(q))
    }
    // ...but planesFor itself has NO cross-width prefix property past
    // table 0 (stream offsets shift) — the reason planesMax exists.
    assert(!Lsh.planes(1).head.sameElements(Lsh.planesMax(1).head))

    // The static d06 oracle embeds every planesMax plane as a literal
    // gated on `i < b.bits` — including the top rung of the last table —
    // so one SQL string realizes whichever tier bitsel picks. A revert
    // to per-tier plane draws cannot produce these literals.
    val sql = graft.SparkEntry.oracleSql("d06_cosine_lsh")
    def duckLit(pl: Array[Double]): String =
      pl.map(x => x.toFloat.toDouble.toString).mkString("[", ",", "]::DOUBLE[]")
    assert(sql.contains(duckLit(Lsh.planesMax(0).head)))
    assert(sql.contains(duckLit(Lsh.planesMax.last.last)))
    assert(sql.contains(s"${Lsh.MAX_BITS - 1} < b.bits"))
    assert(sql.contains(s"${Lsh.TARGET_BUCKET} * (1::BIGINT << k)"))
  }

  test("planesMax dims and default planes are consistent with the constants") {
    assert(Lsh.planesMax.size == Lsh.NUM_TABLES)
    assert(Lsh.planesMax.forall(t => t.size == Lsh.MAX_BITS && t.forall(_.length == Lsh.DIM)))
    assert(Lsh.planes.size == Lsh.NUM_TABLES)
    assert(Lsh.planes.forall(_.size == Lsh.BITS))
  }
}
