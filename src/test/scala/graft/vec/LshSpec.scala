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
    assert(Lsh.bitsForCount(4000L, target = 500L) == 3)
    assert(Lsh.bitsForCount(4001L, target = 500L) == 4)
  }

  test("planesMax: a bits-b tier is a prefix — plane (t,i) identical across tiers") {
    // d06's tier selection takes the FIRST b planes of each planesMax
    // table, so the same (table, plane) literal appears in every tier that
    // includes it; a per-tier planesFor draw would shift stream offsets.
    val perTier = Seq(3, 7, 12).map(b => Lsh.planesMax.map(_.take(b)))
    for (Seq(small, large) <- perTier.sliding(2)) {
      small.zip(large).foreach { case (s, l) =>
        s.zip(l).foreach { case (ps, pl) => assert(ps.sameElements(pl)) }
      }
    }
    // and planesFor does NOT have the prefix property across bit widths —
    // the reason planesMax exists (documented at Lsh.scala:23-31).
    val f3 = Lsh.planesFor(2, 3)
    val f4 = Lsh.planesFor(2, 4)
    assert(!f3(1).head.sameElements(f4(1).head))
  }

  test("planesMax dims and default planes are consistent with the constants") {
    assert(Lsh.planesMax.size == Lsh.NUM_TABLES)
    assert(Lsh.planesMax.forall(t => t.size == Lsh.MAX_BITS && t.forall(_.length == Lsh.DIM)))
    assert(Lsh.planes.size == Lsh.NUM_TABLES)
    assert(Lsh.planes.forall(_.size == Lsh.BITS))
  }
}
