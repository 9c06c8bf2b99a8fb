package graft.expr

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.scalatest.funsuite.AnyFunSuite

/** Seeded property tests (house style — scalacheck runner not bridged)
  * for the three hand-built invariants the oracle queries lean on. */
class InvariantSpec extends AnyFunSuite {

  private val rnd = new java.util.Random(17)

  test("property: VecCodec roundtrip is bit-exact for all float values " +
    "(including NaN, infinities, -0.0, subnormals)") {
    val specials = Array(Float.NaN, Float.PositiveInfinity,
      Float.NegativeInfinity, -0.0f, 0.0f, Float.MinPositiveValue,
      Float.MaxValue, Float.MinValue)
    (1 to 2000).foreach { _ =>
      val n = rnd.nextInt(128)
      val arr = Array.fill(n)(
        if (rnd.nextInt(10) == 0) specials(rnd.nextInt(specials.length))
        else java.lang.Float.intBitsToFloat(rnd.nextInt()))
      val back = VecCodec
        .decodeLE(VecCodec.encodeLE(UnsafeArrayData.fromPrimitiveArray(arr)))
        .toFloatArray()
      assert(back.length == arr.length)
      var i = 0
      while (i < n) {
        // bit-compare: NaN != NaN under ==, and -0.0 == 0.0 would pass
        assert(java.lang.Float.floatToRawIntBits(back(i)) ==
          java.lang.Float.floatToRawIntBits(arr(i)))
        i += 1
      }
    }
  }

  test("property: d03's block pigeonhole — hamming <= 3 over 4 blocks of " +
    "15 bits forces at least one equal block (the candidate join is exact)") {
    (1 to 20000).foreach { _ =>
      val a = rnd.nextLong() & ((1L << 60) - 1)
      // flip 0..3 distinct random bit positions
      val k = rnd.nextInt(4)
      val flips = scala.collection.mutable.LinkedHashSet.empty[Int]
      while (flips.size < k) flips += rnd.nextInt(60)
      val b = flips.foldLeft(a)((x, p) => x ^ (1L << p))
      val shareBlock = (0 until 4).exists { s =>
        ((a >> (15 * s)) & 32767L) == ((b >> (15 * s)) & 32767L)
      }
      assert(shareBlock,
        s"hamming ${java.lang.Long.bitCount(a ^ b)} pair shares no block: $a $b")
    }
  }

  test("property: integer half-up division == BigDecimal HALF_UP at 4 dp " +
    "(the engine-divergence-free rounding used for every rational output)") {
    (1 to 20000).foreach { _ =>
      val p = rnd.nextInt(1000000).toLong
      val q = 1L + rnd.nextInt(1000000)
      val viaIntegers = (20000L * p + q) / (2L * q)
      val viaBigDecimal = java.math.BigDecimal.valueOf(p)
        .multiply(java.math.BigDecimal.valueOf(10000))
        .divide(java.math.BigDecimal.valueOf(q), 0, java.math.RoundingMode.HALF_UP)
        .longValueExact()
      assert(viaIntegers == viaBigDecimal, s"p=$p q=$q")
    }
  }
}
