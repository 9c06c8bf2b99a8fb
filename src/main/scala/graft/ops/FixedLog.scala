package graft.ops

/** Fixed-point base-2 logarithm in CENTIBITS (100·log₂n) over BIGINT —
  * the exact-integer log surface that lets LM-style scoring operators
  * (t14 perplexity, p09 DSIR importance weights) stay hash-exact across
  * engines with ZERO runtime float arithmetic.
  *
  * Why not `ln()`: both Spark and DuckDB evaluate `ln` in IEEE double
  * with no correct-rounding guarantee, so a micro-unit rounding of
  * `ln(tf)` can land on different integers in the two engines — exactly
  * the cross-engine float divergence the exact-arithmetic discipline
  * (e03/v07) exists to rule out. Instead:
  *
  *   log2cb(n) = 100·b + TABLE[m]          for BIGINT n ≥ 1, where
  *   b = floor(log₂ n) = length(bin(n)) − 1            (exact, string)
  *   m = ((n·256) >> b) − 256 ∈ [0, 255]   (top 8 mantissa bits, exact)
  *
  * and TABLE[m] = round(100·log₂(1 + m/256)) is a 256-entry constant
  * table generated ONCE here at code-write time (the only place a float
  * log runs is this Scala constant initializer — both engines interpolate
  * the same literals, so they cannot diverge). Mantissa truncation
  * under-estimates by at most log₂(1+1/256) ≈ 0.56 centibits — noise for
  * quality scoring, where model decisions are whole-bit-scale.
  *
  * Overflow: n·256 requires n < 2⁵⁵ — 3.6·10¹⁶, comfortably above any
  * corpus token count (a 100 TB corpus is ~10¹³ tokens).
  *
  * This is the classic lookup-table fixed-point log (ICSI/DSP practice);
  * the novelty here is only that the SAME literal table is spliced into
  * both the Spark plan and the DuckDB oracle, making log-space scores
  * cross-engine hash-exact.
  */
object FixedLog {

  /** round(100·log₂(1 + m/256)) for m ∈ [0, 255]; values 0..100. */
  val TABLE: IndexedSeq[Long] =
    (0 until 256).map(m => math.round(100.0 * math.log1p(m / 256.0) / math.log(2.0)))

  private val sparkArray = s"array(${TABLE.mkString(",")})"
  private val duckArray = s"[${TABLE.mkString(",")}]"

  /** Spark SQL fragment: centibit log₂ of BIGINT expression `e` (≥ 1).
    * `e` is referenced three times — pass a column name, not a subquery. */
  def sparkLog2Cb(e: String): String =
    s"(100 * (length(bin($e)) - 1) + element_at($sparkArray, " +
      s"CAST(shiftright($e * 256, length(bin($e)) - 1) - 256 AS INT) + 1))"

  /** DuckDB fragment, same arithmetic (lists are 1-indexed there too). */
  def duckLog2Cb(e: String): String =
    s"(100 * (length(bin($e)) - 1) + $duckArray[" +
      s"((($e * 256) >> (length(bin($e)) - 1)) - 256)::INT + 1])"

  /** Reference implementation for tests (same integer arithmetic). */
  def log2Cb(n: Long): Long = {
    require(n >= 1 && n < (1L << 55), s"log2Cb domain: $n")
    val b = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val m = ((n * 256) >> b) - 256
    100L * b + TABLE(m.toInt)
  }
}
