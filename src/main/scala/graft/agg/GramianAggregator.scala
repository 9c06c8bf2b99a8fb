package graft.agg

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Single-pass distributed GRAMIAN over an `ARRAY<FLOAT>` column: one
  * flat integer buffer accumulating n, per-dim sums Σqᵢ, per-dim square
  * sums Σqᵢ², and all upper-triangle cross sums Σqᵢqⱼ (i<j) of the
  * TENTH-MILLI-quantized values qᵢ = ⌊xᵢ·10⁴ + ½⌋ — everything the
  * covariance/correlation matrix of the embedding space needs, in ONE
  * corpus pass with map-side combine.
  *
  * Scale shape: this is how XᵀX is computed on a cluster — each task
  * folds its rows into a d(d+3)/2-entry buffer (d=64 → 2145 longs,
  * ~17 KB), partials merge pairwise, and ONE bounded row reaches the
  * driver; the embeddings never shuffle and nothing grows with N.
  * Quantization at 10⁴ (not the 10⁶ used for v08-style means) is what
  * makes the BIGINT accumulator safe by construction at 100 TB: with
  * |x| ≤ 1 each product is ≤ 10⁸, so Σqᵢqⱼ stays below 2⁶³ up to
  * ~9·10¹⁰ rows — beyond that, shard the aggregation and merge in
  * BigInt on the driver. Integer accumulation (not Double) is what
  * lets a DuckDB oracle reproduce the result bit-for-bit.
  *
  * Buffer layout: [0]=n, [1..d]=Σqᵢ, [d+1..2d]=Σqᵢ², then the flat
  * upper triangle at [[GramianAggregator.pairIndex]].
  */
class GramianAggregator(d: Int)
    extends Aggregator[Array[Float], Array[Long], Array[Long]] {

  private val size = 1 + 2 * d + d * (d - 1) / 2

  def zero: Array[Long] = new Array[Long](size)

  def reduce(b: Array[Long], x: Array[Float]): Array[Long] = {
    if (x == null || x.length < d) return b
    val q = new Array[Long](d)
    var i = 0
    while (i < d) {
      q(i) = math.floor(x(i).toDouble * 10000.0 + 0.5).toLong
      i += 1
    }
    b(0) += 1
    var k = 1 + 2 * d
    i = 0
    while (i < d) {
      b(1 + i) += q(i)
      b(1 + d + i) += q(i) * q(i)
      var j = i + 1
      while (j < d) { b(k) += q(i) * q(j); k += 1; j += 1 }
      i += 1
    }
    b
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < size) { a(i) += b(i); i += 1 }
    a
  }

  def finish(buf: Array[Long]): Array[Long] = buf
  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object GramianAggregator {

  /** Flat upper-triangle index of the (i, j) cross sum (0-based, i<j) in
    * the buffer — the same row-major walk `reduce` takes, written as a
    * closed form so driver-side consumers address pairs without
    * replaying the loop. */
  def pairIndex(d: Int, i: Int, j: Int): Int =
    1 + 2 * d + i * (2 * d - i - 1) / 2 + (j - i - 1)

  def gramian(d: Int) = udaf(new GramianAggregator(d))
}
