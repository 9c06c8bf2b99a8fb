package graft.agg

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise vector aggregates over `ARRAY<FLOAT>` columns — the
  * reference's startup statistics and query-combine reductions
  * (SURVEY §2.5 A1/A2/A5; `rclip_server.py:63-65,140-141`).
  *
  * Implemented as typed [[Aggregator]]s (public API, no Catalyst
  * internals). Each is a single-pass map-side-combining aggregate: the
  * buffer is one `Array[Double]` per group per partition, merged pairwise —
  * at 100 TB the shuffle carries one d-dim vector per partition per group,
  * not N×d exploded rows (the posexplode alternative).
  *
  * Accumulation is in Double so results are order-stable to ~1e-15 and
  * match a DuckDB oracle that sums `embedding::DOUBLE[]`.
  */
object VectorAggregators {

  private def enc: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()

  /** Element-wise fold of float vectors into a Double buffer. An empty
    * buffer is the identity (first vector seeds it). */
  sealed abstract class ElementwiseAgg(op: (Double, Double) => Double)
      extends Aggregator[Array[Float], Array[Double], Array[Double]] {

    def zero: Array[Double] = Array.empty[Double]

    final def reduce(buf: Array[Double], v: Array[Float]): Array[Double] =
      if (v == null) buf
      else if (buf.isEmpty) {
        val out = new Array[Double](v.length)
        var i = 0
        while (i < v.length) { out(i) = v(i).toDouble; i += 1 }
        out
      } else {
        var i = 0
        while (i < buf.length && i < v.length) { buf(i) = op(buf(i), v(i).toDouble); i += 1 }
        buf
      }

    final def merge(a: Array[Double], b: Array[Double]): Array[Double] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        var i = 0
        while (i < a.length && i < b.length) { a(i) = op(a(i), b(i)); i += 1 }
        a
      }

    def finish(buf: Array[Double]): Array[Double] = buf
    def bufferEncoder: Encoder[Array[Double]] = enc
    def outputEncoder: Encoder[Array[Double]] = enc
  }

  /** Σ element-wise (A5 / W1 — query combine, phrase estimate). */
  object VecSum extends ElementwiseAgg(_ + _)

  /** Element-wise min (A1 — `feature_minimums`, `rclip_server.py:63`). */
  object VecMin extends ElementwiseAgg(math.min)

  /** Element-wise max (A2 — `feature_maximums`, `rclip_server.py:64`). */
  object VecMax extends ElementwiseAgg(math.max)

  /** Element-wise Σ of BIGINT arrays — v11's per-round y = Xᵀu fold.
    * Long addition is exact and order-free, so the aggregate equals the
    * dim-keyed shuffle it replaces value-for-value; the buffer is ONE
    * d-length Long array per partition (map-side combining), so a round
    * costs a single narrow pass with no dim-keyed exchange. */
  object VecSumLong extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    private def encL: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def zero: Array[Long] = Array.empty[Long]
    // Ragged inputs fold into a max-length buffer (missing tail elements
    // add 0) so the result is merge-order-INDEPENDENT — the old
    // min-length fold silently dropped tails depending on merge order
    // (ADVICE r09). Embeddings are fixed-dim today, so this changes no
    // value; it removes a latent order-dependence.
    private def addInto(dst: Array[Long], src: Array[Long]): Array[Long] = {
      val out = if (dst.length >= src.length) dst
        else java.util.Arrays.copyOf(dst, src.length)
      var i = 0
      while (i < src.length) { out(i) += src(i); i += 1 }
      out
    }
    def reduce(buf: Array[Long], v: Array[Long]): Array[Long] =
      if (v == null) buf
      else if (buf.isEmpty) v.clone()
      else addInto(buf, v)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else addInto(a, b)
    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] = encL
    def outputEncoder: Encoder[Array[Long]] = encL
  }

  /** Column-level UDAFs for DataFrame `.agg(...)`. */
  lazy val vecSum = udaf(VecSum)
  lazy val vecMin = udaf(VecMin)
  lazy val vecMax = udaf(VecMax)
  lazy val vecSumLong = udaf(VecSumLong)
}
