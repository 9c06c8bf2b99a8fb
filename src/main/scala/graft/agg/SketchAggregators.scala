package graft.agg

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable sketch aggregates (SURVEY §2 sketch family). Unlike the
  * vector aggregates these hold ORDER-STATISTIC state: the KMV distinct
  * sketch's buffer is the K smallest distinct hash values seen so far —
  * the production form the h07 scaladoc promises (Bar-Yossef et al.
  * 2002, "Counting distinct elements in a data stream"): K bounded longs
  * per group per partition, merged by keeping the K smallest of each
  * union. The previous h07 shape ranked ALL distinct hashes through a
  * per-group row_number window — a full sort of the distinct census; at
  * 100 TB the sketch form shuffles 64 longs per group per partition and
  * sorts nothing.
  */
object SketchAggregators {

  /** Bottom-K distinct-hash sketch: state is an ascending array of at
    * most `k` DISTINCT hash values. Deterministic given the hash column,
    * so the KMV estimator built on it is oracle-checkable hash-exact
    * (unlike HLL). Inputs are non-negative hashes by contract
    * (h = (id·2654435761) mod p ≥ 0); null inputs are ignored. */
  final class BottomK(k: Int)
      extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {

    def zero: Array[Long] = Array.empty[Long]

    def reduce(buf: Array[Long], boxed: java.lang.Long): Array[Long] = {
      if (boxed == null) return buf
      val h = boxed.longValue()
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // already present
      else {
        val ins = -pos - 1
        if (buf.length < k) {
          val out = new Array[Long](buf.length + 1)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
          out
        } else if (ins >= k) buf // larger than the current k-th smallest
        else {
          // shift the tail right in place, dropping the old maximum
          System.arraycopy(buf, ins, buf, ins + 1, k - ins - 1)
          buf(ins) = h
          buf
        }
      }
    }

    /** Merge two ascending distinct arrays, keep the K smallest. */
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        val take =
          if (i >= a.length) { val v = b(j); j += 1; v }
          else if (j >= b.length) { val v = a(i); i += 1; v }
          else if (a(i) < b(j)) { val v = a(i); i += 1; v }
          else if (a(i) > b(j)) { val v = b(j); j += 1; v }
          else { val v = a(i); i += 1; j += 1; v } // dup across sides
        out(n) = take; n += 1
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Column-level UDAF for `.agg(...)`, sized for h07's [[graft.ops.ScaleQueries.KMV_K]]. */
  def bottomK(k: Int) = udaf(new BottomK(k))
}
