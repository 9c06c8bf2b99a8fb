package graft.vec

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH for cosine similarity (sign-random-projection):
  * 6 OR-amplified tables × 3 sign bits, seeded once and embedded as
  * literals into both the Spark plan and DuckDB oracles.
  *
  * Collision probability per plane is 1 − θ/π; with k=3 bits and L=6
  * tables the candidate recall at cos 0.4 is ≈ 0.8 while candidate count
  * stays O(near-pairs) — the scale path next to the brute-force baseline.
  */
object Lsh {

  val NUM_TABLES = 6
  val BITS = 3
  val DIM = 64

  /** Seeded hyperplanes: table → plane → 64 dims. */
  val planes: Seq[Seq[Array[Double]]] = {
    val rnd = new java.util.Random(11)
    Seq.fill(NUM_TABLES)(Seq.fill(BITS)(Array.fill(DIM)(rnd.nextGaussian())))
  }

  /** Bucket id of a vector column for table `t` (sum of sign bits). */
  def bucketCol(vec: Column, t: Int): Column =
    planes(t).zipWithIndex.map { case (pl, i) =>
      when(VectorOps.dotQueryNative(vec, pl.map(_.toFloat)) > 0, 1 << i).otherwise(0)
    }.reduce(_ + _)

  /** Driver-side bucket of a query vector — same float-widening arithmetic
    * as the executor/oracle path. */
  def bucketOf(v: Array[Float], t: Int): Int =
    planes(t).zipWithIndex.map { case (pl, i) =>
      var s = 0.0; var j = 0
      val n = math.min(v.length, pl.length)
      while (j < n) { s += v(j).toDouble * pl(j).toFloat.toDouble; j += 1 }
      if (s > 0) 1 << i else 0
    }.sum

  /** DuckDB expression for the bucket of `embedding` in table `t`. */
  def duckBucketExpr(t: Int): String =
    planes(t).zipWithIndex.map { case (pl, i) =>
      val lit = pl.map(x => x.toFloat.toDouble.toString).mkString("[", ",", "]::DOUBLE[]")
      s"(CASE WHEN list_dot_product(embedding::DOUBLE[], $lit) > 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")
}
