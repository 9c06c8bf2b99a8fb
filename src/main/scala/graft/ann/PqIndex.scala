package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.vec.VectorOps

/** Product-quantization index — the MEMORY-bound ANN artifact that
  * complements [[IvfIndex]]'s compute/IO pruning: the corpus embeddings
  * are compressed to `m` per-subspace centroid codes bit-packed into a
  * single BIGINT (m=16, k=16 turns a 64-dim fp32 row from 256 B into
  * 8 B — 32×), and search scans ONLY the packed-code column with
  * asymmetric-distance (ADC) scoring — the query side stays exact via a
  * driver-computed `m×k` dot-product lookup table. At 100 TB this is
  * the difference between scanning 100 TB of raw vectors and ~3 TB of
  * codes; the standard IVF-PQ composition probes cells with
  * [[IvfIndex]] and reranks the survivors with the exact vectors (the
  * n05 rerank pattern).
  *
  * Design:
  *  - `train`: per-subspace Lloyd k-means entirely on the DRIVER over a
  *    bounded sample (PQ codebooks saturate at a few 10⁵ training
  *    points regardless of corpus size, so the sample — taken
  *    deterministically as the first `sampleN` rows in id order — is the
  *    whole training cost: O(sampleN·k·iters·dim) scalar work, no
  *    distributed iteration at all). Deterministic: init = sub-vectors
  *    of the first k sample rows, argmin ties → lowest index, empty
  *    clusters keep their centroid (IvfIndex's conventions).
  *  - `build`: ONE narrow distributed pass — the codegen
  *    `vec_pq_encode_packed` expression against the flat codebook
  *    literal, emitting all m codes bit-packed into a single BIGINT
  *    (m=16, k=16 → 64 bits exactly: the stored row is (id, code) =
  *    16 bytes, vs 256 B of raw fp32 — the real 32× the ADC scan
  *    claims, not an array column's ~4×). No shuffle; the raw vectors
  *    are read once and never again.
  *  - `search`: ADC top-k over the packed-code scan via codegen
  *    `vec_pq_adc_packed` (m shift-mask extractions + LUT adds per
  *    row) + `TakeOrderedAndProject` — zero Exchange, k-bounded driver
  *    merge, same plan skeleton as the exact flagship but over 8-byte
  *    rows.
  *  - `save`/`load`: codes parquet + flat-codebook sidecar, so a cluster
  *    restart reuses the artifact without retraining or re-encoding.
  *
  * Scores are ADC approximations of dot(q, x) (exact on the query side,
  * centroid-quantized on the corpus side); AnnPqSpec pins the recall
  * floor against the exact top-k and the exact-arithmetic parity of
  * both kernels.
  */
final class PqIndex(
    val m: Int,
    val k: Int,
    val flatCodebook: Array[Float],
    val codes: DataFrame,
    idCol: String) {

  require(flatCodebook.length % (m * k) == 0,
    s"flat codebook length ${flatCodebook.length} is not a multiple of m·k = ${m * k}")

  /** Driver-side ADC lookup table for a query: lut[mm·k + j] =
    * dot(q_mm, centroid_mmj) (see [[PqIndex.lut]]). */
  def lutOf(q: Array[Float]): Array[Double] =
    PqIndex.lut(flatCodebook, m, k, q)

  /** ADC top-k: one packed-code-column scan, zero shuffle. `+ 0.0`
    * normalizes -0.0 → 0.0 so tie ordering near zero matches the
    * engine's oracle-normalized score convention (n05/n06/n07). */
  def search(q: Array[Float], topk: Int): DataFrame =
    codes
      .select(col(idCol),
        (round(VectorOps.pqAdcPacked(col("code"), lutOf(q), m, k), 4) + lit(0.0))
          .as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(topk)

  /** Persist codes + codebook sidecar. The sidecar carries idCol too,
    * so the artifact is self-describing — a load() must not depend on
    * the caller remembering which id column the index was built on. */
  def save(path: String): Unit = {
    codes.write.mode("overwrite").parquet(s"$path/codes")
    val spark = codes.sparkSession
    import spark.implicits._
    Seq((m, k, flatCodebook.toSeq, idCol))
      .toDF("m", "k", "flat_codebook", "id_col")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
  }
}

object PqIndex {

  /** Driver twin of the `vec_pq_adc_packed` expression: identical
    * nibble extraction, identical LUT indexing, identical ascending-
    * subspace Double accumulation — bit-for-bit equal to the codegen
    * kernel on every (word, lut), which is what lets a driver-resident
    * code matrix produce the SAME candidate cut as the distributed ADC
    * scan (RClipEngine's RAM-coarse serving regime; EngineSpec pins the
    * equality end-to-end). */
  def adcPacked(word: Long, lut: Array[Double], m: Int, k: Int): Double = {
    val bits = 32 - java.lang.Integer.numberOfLeadingZeros(k - 1)
    val mask = (1L << bits) - 1
    var acc = 0.0
    var mm = 0
    while (mm < m) {
      val c = ((word >>> (mm * bits)) & mask).toInt
      acc += lut(mm * k + c)
      mm += 1
    }
    acc
  }

  /** ADC lookup table: lut[mm·k + j] = dot(q_mm, centroid_mmj), Double
    * accumulation ascending over dd (left-associated — the order the
    * n06 oracle's unrolled `+` chains reproduce bit-exactly). */
  def lut(flatCb: Array[Float], m: Int, k: Int,
      q: Array[Float]): Array[Double] = {
    val sub = flatCb.length / (m * k)
    val out = new Array[Double](m * k)
    var mm = 0
    while (mm < m) {
      var j = 0
      while (j < k) {
        var s = 0.0
        var dd = 0
        while (dd < sub) {
          s += q(mm * sub + dd).toDouble *
            flatCb((mm * k + j) * sub + dd).toDouble
          dd += 1
        }
        out(mm * k + j) = s
        j += 1
      }
      mm += 1
    }
    out
  }

  /** Per-subspace Lloyd k-means on a deterministic driver-side sample.
    * Returns the flat codebook `[(mm·k + j)·sub + dd]`. */
  def train(df: DataFrame, m: Int, k: Int, iters: Int,
      sampleN: Int = 2048, idCol: String = "vec_id",
      vecCol: String = "embedding"): Array[Float] = {
    val spark = df.sparkSession
    import spark.implicits._
    val sample: Array[Array[Float]] = df
      .orderBy(col(idCol)).limit(sampleN)
      .select(col(vecCol)).as[Array[Float]].collect()
    require(sample.length >= k, s"PQ training needs >= $k sample rows")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val sub = dim / m
    val flat = new Array[Float](m * k * sub)
    var mm = 0
    while (mm < m) {
      // init: sub-vectors of the first k sample rows
      var cents = Array.tabulate(k)(j =>
        Array.tabulate(sub)(dd => sample(j)(mm * sub + dd).toDouble))
      var it = 0
      while (it < iters) {
        val sums = Array.fill(k)(new Array[Double](sub))
        val counts = new Array[Int](k)
        sample.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          var j = 0
          while (j < k) {
            var dist = 0.0; var dd = 0
            while (dd < sub) {
              val diff = v(mm * sub + dd).toDouble - cents(j)(dd)
              dist += diff * diff; dd += 1
            }
            if (dist < bestD) { bestD = dist; best = j }
            j += 1
          }
          var dd = 0
          while (dd < sub) { sums(best)(dd) += v(mm * sub + dd).toDouble; dd += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(k)(j =>
          if (counts(j) == 0) cents(j) // empty cluster keeps its centroid
          else sums(j).map(_ / counts(j)))
        it += 1
      }
      var j = 0
      while (j < k) {
        var dd = 0
        while (dd < sub) {
          flat((mm * k + j) * sub + dd) = cents(j)(dd).toFloat
          dd += 1
        }
        j += 1
      }
      mm += 1
    }
    flat
  }

  /** Train + encode: the artifact build. Codes are materialized (built
    * once, scanned many times). */
  def build(df: DataFrame, m: Int = 8, k: Int = 16, iters: Int = 5,
      sampleN: Int = 2048, idCol: String = "vec_id",
      vecCol: String = "embedding"): PqIndex = {
    val spark = df.sparkSession
    VectorOps.ensureRegistered(spark)
    val flat = train(df, m, k, iters, sampleN, idCol, vecCol)
    val codes = df
      .select(col(idCol),
        VectorOps.pqEncodePacked(col(vecCol), flat, m, k).as("code"))
      .cache()
    codes.count()
    new PqIndex(m, k, flat, codes, idCol)
  }

  /** Reload a saved artifact in a fresh session (the sidecar carries
    * m, k, the codebook, and the id column — fully self-describing).
    * A sidecar missing `id_col` is treated as corrupt and fails loudly:
    * every save() has written it, so no legacy artifacts exist. */
  def load(spark: SparkSession, path: String): PqIndex = {
    VectorOps.ensureRegistered(spark)
    import spark.implicits._
    val sidecar = spark.read.parquet(s"$path/codebook")
    require(sidecar.columns.contains("id_col"),
      s"PqIndex.load: sidecar at $path/codebook has no id_col — corrupt or truncated artifact")
    val (m, k, flat, idCol) = sidecar
      .select(col("m"), col("k"), col("flat_codebook"), col("id_col"))
      .as[(Int, Int, Seq[Float], String)].head()
    new PqIndex(m, k, flat.toArray, spark.read.parquet(s"$path/codes"), idCol)
  }
}
