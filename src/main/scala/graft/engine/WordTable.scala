package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.agg.VectorAggregators
import graft.vec.VectorOps

/** The engine's `words` table — `word STRING, vector ARRAY<FLOAT>`,
  * mirroring the reference's optional `words.sqlite3`
  * (`rclip_server.py:292-308`).
  *
  * Offline there is no precomputed CLIP word list, so the canonical build
  * derives one per-label centroid from the corpus itself: word `labelN` =
  * L2-normalized element-wise mean of that label's embeddings (SURVEY
  * §7.5). One map-side-combining aggregation — the shuffle carries
  * #labels × d doubles, independent of corpus size.
  */
object WordTable {

  /** Per-label centroid words from an embeddings table. */
  def labelCentroids(
      embeddings: DataFrame,
      labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame = {
    val toUnitFloat = udf { (v: Array[Double]) =>
      if (v == null) null
      else {
        val f = new Array[Float](v.length)
        var i = 0
        while (i < v.length) { f(i) = v(i).toFloat; i += 1 }
        VectorOps.normalize(f)
      }
    }
    embeddings
      .groupBy(col(labelCol))
      .agg(VectorAggregators.vecSum(col(vecCol)).as("vsum"))
      // normalize(sum) == normalize(mean): same direction, cheaper
      .select(
        concat(lit("label"), col(labelCol).cast("string")).as("word"),
        toUnitFloat(col("vsum")).as("vector"))
  }

  /** Lowercase-only filter the reference applies to its word table
    * (S3/P3, `rclip_server.py:297-301`). */
  def lowercaseOnly(words: DataFrame): DataFrame =
    words.filter(lower(col("word")) === col("word"))
}
