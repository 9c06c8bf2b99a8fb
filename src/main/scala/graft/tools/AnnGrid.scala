package graft.tools

import org.apache.spark.sql.functions._
import graft.vec.VectorOps

/** Throwaway param sweep for the above-cap ANN serving regime: recall@12
  * vs brute over the label query panel, per (cells, nprobe, m, coarseK).
  * Not part of the library surface — a measurement harness. */
object AnnGrid {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = new graft.embed.DeterministicEmbedder(64)
    val corpus = graft.model.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).cache()
    corpus.count()
    val queries = (0 to 9).map(i => emb.embedText(s"label$i"))
    val truth = queries.map { q =>
      corpus.select(col("vec_id"),
          round(VectorOps.dotQueryNative(col("embedding"), q), 4).as("s"))
        .orderBy(col("s").desc, col("vec_id").asc).limit(12)
        .select("vec_id").as[Long].collect().toSet
    }
    for (cells <- Seq(8, 16); m <- Seq(16); ivfIters <- Seq(5)) {
      val ix = graft.ann.IvfPqIndex.build(corpus, "vec_id", "embedding",
        cells = cells, ivfIters = ivfIters, m = m, k = 16, pqIters = 3)
      for (nprobe <- Seq(4, 6, 8, 12).filter(_ <= cells); coarseK <- Seq(128, 192, 256)) {
        val recalls = queries.zip(truth).map { case (q, t) =>
          val got = ix.searchAdc(q, coarseK, nprobe)
            .select("vec_id").as[Long].collect().toSet
          (got & t).size.toDouble / t.size
        }
        println(f"cells=$cells m=$m ivfIters=$ivfIters nprobe=$nprobe " +
          f"coarseK=$coarseK meanRecall=${recalls.sum / recalls.size}%.3f " +
          f"min=${recalls.min}%.3f")
      }
      ix.codes.unpersist()
    }
    spark.stop()
  }
}
