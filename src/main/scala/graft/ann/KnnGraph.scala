package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted k-NN GRAPH artifact — the on-disk form of the n09 edge list
  * that [[graft.engine.ArtifactCache]]'s scaladoc promises ("at cluster
  * scale this memo is replaced by actually writing the artifact"), and
  * the storage layout n17/n20's serving walks assume: edges land in
  * [[KnnGraph.NUM_BUCKETS]] directory partitions keyed by
  * `src mod NUM_BUCKETS`, so a beam-frontier probe joining on
  * (bucket, src) reads only the frontier's buckets — at 100 TB each
  * expansion step is a partition-pruned point read (dynamic partition
  * pruning from the broadcast frontier), never a full edge scan.
  *
  * Same save/load contract as [[IvfIndex]]/[[IvfPqIndex]]: build once per
  * crawl, every consumer (beam serving, label propagation, degree audits)
  * reads the artifact. The graph itself comes from the capped-LSH
  * candidate join (AnnQueries.n09GraphImpl) — this class is storage +
  * probe only, deliberately free of build logic.
  */
final class KnnGraph private (val edges: DataFrame) {

  /** Out-neighbors of a frontier: broadcast the (tiny) frontier ids and
    * join on (bucket, src) — the bucket equi-join gives the partition
    * pruner its handle; the src equi-join does the exact probe. Returns
    * thin (qcols*, nbr) rows, preserving any extra frontier key columns
    * (n20's qlabel rides along untouched). */
  def neighbors(frontier: DataFrame, idCol: String = "vec_id"): DataFrame = {
    val probe = frontier
      .withColumnRenamed(idCol, "src")
      .withColumn("bucket", KnnGraph.bucketOf(col("src")))
    edges.join(broadcast(probe), Seq("bucket", "src"))
      .drop("bucket", "src")
  }
}

object KnnGraph {

  /** Directory-partition count: enough that a width-10 frontier touches
    * ≲ a sixth of the partitions, few enough that a 100 TB edge table
    * keeps healthy file sizes per bucket (the knob to retune per
    * deployment, like IvfIndex's cell count). */
  val NUM_BUCKETS = 64

  private[ann] def bucketOf(src: Column): Column =
    pmod(src, lit(NUM_BUCKETS.toLong))

  /** Persist a thin (src, nbr) edge list id-bucketed by source. */
  def save(edges: DataFrame, path: String): Unit =
    edges.select(col("src"), col("nbr"))
      .withColumn("bucket", bucketOf(col("src")))
      .repartition(col("bucket")) // one writer task per bucket dir
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Append-save for a grown graph (the [[IvfPqIndex.appendSave]]
    * contract applied to edges): write ONLY `deltaEdges` into the
    * existing artifact's bucket partitions — dynamic-partition append,
    * existing files untouched, each touched bucket directory gains
    * delta files. This is how a crawl's incremental k-NN edges land
    * without rewriting the corpus-sized artifact; the probe path is
    * unchanged because bucket membership is a pure function of src. */
  def appendSave(deltaEdges: DataFrame, path: String): Unit =
    deltaEdges.select(col("src"), col("nbr"))
      .withColumn("bucket", bucketOf(col("src")))
      .repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(path)

  /** The bucket column is WRITTEN from a LONG expression but read back
    * through partition-column type inference (INT); cast it back to
    * LONG explicitly so the (bucket, src) probe join is same-typed by
    * construction instead of leaning on an implicit cast to keep the
    * partition pruner engaged (ADVICE r07). */
  def load(spark: SparkSession, path: String): KnnGraph =
    new KnnGraph(spark.read.parquet(path)
      .withColumn("bucket", col("bucket").cast("long")))
}
