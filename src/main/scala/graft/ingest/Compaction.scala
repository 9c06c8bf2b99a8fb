package graft.ingest

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-files compaction — the data-layout maintenance job every
  * long-running 100 TB table needs: streaming/incremental ingest leaves
  * thousands of KB-scale parquet files whose per-file open/footer cost
  * eventually dominates scans, and whose random row order defeats
  * min/max pruning.
  *
  * `compact` rewrites a parquet directory into size-targeted,
  * range-sorted files:
  *  - file count = ceil(on-disk bytes / targetBytes), from ONE
  *    getContentSummary RPC (same sizing pattern as
  *    [[graft.multimodal.MultimodalOps]]'s blob reader);
  *  - `repartitionByRange(sortCol)` samples the key distribution and
  *    gives evenly sized, globally range-partitioned files, so parquet
  *    min/max footer stats on the sort key become a pruning index —
  *    a scan with a sortCol predicate skips whole files;
  *  - `sortWithinPartitions` makes each file internally ordered
  *    (row-group stats prune too).
  *
  * Output goes to a NEW directory and the caller swaps it in (the same
  * `_SUCCESS`-gated snapshot-commit discipline as
  * [[graft.engine.SnapshotStore]]) — compaction must never rewrite a
  * directory readers are scanning.
  */
object Compaction {

  /** `files` is the count of parquet files ACTUALLY written (a low-
    * cardinality sort key can fill fewer range partitions than
    * requested, and Spark writes no file for an empty partition). */
  final case class Stats(rows: Long, inputBytes: Long, files: Int)

  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      sortCol: String,
      targetBytes: Long = 128L * 1024 * 1024): Stats = {
    val bytes = graft.model.FsUtil.dirBytes(spark, inDir)
    val nFiles = graft.model.FsUtil.sizedCount(bytes, targetBytes)
    val df = spark.read.parquet(inDir)
    // rows counted on the INPUT (already listed) — re-reading the fresh
    // output would re-list every new file just for a stat
    val rows = df.count()
    // default ErrorIfExists enforces the documented contract: compaction
    // writes a NEW directory and the caller swaps it in; Overwrite would
    // silently permit an in-place rewrite under live readers
    df.repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.ErrorIfExists).parquet(outDir)
    val written = {
      val p = new org.apache.hadoop.fs.Path(outDir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    }
    Stats(rows, bytes, written)
  }

  /** Z-ORDER compaction — multi-column data clustering: `compact` makes
    * ONE column's min/max footer stats a pruning index; a table queried
    * by several independent predicates (doc_id point reads AND
    * per-source scans, say) needs every clustered column to prune. Each
    * row's cluster key is the bit-interleave of its columns' QUANTILE
    * RANKS, so files cover hypercubes of the value space and a
    * selective predicate on ANY clustered column overlaps ~N^((k-1)/k)
    * of N files instead of all of them (the Z-curve locality bound).
    *
    * Mechanics, all scan-shaped: per-column bucket boundaries come from
    * `approxQuantile` (driver-side array of `buckets` doubles per
    * column — the mergeable GK sketch, one pass); rank lookup is a
    * binary search against the broadcast boundaries inside one compiled
    * UDF; then the same range-repartition + in-file sort as `compact`,
    * now keyed by the z-value. Quantile ranks, not raw bits: raw-value
    * interleaving degenerates when column scales differ (a BIGINT id
    * and a [0,1] score share no bit structure); rank space is uniform
    * by construction, so the z-curve fills evenly and file sizes stay
    * balanced under ANY value distribution. */
  def compactZOrder(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      zCols: Seq[String],
      targetBytes: Long = 128L * 1024 * 1024,
      buckets: Int = 256): Stats = {
    require(zCols.size >= 2, "z-order needs >= 2 columns (use compact for 1)")
    require(buckets > 1 && (buckets & (buckets - 1)) == 0, "buckets must be a power of 2")
    val bytes = graft.model.FsUtil.dirBytes(spark, inDir)
    val nFiles = graft.model.FsUtil.sizedCount(bytes, targetBytes)
    val df = spark.read.parquet(inDir)
    val rows = df.count()
    val bits = java.lang.Integer.numberOfTrailingZeros(buckets)
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    // one GK-sketch pass per column; boundaries are tiny driver arrays
    val bounds: Array[Array[Double]] = zCols.toArray.map(c =>
      df.stat.approxQuantile(c, probs, 0.01))
    val bc = spark.sparkContext.broadcast(bounds)
    val nCols = zCols.size
    val zUdf = udf { (vals: Seq[java.lang.Double]) =>
      val bs = bc.value
      var z = 0L
      var c = 0
      while (c < nCols) {
        val v = vals(c)
        val bucket =
          if (v == null) 0
          else {
            val i = java.util.Arrays.binarySearch(bs(c), v.doubleValue)
            if (i >= 0) i + 1 else -(i + 1)
          }
        var b = 0
        while (b < bits) { // bit b of this column → interleaved position
          z |= ((bucket >> b) & 1L) << (b.toLong * nCols + c)
          b += 1
        }
        c += 1
      }
      z
    }
    val zIn = array(zCols.map(c => col(c).cast("double")): _*)
    df.withColumn("__z", zUdf(zIn))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z") // narrow projection: per-partition order survives
      .write.mode(SaveMode.ErrorIfExists).parquet(outDir)
    val written = {
      val p = new org.apache.hadoop.fs.Path(outDir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    }
    Stats(rows, bytes, written)
  }
}
