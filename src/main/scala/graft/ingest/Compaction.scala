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
}
