package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  test("compact: rewrites many small files into few range-sorted ones, " +
    "rows preserved, file key-ranges disjoint (pruning-ready)") {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft-compaction"
    val inDir = s"$base/in"
    val outDir = s"$base/out"
    // compact() refuses to overwrite (ErrorIfExists enforces the
    // new-dir + swap contract), so clear the stable spec dir first
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(outDir))
    // 20 tiny files in random row order — the incremental-ingest mess
    spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .orderBy(hash(col("doc_id"))) // scatter the sort key
      .repartition(20)
      .write.mode("overwrite").parquet(inDir)
    val inFiles = new java.io.File(inDir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(inFiles == 20)

    val inBytes = new java.io.File(inDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    // target ≈ half the data → expect 2-3 output files
    val stats = Compaction.compact(spark, inDir, outDir, "doc_id",
      targetBytes = inBytes / 2)
    val outFiles = new java.io.File(outDir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(stats.rows == 500)
    assert(outFiles.length == stats.files && outFiles.length < inFiles)

    // each output file covers a DISJOINT doc_id range (footer min/max
    // becomes a pruning index) and is internally sorted
    val ranges = outFiles.toSeq.map { f =>
      val ids = spark.read.parquet(f.getAbsolutePath)
        .select(col("doc_id")).collect().map(_.getLong(0))
      assert(ids.sameElements(ids.sorted), s"${f.getName} not sorted")
      (ids.min, ids.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) =>
        assert(hiA < loB, s"overlapping file ranges: $ranges")
      case _ =>
    }
    // nothing lost or duplicated
    val got = spark.read.parquet(outDir).select(col("doc_id"))
      .collect().map(_.getLong(0)).sorted
    val want = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want))
  }
}
