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

  test("z-order compaction: BOTH clustered columns prune files; a " +
    "linear sort prunes only its own sort key") {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft-zorder"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(base))
    // 4096-point uniform (a, b) grid, written scattered
    spark.range(4096)
      .selectExpr("id", "CAST(id % 64 AS DOUBLE) AS a", "CAST(id DIV 64 AS DOUBLE) AS b")
      .orderBy(hash(col("id")))
      .repartition(16)
      .write.parquet(s"$base/in")
    val inBytes = new java.io.File(s"$base/in").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val target = inBytes / 16 + 1 // ~16 output files

    val zStats = Compaction.compactZOrder(spark, s"$base/in", s"$base/z",
      Seq("a", "b"), targetBytes = target, buckets = 64)
    Compaction.compact(spark, s"$base/in", s"$base/lin", "a",
      targetBytes = target)
    assert(zStats.rows == 4096)

    // fraction of files whose [min,max] overlaps a 1/8-width slice of
    // the given column — what parquet footer pruning would keep
    def overlapFrac(dir: String, c: String, lo: Double, hi: Double): Double = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).toSeq
      val n = files.count { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col(c)), max(col(c))).collect()(0)
        r.getDouble(0) <= hi && r.getDouble(1) >= lo
      }
      n.toDouble / files.size
    }
    // z-order: a thin slice of EITHER dimension touches a minority of
    // files (Z-curve locality: ~sqrt(N) of N files for 2 dims)
    assert(overlapFrac(s"$base/z", "a", 0, 7) <= 0.5,
      "z-order must prune on column a")
    assert(overlapFrac(s"$base/z", "b", 0, 7) <= 0.5,
      "z-order must prune on column b")
    // linear sort: its own key prunes hard, the other key not at all
    assert(overlapFrac(s"$base/lin", "a", 0, 7) <= 0.3)
    assert(overlapFrac(s"$base/lin", "b", 0, 7) >= 0.8,
      "a linear sort should NOT prune the unsorted column (the gap " +
        "z-order closes)")
    // round-trip integrity
    val got = spark.read.parquet(s"$base/z").select(col("id"))
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (0L until 4096L).toSeq)
  }
}
