package graft.engine

import graft.SparkSpec

/** Contract of the session-scoped artifact memo: one build per
  * (session, dir, artifact) while the dir is unchanged; a regenerated
  * fixture (newer mtime under the dir) triggers a fresh build; the hit
  * returns the SAME materialized rows. */
class ArtifactCacheSpec extends SparkSpec {

  private def tmpDir(): java.io.File = {
    val f = java.nio.file.Files.createTempDirectory("graft-artifact").toFile
    f.deleteOnExit()
    f
  }

  test("memoize builds once per (session, dir, key) and returns identical rows") {
    ArtifactCache.clear()
    val dir = tmpDir()
    var builds = 0
    def build() = {
      builds += 1
      spark.range(5).toDF("id")
    }
    val a = ArtifactCache.memoize(spark, dir.getPath, "k")(build())
    val b = ArtifactCache.memoize(spark, dir.getPath, "k")(build())
    assert(builds == 1)
    assert(a.collect().map(_.getLong(0)).toSeq == b.collect().map(_.getLong(0)).toSeq)
    // a different key under the same dir is its own entry
    ArtifactCache.memoize(spark, dir.getPath, "k2")(build())
    assert(builds == 2)
  }

  test("a regenerated dir (newer mtime) invalidates the entry") {
    ArtifactCache.clear()
    val dir = tmpDir()
    var builds = 0
    def build() = { builds += 1; spark.range(3).toDF("id") }
    ArtifactCache.memoize(spark, dir.getPath, "k")(build())
    assert(builds == 1)
    // regenerate: write a file with a strictly newer mtime
    val f = new java.io.File(dir, "table.parquet")
    java.nio.file.Files.writeString(f.toPath, "x")
    f.setLastModified(System.currentTimeMillis() + 5000)
    ArtifactCache.memoize(spark, dir.getPath, "k")(build())
    assert(builds == 2)
  }

  test("materialize preserves row order and schema") {
    val src = spark.range(100).toDF("id").orderBy(org.apache.spark.sql.functions.col("id").desc)
    val out = ArtifactCache.materialize(src)
    assert(out.schema == src.schema)
    assert(out.collect().map(_.getLong(0)).toSeq == (99L to 0L by -1L))
  }
}
