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

  test("memoizeDisk: one build per (dataset, key, mtime) across RAM-memo " +
    "evictions AND fresh sessions — eviction costs a parquet re-read, " +
    "never a rebuild (VERDICT r07 wrong-#3)") {
    val store = tmpDir()
    System.setProperty("graft.artifact.dir", store.getPath)
    try {
      ArtifactCache.clear()
      val dir = tmpDir()
      var builds = 0
      def build() = { builds += 1; spark.range(7).toDF("id") }
      val a = ArtifactCache.memoizeDisk(spark, dir.getPath, "pp")(build())
      assert(builds == 1)
      assert(a.collect().map(_.getLong(0)).sorted.toSeq == (0L to 6L))
      // simulate an LRU eviction / a fresh JVM: the RAM memo is gone but
      // the parquet artifact + stamp marker survive → NO rebuild
      ArtifactCache.clear()
      val b = ArtifactCache.memoizeDisk(spark, dir.getPath, "pp")(build())
      assert(builds == 1, "eviction must re-read the artifact, not rebuild")
      assert(b.collect().map(_.getLong(0)).sorted.toSeq == (0L to 6L))
      // the artifact is a real parquet table under a stamp-addressed
      // version dir (slug = sanitized dir + hash suffix so distinct dirs
      // that sanitize identically can never share an artifact); a
      // version dir only ever appears via an atomic rename, so its
      // existence proves a complete write
      val slug = dir.getPath.replaceAll("[^A-Za-z0-9.]", "_") +
        f"-${dir.getPath.hashCode & 0xffffff}%06x"
      val art = new java.io.File(new java.io.File(store, slug), "pp")
      def versions() = Option(art.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("v")).map(_.getName).sorted.toSeq
      assert(versions().size == 1)
      val v1 = versions().head
      // a regenerated dataset invalidates: new stamp → new version dir,
      // and the superseded version is garbage-collected (no accumulation)
      val f = new java.io.File(dir, "table.parquet")
      java.nio.file.Files.writeString(f.toPath, "x")
      ArtifactCache.clear()
      ArtifactCache.memoizeDisk(spark, dir.getPath, "pp")(build())
      assert(builds == 2, "a regenerated fixture must rebuild the artifact")
      assert(versions().size == 1 && versions().head != v1,
        "superseded version must be GC'd, new version committed")
      // same-tick regeneration with a LENGTH change still invalidates
      // (the stamp hashes path+length+mtime recursively, ADVICE r08)
      val mt = f.lastModified()
      java.nio.file.Files.writeString(f.toPath, "xyz")
      f.setLastModified(mt)
      ArtifactCache.clear()
      ArtifactCache.memoizeDisk(spark, dir.getPath, "pp")(build())
      assert(builds == 3, "same-mtime length change must rebuild")
      // clearDisk removes everything (Bench's honest-build pre-step)
      ArtifactCache.clearDisk()
      assert(!art.exists())
      ArtifactCache.clear()
      ArtifactCache.memoizeDisk(spark, dir.getPath, "pp")(build())
      assert(builds == 4)
      // a committed version wins over a would-be builder: with the RAM
      // memo cleared but the version dir present, no rebuild happens
      ArtifactCache.clear()
      ArtifactCache.memoizeDisk(spark, dir.getPath, "pp")(build())
      assert(builds == 4, "existing committed version must be read, not rebuilt")
    } finally {
      System.clearProperty("graft.artifact.dir")
      ArtifactCache.clear()
    }
  }

  test("materialize preserves row order and schema") {
    val src = spark.range(100).toDF("id").orderBy(org.apache.spark.sql.functions.col("id").desc)
    val out = ArtifactCache.materialize(src)
    assert(out.schema == src.schema)
    assert(out.collect().map(_.getLong(0)).toSeq == (99L to 0L by -1L))
  }
}
