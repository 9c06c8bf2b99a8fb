package graft.ingest

import graft.SparkSpec
import graft.embed.DeterministicEmbedder
import graft.engine.{FakeImageFetcher, SnapshotStore}
import graft.vec.VectorOps
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Counts fetch calls across the (shared-JVM) local executors. */
object CountingFetcher extends graft.engine.ImageFetcher {
  val n = new java.util.concurrent.atomic.AtomicInteger(0)
  def fetch(url: String): Array[Byte] = {
    n.incrementAndGet()
    url.getBytes("UTF-8")
  }
}

class IngestSpec extends SparkSpec {

  private def writeNdjson(lines: Seq[String]): String = {
    val f = Files.createTempFile("listing", ".ndjson")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  private def mkIngest() = {
    val dir = Files.createTempDirectory("graft-ingest").toString
    val store = new SnapshotStore(dir)
    (new Ingest(spark, store, new DeterministicEmbedder(64), FakeImageFetcher), store)
  }

  private def rec(i: Int, ext: String = "jpg"): String =
    s"""{"descr_url": "https://w/Desc_$i", "url": "https://up/f_$i.$ext", "size": ${100 + i}}"""

  test("I1-I6 end-to-end: list, filter, derive, embed, store") {
    val (ingest, store) = mkIngest()
    val listing = writeNdjson(
      (1 to 8).map(i => rec(i)) ++
        Seq(rec(9, "txt"), rec(10, "exe")) ++   // I3: dropped extensions
        Seq(rec(3), rec(5)))                    // in-listing duplicates
    val stats = ingest.run(listing)
    assert(stats.listed == 12)
    assert(stats.newKeys == 10) // 12 minus 2 in-listing dups
    assert(stats.kept == 8)     // minus .txt/.exe
    assert(stats.stored == 8)
    val stored = store.read(spark)
    assert(stored.count() == 8)
    // I4: thumb derivation
    val thumbs = stored.select("thumb_url").collect().map(_.getString(0))
    assert(thumbs.forall(_.matches("https://up/600px-f_\\d+\\.jpg")))
    // I5: vectors are unit-norm embeddings
    val vecs = stored.select("vector").collect()
      .map(_.getSeq[Float](0).toArray)
    assert(vecs.forall(v => math.abs(VectorOps.l2norm(v) - 1.0) < 1e-5))
    // ids are dense and start above 0
    val ids = stored.select("id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(1L to 8L))
  }

  test("I2: re-running the same listing ingests nothing (resumable)") {
    val (ingest, store) = mkIngest()
    val listing = writeNdjson((1 to 5).map(i => rec(i)))
    ingest.run(listing)
    val v1 = store.latestVersion
    val stats2 = ingest.run(listing)
    assert(stats2.newKeys == 0 && stats2.stored == 0)
    assert(store.read(spark).count() == 5)
    assert(store.latestVersion != v1) // a commit happened, content identical
  }

  test("incremental batch: only new keys embed; ids continue the sequence") {
    val (ingest, store) = mkIngest()
    ingest.run(writeNdjson((1 to 5).map(i => rec(i))))
    val stats = ingest.run(writeNdjson((3 to 9).map(i => rec(i))))
    assert(stats.newKeys == 4) // 6,7,8,9
    val ids = store.read(spark).select("id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(1L to 9L))
  }

  test("upsert semantics: same filepath with new key replaces the row") {
    val (ingest, store) = mkIngest()
    ingest.run(writeNdjson(Seq(rec(1))))
    // same image file, different descr key → new row wins on filepath
    ingest.run(writeNdjson(Seq(
      s"""{"descr_url": "https://w/Desc_1b", "url": "https://up/f_1.jpg", "size": 999}""")))
    val rows = store.read(spark).filter(col("filepath") === "https://up/f_1.jpg")
      .collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("size") == 999)
  }

  test("S6: category source feeds the same pipeline via the listing shim") {
    val (ingest, store) = mkIngest()
    val stats = ingest.runOnCategory(
      new graft.sources.FakeCategorySource(6), "Zebras")
    assert(stats.listed == 6 && stats.stored == 6)
    val stored = store.read(spark)
    assert(stored.count() == 6)
    // reference-shaped URLs flow through I4's thumb derivation
    val thumbs = stored.select("thumb_url").collect().map(_.getString(0))
    assert(thumbs.forall(_.contains("/600px-Zebras_")))
    // incremental: re-walking the category ingests nothing (I2)
    assert(ingest.runOnCategory(
      new graft.sources.FakeCategorySource(6), "Zebras").stored == 0)
  }

  test("ids are assigned distributed (no single-partition window) and dense") {
    val (ingest, store) = mkIngest()
    ingest.run(writeNdjson((1 to 40).map(i => rec(i))))
    val ids = store.read(spark).select("id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(1L to 40L))
    // ranks follow the global descr_url order regardless of partitioning
    val byKey = store.read(spark).select("descr_url", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    assert(byKey.map(_._2).sameElements(1L to 40L))
  }

  test("I5 runs once per row: the fetch+embed lineage is not recomputed " +
    "by the id/write/merge jobs (cache regression guard)") {
    CountingFetcher.n.set(0)
    val dir = Files.createTempDirectory("graft-count").toString
    val store = new SnapshotStore(dir)
    val ingest = new Ingest(spark, store, new DeterministicEmbedder(64), CountingFetcher)
    ingest.run(writeNdjson((1 to 6).map(i => rec(i))))
    // local mode shares the JVM, so the static counter sees executor-side
    // calls; without the embedded.cache() this was ~4-5 fetches per row
    assert(CountingFetcher.n.get() == 6,
      s"expected 6 fetches, got ${CountingFetcher.n.get()}")
  }

  test("malformed NDJSON lines are dropped, not fatal") {
    val (ingest, store) = mkIngest()
    val listing = writeNdjson(Seq(rec(1), "{not json at all", rec(2)))
    val stats = ingest.run(listing)
    assert(stats.stored == 2)
  }
}
