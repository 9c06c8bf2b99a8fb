package graft.ann

import graft.SparkSpec
import graft.ops.{AnnQueries, VectorQueries}
import graft.vec.VectorOps
import org.apache.spark.sql.functions._

class IvfPqSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
  private val q = VectorQueries.flagshipVec

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getDouble(1)))

  test("n08 artifact path returns the identical answer to n07's in-query " +
    "math (ids AND scores — iters=0 codebooks make the two comparable)") {
    val want = rows(AnnQueries.n07_ivf_pq(spark, sf))
    val got = rows(AnnQueries.n08_ivfpq_artifact(spark, sf))
    assert(want.nonEmpty)
    assert(got.sameElements(want),
      s"artifact ${got.toSeq} != in-query ${want.toSeq}")
  }

  test("loaded artifact: the ADC probe prunes cell partitions at the " +
    "source and scans ONLY packed codes (no raw vectors in the plan)") {
    val idx = IvfPqIndex.build(emb, cells = 8, ivfIters = 0,
      m = 8, k = 16, pqIters = 0)
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    idx.save(path)
    idx.codes.unpersist()
    val loaded = IvfPqIndex.load(spark, path)
    // packed storage: one BIGINT code word per row, no array column
    assert(loaded.codes.schema("code").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(!loaded.codes.columns.contains("embedding"))
    val p = loaded.searchAdc(q, topk = 50, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"expected cell partition pruning in:\n$p")
    assert(!p.contains("embedding"),
      s"ADC stage must never read raw vectors:\n$p")
    assert(!p.contains("Exchange"), s"ADC stage must not shuffle:\n$p")
  }

  test("save/load round-trips: identical search output, and both " +
    "codebooks survive bit-exactly") {
    val idx = IvfPqIndex.build(emb, cells = 8, ivfIters = 0,
      m = 8, k = 16, pqIters = 0)
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpq-rt").toString
    idx.save(path)
    val a = rows(idx.search(q, 10, nprobe = 2, coarseK = 50, raw = emb))
    idx.codes.unpersist()
    val loaded = IvfPqIndex.load(spark, path)
    assert(loaded.m == idx.m && loaded.k == idx.k)
    assert(loaded.flatCodebook.sameElements(idx.flatCodebook))
    loaded.centroids.zip(idx.centroids).foreach { case (x, y) =>
      assert(x.sameElements(y))
    }
    val b = rows(loaded.search(q, 10, nprobe = 2, coarseK = 50, raw = emb))
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("incremental add: frozen-codebook append ≡ full rebuild at " +
    "iters=0, and the appended artifact save/loads identically") {
    import spark.implicits._
    // base = first 400 ids, delta = the rest (delta ids all ABOVE the
    // base prefix, so the rebuild's first-8/first-16 id-order codebooks
    // equal base's — the precondition for append ≡ rebuild equality)
    val base = emb.filter(col("vec_id") < 400).cache()
    val delta = emb.filter(col("vec_id") >= 400).cache()
    assert(base.count() >= 16 && delta.count() > 0)
    val baseIdx = IvfPqIndex.build(base, cells = 8, ivfIters = 0,
      m = 8, k = 16, pqIters = 0)
    val grown = baseIdx.add(delta)
    // frozen codebooks: same objects, nothing retrained
    assert(grown.flatCodebook.sameElements(baseIdx.flatCodebook))
    assert(grown.centroids.zip(baseIdx.centroids).forall {
      case (x, y) => x.sameElements(y) })
    val rebuilt = IvfPqIndex.build(emb, cells = 8, ivfIters = 0,
      m = 8, k = 16, pqIters = 0)
    // cell assignments and codes agree row-for-row, not just top-k
    val g = grown.codes.select(col("vec_id"), col("cell"), col("code"))
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    val r = rebuilt.codes.select(col("vec_id"), col("cell"), col("code"))
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(g.sameElements(r), "append must equal rebuild at iters=0")
    val want = rows(rebuilt.search(q, 10, nprobe = 2, coarseK = 50, raw = emb))
    assert(rows(grown.search(q, 10, nprobe = 2, coarseK = 50, raw = emb))
      .sameElements(want))
    // artifact path: save base, append-save ONLY the delta codes into
    // the cell partitions, reload → identical search
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpq-add").toString
    baseIdx.save(path)
    val deltaCodes = grown.codes.as("g")
      .join(delta.select(col("vec_id")), "vec_id")
      .select(col("vec_id"), col("cell"), col("code"))
    grown.appendSave(path, deltaCodes)
    val loaded = IvfPqIndex.load(spark, path)
    assert(loaded.codes.count() == emb.count())
    assert(rows(loaded.search(q, 10, nprobe = 2, coarseK = 50, raw = emb))
      .sameElements(want))
    baseIdx.codes.unpersist(); rebuilt.codes.unpersist()
    base.unpersist(); delta.unpersist()
  }

  test("tombstone remove: deleted ids vanish from search, survivors' " +
    "codes are untouched, and remove ≡ rebuild-on-filtered-corpus when " +
    "the codebook prefix survives") {
    import spark.implicits._
    val idx = IvfPqIndex.build(emb, cells = 8, ivfIters = 0,
      m = 8, k = 16, pqIters = 0)
    // victims chosen OUTSIDE the first-16 codebook prefix so the
    // filtered rebuild derives the identical iters=0 codebooks
    val victims = idx.search(q, 10, nprobe = 2, coarseK = 50, raw = emb)
      .collect().map(_.getLong(0)).filter(_ >= 16).take(3)
    assert(victims.length == 3)
    val removed = idx.remove(victims.toSeq.toDF("vec_id"))
    assert(removed.codes.count() == idx.codes.count() - 3)
    val got = rows(removed.search(q, 10, nprobe = 2, coarseK = 50, raw = emb))
    assert(got.length == 10 && !got.exists(r => victims.contains(r._1)))
    val survivors = emb.filter(!col("vec_id").isin(victims: _*))
    val rebuilt = IvfPqIndex.build(survivors, cells = 8, ivfIters = 0,
      m = 8, k = 16, pqIters = 0)
    assert(got.sameElements(
      rows(rebuilt.search(q, 10, nprobe = 2, coarseK = 50, raw = survivors))))
    idx.codes.unpersist(); rebuilt.codes.unpersist()
  }

  test("trained index, full probe + wide coarse: the exact rerank " +
    "recovers EXACTLY the brute-force top-10 (the n05 contract holds " +
    "through the composed artifact)") {
    // m=16 trained: AnnPqSpec measured exact-top10-inside-ADC-top100 =
    // 1.0 on this corpus, so coarseK=100 + all-cells probing must leave
    // the rerank nothing to miss
    val idx = IvfPqIndex.build(emb, cells = 8, ivfIters = 3,
      m = 16, k = 16, pqIters = 5)
    val want = rows(emb
      .select(col("vec_id"),
        (round(VectorOps.dotQueryNative(col("embedding"), q), 4) + lit(0.0))
          .as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10))
    val got = rows(idx.search(q, 10, nprobe = 8, coarseK = 100, raw = emb))
    assert(got.sameElements(want))
  }
}
