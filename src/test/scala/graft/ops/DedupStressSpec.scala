package graft.ops

import graft.SparkSpec
import graft.vec.{Lsh, VectorOps}
import org.apache.spark.sql.functions._

/** Empirical scale checks on the dedup candidate generation (VERDICT r02
  * #7): candidate counts must grow LINEARLY with the number of true
  * near-dups, not quadratically with corpus size, on a purpose-built
  * duplicate-heavy corpus (10× the sf0.1 document count) — the checks
  * behind d02's BUCKET_CAP and d06's plane-count sizing rule.
  */
class DedupStressSpec extends SparkSpec {

  /** Deterministic 8-hex-char token: docs built from these share
    * essentially no 5-char shingles across different ids. */
  private def tok(seed: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(seed.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
  }

  test("d02 cap: pair count is linear in near-dups; a hot identical-doc " +
    "cluster contributes zero O(cluster²) pairs") {
    import spark.implicits._
    // 2000 distinct docs (each will gain one mutated near-dup inside d02)
    // + a hot cluster of 500 IDENTICAL docs. Uncapped, the hot cluster's
    // band buckets pair O(cluster²) ≈ 375k; the BUCKET_CAP=50 drops those
    // buckets entirely — identical-doc clusters are d01's job (exact
    // dedup), not the near-dup join's.
    val distinct = (0 until 2000).map { i =>
      (i.toLong, (0 until 12).map(j => tok(s"$i-$j")).mkString(" "), "srcA")
    }
    val hotText = (0 until 12).map(j => tok(s"hot-$j")).mkString(" ")
    val hot = (0 until 500).map(i => (10000L + i, hotText, "srcB"))
    // stable path + overwrite: repeated suite runs reuse one corpus dir
    // instead of accumulating parquet copies in /tmp
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-stress-d02"
    (distinct ++ hot).toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val pairs = DedupQueries.d02_minhash_lsh(spark, dir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    // copy shift = max(doc_id) + 1 = 10500 on this planted corpus
    val shift = 10500L
    val hotIds = (10000L until 10500L).toSet ++
      ((10000L + shift) until (10500L + shift)).toSet
    val hotPairs = pairs.count(p => hotIds.contains(p._1) || hotIds.contains(p._2))
    val truePairs = pairs.count(p => p._2 == p._1 + shift && p._1 < 2000L)
    assert(hotPairs == 0,
      s"hot cluster leaked $hotPairs pairs through the bucket cap")
    // ≥97.5%: banded MinHash at shingle-J ≈ 0.888 inherently misses
    // 1−(1−J⁴)⁴ ≈ 2% of pairs (LSH recall, independent of the cap;
    // measured 1994/2000 at this seed)
    assert(truePairs >= 1950,
      s"expected ≥1950 of 2000 distinct-doc near-dup pairs, got $truePairs")
    // linear in near-dups: nothing beyond the true pairs survives
    assert(pairs.length == truePairs,
      s"${pairs.length - truePairs} non-true pairs leaked in")
  }

  test("d06 sizing rule: fixed 3-bit buckets go quadratic at 20× corpus; " +
    "log₂(N/B)-scaled bits keep candidates linear at full near-dup recall") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    def randVec(): Array[Float] =
      VectorOps.normalize(Array.fill(Lsh.DIM)(rnd.nextGaussian().toFloat))
    // 20× the sf0.1 embedding count: 39.8k background + 100 planted
    // near-dup pairs (cos ≈ 1 after tiny perturbation)
    val background = (0 until 39800).map(i => (i.toLong, randVec()))
    val planted = (0 until 100).flatMap { i =>
      val v = randVec()
      val w = VectorOps.normalize(v.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
      Seq((100000L + 2 * i, v), (100000L + 2 * i + 1, w))
    }
    val emb = (background ++ planted).toDF("vec_id", "embedding").cache()
    val n = emb.count()

    /** Candidate-JOIN cost Σ_buckets C(size,2) — computed from the bucket
      * histogram (one aggregation), not by materializing the pairs: the
      * fixed-k config's count is ~10⁸ and exists to be measured, not
      * joined. This pre-distinct count is exactly the row count the
      * bucket self-join would produce. */
    def candidateCount(planeSet: Seq[Seq[Array[Double]]]): Long = {
      val structs = planeSet.indices.map(t =>
        struct(lit(t).as("tbl"),
          Lsh.bucketColFor(planeSet)(col("embedding"), t).as("bucket")))
      emb.withColumn("tb", explode(array(structs: _*)))
        .groupBy(col("tb.tbl"), col("tb.bucket")).count()
        .agg(sum(expr("count * (count - 1) div 2"))).head().getLong(0)
    }

    /** Driver-side: does a planted pair share ≥1 table bucket? (Same
      * float-widened sign arithmetic as the executor path.) */
    def collide(planeSet: Seq[Seq[Array[Double]]],
        v: Array[Float], w: Array[Float]): Boolean =
      planeSet.indices.exists { t =>
        planeSet(t).forall { pl =>
          def sign(x: Array[Float]): Boolean = {
            var s = 0.0; var j = 0
            while (j < x.length) { s += x(j).toDouble * pl(j).toFloat.toDouble; j += 1 }
            s > 0
          }
          sign(v) == sign(w)
        }
      }

    // fixed k=3 (the small-corpus default) at 20× corpus: ~L·N²/2^k
    // candidate pairs — quadratic in corpus (≈ 10⁴× N here). This is
    // what "don't scale the bits" costs.
    val fixedTotal = candidateCount(Lsh.planesFor(6, 3))
    assert(fixedTotal > 100L * n,
      s"fixed 3-bit buckets should be super-linear at this N (got $fixedTotal)")

    // scaled k = log₂(N/B) with B≈2.4 → 14 bits, 6 tables: candidate
    // cost ≈ L·N·(B−1)/2 — linear in N with a small constant — while a
    // planted pair (cos ≈ 0.997) still collides in ≥1 table:
    // per-plane agree prob 1−θ/π ≈ 0.977, ^14 ≈ 0.72 per table,
    // OR-amplified miss (1−0.72)⁶ ≈ 5·10⁻⁴.
    val scaled = Lsh.planesFor(6, 14)
    val scaledTotal = candidateCount(scaled)
    assert(scaledTotal < 20L * n,
      s"scaled buckets must keep candidates linear: $scaledTotal vs n=$n")
    val recalled = planted.grouped(2).count {
      case Seq((_, v), (_, w)) => collide(scaled, v, w)
    }
    assert(recalled >= 95,
      s"scaled buckets lost planted near-dups: $recalled/100")
    emb.unpersist()
  }

  test("d06 hot-bucket cap: 5000 planted identical embeddings stay bounded " +
    "and emit no intra-cluster pairs (identical copies are d01's job)") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    def randVec(): Array[Float] =
      VectorOps.normalize(Array.fill(Lsh.DIM)(rnd.nextGaussian().toFloat))
    // 2000 random background vectors + ONE vector with 5000 identical
    // copies — the crawl-shaped degenerate the bitsForCount ladder cannot
    // spread (identical vectors collide in every table at ANY bit width;
    // uncapped, this is C(5000,2) ≈ 12.5M candidate pairs × 6 tables in
    // one bucket of one partition — VERDICT r04 #1's scale-killer).
    val background = (0 until 2000).map(i => (i.toLong, randVec()))
    val hotVec = randVec()
    val hot = (0 until 5000).map(i => (50000L + i, hotVec))
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-stress-d06cap"
    (background ++ hot).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // the census drops the cluster's bucket in EVERY table, so the
    // surviving candidate-join cost is bounded by cap·L·n/2, never
    // O(cluster²)
    val n = 7000L
    val bits = Lsh.bitsForCount(n)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val raw = emb
      .withColumn("tb",
        explode(array(Lsh.tieredBucketStructs(col("embedding"), bits): _*)))
      .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      .cache()
    val capped = Lsh.capTieredBuckets(raw)
    assert(capped.filter(col("vec_id") >= 50000L).count() == 0,
      "every cluster row collides in all 6 tables' hot buckets — all must drop")
    val cost = capped.groupBy(col("tbl"), col("bucket")).count()
      .agg(sum(expr("count * (count - 1) div 2"))).head().getLong(0)
    assert(cost < Lsh.TIER_BUCKET_CAP * Lsh.NUM_TABLES * n / 2,
      s"capped candidate cost $cost exceeds the cap bound")
    raw.unpersist()

    // the full oracled operator completes on this corpus and the cluster
    // contributes ZERO pairs (its rows hold no surviving bucket at all)
    val out = DedupQueries.d06_cosine_lsh(spark, dir)
      .filter(col("id_a") >= 50000L || col("id_b") >= 50000L).count()
    assert(out == 0, s"cluster leaked $out pairs through the cap")

    // both oracles interpolate the capped CTEs — the engines flip
    // together or not at all
    assert(graft.SparkEntry.oracleSql("d06_cosine_lsh").contains("QUALIFY"))
    assert(graft.SparkEntry.oracleSql("n09_knn_graph").contains("QUALIFY"))
  }
}
