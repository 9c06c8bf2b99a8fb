package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ann.{IvfPqIndex, KnnGraph}
import graft.model.Tables

/** ARTIFACT LIFECYCLE at stress scale (VERDICT r07 next-#5): IvfPqSpec
  * and AnnIndexSpec pin the add/remove/append ≡ rebuild contracts on the
  * 500-row spec corpus; this main re-runs the same contracts against a
  * stress-generated sf dir (10× = 20k embeddings) so the lifecycle story
  * isn't resting on toy-scale evidence — build at scale, append a delta,
  * remove victims, and assert search ≡ rebuild at every step. Prints one
  * `[lifecycle] PASS <contract> <wall>s` line per contract; throws on
  * the first violation (nonzero exit).
  *
  * Usage: runMain graft.tools.LifecycleStress [sfDir]
  */
object LifecycleStress {

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("target/stress/sf1")
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lifecycle] PASS $name ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    def rows(df: DataFrame): Seq[(Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).cache()
    val n = emb.count()
    println(s"[lifecycle] corpus $sf: $n embeddings")

    // base/delta split: delta ids strictly above the base prefix, so the
    // iters=0 first-rows codebooks of base and full rebuild coincide —
    // the IvfPqSpec precondition for append ≡ rebuild EQUALITY
    val cut = emb.agg(max(col("vec_id"))).head().getLong(0) * 9 / 10
    val base = emb.filter(col("vec_id") <= cut).cache()
    val delta = emb.filter(col("vec_id") > cut).cache()
    require(base.count() >= 16 && delta.count() > 0,
      s"degenerate split at cut=$cut")
    println(s"[lifecycle] base=${base.count()} delta=${delta.count()}")

    val queries = (0 to 4).map(i =>
      new graft.embed.DeterministicEmbedder(64).embedText(s"label$i"))

    // -- contract 1: frozen-codebook append ≡ full rebuild, row-for-row
    val (grown, rebuilt) = timed("ivfpq_add_equals_rebuild") {
      val baseIdx = IvfPqIndex.build(base, cells = 8, ivfIters = 0,
        m = 8, k = 16, pqIters = 0)
      val grown = baseIdx.add(delta)
      assert(grown.flatCodebook.sameElements(baseIdx.flatCodebook),
        "add retrained the PQ codebook")
      val rebuilt = IvfPqIndex.build(emb, cells = 8, ivfIters = 0,
        m = 8, k = 16, pqIters = 0)
      val g = grown.codes.select(col("vec_id"), col("cell"), col("code"))
        .as[(Long, Int, Long)].collect().sortBy(_._1)
      val r = rebuilt.codes.select(col("vec_id"), col("cell"), col("code"))
        .as[(Long, Int, Long)].collect().sortBy(_._1)
      assert(g.length == n && g.sameElements(r),
        "append ≠ rebuild at stress scale")
      (grown, rebuilt)
    }

    // -- contract 2: the appended ARTIFACT (save base + append-save only
    //    the delta codes) answers identically to the rebuilt index
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-lifecycle-" +
      sf.replaceAll("[^A-Za-z0-9.]", "_")
    timed("ivfpq_appendsave_roundtrip") {
      val baseIdx = IvfPqIndex.build(base, cells = 8, ivfIters = 0,
        m = 8, k = 16, pqIters = 0)
      baseIdx.save(s"$path/ivfpq")
      val deltaCodes = grown.codes
        .join(delta.select(col("vec_id")), "vec_id")
        .select(col("vec_id"), col("cell"), col("code"))
      baseIdx.appendSave(s"$path/ivfpq", deltaCodes)
      val loaded = IvfPqIndex.load(spark, s"$path/ivfpq")
      assert(loaded.codes.count() == n, "appended artifact lost rows")
      queries.foreach { q =>
        val want = rows(rebuilt.search(q, 10, nprobe = 4, coarseK = 100, raw = emb))
        val got = rows(loaded.search(q, 10, nprobe = 4, coarseK = 100, raw = emb))
        assert(got == want, "appended-artifact search ≠ rebuild search")
      }
      baseIdx.codes.unpersist()
    }

    // -- contract 3: tombstone remove ≡ rebuild on the filtered corpus
    timed("ivfpq_remove_equals_filtered_rebuild") {
      val victims = rebuilt.search(queries.head, 10, nprobe = 8,
          coarseK = 100, raw = emb)
        .collect().map(_.getLong(0)).filter(_ >= 16).take(5).toSeq
      assert(victims.length == 5)
      val removed = rebuilt.remove(victims.toDF("vec_id"))
      assert(removed.codes.count() == n - 5)
      val survivors = emb.filter(!col("vec_id").isin(victims: _*)).cache()
      val filteredRebuild = IvfPqIndex.build(survivors, cells = 8,
        ivfIters = 0, m = 8, k = 16, pqIters = 0)
      queries.foreach { q =>
        val got = rows(removed.search(q, 10, nprobe = 4, coarseK = 100,
          raw = survivors))
        assert(!got.exists(r => victims.contains(r._1)),
          "a removed id survived in search")
        val want = rows(filteredRebuild.search(q, 10, nprobe = 4,
          coarseK = 100, raw = survivors))
        assert(got == want, "remove ≠ filtered rebuild")
      }
      filteredRebuild.codes.unpersist(); survivors.unpersist()
    }

    // -- contract 4: KnnGraph appendSave over the REAL n09 edge build —
    //    base-save + delta-append loads identical to a full save
    timed("knngraph_appendsave_roundtrip") {
      val edges = graft.ops.AnnQueries.n09Graph(spark, sf).cache()
      val e = edges.count()
      val ecut = edges.agg(max(col("src"))).head().getLong(0) / 2
      KnnGraph.save(edges.filter(col("src") <= ecut), s"$path/knn_grown")
      KnnGraph.appendSave(edges.filter(col("src") > ecut), s"$path/knn_grown")
      KnnGraph.save(edges, s"$path/knn_full")
      val grownG = KnnGraph.load(spark, s"$path/knn_grown")
      val fullG = KnnGraph.load(spark, s"$path/knn_full")
      assert(grownG.edges.count() == e, "appended graph lost edges")
      val diff = grownG.edges.select(col("src"), col("nbr"))
        .exceptAll(fullG.edges.select(col("src"), col("nbr"))).count()
      assert(diff == 0, s"$diff edges differ between appended and full saves")
      // the probe path over the appended artifact matches the full one
      val frontier = emb.select(col("vec_id"))
        .orderBy(col("vec_id").asc).limit(10)
      val a = grownG.neighbors(frontier).select(col("nbr"))
        .as[Long].collect().sorted.toSeq
      val b = fullG.neighbors(frontier).select(col("nbr"))
        .as[Long].collect().sorted.toSeq
      assert(a == b && a.nonEmpty, "appended-graph probe ≠ full-graph probe")
      edges.unpersist()
    }

    grown.codes.unpersist(); rebuilt.codes.unpersist()
    println(s"[lifecycle] ALL CONTRACTS PASS at $sf ($n embeddings)")
    spark.stop()
  }
}
