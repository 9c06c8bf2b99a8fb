package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for expensive INTERMEDIATE ARTIFACTS that several
  * audits consume: near-dup pair sets (d02/d06), their transitive cluster
  * labels (c02's closure), and the k-NN edge list (n09). In a production
  * pipeline these are persisted tables — the pair set is computed once per
  * crawl and every downstream job (cluster resolution, rep selection,
  * spectrum, leakage audit) reads the artifact, never re-derives it. The
  * in-session equivalent of that contract is this memo: the first consumer
  * pays the build, everyone after reads the materialized rows. `graft.ann`'s
  * saved IVF/PQ indexes are the on-disk version of the same idea; this cache
  * is for artifacts whose natural lifetime is one driver session.
  *
  * Entries are keyed by (session, dir, dir-mtime, artifact name): a test that
  * regenerates parquet under the same path gets a fresh build (the mtime
  * changes), and two concurrent SparkSessions never share plans. The map is
  * a bounded LRU — evicted DataFrames are plain LogicalRDDs whose
  * localCheckpointed blocks the ContextCleaner reclaims once unreferenced.
  *
  * 100 TB note: at cluster scale this memo is replaced by actually writing
  * the artifact (a thin parquet table of id pairs / labels / edges) and
  * reading it back — the operators already take the artifact DataFrame as an
  * input (clusterPairs, clusterReps, the n09-consuming audits), so the swap
  * is a storage decision, not a code change.
  */
object ArtifactCache {

  private val MaxEntries = 16

  private val memo =
    new java.util.LinkedHashMap[String, DataFrame](MaxEntries, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, DataFrame]): Boolean =
        size() > MaxEntries
    }

  /** Materialize `df` to a plan-less LogicalRDD (RDD round-trip +
    * createDataFrame). Same rationale as the closure loop's per-round
    * materialization: no reference to the producing plan, so consumers
    * re-plan over rows, not over the builder pipeline — and stats fall back
    * to size defaults, which is right for thin artifact tables. Row order
    * survives the round-trip (RDD partition order is stable), so builders
    * that end in a total ORDER BY stay ordered. */
  def materialize(df: DataFrame): DataFrame = {
    val rdd = df.rdd
    rdd.localCheckpoint()
    val out = df.sparkSession.createDataFrame(rdd, df.schema)
    out.count()
    out
  }

  /** Latest mtime under `dir` (one level deep — the per-table parquet files
    * or directories), so a regenerated fixture invalidates its entries. */
  private def dirStamp(dir: String): Long = {
    val f = new java.io.File(dir)
    val kids = Option(f.listFiles()).getOrElse(Array.empty)
    (f.lastModified() +: kids.map(_.lastModified())).max
  }

  def memoize(spark: SparkSession, dir: String, key: String)(
      build: => DataFrame): DataFrame = synchronized {
    val k =
      s"${System.identityHashCode(spark)}:$dir:${dirStamp(dir)}:$key"
    val hit = memo.get(k)
    if (hit != null) hit
    else {
      val v = materialize(build)
      memo.put(k, v)
      v
    }
  }

  /** Test hook. */
  private[graft] def clear(): Unit = synchronized { memo.clear() }

  // ------------------------------------------------------------- disk mode

  /** Root for DISK-persisted artifacts ([[memoizeDisk]]). Overridable for
    * tests via the `graft.artifact.dir` system property. */
  private def artifactRoot: String =
    sys.props.getOrElse("graft.artifact.dir",
      s"${System.getProperty("java.io.tmpdir")}/graft-artifacts")

  /** [[memoize]] with the lifetime the scaladoc above promises at scale:
    * the artifact is WRITTEN as parquet once per (dataset, key,
    * dataset-mtime) and every later consumer — including one in a fresh
    * JVM, or one whose RAM memo entry was LRU-evicted — READS the
    * columnar table back instead of re-running the builder. This is the
    * fix for the d15 12× host-state swing (VERDICT r07 wrong-#3): a
    * memo eviction used to put the whole gram-set rebuild inside the
    * consumer's measurement; now eviction costs a parquet re-read.
    *
    * Layout: `<root>/<dataset-slug>/<key>` with a `_graft_stamp` marker
    * (parquet readers ignore `_`-prefixed files) holding the dataset
    * mtime — a regenerated fixture mismatches the marker and rebuilds
    * IN PLACE (overwrite-stable: no per-run directory accumulation, the
    * n21 lesson). A torn write leaves no marker, so the next consumer
    * rebuilds rather than reading a partial table.
    *
    * NOT order-preserving: parquet read-back may reorder rows across
    * files (unlike [[materialize]]'s RDD round-trip), so this mode is
    * only for artifacts whose consumers are order-insensitive
    * (joins/aggregations over pair sets, gram sets, edge lists). */
  def memoizeDisk(spark: SparkSession, dir: String, key: String)(
      build: => DataFrame): DataFrame = synchronized {
    val stamp = dirStamp(dir)
    val k = s"${System.identityHashCode(spark)}:$dir:$stamp:$key:disk"
    val hit = memo.get(k)
    if (hit != null) hit
    else {
      // slug carries a hash of the FULL dir string: two datasets whose
      // paths differ only in non-alphanumeric characters must never
      // share an artifact directory (the sanitize alone would collide)
      val slug = dir.replaceAll("[^A-Za-z0-9.]", "_") +
        f"-${dir.hashCode & 0xffffff}%06x"
      val path = new java.io.File(new java.io.File(artifactRoot, slug), key)
      val marker = new java.io.File(path, "_graft_stamp")
      val fresh = marker.isFile && {
        try java.nio.file.Files.readString(marker.toPath).trim == stamp.toString
        catch { case _: java.io.IOException => false }
      }
      if (!fresh) {
        build.write.mode("overwrite").parquet(path.toString)
        java.nio.file.Files.writeString(marker.toPath, stamp.toString)
        ()
      }
      val df = spark.read.parquet(path.toString)
      memo.put(k, df)
      df
    }
  }

  /** Delete every disk-persisted artifact — Bench calls this before the
    * artifact-build section so the `artifact_*` entries time real
    * builds, not marker-fresh re-reads. */
  private[graft] def clearDisk(): Unit = synchronized {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(artifactRoot))
  }
}
