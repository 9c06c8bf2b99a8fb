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

  /** Content stamp of the dataset under `dir`: a 64-bit FNV-1a hash over the
    * RECURSIVE file listing — (path, length, mtime) per file plus the file
    * count. A fixture regenerated within the same mtime tick still changes
    * the stamp when any file's length or the file set changes, and files in
    * nested table subdirectories are covered (ADVICE r08: the old one-level
    * max-mtime stamp could serve a stale artifact durably across JVMs). */
  private def dirStamp(dir: String): Long = {
    def files(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(files)
      else Seq(f)
    val fs = files(new java.io.File(dir)).sortBy(_.getPath)
    var h = 0xcbf29ce484222325L
    def mix(s: String): Unit =
      s.foreach { c => h ^= c.toLong; h *= 0x100000001b3L }
    mix(fs.size.toString)
    fs.foreach { f =>
      mix(f.getPath); mix(f.length.toString); mix(f.lastModified.toString)
    }
    h
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
    * Layout: `<root>/<dataset-slug>/<key>/v<stamp-hex>` — the dataset stamp
    * is part of the DIRECTORY NAME, so a committed version is immutable and
    * a version directory's existence is proof of completeness. The builder
    * writes into a `build-<pid>-<nanos>` temp sibling and ATOMICALLY renames
    * it into place (ADVICE r08: the old overwrite-in-place layout let a
    * concurrent JVM read a half-written table); a writer that loses the
    * rename race deletes its temp and reads the winner's rows. Superseded
    * stamp versions are garbage-collected after the commit (the n21
    * no-accumulation lesson) — a cross-process reader still scanning a
    * superseded version was reading a stale fixture's artifact anyway.
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
      val keyDir = new java.io.File(new java.io.File(artifactRoot, slug), key)
      val path = new java.io.File(keyDir, f"v$stamp%016x")
      if (!path.isDirectory) {
        val tmp = new java.io.File(keyDir,
          s"build-${ProcessHandle.current.pid}-${System.nanoTime()}")
        build.write.mode("overwrite").parquet(tmp.toString)
        try
          java.nio.file.Files.move(tmp.toPath, path.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          // lost the race to a concurrent builder — its committed version
          // is byte-complete (it only appears via this same atomic rename),
          // so drop our copy and read theirs
          case _: java.nio.file.FileSystemException => rmTree(tmp)
        }
        // GC superseded stamp versions and abandoned temp dirs
        Option(keyDir.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName != path.getName)
          .foreach(rmTree)
      }
      val df = spark.read.parquet(path.toString)
      memo.put(k, df)
      df
    }
  }

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete(); ()
  }

  /** Delete every disk-persisted artifact — Bench calls this before the
    * artifact-build section so the `artifact_*` entries time real
    * builds, not stamp-fresh re-reads. Single-process hygiene only: do
    * not call while another JVM may be reading the shared root (Bench
    * runs are serialized by the idle gate, and tests scope the root via
    * the `graft.artifact.dir` property). */
  private[graft] def clearDisk(): Unit = synchronized {
    rmTree(new java.io.File(artifactRoot))
  }
}
