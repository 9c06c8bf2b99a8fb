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
}
