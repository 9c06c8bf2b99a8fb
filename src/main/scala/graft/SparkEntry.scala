package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{AnnQueries, CurationQueries, IngestQueries, MediaQueries, ScaleQueries, DedupQueries, EventQueries, JoinQueries, RelationalQueries, TextQueries, VectorQueries, WordQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-module operator inventories; every entry
  * that is SQL-expressible has a DuckDB oracle twin in `oracleSql` with
  * identical column names and ORDER BY (the driver sorts columns by name
  * and hash-compares values, so both must line up exactly).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's `zebra -stripes +spots` shape (README.md:15) driven
    * through the FULL stack: parser → term resolution (centroid word
    * table) → combine → codegen-scored top-k via the engine façade
    * (SURVEY §3.1). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-entry").toString
    val store = new graft.engine.SnapshotStore(dir)
    store.initFrom(spark, "/root/testdata/sf0.001/embeddings.parquet")
    val engine = new graft.engine.RClipEngine(
      spark, store, new graft.embed.DeterministicEmbedder(64))
    engine.search("label5 -label6", 12)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ VectorQueries.queries ++ WordQueries.queries ++
      JoinQueries.queries ++ EventQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ AnnQueries.queries ++ IngestQueries.queries ++ MediaQueries.queries ++ ScaleQueries.queries ++ CurationQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ VectorQueries.oracleSql ++ WordQueries.oracleSql ++
      JoinQueries.oracleSql ++ EventQueries.oracleSql ++ TextQueries.oracleSql ++
      DedupQueries.oracleSql ++ AnnQueries.oracleSql ++ IngestQueries.oracleSql ++ MediaQueries.oracleSql ++ ScaleQueries.oracleSql ++ CurationQueries.oracleSql
}
