package graft

import org.apache.spark.sql.SparkSession

/** One place for engine session configuration, so Verify, Bench, and the
  * test harness run identical settings. */
object Sessions {

  /** Apply graft's standard configs to a builder. */
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", cpus)
      // codegen'd vector functions (vec_dot / vec_norm / vec_cosine)
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); read as long, the
      // Tables.events loader restores TimestampType (micros).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE re-plans shuffles at runtime (skew join, dynamic coalescing) —
      // the setting the 100 TB plan relies on; on by default, pinned here.
      .config("spark.sql.adaptive.enabled", "true")

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
