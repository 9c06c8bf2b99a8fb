package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** The per-query dump loop, separated from `main` so the failure-path
    * contract is unit-testable without a session-stopping main: each
    * query writes `outDir/<name>` parquet, and a THROWING query writes
    * `outDir/<name>.err` (message + stack head) — a loud marker
    * (VERDICT r05 #4): without it a broken query just VANISHES from the
    * driver's correctness JSON and "missing" reads as "not declared"
    * instead of "broken". */
  def runQueries(spark: SparkSession, sfDir: String, outDir: String,
      subset: Option[Set[String]]): Unit = {
    new java.io.File(outDir).mkdirs()
    // per-query Spark wall clock (compute + the coalesce(1) dump write),
    // recorded alongside the dumps — the Spark-side half of the
    // STRESS_r{N} per-query cost record (the DuckDB half comes from
    // tools/check_oracle_timed.py)
    val walls = scala.collection.mutable.LinkedHashMap[String, Double]()
    SparkEntry.queries
      .filter { case (name, _) => subset.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // a rerun that succeeds must clear a prior failure's marker —
        // a stale .err next to a fresh dump reads as "still broken"
        Files.deleteIfExists(Paths.get(s"$outDir/$name.err"))
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        val head = (s"${e.getClass.getName}: ${e.getMessage}" +:
          e.getStackTrace.take(8).map("  at " + _)).mkString("\n")
        try Files.writeString(Paths.get(s"$outDir/$name.err"), head + "\n")
        catch { case _: Throwable => () }
      }
      walls(name) = (System.nanoTime() - t0) / 1e9
    }
    val wallsJson = walls
      .map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    try Files.writeString(Paths.get(s"$outDir/spark_walls.json"), wallsJson)
    catch { case _: Throwable => () }
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name subset (local iteration;
    // the driver always calls with 2 args = full run)
    val subset = args.lift(2).map(_.split(',').toSet)
    val spark = Sessions.local()
    runQueries(spark, sfDir, outDir, subset)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
