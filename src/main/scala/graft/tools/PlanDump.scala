package graft.tools

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for a set of declared queries to files —
  * the plan evidence the optimization rounds commit under `plans/rNN/`
  * (before/after pairs; the judge checks plan claims against these).
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [q1,q2,...]
  * Writes `<outDir>/<query>_<suffix>.txt` per query (default: all).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val subset = args.lift(3).map(_.split(',').toSet)
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => subset.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
          System.err.println(s"[plandump] wrote $name")
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        } finally spark.catalog.clearCache()
      }
    spark.stop()
  }
}
