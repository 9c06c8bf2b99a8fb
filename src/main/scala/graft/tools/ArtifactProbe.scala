package graft.tools

import org.apache.spark.sql.SparkSession

/** Times the heavyweight ARTIFACT BUILDS (pair sets, cluster labels, the
  * k-NN edge list, the PPJoin gram-set table) in dependency order against
  * an arbitrary sf/stress directory — the VERDICT r08 next-#7 probe: these
  * are the most expensive bench entries and the only heavyweight paths the
  * 100× probe never timed AS BUILDS. One JSON line of walls, same
  * measurement discipline as Bench's artifact section (clear RAM + disk
  * memo first, each entry times only its own stage).
  *
  * Usage: runMain graft.tools.ArtifactProbe <sfDir>
  */
object ArtifactProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark: SparkSession = graft.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.ArtifactCache.clear()
    graft.engine.ArtifactCache.clearDisk()
    val chain = Seq[(String, () => org.apache.spark.sql.DataFrame)](
      "artifact_d02_pairs" -> (() => graft.ops.DedupQueries.d02Pairs(spark, sfDir)),
      "artifact_d02_labels" -> (() => graft.ops.CurationQueries.d02Labels(spark, sfDir)),
      "artifact_d06_pairs" -> (() => graft.ops.DedupQueries.d06Pairs(spark, sfDir)),
      "artifact_d06_labels" -> (() => graft.ops.CurationQueries.d06Labels(spark, sfDir)),
      "artifact_n09_edges" -> (() => graft.ops.AnnQueries.n09Graph(spark, sfDir)),
      "artifact_ppj_sets" -> (() => graft.ops.DedupQueries.ppjSets(spark, sfDir)))
    val walls = chain.map { case (name, build) =>
      val t0 = System.nanoTime()
      val rows =
        try build().count()
        catch {
          case e: Throwable =>
            System.err.println(s"[artifact-probe] $name failed: ${e.getMessage}")
            -1L
        }
      finally spark.catalog.clearCache()
      val sec = (System.nanoTime() - t0) / 1e9
      (name, sec, rows)
    }
    val json = walls.map { case (n, s, r) =>
      f""""$n":{"sec":$s%.3f,"rows":$r}"""
    }.mkString("{", ",", "}")
    println(json)
    spark.stop()
  }
}
