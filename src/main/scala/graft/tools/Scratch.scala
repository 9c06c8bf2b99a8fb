package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway measurement main (deleted before commit). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.DedupQueries
    val sets = DedupQueries.ppjSets(spark, d).cache()
    println("sets=" + sets.count())
    println("avg n=" + sets.agg(avg(col("n"))).head())
    val ranked = DedupQueries.ppjRanked(spark, d)
    println("ranked=" + ranked.count())
    val prefixes = ranked
      .filter(col("rk") <= expr("n - (n + 1) div 2 + 1") &&
        col("df") <= DedupQueries.PPJ_DF_CAP)
      .select(col("doc_id"), col("n"), col("gram"), col("rk"))
      .cache()
    println("prefixes=" + prefixes.count())
    val candRaw = prefixes.as("x").join(prefixes.as("y"),
      col("x.gram") === col("y.gram") &&
        col("x.doc_id") < col("y.doc_id") &&
        col("x.n") * 2 >= col("y.n") && col("y.n") * 2 >= col("x.n") &&
        expr("3 * (least(x.n - x.rk, y.n - y.rk) + 1) >= x.n + y.n"))
    val t0 = System.nanoTime()
    println("cand occurrences=" + candRaw.count())
    println(f"  in ${(System.nanoTime()-t0)/1e9}%.1fs")
    val t1 = System.nanoTime()
    val cd = candRaw.select(col("x.doc_id").as("doc_a"),
      col("y.doc_id").as("doc_b"), col("x.n").as("na"), col("y.n").as("nb"))
      .distinct()
    println("cand distinct=" + cd.count())
    println(f"  in ${(System.nanoTime()-t1)/1e9}%.1fs")
    // d16 candidate mass with the new in-join filters
    val p16 = ranked
      .filter(col("rk") <= expr("n - (9 * n + 9) div 10 + 1") &&
        col("df") <= DedupQueries.PPJ_DF_CAP)
      .select(col("doc_id"), col("n"), col("gram"), col("rk"))
    val probe = ranked.select(col("doc_id"), col("n"), col("gram"), col("rk"))
    val c16 = p16.as("x").join(probe.as("y").hint("shuffle_hash"),
      col("x.gram") === col("y.gram") && col("x.doc_id") =!= col("y.doc_id") &&
        expr("10 * y.n >= 9 * x.n") &&
        expr("10 * (least(x.n - x.rk, y.n - y.rk) + 1) >= 9 * x.n"))
    val t2 = System.nanoTime()
    println("d16 cand occurrences=" + c16.count())
    println(f"  in ${(System.nanoTime()-t2)/1e9}%.1fs")
    spark.stop()
  }
}
