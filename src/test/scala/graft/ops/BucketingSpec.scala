package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the 100 TB fact⋈fact answer: both
  * tables pre-bucketed on the join key means the sort-merge join reads
  * matching buckets directly, with NO shuffle at query time. This spec
  * proves the plan shape (no Exchange) and the result equivalence against
  * the shuffle join. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle and matches results") {
    // warehouse.dir is static config — tables land in the session default
    // (spark-warehouse/, gitignored) and are dropped in the finally
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")

    Tables.lineitem(spark, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")

    // force sort-merge so the test checks bucketing, not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice")), 2).as("rev"))

      val plan = joined.queryExecution.executedPlan.toString
      // the JOIN itself must consume bucket outputs directly: the only
      // Exchange allowed is the one for the final groupBy
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"),
        s"bucketed join must not shuffle its inputs:\n$plan")

      // result equivalence vs the plain (shuffling) join
      val expect = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice")), 2).as("rev"))
      assert(joined.orderBy("o_orderpriority").collect().toSeq ==
        expect.orderBy("o_orderpriority").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
