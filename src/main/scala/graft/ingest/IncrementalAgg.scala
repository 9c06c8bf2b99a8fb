package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the batch-side pattern that keeps
  * a 100 TB metrics table from being recomputed from scratch every
  * ingest cycle: the stored state is a MERGEABLE partial aggregate per
  * key (count, exact micro-unit sum, min/max event time — the same
  * algebra Spark's own partial/final HashAggregate uses, lifted to
  * storage), each new batch folds in as `merge(state, aggregate(batch))`,
  * and the full answer is always derivable from state alone.
  *
  * Cost model: `aggregate` touches only the new batch; `merge` touches
  * only |keys| rows of state — never the historical corpus. A
  * from-scratch recompute is O(corpus); the fold is O(batch + keys) per
  * cycle.
  *
  * Exactly-once discipline is the CALLER's: fold each batch exactly once
  * (Structured Streaming's foreachBatch + checkpoint provides this; a
  * batch scheduler should key runs by batch id) and persist state with
  * the new-dir + `_SUCCESS` swap of [[graft.engine.SnapshotStore]] —
  * merge is additive, so a replayed batch double-counts by design rather
  * than hiding the duplication.
  */
object IncrementalAgg {

  /** Partial aggregate of one events batch: (event_type, n, sum_micro,
    * first_ts, last_ts). Sums are exact BIGINT micro-units (the repo's
    * standard float-accumulation discipline — a running DOUBLE sum
    * drifts past 2⁵³ long before 100 TB). */
  def aggregate(batch: DataFrame): DataFrame =
    batch
      .withColumn("micro", expr("CAST(round(value * 1000000.0D) AS BIGINT)"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("micro")).as("sum_micro"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))

  /** Fold a delta (the `aggregate` of a new batch) into running state.
    * Every column's merge is the algebra that makes partials mergeable:
    * counts/sums add, min/max take extremes — associative and
    * commutative, so batches may arrive in any order. One |keys|-sized
    * shuffle; the corpus is never touched. */
  def merge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta)
      .groupBy(col("event_type"))
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_micro")).as("sum_micro"),
        min(col("first_ts")).as("first_ts"),
        max(col("last_ts")).as("last_ts"))

  /** Render state as the user-facing metrics. The average is derived at
    * READ time from the exact integer partials — averages are not
    * mergeable, only (sum, count) pairs are, which is why the stored
    * state carries `sum_micro`/`n` and never an avg column. */
  def finalize(state: DataFrame): DataFrame =
    state.select(
      col("event_type"), col("n"),
      (col("sum_micro") / lit(1000000.0)).as("sum_value"),
      (col("sum_micro") / (col("n") * lit(1000000.0))).as("avg_value"),
      col("first_ts"), col("last_ts"))
      .orderBy(col("event_type"))
}
