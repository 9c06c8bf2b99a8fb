package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {

  test("incremental fold over 3 batches == one-shot aggregate of the " +
    "full table, and batch order does not matter") {
    val events = graft.model.Tables.events(spark, sf)
      .select(col("ts"), col("event_type"), col("value"), col("event_id"))
    val batches = Seq(
      events.filter(pmod(col("event_id"), lit(3)) === 0),
      events.filter(pmod(col("event_id"), lit(3)) === 1),
      events.filter(pmod(col("event_id"), lit(3)) === 2))

    def fold(order: Seq[Int]): Seq[(String, Long, Double, Double)] = {
      val state = order.map(i => IncrementalAgg.aggregate(batches(i)))
        .reduce(IncrementalAgg.merge)
      IncrementalAgg.finalize(state).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSeq
    }

    val oneShot = IncrementalAgg.finalize(IncrementalAgg.aggregate(events))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(oneShot.nonEmpty)
    assert(fold(Seq(0, 1, 2)) == oneShot) // fold == from-scratch
    assert(fold(Seq(2, 0, 1)) == oneShot) // commutative merge

    // state carries first/last event times mergeably too
    val state = batches.map(IncrementalAgg.aggregate).reduce(IncrementalAgg.merge)
    val direct = IncrementalAgg.aggregate(events)
    val a = state.orderBy("event_type").collect().map(_.toSeq).toSeq
    val b = direct.orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
