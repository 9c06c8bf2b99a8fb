package graft.streaming

import graft.SparkSpec
import graft.embed.DeterministicEmbedder
import graft.engine.{FakeImageFetcher, SnapshotStore}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  test("streaming ingest: NDJSON file source → dedup → embed → snapshot") {
    val listingDir = Files.createTempDirectory("stream-listing").toString
    val checkpoint = Files.createTempDirectory("stream-ckpt").toString
    val storeDir = Files.createTempDirectory("stream-store").toString
    val store = new SnapshotStore(storeDir)

    def rec(i: Int): String =
      s"""{"descr_url": "https://w/D$i", "url": "https://up/f$i.jpg", "size": $i, "event_ts": "2024-01-01T00:0$i:00.000Z"}"""
    // two files; key D2 duplicated across them
    Files.writeString(java.nio.file.Paths.get(listingDir, "a.ndjson"),
      Seq(rec(1), rec(2)).mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(listingDir, "b.ndjson"),
      Seq(rec(2), rec(3)).mkString("\n"))

    val q = StreamingOps.startIngest(spark, listingDir, store,
      new DeterministicEmbedder(64), FakeImageFetcher, checkpoint)
    q.awaitTermination(120000)

    val stored = store.read(spark)
    assert(stored.count() == 3) // D1, D2 (once), D3
    assert(stored.select("descr_url").distinct().count() == 3)
  }

  test("watermarked hourly windowed aggregation over an event stream") {
    import spark.implicits._
    implicit val s = spark
    val mem = MemoryStream[(Timestamp, String, Double)](spark)
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val query = StreamingOps.hourlyCounts(df).writeStream
      .format("memory").queryName("hourly").outputMode("complete").start()
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    mem.addData((t(0, 10), "click", 1.0), (t(0, 50), "click", 2.0),
      (t(1, 5), "view", 3.0))
    query.processAllAvailable()
    val rows = spark.table("hourly").orderBy("hour", "event_type").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n") == 2) // two clicks in hour 0
    assert(rows(0).getAs[Double]("sum_value") == 3.0)
    query.stop()
  }

  test("stream/batch unification: streaming hourly counts == batch result") {
    // stream the REAL events table through the windowed aggregation and
    // compare against the same aggregation run as a batch query — the
    // unification guarantee Structured Streaming is built on
    val batchEvents = graft.model.Tables.events(spark, sf)
      .select("ts", "event_type", "value")
    val dir = Files.createTempDirectory("stream-eq").toString
    batchEvents.write.parquet(s"$dir/in")

    val streamIn = spark.readStream
      .schema(batchEvents.schema).parquet(s"$dir/in")
    val q = StreamingOps.hourlyCounts(streamIn).writeStream
      .format("memory").queryName("eq_stream").outputMode("complete").start()
    q.processAllAvailable()

    val streamed = spark.table("eq_stream")
      .orderBy("hour", "event_type")
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2)))
    val batch = StreamingOps.hourlyCounts(batchEvents) // same code path
      .orderBy("hour", "event_type")
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2)))
    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch))
    q.stop()
  }

  test("native session_window: streaming append result == the batch " +
    "query once a future sentinel flushes the watermark") {
    import spark.implicits._
    val events = graft.model.Tables.events(spark, sf)
      .select("user_id", "ts")
    val dir = Files.createTempDirectory("sess-win").toString
    events.write.parquet(s"$dir/in")
    // far-future sentinel on a fake user: advances the global watermark
    // past every real session's end so append mode finalizes them all
    Seq((-1L, Timestamp.valueOf("2030-01-01 00:00:00")))
      .toDF("user_id", "ts").write.mode("append").parquet(s"$dir/in")
    val streamIn = spark.readStream.schema(events.schema).parquet(s"$dir/in")
    val q = StreamingOps.sessionWindows(streamIn).writeStream
      .format("memory").queryName("sess_win").outputMode("append").start()
    q.processAllAvailable()
    def tup = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val streamed = spark.table("sess_win").filter(col("user_id") >= 0)
      .orderBy("user_id", "start_us").collect().map(tup).toSeq
    val batch = StreamingOps.sessionWindows(events) // same code path
      .orderBy("user_id", "start_us").collect().map(tup).toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streamed ${streamed.size} sessions vs batch ${batch.size}")
    q.stop()
  }

  test("history-guarded dedup: bloom + exact anti-join drops exactly " +
    "the docs already in the static history, stream == batch") {
    // history = first 300 docs; stream = all 500 (300 dups + 200 new).
    // A deliberately tiny bloom capacity forces real false positives
    // through the suspect path, so the exact anti-join's FP repair is
    // exercised, not just the fast pass-through.
    val all = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "text")
    val history = all.filter(col("doc_id") < 300)
    val dir = Files.createTempDirectory("hist-dedup").toString
    all.write.parquet(s"$dir/in")

    val streamIn = spark.readStream.schema(all.schema).parquet(s"$dir/in")
    val q = StreamingOps.historyGuardedDedup(streamIn, history, expectedKeys = 8)
      .writeStream.format("memory").queryName("hist_dedup")
      .outputMode("append").start()
    q.processAllAvailable()

    val streamed = spark.table("hist_dedup").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val batch = StreamingOps.historyGuardedDedup(all, history, expectedKeys = 8)
      .select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq // same code path, batch df
    val expected = all.join(history.select("text"), Seq("text"), "left_anti")
      .select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(expected.nonEmpty && expected.forall(_ >= 300))
    assert(streamed == expected, s"stream got ${streamed.size} rows")
    assert(batch == expected)
    q.stop()
  }

  test("streaming curation: quality floor + digest dedup within watermark") {
    import spark.implicits._
    implicit val s = spark
    val mem = MemoryStream[(Long, String, String, Timestamp)](spark)
    val df = mem.toDF().toDF("doc_id", "lang", "text", "event_ts")
    val query = StreamingOps.curatedDocuments(df).writeStream
      .format("memory").queryName("curated").outputMode("append").start()
    def t(m: Int) = new Timestamp(1704067200000L + m * 60000L)
    val good = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val junk = "the the the the the the the the the the"
    mem.addData(
      (1L, "en", good, t(0)),
      (2L, "en", good, t(1)),   // duplicate content → deduped
      (3L, "en", junk, t(2)))   // all-stopword, zero diversity → dropped
    query.processAllAvailable()
    val rows = spark.table("curated").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(rows.map(_._1).toSet == Set(1L))
    assert(rows.head._2 >= 0.6)
    // same content arriving within the watermark stays deduped
    mem.addData((4L, "en", good, t(3)))
    query.processAllAvailable()
    assert(spark.table("curated").count() == 1)
    query.stop()
  }

  test("streaming as-of enrichment: purchases pick up the latest prior " +
    "view, state carries across micro-batches") {
    import spark.implicits._
    implicit val s = spark
    val mem = MemoryStream[StreamingOps.AsofEv](spark)
    val query = StreamingOps.asofEnrich(mem.toDS()).writeStream
      .format("memory").queryName("asof").outputMode("append").start()
    def t(m: Int) = new Timestamp(1704067200000L + m * 60000L)
    mem.addData(
      StreamingOps.AsofEv(1, t(0), 10, is_view = true),
      StreamingOps.AsofEv(1, t(5), 11, is_view = false), // prior = 10
      StreamingOps.AsofEv(2, t(1), 20, is_view = false)) // no view yet
    query.processAllAvailable()
    mem.addData(
      StreamingOps.AsofEv(1, t(6), 12, is_view = true),
      StreamingOps.AsofEv(1, t(7), 13, is_view = false), // prior = 12
      StreamingOps.AsofEv(2, t(8), 21, is_view = false)) // still none
    query.processAllAvailable()
    val got = spark.table("asof").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSet
    assert(got == Set((11L, Some(10L)), (20L, None),
      (13L, Some(12L)), (21L, None)))
    query.stop()
  }

  test("stream/batch unification: streaming as-of == batch e07 on the " +
    "events table") {
    import spark.implicits._
    implicit val s = spark
    val asofIn = graft.model.Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"),
        (col("event_type") === "view").as("is_view"))
    val dir = Files.createTempDirectory("stream-asof-eq").toString
    asofIn.write.parquet(s"$dir/in")
    val streamIn = spark.readStream.schema(asofIn.schema).parquet(s"$dir/in")
      .as[StreamingOps.AsofEv]
    val q = StreamingOps.asofEnrich(streamIn).writeStream
      .format("memory").queryName("asof_eq").outputMode("append").start()
    q.processAllAvailable()
    val streamed = spark.table("asof_eq").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val batch = graft.ops.EventQueries.e07_asof_join(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
    q.stop()
  }

  test("stream-stream join: watermarked view x purchase attribution " +
    "join == the ORACLED batch twin e26 on the events table " +
    "(VERDICT r07 next-#4)") {
    val ev = graft.model.Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "purchase"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("v_id"),
        col("ts").as("v_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("ts").as("p_ts"))
    val dir = Files.createTempDirectory("stream-ss-join").toString
    views.write.parquet(s"$dir/v")
    purchases.write.parquet(s"$dir/p")
    val q = StreamingOps.attributionJoin(
        spark.readStream.schema(views.schema).parquet(s"$dir/v"),
        spark.readStream.schema(purchases.schema).parquet(s"$dir/p"))
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    q.processAllAvailable()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val streamed = spark.table("ss_join").collect().map(key).toSet
    // batch truth: the ORACLED batch twin (e26 — hash-checked against
    // DuckDB's native inequality join in CORRECTNESS), so the streaming
    // operator's semantics chain all the way to the oracle. e26 emits
    // (user_id, v_id, p_id, lag_sec); the stream emits the same shape.
    val batch = graft.ops.EventQueries.e26_attribution_join(spark, sf)
      .collect().map(key).toSet
    assert(batch.nonEmpty, "fixture must produce attribution pairs")
    assert(streamed == batch,
      s"streamed ${streamed.size} pairs vs batch ${batch.size}")
    q.stop()
  }

  test("restart recovery: dedupedListing resumes offsets AND " +
    "dropDuplicatesWithinWatermark state from the checkpoint — a key " +
    "duplicated across the restart is dropped, pre-restart rows are " +
    "not replayed") {
    import org.apache.spark.sql.streaming.Trigger
    val inDir = Files.createTempDirectory("restart-dedup-in").toString
    val ckpt = Files.createTempDirectory("restart-dedup-ckpt").toString
    val outDir = Files.createTempDirectory("restart-dedup-out").toString + "/rows"
    def rec(i: Int, size: Int): String =
      s"""{"descr_url": "https://w/D$i", "url": "https://up/f$i.jpg", "size": $size, "event_ts": "2024-01-01T00:0$i:00.000Z"}"""
    def runOnce(): Unit = {
      val q = StreamingOps.dedupedListing(spark, inDir).writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(outDir); ()
        }
        .start()
      q.awaitTermination(120000)
    }
    Files.writeString(java.nio.file.Paths.get(inDir, "a.ndjson"),
      Seq(rec(1, 1), rec(2, 2)).mkString("\n"))
    runOnce() // first run: D1, D2 pass, then the query stops (the "kill")
    // across the restart: D2 again (same key, DIFFERENT size — if the
    // dedup state store were lost, this row would sail through) + D3
    Files.writeString(java.nio.file.Paths.get(inDir, "b.ndjson"),
      Seq(rec(2, 99), rec(3, 3)).mkString("\n"))
    runOnce() // restart from the same checkpoint
    val got = spark.read.parquet(outDir)
      .select("descr_url", "size").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq(("https://w/D1", 1L), ("https://w/D2", 2L),
      ("https://w/D3", 3L)),
      s"expected D1,D2(pre-restart size),D3 exactly once each; got $got")
  }

  test("restart recovery: asofEnrich resumes flatMapGroupsWithState " +
    "state from the checkpoint — post-restart purchases still see " +
    "pre-restart views, and the split run equals an uninterrupted run") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    implicit val s = spark
    val inDir = Files.createTempDirectory("restart-asof-in").toString + "/in"
    val ckpt = Files.createTempDirectory("restart-asof-ckpt").toString
    val outDir = Files.createTempDirectory("restart-asof-out").toString + "/rows"
    def t(m: Int) = new Timestamp(1704067200000L + m * 60000L)
    def runOnce(out: String, checkpoint: String): Unit = {
      val streamIn = spark.readStream
        .schema(Seq.empty[StreamingOps.AsofEv].toDS().schema)
        .parquet(inDir).as[StreamingOps.AsofEv]
      val q = StreamingOps.asofEnrich(streamIn).writeStream
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[StreamingOps.AsofOut], _: Long) =>
            b.toDF().write.mode("append").parquet(out); ()
        }
        .start()
      q.awaitTermination(120000)
    }
    Seq(
      StreamingOps.AsofEv(1, t(0), 10, is_view = true),
      StreamingOps.AsofEv(1, t(5), 11, is_view = false), // prior = 10
      StreamingOps.AsofEv(2, t(1), 20, is_view = true))  // state only
      .toDS().write.mode("append").parquet(inDir)
    runOnce(outDir, ckpt) // run 1, then the query stops (the "kill")
    Seq(
      StreamingOps.AsofEv(1, t(7), 12, is_view = false), // prior = 10 (recovered)
      StreamingOps.AsofEv(2, t(8), 21, is_view = false)) // prior = 20 (recovered)
      .toDS().write.mode("append").parquet(inDir)
    runOnce(outDir, ckpt) // restart from the same checkpoint
    def read(out: String) = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    val got = read(outDir)
    // 12 and 21 enrich ONLY if the per-user view state survived the kill
    assert(got == Set((11L, Some(10L)), (12L, Some(10L)), (21L, Some(20L))),
      s"state not recovered across restart: $got")
    // uninterrupted control: a fresh checkpoint over the SAME input dir
    // (both batches present) must produce the identical output set
    val ckpt2 = Files.createTempDirectory("restart-asof-ckpt2").toString
    val outDir2 = Files.createTempDirectory("restart-asof-out2").toString + "/rows"
    runOnce(outDir2, ckpt2)
    assert(read(outDir2) == got)
  }

  test("mapGroupsWithState sessionization counts per-user events") {
    import spark.implicits._
    implicit val s = spark
    val mem = MemoryStream[StreamingOps.Ev](spark)
    val query = StreamingOps.sessionize(mem.toDS(), withTimeout = false).writeStream
      .format("memory").queryName("sessions").outputMode("update").start()
    def t(m: Int) = new Timestamp(1704067200000L + m * 60000L)
    mem.addData(
      StreamingOps.Ev(1, t(0), "click"), StreamingOps.Ev(1, t(5), "view"),
      StreamingOps.Ev(2, t(1), "click"))
    query.processAllAvailable()
    mem.addData(StreamingOps.Ev(1, t(10), "click"))
    query.processAllAvailable()
    val byUser = spark.table("sessions").orderBy(col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // user 1 accumulated 3 events across micro-batches, user 2 has 1
    assert(byUser.contains((1L, 3L)))
    assert(byUser.contains((2L, 1L)))
    query.stop()
  }

  test("stream/batch unification: streaming transitions == batch e11 " +
    "edge counts across micro-batches") {
    import spark.implicits._
    implicit val s = spark
    val evs = graft.model.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type",
        "unix_micros(ts) AS tsMicros", "event_id")
      .as[StreamingOps.TransEv].collect()
      .sortBy(e => (e.tsMicros, e.event_id)) // global event-time order
      // preserves per-user order across the micro-batch splits below
    val mem = MemoryStream[StreamingOps.TransEv](spark)
    val query = StreamingOps.transitions(mem.toDS()).writeStream
      .format("memory").queryName("trans").outputMode("append").start()
    evs.grouped(300).foreach { chunk =>
      mem.addData(chunk.toSeq)
      query.processAllAvailable() // state must carry edges ACROSS batches
    }
    val streamed = spark.table("trans").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val batch = graft.ops.EventQueries.e11_transitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
    query.stop()
  }

  test("stream/batch unification: streaming volume spikes == batch e15 " +
    "with verdicts carried across micro-batches") {
    import spark.implicits._
    implicit val s = spark
    val evs = graft.model.Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) div 86400000000 AS dayId")
      .as[StreamingOps.SpikeEv].collect()
      .sortBy(_.dayId) // per-type event-time order across batches
    // sentinel day per type: closes the final open day so its verdict
    // is emitted (a live pipeline's next real day plays this role)
    val maxDay = evs.map(_.dayId).max
    val sentinels = evs.map(_.event_type).distinct
      .map(t => StreamingOps.SpikeEv(t, maxDay + 1))
    val mem = MemoryStream[StreamingOps.SpikeEv](spark)
    val query = StreamingOps.volumeSpikes(mem.toDS()).writeStream
      .format("memory").queryName("spikes").outputMode("append").start()
    (evs ++ sentinels).grouped(400).foreach { chunk =>
      mem.addData(chunk.toSeq)
      query.processAllAvailable() // day counts must close ACROSS batches
    }
    val streamed = spark.table("spikes").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val batch = graft.ops.EventQueries.e15_volume_spikes(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(streamed == batch)
    query.stop()
  }

  test("e21 equivalence: a real withWatermark stream drops exactly the " +
    "rows the batch audit predicts, batch by batch") {
    import spark.implicits._
    implicit val sq = spark
    // the audit at sf0.01 and the streaming replay use the SAME batch
    // size and the SAME planted shift, so numRowsDroppedByWatermark
    // must equal the audit's n_late total
    val sf001 = "/root/testdata/sf0.01"
    val B = graft.ops.EventQueries.WM_BATCH
    val audit = graft.ops.EventQueries
      .watermarkBatchAudit(spark, sf001, B).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val rows = graft.model.Tables.events(spark, sf001)
      .selectExpr("event_id",
        s"${graft.ops.EventQueries.wmShiftSpark} AS ev_us")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val mem = MemoryStream[(Long, Long)](spark)
    val st = mem.toDF().toDF("event_id", "ev_us")
      .withColumn("ev_ts", expr("timestamp_micros(ev_us)"))
      .withWatermark("ev_ts",
        s"${graft.ops.EventQueries.WM_DELAY_S} seconds")
      .dropDuplicates(Seq("event_id", "ev_ts"))
    val query = st.writeStream.format("memory").queryName("wmeq")
      .outputMode("append").start()
    rows.grouped(B.toInt).foreach { batch =>
      mem.addData(batch.toIndexedSeq)
      query.processAllAvailable()
    }
    val dropped = query.recentProgress
      .groupBy(_.batchId).map(_._2.head) // one progress per micro-batch
      .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
    val expected = audit.values.sum
    assert(expected > 0, "the planted hours-late devices must register")
    assert(dropped == expected,
      s"streaming dropped $dropped, audit predicts $expected")
    assert(spark.table("wmeq").count() == rows.length - expected)
    query.stop()
  }

  test("e22 equivalence: a real dropDuplicatesWithinWatermark stream " +
    "suppresses/escapes exactly what the horizon audit predicts") {
    import graft.ops.EventQueries
    import spark.implicits._
    implicit val sq = spark
    // sf0.01 at the audit's own batch size: the only scale/granularity
    // where the fixture populates ALL FOUR outcome classes (sf0.001's
    // 2592 s/position cadence makes escapes unreachable by arithmetic)
    val sf001 = "/root/testdata/sf0.01"
    val B = EventQueries.WM_BATCH
    val H = 86400L // the 24h TTL row of the audit's horizon menu
    // the planted feed, replicated from the audit's definition
    val ev = graft.model.Tables.events(spark, sf001)
      .selectExpr("event_id", "unix_micros(ts) AS ev_us")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val origs = ev.map { case (id, us) => (id, us, id) }
    val dups = ev.filter(_._1 % 13 == 6).map { case (id, us) =>
      (id, us + (id % 5) * 43200000000L, id + (id % 7 + 1) * 200) }
    val feed = (origs ++ dups).sortBy(t => (t._3, t._1))
    // driver watermark replay for ORIGINAL lateness (the audit reports
    // dup outcomes; originals can go late too when a re-stamped dup
    // bumps a batch max) — same completed-batch ms-truncated rule
    val bmax = feed.groupBy(_._3 / B).view.mapValues(_.map(_._2).max).toMap
    def wmOf(b: Long): Option[Long] = {
      val prior = bmax.keys.filter(_ < b)
      if (prior.isEmpty) None
      else Some((prior.map(bmax).max / 1000 - H * 1000) * 1000)
    }
    val lateOrig = origs.count { case (_, us, arr) =>
      wmOf(arr / B).exists(us < _) }
    val auditRow = EventQueries.dedupHorizonAudit(spark, sf001, B)
      .filter(col("h_s") === H).collect().head
    val (nDups, nSup, nLate, nEsc, nSolo) = (auditRow.getLong(1),
      auditRow.getLong(2), auditRow.getLong(3), auditRow.getLong(4),
      auditRow.getLong(5))
    assert(Seq(nSup, nLate, nEsc, nSolo).forall(_ > 0),
      s"every outcome class must populate: $auditRow")
    // the real stream, one audit micro-batch per trigger
    val mem = MemoryStream[(Long, Long)](spark)
    val st = mem.toDF().toDF("key", "ev_us")
      .withColumn("ev_ts", expr("timestamp_micros(ev_us)"))
      .withWatermark("ev_ts", s"$H seconds")
      .dropDuplicatesWithinWatermark("key")
    val query = st.writeStream.format("memory").queryName("ddweq")
      .outputMode("append").start()
    feed.groupBy(_._3 / B).toSeq.sortBy(_._1).foreach { case (_, batch) =>
      mem.addData(batch.map(t => (t._1, t._2)).toIndexedSeq)
      query.processAllAvailable()
    }
    val sink = spark.table("ddweq").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val perKey = sink.groupBy(_._1).view.mapValues(_.length).toMap
    val droppedMetric = query.recentProgress
      .groupBy(_.batchId).map(_._2.head)
      .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
    query.stop()
    // escaped keys are emitted twice — the downstream poison
    assert(perKey.values.count(_ == 2).toLong == nEsc,
      s"double-emitted ${perKey.values.count(_ == 2)} vs audit esc $nEsc")
    // total drops = late dups + late originals
    assert(droppedMetric == nLate + lateOrig,
      s"dropped $droppedMetric vs ${nLate + lateOrig}")
    // total emissions: surviving originals + escaped + solo dup rows
    assert(sink.length.toLong == (origs.length - lateOrig) + nEsc + nSolo,
      s"emitted ${sink.length}")
  }
}
