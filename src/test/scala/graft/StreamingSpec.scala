package graft

import graft.streaming.{RawEvent, StreamingOps, TrendOut, WindowCount}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming-semantics coverage via MemoryStream (SURVEY §5): the same
  * transforms must produce the batch-replay results when run as a
  * streaming query, and the keyed state machine must fire the doubling
  * alert exactly per the reference condition. */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("eventCounts over MemoryStream equals the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "event_type")
    val q = StreamingOps.eventCounts(events)
      .writeStream.format("memory").queryName("ec_test")
      .outputMode("complete").start()
    try {
      val rows = Seq(
        (ts("2024-01-01 00:05:00"), "click"),
        (ts("2024-01-01 00:55:00"), "view"),
        (ts("2024-01-01 01:05:00"), "click"),
        (ts("2024-01-01 01:06:00"), "error"))
      input.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("ec_test")
        .select("window_start", "cnt").as[(Timestamp, Long)].collect().toMap
      assert(got == Map(
        ts("2024-01-01 00:00:00") -> 2L,
        ts("2024-01-01 01:00:00") -> 2L))
      val batch = StreamingOps.eventCounts(
        rows.toDF("ts", "event_type"))
        .select("window_start", "cnt").as[(Timestamp, Long)].collect().toMap
      assert(got == batch)
    } finally q.stop()
  }

  test("slidingCounts over MemoryStream equals batch; 2 windows per event") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "event_type")
    val q = StreamingOps.slidingCounts(events)
      .writeStream.format("memory").queryName("slide_test")
      .outputMode("complete").start()
    try {
      val rows = Seq(
        (ts("2024-01-01 00:05:00"), "click"), // windows 23:30, 00:00
        (ts("2024-01-01 00:40:00"), "view"),  // windows 00:00, 00:30
        (ts("2024-01-01 01:05:00"), "click")) // windows 00:30, 01:00
      input.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("slide_test")
        .select("window_start", "cnt").as[(Timestamp, Long)].collect().toMap
      assert(got == Map(
        ts("2023-12-31 23:30:00") -> 1L,
        ts("2024-01-01 00:00:00") -> 2L,
        ts("2024-01-01 00:30:00") -> 2L,
        ts("2024-01-01 01:00:00") -> 1L))
      // Overlap accounting: each event is in exactly dur/slide = 2
      // windows, so the counts total twice the events.
      assert(got.values.sum == 2L * rows.size)
      val batch = StreamingOps.slidingCounts(rows.toDF("ts", "event_type"))
        .select("window_start", "cnt").as[(Timestamp, Long)].collect().toMap
      assert(got == batch)
    } finally q.stop()
  }

  test("regionEventCounts streaming equals batch on fixture-shaped data") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val q = StreamingOps.regionEventCounts(input.toDF().toDF("ts", "event_type"))
      .writeStream.format("memory").queryName("rec_test")
      .outputMode("complete").start()
    try {
      input.addData(
        (ts("2024-01-01 00:01:00"), "click"),
        (ts("2024-01-01 00:02:00"), "view"),
        (ts("2024-01-01 00:03:00"), "purchase"),
        (ts("2024-01-01 00:04:00"), "error"))
      q.processAllAvailable()
      val got = spark.table("rec_test")
        .select("region", "cnt").as[(String, Long)].collect().toMap
      assert(got == Map("web" -> 2L, "txn" -> 1L, "ops" -> 1L))
    } finally q.stop()
  }

  test("streamingDedup keeps the first event per key and matches firstTouch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val events = input.toDF().toDF("ts", "user_id", "event_type")
    val q = StreamingOps.streamingDedup(events)
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      // In event-time arrival order: the duplicate (7, click) pairs and
      // the (9, view) pair must collapse to their first occurrence.
      val rows = Seq(
        (ts("2024-01-01 00:01:00"), 7L, "click"),
        (ts("2024-01-01 00:02:00"), 9L, "view"),
        (ts("2024-01-01 00:05:00"), 7L, "click"),
        (ts("2024-01-01 00:06:00"), 9L, "view"),
        (ts("2024-01-01 00:07:00"), 7L, "view"),
        (ts("2024-01-01 00:09:00"), 7L, "click"))
      input.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("dedup_test")
        .select("user_id", "event_type", "ts")
        .as[(Long, String, Timestamp)].collect().toSet
      val batch = StreamingOps.firstTouch(rows.toDF("ts", "user_id", "event_type"))
        .select(col("user_id"), col("event_type"), col("first_ts"))
        .as[(Long, String, Timestamp)].collect().toSet
      assert(got == batch)
      assert(got.size == 3) // (7,click), (9,view), (7,view)
      // duplicate counts come from the batch form
      val dups = StreamingOps.firstTouch(rows.toDF("ts", "user_id", "event_type"))
        .select(col("user_id"), col("event_type"), col("n_dups"))
        .as[(Long, String, Long)].collect()
        .map { case (u, e, n) => (u, e) -> n }.toMap
      assert(dups((7L, "click")) == 3L && dups((9L, "view")) == 2L)
    } finally q.stop()
  }

  test("trending state machine fires the doubling alert per the reference rule") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[WindowCount]
    val q = StreamingOps.trendingStateMachine(input.toDS())
      .writeStream.format("memory").queryName("trend_test")
      .outputMode("update").start()
    try {
      // One window per trigger, in order — the reference's batch cadence.
      input.addData(WindowCount("click", ts("2024-01-01 00:00:00"), 4))
      q.processAllAvailable()
      input.addData(WindowCount("click", ts("2024-01-01 00:10:00"), 10))
      q.processAllAvailable()
      input.addData(WindowCount("click", ts("2024-01-01 00:20:00"), 25))
      q.processAllAvailable()
      input.addData(WindowCount("click", ts("2024-01-01 00:30:00"), 12))
      q.processAllAvailable()
      val got = spark.table("trend_test").as[TrendOut].collect()
        .sortBy(_.window_start.getTime)
      assert(got.map(_.cnt).toSeq == Seq(4L, 10L, 25L, 12L))
      assert(got.map(_.prev_cnt).toSeq == Seq(0L, 4L, 10L, 25L))
      // 4: below min; 10: ≥10 and ≥2·4 ✓; 25: ≥2·10 ✓; 12: < 2·25.
      assert(got.map(_.is_alert).toSeq == Seq(false, true, true, false))
    } finally q.stop()
  }

  test("state-machine form agrees with the lag form on fixture data (batch)") {
    val counts = StreamingOps.trendingCounts(Tables.events(spark, sfDir))
      .as[WindowCount]
    val viaState = StreamingOps.trendingStateMachine(counts)
      .select("event_type", "window_start", "cnt", "prev_cnt", "is_alert")
    val viaLag = StreamingOps.trendingLag(counts.toDF())
      .select("event_type", "window_start", "cnt", "prev_cnt", "is_alert")
    assert(viaState.exceptAll(viaLag).isEmpty && viaLag.exceptAll(viaState).isEmpty)
  }

  test("stream_trending_live: live engine equals the batch lag replay") {
    // The gate checks this against DuckDB; this pin keeps the
    // equivalence inside `sbt test` too, with the engine really paced
    // (the staging test below proves the batch boundaries existed).
    val live = StreamingOps.streamTrendingLive(spark, sfDir)
      .select("event_type", "window_start", "cnt", "prev_cnt", "is_alert")
    val replay = StreamingOps.trendingArrivals(spark, sfDir)
      .select("event_type", "window_start", "cnt", "prev_cnt", "is_alert")
    assert(live.exceptAll(replay).isEmpty && replay.exceptAll(live).isEmpty)
  }

  test("trending staging: raw ts-range slices, increasing mtimes, punctuation last") {
    // The live query's oracle-equality rests on this layout: slices
    // partition the RAW events BY ts RANGE (so every key's events
    // arrive in ts order across batches and a closed window can never
    // receive another event) under strictly increasing mtimes (so the
    // file source lists them in slice order), with the punctuation
    // flush file last. A staging regression must fail here with a
    // named cause.
    val dir = StreamingOps.stagedTrendingDir(spark, sfDir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length == StreamingOps.TREND_BATCHES + 1)
    assert(files.map(_.lastModified).sliding(2).forall { case Array(a, b) => a < b })
    // Range property over the data slices: slice k's max ts < slice
    // k+1's min ts.
    val spans = files.dropRight(1).map { f =>
      spark.read.parquet(f.getPath)
        .agg(min(col("ts")), max(col("ts")))
        .as[(Timestamp, Timestamp)].head()
    }
    spans.sliding(2).foreach { case Array((_, hiA), (loB, _)) =>
      assert(!hiA.after(loB), s"slices out of order: $hiA !<= $loB")
    }
    val staged = files.dropRight(1)
      .map(f => spark.read.parquet(f.getPath).count()).sum
    assert(staged == Tables.events(spark, sfDir).count())
    // The flush file: exactly one punctuation row per key, ts strictly
    // past every real event of that key.
    val flush = spark.read.parquet(files.last.getPath)
    assert(flush.filter(col("event_id") =!= -1L).count() == 0)
    val keys = Tables.events(spark, sfDir)
      .select(col("event_type")).distinct().count()
    assert(flush.count() == keys)
    // Ordering is PER KEY (grouped state): each key's punctuation must
    // land strictly after that key's last real event.
    val perKeyMax = Tables.events(spark, sfDir)
      .groupBy(col("event_type")).agg(max(col("ts")).as("mx"))
    val early = flush.join(perKeyMax, "event_type")
      .filter(col("ts") <= col("mx")).count()
    assert(early == 0, s"$early punctuation rows not after their key's last event")
  }

  test("raw trending machine: window straddling a batch boundary accumulates in state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RawEvent]
    val q = StreamingOps.trendingRawStateMachine(input.toDS())
      .writeStream.format("memory").queryName("trend_raw_test")
      .outputMode("update").start()
    def ev(id: Long, t: String) = RawEvent(id, "click", ts(t))
    try {
      // Batch 1: 4 events in window 00:00, 6 in 00:10 — 00:00 closes
      // (cnt 4), 00:10 stays OPEN in state.
      input.addData(ev(1, "2024-01-01 00:01:00"), ev(2, "2024-01-01 00:02:00"),
        ev(3, "2024-01-01 00:03:00"), ev(4, "2024-01-01 00:09:59"),
        ev(5, "2024-01-01 00:10:00"), ev(6, "2024-01-01 00:11:00"),
        ev(7, "2024-01-01 00:12:00"), ev(8, "2024-01-01 00:13:00"),
        ev(9, "2024-01-01 00:14:00"), ev(10, "2024-01-01 00:15:00"))
      q.processAllAvailable()
      // Batch 2: 4 MORE events in 00:10 (the straddle), then 00:20
      // opens — 00:10 must close with the CROSS-BATCH total 10.
      input.addData(ev(11, "2024-01-01 00:16:00"), ev(12, "2024-01-01 00:17:00"),
        ev(13, "2024-01-01 00:18:00"), ev(14, "2024-01-01 00:19:00"),
        ev(15, "2024-01-01 00:20:00"))
      q.processAllAvailable()
      // Batch 3: punctuation closes the final window (cnt 1).
      input.addData(RawEvent(-1L, "click", ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      val got = spark.table("trend_raw_test").as[TrendOut].collect()
        .sortBy(_.window_start.getTime)
      assert(got.map(_.cnt).toSeq == Seq(4L, 10L, 1L))
      assert(got.map(_.prev_cnt).toSeq == Seq(0L, 4L, 10L))
      // 4: below min; 10: ≥10 and ≥2·4 ✓; 1: below min.
      assert(got.map(_.is_alert).toSeq == Seq(false, true, false))
    } finally q.stop()
  }

  test("userSessions: session windows merge and close across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val q = StreamingOps.userSessions(
      input.toDF().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("complete").start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:00"), 1L),
        (ts("2024-01-01 00:10:00"), 1L), // same session (gap 10 < 30 min)
        (ts("2024-01-01 02:00:00"), 1L), // new session
        (ts("2024-01-01 00:05:00"), 2L))
      q.processAllAvailable()
      val got = spark.table("sess_test")
        .select("user_id", "session_start", "n_events")
        .as[(Long, Timestamp, Long)].collect().sortBy(r => (r._1, r._2.getTime))
      assert(got.toSeq == Seq(
        (1L, ts("2024-01-01 00:00:00"), 2L),
        (1L, ts("2024-01-01 02:00:00"), 1L),
        (2L, ts("2024-01-01 00:05:00"), 1L)))
    } finally q.stop()
  }

  test("append-mode sessions: watermark evicts closed sessions mid-stream, open ones never emit") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val q = StreamingOps.userSessions(input.toDF().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("sess_evict_test")
      .outputMode("append").start()
    try {
      def emitted(): Seq[(Long, Timestamp, Long)] =
        spark.table("sess_evict_test")
          .select("user_id", "session_start", "n_events")
          .as[(Long, Timestamp, Long)].collect().toSeq
          .sortBy(r => (r._1, r._2.getTime))
      // One session (00:00–00:40 with the 30-min gap), not yet sealed.
      input.addData((ts("2024-01-01 00:00:00"), 1L),
        (ts("2024-01-01 00:10:00"), 1L))
      q.processAllAvailable()
      assert(emitted().isEmpty, "session emitted before the watermark passed it")
      // Watermark advances to 03:00 (2-hour delay) — PAST the first
      // session's end: it must be evicted and emitted NOW, mid-stream,
      // not at end-of-stream.
      input.addData((ts("2024-01-01 05:00:00"), 1L))
      q.processAllAvailable()
      assert(emitted() == Seq((1L, ts("2024-01-01 00:00:00"), 2L)),
        "closed session not evicted when the watermark passed it")
      // The 05:00 session grows by a cross-batch merge (05:10 is within
      // the 30-min gap) while it sits in state...
      input.addData((ts("2024-01-01 05:10:00"), 1L))
      q.processAllAvailable()
      // ...and seals once the watermark passes 05:40. The 10:00 event's
      // own session stays open behind the terminal watermark (08:00)
      // and must never be emitted.
      input.addData((ts("2024-01-01 10:00:00"), 1L))
      q.processAllAvailable()
      assert(emitted() == Seq(
        (1L, ts("2024-01-01 00:00:00"), 2L),
        (1L, ts("2024-01-01 05:00:00"), 2L)),
        "merged session mis-sealed, or an open session leaked out")
    } finally q.stop()
  }

  test("watermark evicts state in append mode (late row dropped)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val q = StreamingOps.eventCounts(input.toDF().toDF("ts", "event_type"))
      .writeStream.format("memory").queryName("wm_test")
      .outputMode("append").start()
    try {
      input.addData((ts("2024-01-01 00:30:00"), "click"))
      q.processAllAvailable()
      // Advance watermark far past the first window...
      input.addData((ts("2024-01-01 12:00:00"), "click"))
      q.processAllAvailable()
      // ...then a very late event for the closed window: must be dropped.
      input.addData((ts("2024-01-01 00:31:00"), "click"))
      q.processAllAvailable()
      input.addData((ts("2024-01-02 00:00:00"), "click"))
      q.processAllAvailable()
      val got = spark.table("wm_test")
        .select("window_start", "cnt").as[(Timestamp, Long)].collect().toMap
      assert(got(ts("2024-01-01 00:00:00")) == 1L) // late +1 not applied
    } finally q.stop()
  }
}
