package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {

  import EventStreams._

  private def ts(minute: Int): Timestamp = new Timestamp((minute + 1) * 60L * 1000L)

  test("windowedCounts on bounded events matches manual grouping") {
    val events = graft.graph.GraphLoader.eventsTable(spark, sfDir)
    val got = windowedCounts(events, window = "1 hour")
      .groupBy("event_type").agg(sum("cnt").as("total"))
    val want = events.groupBy("event_type").agg(count(lit(1)).as("total"))
    assert(sortedRowsOf(got) == sortedRowsOf(want))
  }

  test("sessionizeBatch splits on gaps > threshold") {
    import spark.implicits._
    val events = Seq(
      Event(1, ts(0), 1L, "view", 1.0),
      Event(2, ts(10), 1L, "view", 2.0),
      Event(3, ts(120), 1L, "buy", 3.0), // 110-minute gap: new session
      Event(4, ts(5), 2L, "view", 4.0)
    ).toDF()
    val got = sessionizeBatch(events, gapMinutes = 30)
      .orderBy("user_id", "session_start").collect()
    assert(got.length == 3)
    assert(got(0).getAs[Long]("n_events") == 2 && got(0).getAs[Double]("total_value") == 3.0)
    assert(got(1).getAs[Long]("n_events") == 1 && got(1).getAs[Double]("total_value") == 3.0)
    assert(got(2).getAs[Long]("user_id") == 2L)
  }

  test("sessionizeStream emits closed sessions across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = sessionizeStream(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two events in one session, then a far-later event closes it
      input.addData(Event(1, ts(0), 1L, "view", 1.0), Event(2, ts(10), 1L, "view", 2.0))
      query.processAllAvailable()
      input.addData(Event(3, ts(120), 1L, "buy", 3.0))
      query.processAllAvailable()
      val out = spark.table("sessions").collect()
      assert(out.length == 1)
      assert(out(0).getAs[Long]("n_events") == 2)
      assert(out(0).getAs[Double]("total_value") == 3.0)
      assert(out(0).getAs[Timestamp]("session_start") == ts(0))
      assert(out(0).getAs[Timestamp]("session_end") == ts(10))
    } finally query.stop()
  }

  test("streaming file ingest + windowed aggregation end-to-end") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val events = graft.graph.GraphLoader.eventsTable(spark, sfDir).limit(100)
    events.write.mode("overwrite").parquet(s"$tmp/in")
    val stream = readEventStream(spark, s"$tmp/in", maxFilesPerTrigger = 2)
    val query = windowedCounts(stream).writeStream
      .format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination(60000)
    // append-mode windowed aggs emit only watermark-closed windows; the
    // plumbing check is that the query ran and state was maintained
    assert(spark.table("win_counts").schema.fieldNames.contains("event_type"))
  }

  test("wildcard glob resolves to the matched leaf files, not the dataset dir") {
    // the documented 10x layout: events as a DIRECTORY of part files,
    // selected by a wildcard glob; schema inference must resolve the
    // glob (a literal fs.exists check fails on wildcards and would fall
    // back to the parent dir, which here holds a second, incompatible
    // table that must NOT poison inference)
    val tmp = java.nio.file.Files.createTempDirectory("graft-glob").toString
    val events = graft.graph.GraphLoader.eventsTable(spark, sfDir).limit(50)
    events.write.mode("overwrite").parquet(s"$tmp/events_0.parquet")
    import spark.implicits._
    Seq((1L, "other")).toDF("k", "v").write.mode("overwrite")
      .parquet(s"$tmp/unrelated.parquet")
    val out = windowedCountsStreamed(spark, tmp, glob = "events_*.parquet",
      queryName = "glob_win")
    assert(out.count() > 0, "stream must read the glob-matched files")
    assert(out.schema.fieldNames.contains("event_type"))
  }

  test("sessionizeWindowStreamed equals sessionizeBatch on the full table") {
    val ev = graft.graph.GraphLoader.eventsTable(spark, sfDir)
    val batch = sessionizeBatch(ev, gapMinutes = 30)
      .select(col("user_id"),
        org.apache.spark.sql.functions.unix_micros(col("session_start")).as("session_start"),
        org.apache.spark.sql.functions.unix_micros(col("session_end")).as("session_end"),
        col("n_events"), org.apache.spark.sql.functions.round(col("total_value"), 3).as("tv"))
    val streamed = sessionizeWindowStreamed(spark, sfDir, glob = "events.parquet",
        queryName = "sess_win_spec")
      .withColumn("tv", org.apache.spark.sql.functions.round(col("total_value"), 3))
      .drop("total_value")
    assert(sortedRowsOf(streamed.select(batch.columns.map(col): _*)) == sortedRowsOf(batch))
  }

  test("streamingDedup equals batch DISTINCT and is rerun-stable") {
    val want = graft.graph.GraphLoader.eventsTable(spark, sfDir)
      .select("user_id", "event_type").distinct().count()
    // two invocations in one session: the memory sink must be replaced,
    // not appended to (Bench reruns every query in one session)
    val a = EventStreams.streamingDedup(spark, sfDir,
      queryName = "stream_dedup_spec").count()
    val b = EventStreams.streamingDedup(spark, sfDir,
      queryName = "stream_dedup_spec").count()
    assert(a == want && b == want,
      s"streamed dedup $a/$b != batch distinct $want")
  }

  test("streamingDedupTtl equals batch DISTINCT when the horizon covers the corpus") {
    val want = graft.graph.GraphLoader.eventsTable(spark, sfDir)
      .select("user_id", "event_type").distinct().count()
    val got = EventStreams.streamingDedupTtl(spark, sfDir,
      queryName = "stream_dedup_ttl_spec").count()
    assert(got == want, s"TTL dedup $got != batch distinct $want")
  }

  test("streamingFunnel equals funnelBatch on the full table") {
    val ev = graft.graph.GraphLoader.eventsTable(spark, sfDir)
    val batch = EventStreams.funnelBatch(ev, Seq("view", "click", "purchase"))
      .select(col("user_id"),
        coalesce(col("t1_us"), lit(-1L)).as("t1"),
        coalesce(col("t2_us"), lit(-1L)).as("t2"),
        coalesce(col("t3_us"), lit(-1L)).as("t3"), col("depth"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    val streamed = EventStreams.streamingFunnel(spark, sfDir,
        queryName = "stream_funnel_spec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    assert(batch.nonEmpty && streamed == batch)
  }

  test("streamingFunnel state: a late step-1 event re-qualifies earlier step-2 times") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.FunnelEv]
    val query = input.toDS().groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)(
        EventStreams.funnelUpdate)
      .writeStream.format("memory").queryName("funnel_requalify")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: click at 5, purchase at 9 — no view yet, NO emission
      input.addData(EventStreams.FunnelEv(1L, 1, 5L),
        EventStreams.FunnelEv(1L, 2, 9L))
      query.processAllAvailable()
      assert(spark.table("funnel_requalify").count() == 0)
      // batch 2: the LATE step-1 view at 0 — the chain must now pick up
      // the step-2/3 times that arrived before it: t1=0, t2=5, t3=9
      input.addData(EventStreams.FunnelEv(1L, 0, 0L))
      query.processAllAvailable()
      val rows = spark.table("funnel_requalify").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("version"),
          r.getAs[Long]("t1_us"), r.getAs[Long]("t2_us"),
          r.getAs[Long]("t3_us"), r.getAs[Long]("depth")))
      val last = rows.maxBy(_._2)
      assert(last == ((1L, 2L, 0L, 5L, 9L, 3L)),
        s"late step-1 must re-qualify buffered later steps: ${rows.toSeq}")
    } finally query.stop()
  }

  test("transitionMatrix: hand-computed adjacency counts and permilles") {
    import spark.implicits._
    def e(id: Long, u: Long, t: Int, ty: String) =
      Event(id, ts(t), u, ty, 0.0)
    // user 1: view->click->view ; user 2: view->view
    val ev = Seq(e(1, 1, 0, "view"), e(2, 1, 5, "click"), e(3, 1, 9, "view"),
      e(4, 2, 1, "view"), e(5, 2, 4, "view")).toDF()
    val got = EventStreams.transitionMatrix(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      ("view", "click", 1L, 500L), // 2 view-outgoing edges: ->click, ->view
      ("view", "view", 1L, 500L),
      ("click", "view", 1L, 1000L)))
  }

  test("streamingFunnel is rerun-stable in one session (memory sink replaced, not appended)") {
    val a = EventStreams.streamingFunnel(spark, sfDir,
      queryName = "stream_funnel_rerun").collect().map(_.toSeq).toSeq
    val b = EventStreams.streamingFunnel(spark, sfDir,
      queryName = "stream_funnel_rerun").collect().map(_.toSeq).toSeq
    assert(a.nonEmpty && a == b, "Bench reruns every query in one session")
  }

  test("streamingSourceDrift equals the batch chi-square grid") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val batch = graft.pipeline.TextOps.sourceDrift(docs).collect()
      .map(_.toSeq).toSeq
    val streamed = EventStreams.streamingSourceDrift(spark, sfDir,
        queryName = "stream_drift_spec").collect()
      .map(_.toSeq).toSeq
    assert(batch.nonEmpty && streamed == batch)
  }

  test("streamingActiveUsers equals the batch DAU/WAU rollup") {
    val ev = graft.graph.GraphLoader.eventsTable(spark, sfDir)
    val batch = graft.operators.Olap.activeUsers(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val streamed = EventStreams.streamingActiveUsers(spark, sfDir,
        queryName = "stream_active_spec").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(batch.nonEmpty && streamed == batch)
  }

  test("streamingFunnelTtl equals funnelBatch when the horizon covers the corpus") {
    val ev = graft.graph.GraphLoader.eventsTable(spark, sfDir)
    val batch = EventStreams.funnelBatch(ev, Seq("view", "click", "purchase"))
      .select(col("user_id"),
        coalesce(col("t1_us"), lit(-1L)).as("t1_us"),
        coalesce(col("t2_us"), lit(-1L)).as("t2_us"),
        coalesce(col("t3_us"), lit(-1L)).as("t3_us"),
        col("depth"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    val streamed = EventStreams.streamingFunnelTtl(spark, sfDir,
        queryName = "stream_funnel_ttl_spec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    assert(batch.nonEmpty && streamed == batch)
  }

  test("streamingFunnelTtl state: horizon evicts step times and timeout removes idle users") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val horizonDays = 30
    val input = MemoryStream[Event]
    val rows = input.toDS()
      .withWatermark("ts", s"$horizonDays days")
      .select(col("user_id"),
        when(col("event_type") === "view", 0)
          .when(col("event_type") === "click", 1)
          .when(col("event_type") === "purchase", 2).as("step"),
        unix_micros(col("ts")).as("us"), col("ts"))
      .filter(col("step").isNotNull)
      .as[EventStreams.FunnelEvT]
    val query = rows.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout)(
        EventStreams.funnelUpdateTtl(horizonDays.toLong * 86400000L))
      .writeStream.format("memory").queryName("funnel_ttl_evict")
      .outputMode(OutputMode.Append).start()
    try {
      // +1 day: an event at epoch 0 ties the INITIAL watermark (0) and
      // the engine's late filter drops ties
      def day(d: Int) = new Timestamp((d + 1).toLong * 86400L * 1000L)
      def dayUs(d: Int) = (d + 1).toLong * 86400L * 1000000L
      // batch 1: user 7 starts a chain well inside the horizon
      input.addData(Event(1, day(0), 7L, "view", 0.0),
        Event(2, day(1), 7L, "click", 0.0))
      query.processAllAvailable()
      val b1 = spark.table("funnel_ttl_evict").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("t1_us"),
          r.getAs[Long]("t2_us"), r.getAs[Long]("depth")))
      assert(b1.toSeq == Seq((7L, dayUs(0), dayUs(1), 2L)),
        s"in-horizon chain must be exact: ${b1.toSeq}")
      // batch 2 advances the watermark far past user 7's chain
      input.addData(Event(3, day(100), 8L, "view", 0.0))
      query.processAllAvailable()
      // batch 3: user 7's timeout (day 31) is below the watermark
      // (day 70) -> their state row is REMOVED this trigger
      input.addData(Event(4, day(101), 8L, "view", 0.0))
      query.processAllAvailable()
      val state = query.lastProgress.stateOperators
      assert(state.nonEmpty && state.head.numRowsTotal == 1,
        s"idle user's state must evict: ${state.map(_.numRowsTotal).toSeq}")
      // batch 4: user 7 returns -> the chain RESTARTS from the retained
      // horizon (old view/click gone), and the watermark-seeded version
      // outranks the original rows in the drain
      input.addData(Event(5, day(102), 7L, "view", 0.0))
      query.processAllAvailable()
      val rows7 = spark.table("funnel_ttl_evict").collect()
        .filter(_.getAs[Long]("user_id") == 7L)
        .map(r => (r.getAs[Long]("version"), r.getAs[Long]("t1_us"),
          r.getAs[Long]("t2_us"), r.getAs[Long]("depth")))
      val last7 = rows7.maxBy(_._1)
      assert((last7._2, last7._3, last7._4) == ((dayUs(102), -1L, 1L)),
        s"returning user must restart from the horizon: ${rows7.toSeq}")
      // and the watermark-seeded version outranks the original rows
      assert(rows7.count(_._1 == last7._1) == 1,
        s"latest version must be unique per user: ${rows7.toSeq}")
    } finally query.stop()
  }

  test("streamingActiveUsers with a horizon equals the batch rollup on the gate corpus") {
    val ev = graft.graph.GraphLoader.eventsTable(spark, sfDir)
    val batch = graft.operators.Olap.activeUsers(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val streamed = EventStreams.streamingActiveUsers(spark, sfDir,
        horizon = Some("365 days"), queryName = "stream_active_ttl_spec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(batch.nonEmpty && streamed == batch)
  }

  test("streamingActiveUsers horizon: pair state evicts and the drain dedups re-emissions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val pairs = input.toDS()
      .withWatermark("ts", "30 days")
      .select(datediff(to_date(col("ts")), lit("2024-01-01"))
          .cast("long").as("uday"),
        col("user_id"), col("ts"))
      .dropDuplicatesWithinWatermark("uday", "user_id")
      .select(col("uday"), col("user_id"))
    val query = pairs.writeStream.format("memory")
      .queryName("active_ttl_evict").outputMode(OutputMode.Append).start()
    try {
      def onDay(d: Int) = new Timestamp(
        Timestamp.valueOf("2024-01-01 00:00:00").getTime + d.toLong * 86400000L)
      // batch 1: user 7 active on day 0, with an in-horizon duplicate
      input.addData(Event(1, onDay(0), 7L, "view", 0.0),
        Event(2, onDay(0), 7L, "click", 0.0))
      query.processAllAvailable()
      assert(spark.table("active_ttl_evict").count() == 1)
      // batch 2 advances the watermark past day 0's horizon
      input.addData(Event(3, onDay(100), 8L, "view", 0.0))
      query.processAllAvailable()
      // batch 3: the SAME (day 0, user 7) pair recurs as late data long
      // after eviction — if the engine admits it, it re-emits (the TTL
      // trade); either way the DEDUPED drain (what
      // streamingActiveUsers feeds the rollup) holds exactly one copy
      input.addData(Event(4, onDay(0), 7L, "purchase", 0.0))
      query.processAllAvailable()
      val drained = spark.table("active_ttl_evict")
      val deduped = drained.distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(deduped == Seq((0L, 7L), (100L, 8L)),
        s"deduped drain must hold one copy per pair: $deduped")
      // bounded state: the evicted day-0 pair no longer holds a row
      val state = query.lastProgress.stateOperators
      assert(state.nonEmpty && state.head.numRowsTotal <= 2,
        s"state not bounded: ${state.map(_.numRowsTotal).toSeq}")
    } finally query.stop()
  }

  test("sessionPaths: triples count inside a session, never across the gap") {
    import spark.implicits._
    def e(id: Long, u: Long, minute: Int, ty: String) =
      Event(id, ts(minute), u, ty, 0.0)
    // user 1: A,B,C close together; 40-min gap; D,E,F close together.
    // In-session triples: A>B>C and D>E>F. B>C>D and C>D>E span the gap.
    // user 2 repeats A,B,C so that triple clears minCount = 2.
    val ev = Seq(
      e(1, 1, 0, "A"), e(2, 1, 5, "B"), e(3, 1, 9, "C"),
      e(4, 1, 49, "D"), e(5, 1, 52, "E"), e(6, 1, 55, "F"),
      e(7, 2, 0, "A"), e(8, 2, 3, "B"), e(9, 2, 7, "C")).toDF()
    val got = EventStreams.sessionPaths(ev, gapMinutes = 30, minCount = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("A>B>C" -> 2L, "D>E>F" -> 1L), s"got $got")
    val thresholded = EventStreams.sessionPaths(ev, gapMinutes = 30,
      minCount = 2L).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(thresholded == Map("A>B>C" -> 2L))
  }

  test("dropDuplicatesWithinWatermark EVICTS key state past the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val deduped = input.toDS().toDF()
      .withWatermark("ts", "30 days")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select("user_id", "event_type", "ts")
    val query = deduped.writeStream.format("memory")
      .queryName("ttl_evict_spec").outputMode(OutputMode.Append).start()
    try {
      def day(d: Int) = new Timestamp(d.toLong * 86400L * 1000L)
      // batch 1: a key plus an in-horizon duplicate -> ONE emission
      input.addData(Event(1, day(0), 7L, "view", 0.0),
        Event(2, day(1), 7L, "view", 0.0))
      query.processAllAvailable()
      val afterB1 = spark.table("ttl_evict_spec").count()
      assert(afterB1 == 1, s"in-horizon duplicate not suppressed: $afterB1")
      // batch 2 advances the watermark far past the key's horizon
      // (its own emission also proves unrelated keys pass through)
      input.addData(Event(3, day(100), 8L, "view", 0.0))
      query.processAllAvailable()
      // batch 3: the ORIGINAL key recurs long after eviction -> state
      // is gone, so it is emitted AGAIN (the TTL trade, by design)
      input.addData(Event(4, day(200), 7L, "view", 0.0))
      query.processAllAvailable()
      val rows = spark.table("ttl_evict_spec").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
      assert(rows.count(_ == (7L, "view")) == 2,
        s"evicted key must re-emit on recurrence, got ${rows.toSeq}")
      // bounded state: live rows never exceed the non-evicted keys
      val state = query.lastProgress.stateOperators
      assert(state.nonEmpty && state.head.numRowsTotal <= 2,
        s"state not bounded: ${state.map(_.numRowsTotal).toSeq}")
    } finally query.stop()
  }

  test("nearDupCandidateStream emits each candidate pair exactly once, incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.BandRow]
    val query = EventStreams.nearDupCandidateStream(input.toDS())
      .writeStream.format("memory").queryName("neardup_cands")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: docs 3 and 1 collide in bucket (0, 77)
      input.addData(EventStreams.BandRow(3L, 0, 77L),
        EventStreams.BandRow(1L, 0, 77L), EventStreams.BandRow(9L, 1, 5L))
      query.processAllAvailable()
      val b1 = spark.table("neardup_cands").as[EventStreams.CandPair]
        .collect().toSet
      assert(b1 == Set(EventStreams.CandPair(1L, 3L)))
      // batch 2: doc 2 joins the bucket → only the NEW pairs appear;
      // a re-arrival of doc 1 emits nothing
      input.addData(EventStreams.BandRow(2L, 0, 77L),
        EventStreams.BandRow(1L, 0, 77L))
      query.processAllAvailable()
      val all = spark.table("neardup_cands").as[EventStreams.CandPair]
        .collect()
      assert(all.length == 3, s"expected 3 total pairs, got ${all.toSeq}")
      assert(all.toSet == Set(EventStreams.CandPair(1L, 3L),
        EventStreams.CandPair(1L, 2L), EventStreams.CandPair(2L, 3L)))
    } finally query.stop()
  }

  test("topKApproxSummaries: state stays <= capacity as keys grow; heavy key survives exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.HHRow]
    val query = EventStreams.topKApproxSummaries(input.toDS(),
        buckets = 1, capacity = 8)
      .writeStream.format("memory").queryName("hh_approx_spec")
      .outputMode(OutputMode.Append).start()
    try {
      // heavy key 7 arrives 50x up front, then 10x capacity distinct
      // one-off keys try to flush it
      input.addData((1 to 50).map(_ => EventStreams.HHRow("g", 7L)): _*)
      query.processAllAvailable()
      input.addData((100L to 179L).map(k => EventStreams.HHRow("g", k)): _*)
      query.processAllAvailable()
      val drained = spark.table("hh_approx_spec").as[EventStreams.HHState]
        .collect()
      val last = drained.map(_.version).max
      val state = drained.filter(_.version == last)
      // bounded state: 80 distinct keys entered, summary holds 8
      assert(state.length == 8, s"state rows ${state.length}")
      // the heavy hitter survives with its exact count (space-saving
      // guarantees any key with true count > N/capacity survives; 7's
      // entry was never the minimum so never inherited)
      val heavy = state.find(_.key == 7L)
      assert(heavy.isDefined && heavy.get.cnt == 50L, s"heavy: $heavy")
      // space-saving invariant: every kept count <= true total
      assert(state.map(_.cnt).sum <= 130L)
      // version is the monotone total
      assert(last == 130L)
    } finally query.stop()
  }

  test("streamingBloomRotated: per-window bit sets equal per-day batch filters") {
    val got = EventStreams.streamingBloomRotated(spark, sfDir,
      queryName = "stream_bloom_rotate_spec").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_bits")).toMap
    val ev = graft.graph.GraphLoader.eventsTable(spark, sfDir)
      .withColumn("day", date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"))
    val want = ev
      .select(col("day"), explode(graft.pipeline.Sketches.bloomPositions(
        col("user_id"), 4096L, 5)).as("pos"))
      .distinct().groupBy("day").agg(count(lit(1)).as("n_bits"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_bits")).toMap
    assert(got == want && got.nonEmpty)
    // every per-window filter is bounded by m
    assert(got.values.forall(_ <= 4096L))
  }

  test("streamingPrioritySample equals the batch sampler bit-for-bit") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-wsample").toString
    val docs = (1 to 300).map(i =>
      (i.toLong, s"text $i", "en", "s", (i * 37 % 211 + 1).toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val streamed = EventStreams.streamingPrioritySample(spark, tmp,
      k = 20, queryName = "stream_wsample_spec").collect().map(_.toSeq).toSeq
    val batch = graft.pipeline.TextOps.prioritySample(docs, k = 20)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    assert(streamed.length == 20)
  }

  test("streamingNearDup flags planted near-duplicates against the earlier doc") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"tok$i").mkString(" ") + " changed tail"
    val tmp = java.nio.file.Files.createTempDirectory("graft-neardup").toString
    Seq(
      (10L, base, "en", "s", base.length.toLong),
      (20L, nearDup, "en", "s", nearDup.length.toLong),   // ~0.9 Jaccard vs 10
      (30L, base, "en", "s", base.length.toLong),         // exact dup of 10
      (40L, "completely different words entirely here now", "en", "s", 44L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = EventStreams.streamingNearDup(spark, tmp,
      queryName = "stream_neardup_spec").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(out(10L) == ((false, -1L)), "earliest doc is never the duplicate")
    assert(out(20L) == ((true, 10L)))
    assert(out(30L) == ((true, 10L)))
    assert(out(40L) == ((false, -1L)))
    // rerun-stable in one session (Bench reruns every query)
    val again = EventStreams.streamingNearDup(spark, tmp,
      queryName = "stream_neardup_spec").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(again == out)
  }

  test("edgeAppendRun replays the full input on every invocation") {
    // append mode + a surviving checkpoint would skip the input on rerun;
    // the wrapper wipes both dirs so each call yields the complete frame
    val tmp = java.nio.file.Files.createTempDirectory("graft-earun").toString
    val a = EventStreams.edgeAppendRun(spark, sfDir,
      s"$tmp/edges", s"$tmp/ckpt").count()
    val b = EventStreams.edgeAppendRun(spark, sfDir,
      s"$tmp/edges", s"$tmp/ckpt").count()
    val want = graft.graph.GraphLoader.eventsTable(spark, sfDir).count()
    assert(a == want && b == want, "reruns must not skip or double-append")
  }

  test("streamingSplit equals the batch hashSplit assignment exactly") {
    val streamed = EventStreams.streamingSplit(spark, sfDir,
        queryName = "spec_stream_split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = graft.graph.GraphLoader.table(spark, sfDir, "documents")
    val batch = graft.pipeline.TextOps.hashSplit(docs, 80, 100)
      .select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed == batch)
    assert(streamed.values.toSet == Set("train", "val", "test"))
  }

  test("enrichStreamed equals the batch broadcast join") {
    import org.apache.spark.sql.functions._
    val cust = graft.graph.GraphLoader.table(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("segment"))
    val streamed = EventStreams.enrichStreamed(spark, sfDir, cust, "c_custkey",
        queryName = "spec_stream_enrich")
      .select("event_id", "user_id", "segment")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val batch = graft.graph.GraphLoader.eventsTable(spark, sfDir)
      .join(cust, col("user_id") === col("c_custkey"))
      .select("event_id", "user_id", "segment")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streamingEdgeAppend writes TRIGGERED edges a graph can load") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-edges").toString
    val events = graft.graph.GraphLoader.eventsTable(spark, sfDir).limit(50)
    events.write.mode("overwrite").parquet(s"$tmp/in")
    val stream = readEventStream(spark, s"$tmp/in", maxFilesPerTrigger = 1)
    val query = EventStreams.streamingEdgeAppend(stream, s"$tmp/edges", s"$tmp/ckpt")
    query.awaitTermination(60000)
    val edges = spark.read.parquet(s"$tmp/edges")
    assert(edges.count() == 50)
    assert(edges.columns.toSet ==
      Set("_src", "_dst", "ts", "event_type", "_eid"))
  }

  test("intervalJoinStreamed equals the batch interval join") {
    import org.apache.spark.sql.functions._
    val ev = graft.graph.GraphLoader.eventsTable(spark, sfDir)
    val batch = ev.filter(col("event_type") =!= "error").as("e")
      .join(ev.filter(col("event_type") === "error").as("x"),
        col("x.user_id") === col("e.user_id") &&
          col("x.ts") <= col("e.ts") &&
          col("x.ts") >= col("e.ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("e.event_id"), unix_micros(col("x.ts")).as("err_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val streamed = EventStreams
      .intervalJoinStreamed(spark, sfDir, queryName = "tt_interval_join")
      .select(col("event_id"), col("err_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(batch.nonEmpty && streamed == batch)
  }

  test("funnel: strict-after chaining, out-of-order steps don't count") {
    import spark.implicits._
    val events = Seq(
      // user 1 completes the funnel in order
      Event(1, ts(0), 1L, "view", 0.0), Event(2, ts(5), 1L, "click", 0.0),
      Event(3, ts(9), 1L, "purchase", 0.0),
      // user 2: click BEFORE the first view — doesn't count; depth 1
      Event(4, ts(3), 2L, "click", 0.0), Event(5, ts(7), 2L, "view", 0.0),
      // user 3: view+click but purchase precedes the click — depth 2
      Event(6, ts(0), 3L, "view", 0.0), Event(7, ts(1), 3L, "purchase", 0.0),
      Event(8, ts(2), 3L, "click", 0.0),
      // user 4: never views — not in the funnel at all
      Event(9, ts(0), 4L, "purchase", 0.0)
    ).toDF()
    val out = EventStreams.funnelBatch(events, Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("depth")).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 2L))
  }

  test("streaming quantile histogram equals the batch sketch; state <= 64/group") {
    val streamed = EventStreams.streamingQuantileHist(
      spark, sfDir, queryName = "tt_qsketch")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val base = graft.graph.GraphLoader.eventsTable(spark, sfDir)
      .select(col("event_type").cast("string").as("grp"),
        floor(col("value")).cast("long").as("v"))
    val batch = graft.pipeline.Sketches.qhistSketch(base, "v", "grp")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(streamed.nonEmpty && streamed == batch)
    assert(streamed.keys.groupBy(_._1).forall(_._2.size <= 64))
  }

  test("streaming HLL register state equals the batch sketch bit-for-bit") {
    val streamed = EventStreams.streamingHll(spark, sfDir, queryName = "tt_hll")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val batch = graft.pipeline.Sketches.hllRegisters(
      graft.graph.GraphLoader.eventsTable(spark, sfDir), "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(streamed.nonEmpty && streamed == batch)
    // bounded state: at most m rows per group
    assert(streamed.keys.groupBy(_._1).forall(_._2.size <= 256))
  }

  test("streaming top-k: counts accumulate across micro-batches, slice ranks the state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = input.toDS().toDF()
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .writeStream.format("memory").queryName("tt_topk")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(
        Event(1, ts(0), 1L, "view", 0.0), Event(2, ts(1), 1L, "view", 0.0),
        Event(3, ts(2), 2L, "view", 0.0))
      query.processAllAvailable()
      // second batch: user 2 overtakes user 1
      input.addData(
        Event(4, ts(3), 2L, "view", 0.0), Event(5, ts(4), 2L, "view", 0.0),
        Event(6, ts(5), 3L, "view", 0.0))
      query.processAllAvailable()
      val out = EventStreams.topKSlice(spark.table("tt_topk"), 2).collect()
      assert(out.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("cnt"),
        r.getAs[Long]("rank"))).toSeq == Seq((2L, 3L, 1L), (1L, 2L, 2L)))
    } finally query.stop()
  }

  test("streaming CMS counter table equals the batch sketch cell-for-cell") {
    val streamed = EventStreams.streamingCms(spark, sfDir, queryName = "tt_cms")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = graft.pipeline.Sketches.cmsSketch(
      graft.graph.GraphLoader.table(spark, sfDir, "events"), "user_id")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed.nonEmpty && streamed == batch)
    assert(streamed.size <= 4 * 256)
  }

  test("streaming retention equals the batch cohort matrix") {
    val streamed = EventStreams.streamingRetention(spark, sfDir,
      queryName = "tt_retention").collect().map(_.toSeq).toSeq
    val batch = graft.operators.Olap.retention(
      graft.graph.GraphLoader.eventsTable(spark, sfDir), "purchase")
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming anomaly stats equal the batch pass (exact decimal sums)") {
    val streamed = EventStreams.streamingAnomaly(spark, sfDir,
      queryName = "tt_anomaly").collect().map(_.toSeq).toSeq
    val batch = graft.operators.Olap.anomaly(
      graft.graph.GraphLoader.eventsTable(spark, sfDir))
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming Bloom bit set equals the batch filter bit-for-bit") {
    val m = 4096L
    val streamed = EventStreams.streamingBloomBits(spark, sfDir, m = m,
      queryName = "tt_bloom")
      .collect().map(_.getLong(0)).toSet
    val batch = graft.pipeline.Sketches.bloomBits(
      graft.graph.GraphLoader.table(spark, sfDir, "events"), "user_id", m)
      .collect().map(_.getLong(0)).toSet
    assert(streamed.nonEmpty && streamed == batch)
    // state boundedness: the bit set never exceeds m rows
    assert(streamed.size <= m)
  }

  test("funnel rates surface: step counts monotone, step 1 is its own baseline") {
    val ev = graft.graph.GraphLoader.eventsTable(spark, sfDir)
    val f = EventStreams.funnelBatch(ev, Seq("view", "click", "purchase"))
    val n1 = f.filter(col("t1_us").isNotNull).count()
    val n2 = f.filter(col("t2_us").isNotNull).count()
    val n3 = f.filter(col("t3_us").isNotNull).count()
    assert(n1 >= n2 && n2 >= n3 && n1 > 0)
    // the permille identities the q_funnel_rates gate publishes
    assert(1000L * n1 / n1 == 1000L)
    assert(1000L * n3 / n2 <= 1000L)
  }
}
