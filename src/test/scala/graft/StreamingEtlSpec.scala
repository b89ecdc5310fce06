package graft

import org.apache.spark.sql.functions._

import graft.etl.LogParser
import graft.operators.Multimodal
import graft.sources.Sources
import graft.streaming.EventStream

class StreamingEtlSpec extends SparkSpec {
  import spark.implicits._

  // -- log parsing (T4) ------------------------------------------------
  private val logLines = Seq(
    """alpha.host.de - - [01/Jul/1995:00:00:01 -0400] "GET /a.html HTTP/1.0" 200 6245""",
    """alpha.host.de - - [01/Jul/1995:13:10:01 -0400] "GET /b.gif HTTP/1.0" 200 3985""",
    """beta.uni.ca - - [02/Jul/1995:23:59:59 -0400] "POST /x HTTP/1.0" 404 100""",
    """gamma.net.sg - - [03/Jul/1995:07:30:00 -0400] "GET / HTTP/1.0" 200 7074""")

  test("NASA log parser extracts all CLF fields") {
    val parsed = LogParser.parseNasaLog(logLines.toDF("value"))
    val r = parsed.orderBy("host", "timestamp").head()
    assert(r.getAs[String]("host") == "alpha.host.de")
    assert(r.getAs[String]("timestamp") == "01/Jul/1995:00:00:01 -0400")
    assert(r.getAs[String]("request") == "GET /a.html HTTP/1.0")
    assert(r.getAs[Int]("HTTP_reply_code") == 200)
    assert(r.getAs[Int]("bytes_in_reply") == 6245)
    assert(r.getAs[Int]("day") == 1 && r.getAs[Int]("hour") == 0)
  }

  test("topHostsAllSuffixes ranks within each country in one pass") {
    val parsed = LogParser.parseNasaLog(logLines.toDF("value"))
    val top = LogParser.topHostsAllSuffixes(parsed, Seq(".de", ".ca", ".sg"), 9)
    val byCountry = top.select("country", "host", "count")
      .as[(String, String, Long)].collect().groupBy(_._1)
    assert(byCountry("de").head == (("de", "alpha.host.de", 2L)))
    assert(byCountry.keySet == Set("de", "ca", "sg"))
  }

  test("malformed CLF fields parse to null under ANSI (try_cast), not a crash") {
    val withJunk = logLines :+
      """dash.host.de - - [04/Jul/1995:08:00:00 -0400] "GET /d HTTP/1.0" 200 -""" :+
      """garbage line with no structure at all"""
    val parsed = LogParser.parseNasaLog(withJunk.toDF("value"))
    assert(parsed.count() == 6) // nothing thrown, every line emitted
    val dash = parsed.filter(col("host") === "dash.host.de").head()
    assert(dash.isNullAt(dash.fieldIndex("bytes_in_reply"))) // '-' → null
    assert(dash.getAs[Int]("HTTP_reply_code") == 200)
    val junk = parsed.filter(col("timestamp") === "").head()
    assert(junk.isNullAt(junk.fieldIndex("day")) &&
      junk.isNullAt(junk.fieldIndex("hour"))) // '' extracts → null ints
  }

  test("dayHourHeatmapTopHost filters to the single most frequent host") {
    val parsed = LogParser.parseNasaLog(logLines.toDF("value"))
    val heat = LogParser.dayHourHeatmapTopHost(parsed)
      .as[(Int, Int, Long)].collect().toSet
    // alpha.host.de (2 requests) wins; its two day/hour cells only
    assert(heat == Set((1, 0, 1L), (1, 13, 1L)))
  }

  test("restShare computes (total-top)/total correctly (quirk Q2 fixed)") {
    val parsed = LogParser.parseNasaLog(logLines.toDF("value"))
    val r = LogParser.restShare(parsed, 1).head()
    assert(r.getAs[Long]("total") == 4 && r.getAs[Long]("top_total") == 2)
    assert(r.getAs[Double]("rest_share") == 0.5)
  }

  // -- sources ----------------------------------------------------------
  test("headerless CSV roundtrip with castAll (S1, higgs shape)") {
    val dir = new java.io.File("target/tmp/higgs_csv")
    dir.mkdirs()
    Sources.writeTextReport(s"$dir/part.csv",
      Seq("1.0,2.5,3.5", "0.0,1.5,0.5"))
    val df = Sources.csvHeaderless(spark, dir.getPath)
    assert(df.columns.toSeq == Seq("_c0", "_c1", "_c2"))
    val typed = Sources.castAll(df, "double", df.columns)
    assert(typed.schema.fields.forall(_.dataType.typeName == "double"))
    assert(typed.agg(sum("_c1")).as[Double].head() == 4.0)
  }

  test("gzip text is single-partition; materializeToParquet splits it (Q7)") {
    val dir = new java.io.File("target/tmp/gz_demo")
    dir.mkdirs()
    val gz = new java.io.File(dir, "log.gz")
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(gz))
    out.write((1 to 5000).map(i => s"line $i").mkString("\n").getBytes)
    out.close()
    val txt = Sources.text(spark, gz.getPath)
    assert(txt.rdd.getNumPartitions == 1) // non-splittable
    Sources.materializeToParquet(txt, "target/tmp/gz_demo_parquet", 4)
    val pq = spark.read.parquet("target/tmp/gz_demo_parquet")
    assert(pq.rdd.getNumPartitions == 4 && pq.count() == 5000)
  }

  // -- streaming --------------------------------------------------------
  test("hourlyStats runs as a real stream and matches the batch plan") {
    // Complete mode: a finite fixture never advances the watermark past its
    // own tail, so Append would withhold the final windows by design.
    val streamed = EventStream.runToMemory(
      EventStream.hourlyStats(EventStream.readEvents(spark, sf0001)),
      "hourly_stats_test",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    val batch = SparkEntry.queries("q18_hourly_window")(spark, sf0001)
    val s = streamed.orderBy("win_start", "event_type")
      .as[(String, String, Long, Double)].collect().toSeq
    val b = batch.as[(String, String, Long, Double)].collect().toSeq
    assert(s == b, s"stream rows ${s.size} vs batch ${b.size}")
  }

  test("slidingTypeStats runs as a real stream and matches the batch plan") {
    val streamed = EventStream.runToMemory(
      EventStream.slidingTypeStats(EventStream.readEvents(spark, sf0001)),
      "sliding_type_test",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    val batch = SparkEntry.queries("q48_sliding_window")(spark, sf0001)
    val s = streamed.orderBy("win_start", "event_type")
      .as[(String, String, Long)].collect().toSeq
    val b = batch.as[(String, String, Long)].collect().toSeq
    assert(s == b, s"stream rows ${s.size} vs batch ${b.size}")
  }

  test("hourlyStats: checkpointed file sink survives a mid-input restart exactly once") {
    // The recovery property a production stream needs (round-10 verdict
    // #3), proven end to end: run hourlyStats as a REAL parquet file-sink
    // stream with a checkpoint dir, stop it with only half the input
    // consumed, restart from the same checkpoint over the full input, and
    // the written output must equal the batch q18 result EXACTLY — every
    // window present, none duplicated. The parquet sink's manifest log +
    // the file source's processed-files log in the checkpoint are what
    // make the restart exactly-once; a re-delivered or re-emitted window
    // would fail the multiset compare below.
    import java.nio.file.{Files, Paths}
    val stageDir = Files.createTempDirectory("ckpt_stage")
    val ckptDir = Files.createTempDirectory("ckpt_cp").toString
    val outDir = Files.createTempDirectory("ckpt_out").toString
    val ev = Tables.events(spark, sf0001)
    // four chronological slice files so maxFilesPerTrigger=1 gives real
    // multi-trigger progress, and the watermark advances between triggers
    val bounds = ev.withColumn("d", col("ts").cast("double"))
      .stat.approxQuantile("d", Array(0.25, 0.5, 0.75), 0.0001)
    val slices = Seq(
      col("ts").cast("double") < bounds(0),
      col("ts").cast("double") >= bounds(0) &&
        col("ts").cast("double") < bounds(1),
      col("ts").cast("double") >= bounds(1) &&
        col("ts").cast("double") < bounds(2),
      col("ts").cast("double") >= bounds(2))
    def stage(i: Int, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = Files.createTempDirectory(s"ckpt_tmp_$i")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp)
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, stageDir.resolve(f"s$i%02d.parquet"))
    }
    def startStream() =
      EventStream.hourlyStats(
        spark.readStream.schema(EventStream.schemaFor("TIMESTAMP"))
          .option("maxFilesPerTrigger", "1").parquet(stageDir.toString))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckptDir)
        .outputMode("append").start()

    // phase 1: first two slices only; stop with the rest of the input
    // still unstaged — the stream is down mid-input
    slices.take(2).zipWithIndex.foreach { case (p, i) => stage(i, ev.filter(p)) }
    val q1 = startStream()
    q1.processAllAvailable()
    q1.stop()

    // phase 2: the remaining slices plus a far-future sentinel event whose
    // arrival pushes the watermark past every fixture window (a finite
    // append stream otherwise withholds its tail windows forever); the
    // sentinel's own window stays open and is never emitted
    slices.drop(2).zipWithIndex.foreach { case (p, i) => stage(2 + i, ev.filter(p)) }
    val maxUs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val sentinelUs = maxUs + 24L * 3600 * 1000000
    stage(9, Seq((9999999L, sentinelUs, 0L, "sentinel", 0.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props")))
    val q2 = startStream()
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(outDir)
      .as[(String, String, Long, Double)].collect().toSeq
    val batch = SparkEntry.queries("q18_hourly_window")(spark, sf0001)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got.distinct.size == got.size,
      "restart re-emitted a window (duplicate rows in the file sink)")
    assert(got.sorted == batch.sorted,
      s"file-sink rows ${got.size} vs batch ${batch.size}")
  }

  test("recentPairs runs as a real stream-stream join and matches batch") {
    // inner matches emit eagerly in append mode, so a finite fixture
    // yields the complete inner-join result (outer's null rows would wait
    // on the watermark — same finite-fixture caveat as hourlyStats)
    val src = EventStream.readEvents(spark, sf0001)
    val streamed = EventStream.runToMemory(
      EventStream.recentPairs(
        src.filter(col("event_type") === "click"),
        src.where(col("event_type") === "error"),
        windowMinutes = 10),
      "recent_pairs_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .select("event_id", "r_event").as[(Long, Long)].collect().toSeq.sorted
    val e = Tables.events(spark, sf0001)
    val batch = EventStream.recentPairs(
        e.filter(col("event_type") === "click"),
        e.filter(col("event_type") === "error"),
        windowMinutes = 10)
      .select("event_id", "r_event").as[(Long, Long)].collect().toSeq.sorted
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"stream pairs ${streamed.size} vs batch ${batch.size}")
  }

  test("enrichWithDim: stream-static broadcast join matches batch, append-mode") {
    // stateless by construction (no watermark, no state store): every
    // event joins the static dimension inside its own micro-batch, so
    // Append mode emits everything immediately
    val dim = Tables.events(spark, sf0001).select(col("event_type"))
      .distinct().withColumn("type_code", xxhash64(col("event_type")))
    val streamed = EventStream.runToMemory(
      EventStream.enrichWithDim(
        EventStream.readEvents(spark, sf0001), dim, "event_type"),
      "enrich_dim_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val batch = EventStream.enrichWithDim(
      Tables.events(spark, sf0001), dim, "event_type")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "event_type", "type_code")
        .as[(Long, String, Long)].collect().sorted.toSeq
    val (s, b) = (rows(streamed), rows(batch))
    assert(s.nonEmpty && s == b, s"stream rows ${s.size} vs batch ${b.size}")
  }

  test("recentPairs LEFT OUTER emits watermark-evicted unmatched lefts as a stream") {
    // The append-mode outer-join semantic the inner test's comment dodges:
    // an unmatched left row may only emit once the watermark passes
    // left.ts + window (no future right can match it). Stage the fixture
    // as three time-ordered files replayed one per trigger so the
    // watermark genuinely ADVANCES between micro-batches and evicts —
    // a single-batch read would withhold every outer row forever.
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val stageDir = Files.createTempDirectory("louter_stage")
    val ev = Tables.events(spark, sf0001)
    val bounds = ev.withColumn("d", col("ts").cast("double"))
      .stat.approxQuantile("d", Array(1.0 / 3, 2.0 / 3), 0.0001)
    val slices = Seq(
      col("ts").cast("double") < bounds(0),
      col("ts").cast("double") >= bounds(0) &&
        col("ts").cast("double") < bounds(1),
      col("ts").cast("double") >= bounds(1))
    slices.zipWithIndex.foreach { case (pred, i) =>
      val tmp = Files.createTempDirectory(s"louter_tmp_$i")
      ev.filter(pred).coalesce(1).write.mode("overwrite")
        .parquet(tmp.toString)
      val part = Files.list(tmp)
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      val dest = stageDir.resolve(f"s$i%02d.parquet")
      Files.move(part, dest)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(1000000L + i * 1000L))
    }
    val wm = "5 minutes"
    def staged() = spark.readStream
      .schema(EventStream.schemaFor("TIMESTAMP"))
      .option("maxFilesPerTrigger", "1").parquet(stageDir.toString)
    val streamed = EventStream.runToMemory(
      EventStream.recentPairs(
        staged().filter(col("event_type") === "click"),
        staged().filter(col("event_type") === "error"),
        windowMinutes = 10, joinType = "left_outer", watermark = wm),
      "recent_pairs_louter_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .select(col("event_id"), col("r_event"))
      .as[(Long, Option[Long])].collect().toSeq
    val batch = EventStream.recentPairs(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "error"),
        windowMinutes = 10, joinType = "left_outer", watermark = wm)
      .select(col("event_id"), col("r_event"), unix_micros(col("ts")).as("us"))
      .as[(Long, Option[Long], Long)].collect().toSeq

    // inner matches emit eagerly and completely
    val sInner = streamed.collect { case (l, Some(r)) => (l, r) }.sorted
    val bInner = batch.collect { case (l, Some(r), _) => (l, r) }.sorted
    assert(sInner == bInner,
      s"inner rows: stream ${sInner.size} vs batch ${bInner.size}")

    // the watermark as of the LAST completed trigger derives from the
    // first two slices' ACTUAL max event time (not the quantile cut —
    // events are ~43 min apart at sf0.001, so the cut can overshoot the
    // real max and manufacture flaky must-emit rows); every unmatched
    // left whose (ts + window) lies below it must have been evicted-and-
    // emitted, and nothing may emit that batch doesn't justify
    val maxTwoUs = ev.filter(col("ts").cast("double") < bounds(1))
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val wmUs = maxTwoUs - 5L * 60 * 1000000
    val mustEmit = batch.collect {
      case (l, None, us) if us + 10L * 60 * 1000000 < wmUs => l }.toSet
    val sOuter = streamed.collect { case (l, None) => l }.toSet
    val bOuter = batch.collect { case (l, None, _) => l }.toSet
    assert(mustEmit.nonEmpty, "fixture produced no evictable unmatched lefts")
    assert(mustEmit.subsetOf(sOuter),
      s"${(mustEmit -- sOuter).size} watermark-passed unmatched lefts never emitted")
    assert(sOuter.subsetOf(bOuter),
      s"stream emitted ${(sOuter -- bOuter).size} outer rows batch disowns")
  }

  test("sessionize keeps one bounded state per user") {
    val events = Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[EventStream.Event]
    val sessions = EventStream.sessionize(events, gapMinutes = 30)
    val perUser = sessions.groupBy("user_id").count()
    assert(perUser.count() ==
      events.select("user_id").distinct().count())
  }

  test("sessionizeClosed (flatMapGroupsWithState) emits exactly the non-final sessions in batch") {
    val events = Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[EventStream.Event]
    // batch semantics: one invoke per user with all events; only the last
    // (still-open) session per user is withheld
    val closed = EventStream.sessionizeClosed(events, gapMinutes = 30)
      .collect().map(s => (s.user_id, s.n_events)).sorted.toSeq
    val q49 = SparkEntry.queries("q49_sessionize")(spark, sf0001).collect()
    val lastSess = q49.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).max).toMap
    val expected = q49.filter(r => r.getLong(1) != lastSess(r.getLong(0)))
      .map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(closed == expected)
  }

  test("sessionizeClosed runs as a real append-mode stream") {
    val events = EventStream.readEvents(spark, sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[EventStream.Event]
    val got = EventStream.runToMemory(
      EventStream.sessionizeClosed(events, gapMinutes = 30).toDF(),
      "closed_sessions_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val q49 = SparkEntry.queries("q49_sessionize")(spark, sf0001).collect()
    val batchAll = q49.map(r => (r.getLong(0), r.getLong(2))).toSeq
    val lastSess = q49.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).max).toMap
    val nonFinal = q49.filter(r => r.getLong(1) != lastSess(r.getLong(0)))
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    // every emitted session is a real batch session; all gap-closed
    // sessions are emitted (timeout-flushed finals depend on the watermark)
    def multiset(s: Seq[(Long, Long)]) = s.groupBy(identity).view.mapValues(_.size).toMap
    val gotM = multiset(got); val allM = multiset(batchAll)
    assert(gotM.forall { case (k, n) => allM.getOrElse(k, 0) >= n })
    assert(multiset(nonFinal).forall { case (k, n) =>
      gotM.getOrElse(k, 0) >= n })
  }

  test("sessionizeClosed merges a late in-watermark event without regressing bounds") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(id: Long, offsetMin: Long) = EventStream.Event(id,
      new java.sql.Timestamp(t0 + offsetMin * 60000L), 1L, "click", 1.0)
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.sessionizeClosed(input.toDS(), gapMinutes = 30)
      .toDF().writeStream.format("memory").queryName("late_event_test")
      .outputMode("append").start()
    try {
      input.addData(ev(1, 0), ev(2, 10))
      q.processAllAvailable() // watermark now t0+10min − 30min
      input.addData(ev(3, 5)) // LATE but above watermark: must merge
      q.processAllAvailable()
      input.addData(ev(4, 120)) // gap > 30min closes the session in-batch
      q.processAllAvailable()
      val got = spark.table("late_event_test")
        .select("user_id", "n_events", "first_ts", "last_ts")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      // the late event joins the open session; bounds stay [t0, t0+10min] —
      // before the min/max merge, last_ts regressed to the late t0+5min
      assert(got == Seq((1L, 3L, t0, t0 + 10 * 60000L)), got.toString)
    } finally q.stop()
  }

  test("sessionizeClosed state stays bounded by live users while input grows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // sf0.001 events in ts order, delivered as 5 chronological micro-batches:
    // input grows 200 → 1000 events, but flatMapGroupsWithState keeps ONE
    // OpenSession row per live user, so state-store rows must stay ≤ the
    // user cardinality at every batch — the watermark-bounded-state claim,
    // asserted instead of argued. (STREAM_STATE.md records the same curve
    // at sf0.1: 100k events, state plateaus at the 1.5k user count.)
    val evs = Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[EventStream.Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val nUsers = evs.map(_.user_id).distinct.length
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.sessionizeClosed(input.toDS(), gapMinutes = 30)
      .toDF().writeStream.format("memory").queryName("state_bound_test")
      .outputMode("append").start()
    try {
      val stateRows = evs.grouped(math.max(1, evs.length / 5)).map { chunk =>
        input.addData(chunk.toSeq: _*)
        q.processAllAvailable()
        q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      }.toSeq
      assert(stateRows.nonEmpty && stateRows.forall(_ > 0))
      stateRows.foreach(n =>
        assert(n <= nUsers, s"state rows $n exceed user count $nUsers " +
          s"(curve: $stateRows)"))
    } finally q.stop()
  }

  test("foldSessions: backward-gap late event is its own session, not a merge") {
    // the per-group fold, driven directly: MemoryStream can't deliver a
    // strictly-backward-gap event (the watermark filter removes exactly
    // those when delay == gap), but a caller with a longer watermark could
    val min = 60000000L // one minute in micros
    val gap = 30 * min
    val open = EventStream.OpenSession(1L, 2L, 2.0, 100 * min, 110 * min)
    // within gap of first_us: merges, extending the session backwards
    val (c1, o1) = EventStream.foldSessions(1L, Some(open),
      Seq((80 * min, 1.0)).iterator, gap)
    assert(c1.isEmpty)
    assert(o1.contains(EventStream.OpenSession(1L, 3L, 3.0, 80 * min, 110 * min)))
    // more than a gap before first_us: closes as its own earlier session
    val (c2, o2) = EventStream.foldSessions(1L, Some(open),
      Seq((40 * min, 1.0)).iterator, gap)
    assert(c2 == Seq(EventStream.SessionSummary(1L, 1L, 1.0,
      40 * min / 1000, 40 * min / 1000)))
    assert(o2.contains(open))
    // two late events within gap of EACH OTHER form one earlier session —
    // batch q49 over the same events would split identically
    val (c3, o3) = EventStream.foldSessions(1L, Some(open),
      Seq((40 * min, 1.0), (35 * min, 2.0)).iterator, gap)
    assert(c3 == Seq(EventStream.SessionSummary(1L, 2L, 3.0,
      35 * min / 1000, 40 * min / 1000)))
    assert(o3.contains(open))
    // a forward event past the gap closes the open session, opens a new one
    val (c4, o4) = EventStream.foldSessions(1L, Some(open),
      Seq((150 * min, 5.0)).iterator, gap)
    assert(c4 == Seq(EventStream.SessionSummary(1L, 2L, 2.0,
      100 * min / 1000, 110 * min / 1000)))
    assert(o4.contains(EventStream.OpenSession(1L, 1L, 5.0, 150 * min, 150 * min)))
  }

  test("foldSessions: hot user in one batch — bounded merge, arrival-order independent") {
    // Round-10 verdict #7: a single hot user landing a whole batch on one
    // executor must not materialize its events — foldSessions now streams
    // them into a map of gap-separated intervals, O(sessions) memory.
    // Semantics check: 50k events forming 10 well-separated sessions,
    // delivered in a seeded SHUFFLED order (worst case for an incremental
    // merge — constant interval splits/joins), must produce exactly the
    // sessions the time-sorted delivery produces: same counts, same
    // bounds, 9 closed + 1 open.
    val min = 60000000L
    val gap = 30 * min
    val rnd = new scala.util.Random(7)
    val events = (0 until 10).flatMap { s0 =>
      val start = s0 * 1000L * min // sessions 1000 min apart, gap 30 min
      (0 until 5000).map(i => (start + (i % 25) * min, 1.0))
    }
    def run(evs: Seq[(Long, Double)]) =
      EventStream.foldSessions(1L, None, evs.iterator, gap)
    val (closedSorted, openSorted) = run(events.sortBy(_._1))
    val (closedShuffled, openShuffled) = run(rnd.shuffle(events))
    def key(s: EventStream.SessionSummary) = (s.user_id, s.n_events, s.first_ts, s.last_ts)
    assert(closedSorted.size == 9 && openSorted.isDefined)
    assert(closedSorted.map(key) == closedShuffled.map(key))
    assert(openSorted.map(s => (s.n_events, s.first_us, s.last_us)) ==
      openShuffled.map(s => (s.n_events, s.first_us, s.last_us)))
    assert(closedSorted.forall(_.n_events == 5000L))
  }

  test("streaming dedup: dropDuplicates over a watermarked stream") {
    val deduped = EventStream.readEvents(spark, sf0001)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_type")
    val got = EventStream.runToMemory(
      deduped.groupBy("user_id").count(), "stream_dedup_test",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    val batch = Tables.events(spark, sf0001)
      .dropDuplicates("user_id", "event_type")
      .groupBy("user_id").count()
    assert(got.as[(Long, Long)].collect().toMap ==
      batch.as[(Long, Long)].collect().toMap)
  }

  test("dedupWithinWatermark drops delivery duplicates with BOUNDED state") {
    // plant exact delivery duplicates: the fixture unioned with itself —
    // every duplicate pair arrives in the same batch, well inside any
    // watermark horizon, so the bounded-state operator must behave
    // exactly like batch distinct-on-key while its state stays evictable
    // (plain dropDuplicates on these keys would pin one state row per
    // event_id forever)
    val src = EventStream.readEvents(spark, sf0001)
    val doubled = src.unionAll(src)
    val got = EventStream.runToMemory(
      EventStream.dedupWithinWatermark(doubled, Seq("event_id"),
        watermark = "30 minutes"),
      "stream_dedup_wm_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val batch = Tables.events(spark, sf0001)
    assert(got.count() == batch.count(),
      s"deduped stream ${got.count()} rows vs batch distinct ${batch.count()}")
    assert(got.select("event_id").distinct().count() == batch.count())
  }

  test("custom expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
                graft_simhash(array('a', 'b')) AS sh,
                size(graft_shingle_hashes(array('a','b','c','d'), 3)) AS nsh,
                size(graft_minhash_sig(array(1L, 2L, 3L), 16, 42L)) AS nsig
      """).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) != 0L)
    assert(r.getInt(2) == 2 && r.getInt(3) == 16)
    val r2 = spark.sql(
      """SELECT size(graft_winnow('the quick brown fox jumps', 4, 3)) AS nw,
                size(graft_hyperplane_sketches(array(1.0d, -2.0d), 2, 8, 5, 42L)) AS nhp
      """).head()
    assert(r2.getInt(0) > 0 && r2.getInt(1) == 5)
    val topk = spark.sql(
      """SELECT g, graft_topk(s, i, 2) AS top FROM VALUES
           (1, 0.9d, 10L), (1, 0.5d, 11L), (1, 0.7d, 12L),
           (2, 0.1d, 20L) AS t(g, s, i)
         GROUP BY g ORDER BY g""").collect()
    assert(topk(0).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0)) ==
      Seq(10L, 12L)) // best two by score desc
    assert(topk(1).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0)) ==
      Seq(20L))
    // the bloom pair end-to-end in SQL: build a filter over seen keys,
    // probe a seen and an unseen key (no false negative on the seen one).
    // might_contain requires its filter side constant-foldable or a
    // scalar subquery — the subquery IS the production shape (Spark's own
    // runtime filters inject exactly this)
    val bloom = spark.sql(
      """SELECT graft_bloom_contains(
           (SELECT graft_bloom_agg(xxhash64(k), 3L, 4096L)
            FROM VALUES ('a'), ('b'), ('c') AS t(k)),
           xxhash64('b')) AS hit,
         graft_bloom_contains(
           (SELECT graft_bloom_agg(xxhash64(k), 3L, 4096L)
            FROM VALUES ('a'), ('b'), ('c') AS t(k)),
           xxhash64('zzz-never-seen')) AS miss""").head()
    assert(bloom.getBoolean(0), "bloom false negative on a seen key")
    assert(!bloom.getBoolean(1), "unseen key probed true at 4096 bits/3 keys")
  }

  test("SQL surface coerces or rejects mistyped inputs at analysis time") {
    GraftFunctions.register(spark)
    // a raw float embedding column implicit-casts to array<double> — before
    // the inputTypes contract, ArrayData.getDouble read 8-byte garbage over
    // 4-byte elements and produced silently wrong bucket keys
    val viaFloat = spark.sql(
      """SELECT graft_hyperplane_sketches(
           cast(array(1.0, -2.0) AS array<float>), 2, 8, 5, 42L) AS ks""")
      .head().getSeq[Long](0)
    val viaDouble = spark.sql(
      """SELECT graft_hyperplane_sketches(array(1.0d, -2.0d), 2, 8, 5, 42L)
           AS ks""").head().getSeq[Long](0)
    assert(viaFloat == viaDouble)
    // graft_topk(float, int, k) coerces during analysis instead of a
    // ClassCastException mid-execution
    val t = spark.sql(
      """SELECT graft_topk(s, i, 2) AS top FROM VALUES
           (cast(0.9 AS float), 10), (cast(0.5 AS float), 11) AS t(s, i)""")
      .head()
    assert(t.getSeq[org.apache.spark.sql.Row](0).map(_.getLong(0)) ==
      Seq(10L, 11L))
    // non-castable input is rejected at analysis, not at runtime
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hyperplane_sketches('oops', 2, 8, 5, 42L)")
        .head()
    }
    // packed-key overflow guard: planes capped so tables * 2^planes fits
    intercept[IllegalArgumentException] {
      graft.functions.expressions.HyperplaneSketches(
        org.apache.spark.sql.catalyst.expressions.Literal(1L), 2, 57, 2, 42L)
    }
  }

  test("GraftExtensions injects every function via SparkSessionExtensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = spark.sessionState.functionRegistry.clone()
    GraftFunctions.builders.foreach { case (name, _) =>
      reg.dropFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(name))
    }
    org.apache.spark.sql.graft.ExtensionsTestBridge.registerFunctions(ext, reg)
    GraftFunctions.builders.foreach { case (name, _) =>
      assert(reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)), name)
    }
  }

  // -- multimodal -------------------------------------------------------
  test("multimodal ingest sniffs magic bytes and extract is deterministic") {
    val png = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 1, 2, 3)
    val wav = "RIFFxxxx".getBytes
    val df = Seq((1L, png), (2L, wav)).toDF("media_id", "content")
    val media = Multimodal.ingest(df, "media_id", "content")
    val types = media.collect().map(m => m.media_id -> m.meta.media_type).toMap
    assert(types == Map(1L -> "png", 2L -> "wav"))
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    assert(f1.forall(f => f.embedding.length == 16))
    assert(f1.forall(f => f.brightness >= 0 && f.brightness < 1))
  }

  test("frameOffsets plans sampling from metadata only") {
    val media = Seq((1L, ("mp4", -1, -1, 1000L))).toDF("media_id", "meta")
      .select(col("media_id"), col("meta").cast(
        "struct<media_type:string,width:int,height:int,n_bytes:bigint>"))
    val offs = Multimodal.frameOffsets(media, chunkBytes = 100, everyK = 3)
      .as[(Long, Long)].collect()
    assert(offs.map(_._2).toSeq == Seq(0L, 3L, 6L, 9L))
  }

  test("sampleFrames slices exact chunk payloads; resize strides bytes") {
    val big = Array.tabulate(200)(_.toByte) // 3 chunks of 64 → offsets 0, 2
    val df = Seq((1L, big), (2L, "short".getBytes)).toDF("doc_id", "bytes")
    val media = Multimodal.ingest(df, "doc_id", "bytes")
    val frames = Multimodal.sampleFrames(media, chunkBytes = 64, everyK = 2)
      .collect()
    val f1 = frames.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
    assert(f1.map(_.getLong(1)).toSeq == Seq(0L, 2L))
    assert(f1(0).getAs[Array[Byte]]("frame").toSeq ==
      big.slice(0, 64).toSeq)
    assert(f1(1).getAs[Array[Byte]]("frame").toSeq ==
      big.slice(128, 192).toSeq)
    // payload shorter than a chunk: single offset-0 frame, whole payload
    val f2 = frames.filter(_.getLong(0) == 2L)
    assert(f2.length == 1 &&
      new String(f2.head.getAs[Array[Byte]]("frame")) == "short")
    // stride resize: 10 bytes to ~4 → stride 2 → indices 0,2,4,6,8
    assert(new String(
      Multimodal.StubDecoder.resize("abcdefghij".getBytes, 4)) == "acegi")
    // target larger than payload → stride 1, identity
    assert(Multimodal.StubDecoder.resize(big, 1000).toSeq == big.toSeq)
  }

  test("boxDownsample: area-averaging cell math, conservation, bounds") {
    import Multimodal.StubDecoder.boxDownsample
    // 8 bytes → 4 cells of 2: floor means
    val in = Array(10, 20, 30, 31, 250, 255, 0, 1).map(_.toByte)
    assert(boxDownsample(in, 4).map(_ & 0xff).toSeq == Seq(15, 30, 252, 0))
    // non-divisible: 10 bytes → 4 cells with boundaries 0,2,5,7,10
    // (floor(i*10/4)) → widths 2,3,2,3 — every byte in exactly one cell
    val in10 = Array.tabulate(10)(i => (i * 10).toByte)
    val cells = Seq((0, 2), (2, 5), (5, 7), (7, 10)).map { case (lo, hi) =>
      (lo until hi).map(i => in10(i) & 0xff).sum / (hi - lo)
    }
    assert(boxDownsample(in10, 4).map(_ & 0xff).toSeq == cells)
    // pass-through when n <= target
    assert(boxDownsample(in, 100).toSeq == in.toSeq)
    // output length is exactly target for n > target; values in [0,255]
    val big2 = Array.tabulate(1000)(i => (i * 7).toByte)
    val ds = boxDownsample(big2, 64)
    assert(ds.length == 64 && ds.forall(b => (b & 0xff) <= 255))
    // constant input is invariant under downsampling (mean of a constant)
    val const = Array.fill(500)(42.toByte)
    assert(boxDownsample(const, 64).forall(_ == 42.toByte))
  }

  test("streaming bloom admission equals the batch gate (stream-static, Append)") {
    // q101's arrival-time twin: the same persisted filter probed inside a
    // continuous stream, residue verified through a stream-static anti
    // join — entirely stateless, so Append mode with no watermark.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val path = java.nio.file.Files
      .createTempDirectory("stream_bloom").toString
    graft.operators.Dedup.buildExactBloom(corpus, "text", path)
    // arrivals: verbatim corpus duplicates (re-keyed) + genuinely new docs
    val arrivals = corpus.filter(col("doc_id") % 10 === 1)
      .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
      .unionAll(docs.filter(col("doc_id") % 10 === 7)
        .select((col("doc_id") + 7000000L).as("doc_id"),
          concat(col("text"), lit(" brandnew")).as("text")))
      .as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    val streamed = graft.streaming.IngestStream.bloomAdmit(
      input.toDF().toDF("doc_id", "text"), corpus, "text", path)
    val q = streamed.writeStream.format("memory").queryName("bloom_admit")
      .outputMode(OutputMode.Append).start()
    try {
      // two micro-batches — admission must not depend on batch boundaries
      input.addData(arrivals.take(arrivals.size / 2): _*)
      q.processAllAvailable()
      input.addData(arrivals.drop(arrivals.size / 2): _*)
      q.processAllAvailable()
      val got = spark.table("bloom_admit").select("doc_id")
        .as[Long].collect().toSet
      val batch = graft.operators.Dedup.bloomAdmit(corpus,
          arrivals.toDF("doc_id", "text"), "text", path)
        .select("doc_id").as[Long].collect().toSet
      assert(got === batch, "streamed admission diverged from batch gate")
      // and the gate actually discriminated: news in, dups out
      assert(batch.forall(_ >= 7000000L), "every verbatim dup rejected")
      assert(batch.nonEmpty, "new docs admitted")
    } finally q.stop()
  }

  test("micro-batch fuzzy admission: foreachBatch + lshIndexProbe equals batch") {
    // The pattern IngestStream's scaladoc prescribes for NEAR-dup
    // admission (whose candidate verify needs a batch-built broadcast, so
    // it cannot be a continuous stream-static join): each micro-batch
    // probes the persisted band index and anti-joins its own flagged set.
    // Across arbitrary batch boundaries the union of admitted rows must
    // equal the one-shot batch admission over the whole shard.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val dir = java.nio.file.Files
      .createTempDirectory("stream_fuzzy").toString
    graft.operators.Dedup.writeLshBandIndex(corpus, "doc_id", "text", dir)
    val arrivals = docs.filter(col("doc_id") % 10 === 5)
      .select((col("doc_id") + 5000000L).as("doc_id"),
        concat(col("text"), lit(" zzingest")).as("text"))
      .unionAll(docs.filter(col("doc_id") % 10 === 7)
        .select((col("doc_id") + 7000000L).as("doc_id"), col("text")))
      .as[(Long, String)].collect().toSeq
    val admitted = scala.collection.mutable.Set[Long]()
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val flagged = graft.operators.Dedup.lshIndexProbe(corpus, batch,
            dir, "doc_id", "text", threshold = 0.8)
          .select(col("id_b").as("doc_id")).distinct()
        admitted ++= batch.join(flagged, Seq("doc_id"), "left_anti")
          .select("doc_id").as[Long].collect()
        ()
      }
      .start()
    try {
      input.addData(arrivals.take(arrivals.size / 2): _*)
      q.processAllAvailable()
      input.addData(arrivals.drop(arrivals.size / 2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val oneShot = arrivals.toDF("doc_id", "text")
    val batchAdmitted = oneShot.join(
        graft.operators.Dedup.lshIndexProbe(corpus, oneShot, dir,
            "doc_id", "text", threshold = 0.8)
          .select(col("id_b").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted.toSet === batchAdmitted,
      "micro-batched fuzzy admission diverged from the one-shot batch")
    assert(batchAdmitted.nonEmpty && batchAdmitted.size < arrivals.size,
      "gate must both admit and reject on this fixture")
  }

  test("end-to-end curated ingest: bloom + LSH into a checkpointed file " +
      "sink, killed mid-shard, resumes exactly once") {
    // Round-11 verdict #6: the FULL admission pipeline (exact Bloom gate
    // then band-index near-dup gate) composed into IngestStream
    // .curatedAdmitEachBatch's restartable file sink — run over a staged
    // file source, stopped with half the shard unprocessed, restarted
    // from the same checkpoint, and the union of per-batch output
    // directories must equal the one-shot batch admission of the whole
    // shard: every admit present exactly once, every dup/near-dup absent.
    import java.nio.file.Files
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val bloomPath = Files.createTempDirectory("cur_bloom").toString
    val lshPath = Files.createTempDirectory("cur_lsh").toString
    graft.operators.Dedup.buildExactBloom(corpus, "text", bloomPath)
    graft.operators.Dedup.writeLshBandIndex(corpus, "doc_id", "text",
      lshPath)
    // shard: verbatim corpus dups (bloom must drop), near-miss variants
    // (bloom passes, LSH must drop), genuinely new docs (admit)
    val shard = corpus.filter(col("doc_id") % 10 === 1)
      .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
      .unionAll(docs.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 6000000L).as("doc_id"),
          concat(col("text"), lit(" zzingest")).as("text")))
      .unionAll(docs.filter(col("doc_id") % 10 === 7)
        .select((col("doc_id") + 7000000L).as("doc_id"),
          concat(col("text"), lit(" brandnew")).as("text")))
    val stageDir = Files.createTempDirectory("cur_stage")
    val ckpt = Files.createTempDirectory("cur_ckpt").toString
    val outDir = Files.createTempDirectory("cur_out").toString
    def stage(i: Int): Unit = {
      val tmp = Files.createTempDirectory(s"cur_tmp_$i")
      shard.filter(pmod(col("doc_id"), lit(4)) === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp)
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, stageDir.resolve(f"s$i%02d.parquet"))
    }
    def start() = graft.streaming.IngestStream.curatedAdmitEachBatch(
      spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(stageDir.toString),
      corpus, "doc_id", "text", bloomPath, lshPath, threshold = 0.8,
      outDir, ckpt)
    // phase 1: half the shard, then the stream dies mid-ingest
    stage(0); stage(1)
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    // phase 2: the rest arrives, the stream resumes from the checkpoint
    stage(2); stage(3)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSeq
    // one-shot batch truth over the whole shard: bloom gate then LSH gate
    val exact = graft.operators.Dedup.bloomAdmit(corpus, shard, "text",
      bloomPath)
    val flagged = graft.operators.Dedup.lshIndexProbe(corpus, exact,
        lshPath, "doc_id", "text", threshold = 0.8)
      .select(col("id_b").as("doc_id")).distinct()
    val truth = exact.join(flagged, Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().toSeq
    assert(got.distinct.size == got.size,
      "restart re-admitted a row (duplicate in the file sink)")
    assert(got.sorted == truth.sorted,
      s"streamed admission ${got.size} rows vs batch ${truth.size}")
    // and the composed gate discriminated all three slices
    assert(truth.forall(_ >= 7000000L), "every dup/near-dup rejected")
    assert(truth.nonEmpty, "new docs admitted")
  }

  test("selfDedupIngest: the stream rejects dups of its OWN admissions, " +
      "across batches and across a restart") {
    // The full crawler loop: each batch appends its admissions back into
    // the Bloom filter and the band index, so a page re-crawled (or
    // paraphrased) hundreds of batches later is rejected — including
    // after a kill/restart, because the artifacts AND the admitted
    // output are persistent.
    import java.nio.file.Files
    def toks(p: String) = (1 to 30).map(i => s"${p}w$i").mkString(" ")
    val c1 = toks("c1"); val c2 = toks("c2")
    val n1 = toks("n1"); val n2 = toks("n2"); val n3 = toks("n3")
    val corpus = Seq((1L, c1), (2L, c2)).toDF("doc_id", "text")
    val bloomPath = Files.createTempDirectory("sd_bloom").toString
    val lshPath = Files.createTempDirectory("sd_lsh").toString
    graft.operators.Dedup.buildExactBloom(corpus, "text", bloomPath)
    graft.operators.Dedup.writeLshBandIndex(corpus, "doc_id", "text",
      lshPath)
    val stageDir = Files.createTempDirectory("sd_stage")
    val ckpt = Files.createTempDirectory("sd_ckpt").toString
    val outDir = Files.createTempDirectory("sd_out").toString
    var staged = 0
    def stage(rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory(s"sd_tmp_$staged")
      rows.toDF("doc_id", "text")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp)
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, stageDir.resolve(f"s$staged%02d.parquet"))
      staged += 1
    }
    def start() = graft.streaming.IngestStream.selfDedupIngest(
      spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(stageDir.toString),
      corpus, "doc_id", "text", bloomPath, lshPath, threshold = 0.8,
      outDir, ckpt)

    // batch 0: two copies of a NEW page in one batch (one admitted,
    // smallest id) + a verbatim copy of the standing corpus (rejected)
    stage(Seq(101L -> n1, 102L -> n1, 103L -> c1))
    val q1 = start()
    q1.processAllAvailable()
    // batch 1: a re-crawl of the batch-0 admission (exact self-dup), a
    // paraphrase of it (near self-dup), and a fresh page
    stage(Seq(111L -> n1, 112L -> (n1 + " extra"), 113L -> n2))
    q1.processAllAvailable()
    q1.stop() // the stream dies here, mid-crawl

    // batch 2 arrives after the restart: a re-crawl of the PRE-restart
    // admission, a paraphrase of the standing corpus, and a fresh page
    stage(Seq(121L -> n2, 122L -> (c2 + " extra"), 123L -> n3))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSeq
    assert(got.distinct.size == got.size, "a row was admitted twice")
    assert(got.toSet == Set(101L, 113L, 123L),
      s"self-dedup admission wrong: ${got.sorted}")
    // the artifacts grew with the admissions
    val nKeys = graft.operators.Dedup.readBloomArtifact(spark, bloomPath)
      .getAs[Long]("n_keys")
    assert(nKeys == 2L + 3L, s"bloom must hold corpus+admitted keys: $nKeys")
    val bandIds = spark.read.parquet(
        graft.operators.MaintenanceIo.snapshot(lshPath)("bands"))
      .select("id").distinct().as[Long].collect().toSet
    assert(bandIds == Set(1L, 2L, 101L, 113L, 123L),
      s"band index must hold corpus+admitted docs: $bandIds")
  }

  test("selfDedupIngest card telemetry: the streaming HLL card equals the " +
      "batch scratch card across a kill/restart (idempotent side effect)") {
    // The q126 artifact maintained FROM the stream: each batch folds its
    // admissions into the card. foreachBatch side effects are
    // at-least-once, so a count-shaped stat would drift on replay — the
    // register max-merge cannot. Truth: a from-scratch card over
    // corpus ∪ (everything the stream actually admitted).
    import java.nio.file.Files
    def toks(p: String) = (1 to 30).map(i => s"${p}w$i").mkString(" ")
    val corpus = Seq((1L, toks("e1")), (2L, toks("e2"))).toDF("doc_id", "text")
    val bloomPath = Files.createTempDirectory("cd_bloom").toString
    val lshPath = Files.createTempDirectory("cd_lsh").toString
    val cardPath = Files.createTempDirectory("cd_card").toString
    graft.operators.Dedup.buildExactBloom(corpus, "text", bloomPath)
    graft.operators.Dedup.writeLshBandIndex(corpus, "doc_id", "text",
      lshPath)
    graft.operators.Sketches.buildHllCard(corpus, "text", cardPath)
    val stageDir = Files.createTempDirectory("cd_stage")
    val ckpt = Files.createTempDirectory("cd_ckpt").toString
    val outDir = Files.createTempDirectory("cd_out").toString
    var staged = 0
    def stage(rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory(s"cd_tmp_$staged")
      rows.toDF("doc_id", "text")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp)
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, stageDir.resolve(f"s$staged%02d.parquet"))
      staged += 1
    }
    def start() = graft.streaming.IngestStream.selfDedupIngest(
      spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(stageDir.toString),
      corpus, "doc_id", "text", bloomPath, lshPath, threshold = 0.8,
      outDir, ckpt, cardPath = Some(cardPath))
    stage(Seq(101L -> toks("e3"), 102L -> toks("e3"), 103L -> toks("e1"))) // dup pair + corpus dup
    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // dies mid-crawl
    stage(Seq(111L -> toks("e3"), 112L -> toks("e4"))) // self-dup + fresh
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val admitted = spark.read.parquet(outDir).select("doc_id", "text")
    val streamedEst = graft.operators.Sketches
      .hllCardEstimate(spark, cardPath).as[Long].head()
    val scratchEst = graft.operators.Sketches.hllEstimate(
      graft.operators.Sketches.hllRegisters(
        corpus.unionByName(admitted), col("text"), Seq.empty),
      Seq.empty).as[Long].head()
    assert(streamedEst == scratchEst,
      s"card drifted: streamed $streamedEst vs scratch $scratchEst")
    // 4 distinct texts total (e1, e2, e3, e4) — LC regime is near-exact
    assert(streamedEst == 4L, s"expected 4 distinct texts, got $streamedEst")
  }

  test("selfDedupIngest search index: the stream-maintained inverted index " +
      "equals a from-scratch build across a kill/restart") {
    // q134's writer driven from a real checkpointed stream: each batch
    // appends its admissions as a generation triple; the kill/restart
    // replays side effects at-least-once, and the per-batch overwrite
    // must keep the index equal to a from-scratch build over
    // corpus ∪ admitted — tf, df, and stats all exactly-once.
    import java.nio.file.Files
    def toks(p: String) = (1 to 30).map(i => s"${p}w$i").mkString(" ")
    val corpus = Seq((1L, toks("s1")), (2L, toks("s2"))).toDF("doc_id", "text")
    val bloomPath = Files.createTempDirectory("si_bloom").toString
    val lshPath = Files.createTempDirectory("si_lsh").toString
    val idxPath = Files.createTempDirectory("si_idx").toString
    graft.operators.Dedup.buildExactBloom(corpus, "text", bloomPath)
    graft.operators.Dedup.writeLshBandIndex(corpus, "doc_id", "text",
      lshPath)
    graft.operators.InvertedIndex.buildIndex(corpus, idxPath)
    val stageDir = Files.createTempDirectory("si_stage")
    val ckpt = Files.createTempDirectory("si_ckpt").toString
    val outDir = Files.createTempDirectory("si_out").toString
    var staged = 0
    def stage(rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory(s"si_tmp_$staged")
      rows.toDF("doc_id", "text")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp)
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, stageDir.resolve(f"s$staged%02d.parquet"))
      staged += 1
    }
    def start() = graft.streaming.IngestStream.selfDedupIngest(
      spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(stageDir.toString),
      corpus, "doc_id", "text", bloomPath, lshPath, threshold = 0.8,
      outDir, ckpt, searchIndexPath = Some(idxPath))
    stage(Seq(101L -> toks("s3"), 102L -> toks("s3"), 103L -> toks("s1")))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // dies mid-crawl
    stage(Seq(111L -> toks("s3"), 112L -> toks("s4")))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val admitted = spark.read.parquet(outDir).select("doc_id", "text")
    // truth: a from-scratch index over what the stream actually admitted
    val scratch = Files.createTempDirectory("si_scratch").toString
    graft.operators.InvertedIndex.buildIndex(
      corpus.unionByName(admitted), scratch)
    val terms = Seq("s1w1", "s3w5", "s4w9")
    def top(p: String) = graft.operators.InvertedIndex
      .bm25FromIndex(spark, p, terms)
      .orderBy(col("score").desc, col("doc_id"))
      .as[(Long, Double, Long)].collect().toSeq
    val streamed = top(idxPath)
    assert(streamed.nonEmpty && streamed == top(scratch),
      s"stream-maintained index drifted: $streamed vs ${top(scratch)}")
  }

  test("selfDedupIngest similarity graph: the stream-maintained edge set " +
      "equals a from-scratch rebuild across a kill/restart") {
    // q154's writer driven from a real checkpointed stream: each batch
    // lands its admissions as a generation quad (appendBatch); the
    // kill/restart replays side effects at-least-once, and the per-batch
    // overwrite must keep the maintained graph equal to a from-scratch
    // exactJaccardJoin over corpus ∪ admitted. Texts are engineered so
    // admitted docs pass the 0.8 ingest gate but still bind 0.4-edges to
    // their standing cousins — the graph threshold is the LOOSER one.
    import java.nio.file.Files
    def toks(p: String) = (1 to 30).map(i => s"${p}w$i").mkString(" ")
    def blend(p: String, q: String, k: Int) =
      ((1 to (30 - k)).map(i => s"${p}w$i") ++
        (1 to k).map(i => s"${q}x$i")).mkString(" ")
    val corpus = Seq((1L, toks("a")), (2L, toks("b"))).toDF("doc_id", "text")
    val bloomPath = Files.createTempDirectory("sg_bloom").toString
    val lshPath = Files.createTempDirectory("sg_lsh").toString
    val gPath = Files.createTempDirectory("sg_graph").toString
    graft.operators.Dedup.buildExactBloom(corpus, "text", bloomPath)
    graft.operators.Dedup.writeLshBandIndex(corpus, "doc_id", "text",
      lshPath)
    graft.operators.SimGraphIndex.build(corpus, "doc_id", "text", gPath,
      threshold = 0.4)
    val stageDir = Files.createTempDirectory("sg_stage")
    val ckpt = Files.createTempDirectory("sg_ckpt").toString
    val outDir = Files.createTempDirectory("sg_out").toString
    var staged = 0
    def stage(rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory(s"sg_tmp_$staged")
      rows.toDF("doc_id", "text")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp)
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, stageDir.resolve(f"s$staged%02d.parquet"))
      staged += 1
    }
    def start() = graft.streaming.IngestStream.selfDedupIngest(
      spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(stageDir.toString),
      corpus, "doc_id", "text", bloomPath, lshPath, threshold = 0.8,
      outDir, ckpt, simGraphPath = Some(gPath))
    // 101: half-a half-fresh (admitted; 0.4-edge to doc 1); 102: exact
    // dup of doc 2 (rejected)
    stage(Seq(101L -> blend("a", "f", 10), 102L -> toks("b")))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // dies mid-crawl
    // 111: half-b half-fresh (admitted; 0.4-edge to doc 2)
    stage(Seq(111L -> blend("b", "g", 10)))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val admitted = spark.read.parquet(outDir).select("doc_id", "text")
    assert(admitted.count() == 2, "gate check: both blends must admit")
    def es(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
    val got = es(graft.operators.SimGraphIndex.edges(spark, gPath))
    val want = es(graft.operators.Dedup.exactJaccardJoin(
      corpus.unionByName(admitted), "doc_id", "text", 0.4))
    assert(got.nonEmpty && got == want,
      s"stream-maintained graph drifted: $got vs $want")
  }

  test("search-while-ingesting: retrieval served from the maintained " +
      "index + simgraph WHILE the ingest query is active equals " +
      "from-scratch at every trigger boundary") {
    // Round-16/17 carried stretch: the stream-maintained artifacts are
    // gated above AFTER the writer stops — this drives the actual serving
    // pattern, a retrieval probe (BM25 from the inverted index + SERP
    // dedup against the simgraph) issued BETWEEN micro-batches with the
    // streaming query still ACTIVE. The manifest-snapshot read path must
    // serve a consistent page equal to a from-scratch build over
    // corpus ∪ admitted-so-far, and the next trigger's admissions must
    // become searchable at the following boundary.
    import java.nio.file.Files
    def toks(p: String) = (1 to 30).map(i => s"${p}w$i").mkString(" ")
    def blend(p: String, q: String, k: Int) =
      ((1 to (30 - k)).map(i => s"${p}w$i") ++
        (1 to k).map(i => s"${q}x$i")).mkString(" ")
    val corpus = Seq((1L, toks("a")), (2L, toks("b"))).toDF("doc_id", "text")
    val bloomPath = Files.createTempDirectory("swi_bloom").toString
    val lshPath = Files.createTempDirectory("swi_lsh").toString
    val idxPath = Files.createTempDirectory("swi_idx").toString
    val gPath = Files.createTempDirectory("swi_graph").toString
    graft.operators.Dedup.buildExactBloom(corpus, "text", bloomPath)
    graft.operators.Dedup.writeLshBandIndex(corpus, "doc_id", "text",
      lshPath)
    graft.operators.InvertedIndex.buildIndex(corpus, idxPath)
    graft.operators.SimGraphIndex.build(corpus, "doc_id", "text", gPath,
      threshold = 0.4)
    val stageDir = Files.createTempDirectory("swi_stage")
    val ckpt = Files.createTempDirectory("swi_ckpt").toString
    val outDir = Files.createTempDirectory("swi_out").toString
    var staged = 0
    def stage(rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory(s"swi_tmp_$staged")
      rows.toDF("doc_id", "text")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp)
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, stageDir.resolve(f"s$staged%02d.parquet"))
      staged += 1
    }
    // the serving probe: BM25 candidate page from the index, ranked
    // (score DESC, doc_id), then SERP-deduped against the graph edges
    val terms = Seq("aw1", "aw2", "bw5", "gx1")
    def probe(ip: String, gp: String): Seq[(Long, Long, String, Long)] = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("score").desc, col("doc_id"))
      val cand = graft.operators.InvertedIndex.bm25FromIndex(spark, ip,
          terms)
        .withColumn("q_id", lit(0L))
        .withColumn("rn", row_number().over(w))
        .select("q_id", "doc_id", "rn")
      graft.operators.Retrieval.serpDedup(cand,
          graft.operators.SimGraphIndex.edges(spark, gp))
        .orderBy("rn")
        .select("rn", "doc_id", "action", "dup_of")
        .as[(Long, Long, String, Long)].collect().toSeq
    }
    def scratchProbe(): Seq[(Long, Long, String, Long)] = {
      val admitted = spark.read.parquet(outDir).select("doc_id", "text")
      val all = corpus.unionByName(admitted)
      val si = Files.createTempDirectory("swi_scr_idx").toString
      val sg = Files.createTempDirectory("swi_scr_g").toString
      graft.operators.InvertedIndex.buildIndex(all, si)
      graft.operators.SimGraphIndex.build(all, "doc_id", "text", sg,
        threshold = 0.4)
      probe(si, sg)
    }
    // shard 1: a near-dup blend of doc 1 (admits; 0.4-edge to doc 1) and
    // a fresh doc carrying the "gx1" term
    stage(Seq(101L -> blend("a", "g", 10), 102L -> toks("c")))
    val q = graft.streaming.IngestStream.selfDedupIngest(
      spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(stageDir.toString),
      corpus, "doc_id", "text", bloomPath, lshPath, threshold = 0.8,
      outDir, ckpt, searchIndexPath = Some(idxPath),
      simGraphPath = Some(gPath))
    q.processAllAvailable()
    assert(q.isActive, "the ingest query must still be running")
    val live1 = probe(idxPath, gPath)
    val want1 = scratchProbe()
    assert(live1.nonEmpty && live1 == want1,
      s"mid-stream probe diverged from from-scratch: $live1 vs $want1")
    assert(live1.exists(_._2 == 101L),
      "batch-1 admission must already be searchable mid-stream")
    assert(live1.exists { case (_, d, a, dup) =>
      d == 101L && a == "dropped" && dup == 1L } ||
      live1.exists { case (_, d, a, dup) =>
        d == 1L && a == "dropped" && dup == 101L },
      s"the near-dup pair (1, 101) must SERP-dedup against the live " +
        s"graph: $live1")
    // shard 2 lands while the SAME query instance keeps running — its
    // admissions must be searchable at the next boundary
    stage(Seq(111L -> blend("b", "h", 10)))
    q.processAllAvailable()
    assert(q.isActive)
    val live2 = probe(idxPath, gPath)
    val want2 = scratchProbe()
    assert(live2 == want2,
      s"post-trigger-2 probe diverged: $live2 vs $want2")
    assert(live2.exists(_._2 == 111L),
      "batch-2 admission must be searchable after its trigger")
    q.stop()
  }

  test("stream-maintained DENSE channel: batch-N admissions are " +
      "ANN-searchable at boundary N+1 with a FRESH certificate, and the " +
      "maintained index equals a cold build (stream==batch law)") {
    // Round-18 verdict #5: the ingest loop maintains the inverted index
    // and simgraph at stream cadence; this drives the DENSE channel the
    // same way — per-batch appendBatchToIvfIndex + cert refresh in the
    // same publish — and probes it MID-STREAM like the
    // search-while-ingesting smoke probes BM25.
    import java.nio.file.Files
    import graft.operators.Similarity
    def vec(id: Long): Seq[Double] =
      (0 until 8).map(d => ((id * 31 + d * 17) % 1009).toDouble / 1009.0 + 0.01)
    def doc(id: Long): (Long, String, Seq[Double]) =
      (id, (1 to 20).map(i => s"d${id}t$i").mkString(" "), vec(id))
    val corpus = (1L to 6L).map(doc).toDF("doc_id", "text", "embedding")
    val bloomPath = Files.createTempDirectory("dn_bloom").toString
    val lshPath = Files.createTempDirectory("dn_lsh").toString
    val densePath = Files.createTempDirectory("dn_ivf").toString
    val cert = Similarity.RecallCertSpec(k = 3, nProbe = 2, sampleEvery = 1L)
    graft.operators.Dedup.buildExactBloom(corpus, "text", bloomPath)
    graft.operators.Dedup.writeLshBandIndex(corpus, "doc_id", "text",
      lshPath)
    Similarity.buildIvfIndex(
      corpus.select(col("doc_id").as("vec_id"), col("embedding")),
      densePath, nLists = 2, cert = Some(cert))
    val stageDir = Files.createTempDirectory("dn_stage")
    val ckpt = Files.createTempDirectory("dn_ckpt").toString
    val outDir = Files.createTempDirectory("dn_out").toString
    var staged = 0
    def stage(ids: Seq[Long]): Unit = {
      val tmp = Files.createTempDirectory(s"dn_tmp_$staged")
      ids.map(doc).toDF("doc_id", "text", "embedding")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp)
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, stageDir.resolve(f"s$staged%02d.parquet"))
      staged += 1
    }
    // probe the live index for the vector of `target` under a foreign
    // q_id; at exhaustive probe (nProbe == nLists) the top hit must be
    // the target itself (cosine 1) the moment its batch committed
    def topHit(target: Long): Long =
      Similarity.ivfTopKFromIndex(densePath,
          Seq((999L, vec(target))).toDF("vec_id", "embedding"),
          k = 3, nProbe = 2)
        .orderBy("rn").select("n_id").head().getLong(0)
    // stream==batch law: the maintained index at exhaustive probe equals
    // brute force over corpus ∪ admitted-so-far, query-for-query
    def lawHolds(): Unit = {
      val admitted = spark.read.parquet(outDir)
        .select(col("doc_id").as("vec_id"), col("embedding"))
      val all = corpus.select(col("doc_id").as("vec_id"), col("embedding"))
        .unionByName(admitted)
      val qs = Seq((101L, vec(101L)), (1L, vec(1L))).toDF("vec_id", "embedding")
      val got = Similarity.ivfTopKFromIndex(densePath, qs, k = 3, nProbe = 2)
        .select("q_id", "n_id", "sim", "rn")
        .as[(Long, Long, Double, Long)].collect().toSet
      val want = Similarity.bruteForceTopK(all, qs, k = 3)
        .select("q_id", "n_id", "sim", "rn")
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(got == want, s"maintained index drifted: $got vs $want")
    }
    stage(Seq(101L, 102L))
    val q = graft.streaming.IngestStream.selfDedupIngest(
      spark.readStream
        .schema("doc_id LONG, text STRING, embedding ARRAY<DOUBLE>")
        .option("maxFilesPerTrigger", "1").parquet(stageDir.toString),
      corpus, "doc_id", "text", bloomPath, lshPath, threshold = 0.8,
      outDir, ckpt, denseIndexPath = Some(densePath),
      denseCert = Some(cert))
    q.processAllAvailable()
    assert(q.isActive, "the ingest query must still be running")
    // the batch publish re-certified: the mid-stream serve asserts
    // freshness+floor exactly like a batch one (exhaustive probe -> 1.0)
    assert(Similarity.requireCertifiedRecall(spark, densePath,
      k = 3, nProbe = 2, floor = 0.99) == 1.0)
    assert(topHit(101L) == 101L,
      "batch-1 admission must be ANN-searchable mid-stream")
    lawHolds()
    // shard 2 lands while the SAME query instance keeps running
    stage(Seq(111L))
    q.processAllAvailable()
    assert(Similarity.requireCertifiedRecall(spark, densePath,
      k = 3, nProbe = 2, floor = 0.99) == 1.0)
    assert(topHit(111L) == 111L,
      "batch-2 admission must be ANN-searchable after its trigger")
    lawHolds()
    q.stop()
  }

  test("appendBatchToIvfIndex: a REPLAYED batch is exactly-once (the " +
      "per-batch generation overwrites in place, rows never duplicate)") {
    import graft.operators.Similarity
    def vec(id: Long): Seq[Double] =
      (0 until 8).map(d => ((id * 31 + d * 17) % 1009).toDouble / 1009.0 + 0.01)
    val base = (1L to 6L).map(id => (id, vec(id)))
      .toDF("vec_id", "embedding")
    val shard = Seq((101L, vec(101L)), (102L, vec(102L)))
      .toDF("vec_id", "embedding")
    val p = java.nio.file.Files.createTempDirectory("replay_ivf").toString
    Similarity.buildIvfIndex(base, p, nLists = 2)
    Similarity.appendBatchToIvfIndex(shard, p, batchId = 0L)
    def state() = {
      val qs = Seq((999L, vec(101L))).toDF("vec_id", "embedding")
      (graft.operators.MaintenanceIo.requireManifest(p).epoch,
        Similarity.ivfTopKFromIndex(p, qs, k = 8, nProbe = 2)
          .select("n_id", "sim", "rn")
          .as[(Long, Double, Long)].collect().toSet)
    }
    val (e1, s1) = state()
    assert(s1.exists(_._1 == 101L))
    // a foreachBatch replay re-delivers the SAME batchId: the append must
    // overwrite its own generation — same epoch, same rows, no duplicates
    Similarity.appendBatchToIvfIndex(shard, p, batchId = 0L)
    val (e2, s2) = state()
    assert(e1 == e2, s"replay must reuse the pinned epoch: $e1 -> $e2")
    assert(s1 == s2, s"replay changed the index: $s1 vs $s2")
    // 8 live vectors total (6 base + 2 shard), not 10
    assert(Similarity.ivfTopKFromIndex(p,
        Seq((999L, vec(1L))).toDF("vec_id", "embedding"),
        k = 20, nProbe = 2).count() == 8L)
    // compaction folds the batch generation back into ONE main table,
    // result-identically (the lifecycle contract)
    Similarity.compactIvfIndex(spark, p)
    val mC = graft.operators.MaintenanceIo.requireManifest(p)
    assert(!mC.tables.keys.exists(_.startsWith("assignments.")),
      s"compact must retire batch generations: ${mC.tables.keys}")
    assert(state()._2 == s1, "compaction changed query results")
    // guards: stream-append refuses quantized and graph-bearing indexes
    val pq = java.nio.file.Files.createTempDirectory("replay_pq").toString
    Similarity.buildQuantizedIndex(base, pq, nLists = 2)
    val eQ = intercept[IllegalArgumentException] {
      Similarity.appendBatchToIvfIndex(shard, pq, batchId = 0L)
    }
    assert(eQ.getMessage.contains("QUANTIZED"))
    val pg = java.nio.file.Files.createTempDirectory("replay_kg").toString
    Similarity.buildIvfIndex(base, pg, nLists = 2)
    Similarity.buildKnnGraph(spark, pg, k = 2, nProbe = 2)
    val eG = intercept[IllegalArgumentException] {
      Similarity.appendBatchToIvfIndex(shard, pg, batchId = 0L)
    }
    assert(eG.getMessage.contains("kNN graph"))
  }

  test("writeShards: export is identical under input repartitioning") {
    // the bit-reproducibility claim: shard membership, global positions,
    // and in-file order are pure functions of (ids, seed) — independent
    // of how the input happened to be partitioned
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    def export(d: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] = {
      val dir = java.nio.file.Files
        .createTempDirectory("shards").toString
      Sources.writeShards(d, "doc_id", dir, shards = 4, buckets = 32,
        seed = 23L)
      spark.read.parquet(dir)
        .select(col("shard").cast("long"), col("pos"), col("doc_id"))
        .as[(Long, Long, Long)].collect().toSeq.sorted
    }
    val a = export(docs)
    val b = export(docs.repartition(13))
    assert(a == b, "shard export must not depend on input partitioning")
    // shards are contiguous pos slices covering [0, n)
    val n = docs.count()
    assert(a.map(_._2).toSet == (0L until n).toSet)
    a.groupBy(_._1).foreach { case (_, rows) =>
      val ps = rows.map(_._2).sorted
      assert(ps.last - ps.head + 1 == ps.size, "shard must be contiguous")
    }
  }
}
