package graft

import org.apache.spark.sql.functions._

/** Structured Streaming path: the ingest stream over the events parquet
  * must agree with the equivalent batch computation (batch-equivalence is
  * the verification strategy — the DuckDB oracle is batch-only).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ingest (watermark + dedup + hourly counts) equals batch") {
    // file streaming source requires a directory; stage the parquet there
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val q = streaming.Streaming.ingestStream(spark, dir.toString, "stream_sink")
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_sink")
        .select($"window.start".as("win_start"), $"event_type", $"n")
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      val batch = Tables.events(spark, sf)
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select($"window.start".as("win_start"), $"event_type", $"n")
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream-stream interval join (watermarked both sides) equals batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ssj")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val q = streaming.Streaming.attributionStream(spark, dir.toString, "attr_sink")
    try {
      q.awaitTermination() // AvailableNow: drains the input, then stops
      val streamed = spark.table("attr_sink")
        .select($"c_user", $"c_ts", $"p_ts", $"p_value")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Double)]
        .collect().sorted
      val ev = Tables.events(spark, sf)
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id".as("c_user"), $"ts".as("c_ts"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"value".as("p_value"))
      val batch = clicks.join(purchases,
          expr("c_user = p_user AND p_ts > c_ts AND p_ts <= c_ts + INTERVAL 1 HOUR"))
        .select($"c_user", $"c_ts", $"p_ts", $"p_value")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Double)]
        .collect().sorted
      assert(streamed.nonEmpty && (streamed sameElements batch))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join: orphan clicks emit NULLs only after the watermark passes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_outer")
    def ts(t: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $t")
    def write(chunk: Int,
              rows: Seq[(Long, java.sql.Timestamp, Long, String, Double,
                         String)]): Unit = {
      val tmp = dir.resolve(s"tmp$chunk")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(tmp.toString)
      val st = java.nio.file.Files.list(tmp)
      val part =
        try st.filter(_.toString.endsWith(".parquet")).findFirst.get
        finally st.close()
      java.nio.file.Files.move(part, dir.resolve(f"chunk$chunk%03d.parquet"))
    }
    // chunk 1: u1 click->purchase (in-window match), u2 click that
    // never converts. Watermark after this batch = min-side max - 1h
    // = 09:05, far before u2's window closes (11:05) — the orphan's
    // NULL row must be HELD BACK: emitting it now would be wrong (a
    // u2 purchase could still arrive at, say, 10:50).
    write(1, Seq(
      (1L, ts("10:00:00"), 1L, "click", 0.0, "{}"),
      (2L, ts("10:30:00"), 1L, "purchase", 5.0, "{}"),
      (3L, ts("10:05:00"), 2L, "click", 0.0, "{}")))
    val q = streaming.Streaming.attributionOuterStream(
      spark, dir.toString, "outer_sink")
    try {
      q.processAllAvailable()
      val early = spark.table("outer_sink")
        .select($"c_user", $"p_ts").collect()
      assert(early.map(_.getLong(0)).toSeq === Seq(1L),
        s"expected only the matched pair early, got ${early.toSeq}")
      assert(!early.exists(_.isNullAt(1)),
        "orphan NULL row emitted before the watermark closed its window")
      // chunk 2: a far-future non-matching pair on BOTH sides pushes
      // the watermark to 19:00 — u2's window is now provably closed,
      // so its click must come out with NULL purchase columns; u9's
      // own window (ends 21:00) is still open, so u9 stays held.
      write(2, Seq(
        (10L, ts("20:00:00"), 9L, "click", 0.0, "{}"),
        (11L, ts("20:00:00"), 9L, "purchase", 1.0, "{}")))
      q.processAllAvailable()
      val streamed = spark.table("outer_sink")
        .filter($"c_user" =!= 9L)
        .select($"c_user", $"c_ts", $"p_ts", $"p_value")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1),
          Option(r.getTimestamp(2)), Option(r.get(3))))
        .sortBy(t => (t._1, t._2.getTime))
      assert(streamed.exists(r => r._1 == 2L && r._3.isEmpty),
        "never-matched click u2 did not surface with NULLs")
      assert(!spark.table("outer_sink").filter($"c_user" === 9L)
          .collect().exists(_ => true),
        "u9's still-open window leaked an early NULL row")
      // full equality with the batch LEFT join over the same events
      val ev = Seq(
        (1L, ts("10:00:00"), 1L, "click", 0.0),
        (2L, ts("10:30:00"), 1L, "purchase", 5.0),
        (3L, ts("10:05:00"), 2L, "click", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id".as("c_user"), $"ts".as("c_ts"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id".as("p_user"), $"ts".as("p_ts"),
                $"value".as("p_value"))
      val batch = clicks.join(purchases,
          expr("c_user = p_user AND p_ts > c_ts AND p_ts <= c_ts + INTERVAL 1 HOUR"),
          "left_outer")
        .select($"c_user", $"c_ts", $"p_ts", $"p_value")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1),
          Option(r.getTimestamp(2)), Option(r.get(3))))
        .sortBy(t => (t._1, t._2.getTime))
      assert(streamed.toSeq === batch.toSeq,
        "streamed outer join diverged from the batch left join")
    } finally q.stop()
  }

  test("session_window end = last event + gap (streaming construct, batch run)") {
    val out = streaming.Streaming.queries("q42_session_window")(spark, sf)
    val bad = out.filter($"sess_end" < $"sess_start" + expr("INTERVAL 30 MINUTES"))
    assert(bad.count() === 0)
  }

  test("RocksDB state store: same results as the default store (scale path)") {
    // at 100 TB the state store must spill off-heap — RocksDB is the
    // provider for that; results must not depend on the store backend
    val dir = java.nio.file.Files.createTempDirectory("graft_rocks")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = streaming.Streaming.ingestStream(spark, dir.toString, "rocks_sink")
      try {
        q.processAllAvailable()
        val streamed = spark.table("rocks_sink")
          .select($"window.start".as("ws"), $"event_type", $"n")
          .as[(java.sql.Timestamp, String, Long)].collect().toSet
        val batch = Tables.events(spark, sf)
          .groupBy(window($"ts", "1 hour"), $"event_type")
          .agg(count(lit(1)).as("n"))
          .select($"window.start".as("ws"), $"event_type", $"n")
          .as[(java.sql.Timestamp, String, Long)].collect().toSet
        assert(streamed === batch)
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("dropDuplicatesWithinWatermark: dups suppressed, state evicted after horizon") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val deduped = input.toDS().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.format("memory").queryName("ddww_sink")
      .outputMode("append").start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00")),
                    (1L, ts("2024-01-01 10:01:00")), // dup within watermark
                    (2L, ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      assert(spark.table("ddww_sink").count() === 2) // one per id
      // 3 hours later the watermark has LONG passed id 1's expiry — its
      // dedup state was evicted, so the key may legitimately re-emit
      // (bounded state: the store holds only the watermark horizon)
      input.addData((1L, ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      input.addData((1L, ts("2024-01-01 13:00:30"))) // dup in NEW horizon
      q.processAllAvailable()
      val ids = spark.table("ddww_sink").as[(Long, java.sql.Timestamp)]
        .collect().toSeq.sorted
      assert(ids.count(_._1 == 1L) === 2, s"expected re-emission after eviction: $ids")
      assert(ids.count(_._1 == 2L) === 1)
    } finally q.stop()
  }

  test("w09 streaming twin: per-batch plan shrinks monotonically and matches the batch planner") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_w09s").toString
    val slots = weather.WeatherPipeline.backfillSlots(spark)
      .select($"location_id", $"ts").as[(Long, java.sql.Timestamp)].collect()
    val others = slots.filter(_._1 != 1L).toSeq          // locations 0 and 2
    val loc1 = slots.filter(_._1 == 1L).sortBy(_._2.getTime)
    val (h1, h2full) = loc1.splitAt(loc1.length / 2)
    val h2 = h2full.dropRight(5).toSeq // leave 5 trailing holes open
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val q = weather.WeatherPipeline.backfillStream(
      input.toDS().toDF("location_id", "ts"),
      s"$dir/sink", s"$dir/plan", s"$dir/ckpt")
    try {
      input.addData(others: _*); q.processAllAvailable()
      input.addData(h1.toSeq: _*); q.processAllAvailable()
      input.addData(h2: _*); q.processAllAvailable()
    } finally q.stop()
    val plans = spark.read.parquet(s"$dir/plan")
    val totals = plans.groupBy($"batch_id")
      .agg(sum($"n_slots").as("miss")).orderBy($"batch_id")
      .as[(Long, Long)].collect()
    // batch 0 filled locations 0/2 entirely -> location 1's whole week
    // (672 slots) is the plan; batch 1 closes the first half; batch 2
    // all but 5 — STRICTLY shrinking, never zero here
    assert(totals.map(_._1).toSeq === Seq(0L, 1L, 2L), s"got $totals")
    assert(totals.map(_._2).toSeq === Seq(672L, 672L - h1.length, 5L))
    // batch equivalence: the last snapshot must be EXACTLY what the
    // batch planner computes over the final sink state
    val finalSink = spark.read.parquet(s"$dir/sink")
    val batchPlan = weather.WeatherPipeline.coalesceRanges(
      weather.WeatherPipeline.backfillSlots(spark)
        .join(finalSink, Seq("location_id", "ts"), "left_anti"))
      .collect().toSeq
    val streamPlan = plans.filter($"batch_id" === 2L)
      .select($"location_id", $"range_start", $"range_end", $"n_slots")
      .orderBy($"location_id", $"range_start").collect().toSeq
    assert(streamPlan === batchPlan, "stream plan diverged from batch planner")
    assert(streamPlan.size === 1 && streamPlan.head.getLong(3) === 5L)
    // sink appends are idempotent: replaying a batch's rows inserts zero
    val before = finalSink.count()
    weather.WeatherPipeline.upsertNew(
      h1.toSeq.toDF("location_id", "ts"), finalSink, Seq("location_id", "ts"))
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(s"$dir/sink")
    assert(spark.read.parquet(s"$dir/sink").count() === before)
  }

  test("micro-batch wire error fails the trigger; restart re-reads exactly once") {
    // the micro-batch path goes through the SAME wire framing as the batch
    // scan: an in-stream error magic must fail the trigger BEFORE its
    // offset commits, and a restarted query must re-read the range with no
    // gaps and no duplicates (the FileStreamSink manifest excludes the
    // failed trigger's orphan files)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_wire_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_wire_out").toString
    def startQ() = spark.readStream.format("graft.sources.WeatherGridSource")
      .option("start", "2024-01-01 00:00:00")
      .option("end", "2024-01-02 00:00:00")
      .option("locations", 1)
      .option("maxSlotsPerTrigger", 48)
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()
    sources.WeatherGridSource.streamWireErrors.set(1)
    val q1 = startQ()
    val e = intercept[Exception] { q1.processAllAvailable() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("Unexpected weather API error")),
      s"server error message lost: ${e.getMessage}")
    q1.stop()
    val q2 = startQ()
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(out)
      assert(got.count() === 96, "1 day of 15-min slots, exactly once")
      assert(got.select($"ts").distinct().count() === 96)
    } finally q2.stop()
  }

  test("event-time sessionizer: sessions emit on watermark expiry, state drops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import streaming.Sessionizer
    import streaming.Sessionizer.Ev
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val sessions = Sessionizer.sessionizeStream(
      input.toDS().withWatermark("ts", "10 minutes").as[Ev])
    val q = sessions.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      // one session for user 1; nothing may emit while the watermark is
      // still behind its close time
      input.addData(Ev(1L, ts("2024-01-01 10:00:00"), 1.0),
                    Ev(1L, ts("2024-01-01 10:10:00"), 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_stream").count() === 0,
        "open session emitted before watermark expiry")
      // a later event (user 2) pushes the watermark to 12:50, past user
      // 1's close (10:40) -> user 1's session emits via timeout; user 2's
      // stays open
      input.addData(Ev(2L, ts("2024-01-01 13:00:00"), 5.0))
      q.processAllAvailable()
      val emitted = spark.table("sess_stream")
        .as[Sessionizer.Session].collect()
      assert(emitted.map(_.user_id).toSeq === Seq(1L))
      assert(emitted.head.start === ts("2024-01-01 10:00:00"))
      assert(emitted.head.end === ts("2024-01-01 10:40:00")) // last + 30 min gap
      assert(emitted.head.n === 2 && emitted.head.total === 3.0)
      // push the watermark past user 2's close as well -> its session
      // emits too, proving the timed-out key was the only state left
      input.addData(Ev(3L, ts("2024-01-01 16:00:00"), 7.0))
      q.processAllAvailable()
      val all = spark.table("sess_stream").as[Sessionizer.Session].collect()
      assert(all.map(_.user_id).sorted.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("streaming text-cleaning gate: the t09 chain streams unchanged") {
    // the LLM-pipeline gates are map-only + one aggregate, so the SAME
    // function behind t09 runs under readStream — micro-batched corpus
    // ingest produces the batch report bit-for-bit
    val dir = java.nio.file.Files.createTempDirectory("graft_docs_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val q = datapipe.TextAnalysis.cleanPipeline(stream)
      .writeStream.format("memory").queryName("t09_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("t09_stream")
        .select($"lang", $"n_docs", $"n_q_fail", $"n_len_fail", $"n_kept")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val batch = datapipe.TextAnalysis
        .queries("t09_clean_pipeline")(spark, sf)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming classifier inference: the t23 transform streams unchanged") {
    // model-based scoring is THE curation stage most often deployed as a
    // stream (score docs as they arrive); the same classifierScore
    // function runs under readStream — broadcast static model joined to
    // a streaming side, keyed aggregate under complete mode — and the
    // micro-batched scores equal the batch registry entry bit-for-bit
    val dir = java.nio.file.Files.createTempDirectory("graft_docs_clf")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val q = datapipe.TextAnalysis.classifierScore(stream)
      .writeStream.format("memory").queryName("t23_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("t23_stream")
        .as[(Long, Long, Double, String)].collect().toSet
      val batch = datapipe.TextAnalysis
        .queries("t23_classifier_score")(spark, sf)
        .as[(Long, Long, Double, String)].collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streamed domain cap: revisable quota equals batch selection; evictions occur") {
    // the per-source cap as a streaming quota: hash-rank selection is a
    // pure function of the doc SET, so the persisted top-cap state must
    // converge to the batch answer for any batch split — and a later
    // lower-hash arrival must EVICT an earlier admission, the semantics
    // a first-come quota cannot have without over-admitting
    val root = java.nio.file.Files.createTempDirectory("graft_cap")
    val inDir = root.resolve("in"); java.nio.file.Files.createDirectories(inDir)
    val docs = Tables.documents(spark, sf)
    val rows = docs.orderBy($"doc_id").collect()
    val third = (rows.length + 2) / 3
    rows.grouped(third).zipWithIndex.foreach { case (chunk, i) =>
      val tmp = root.resolve(s"tmp$i")
      spark.createDataFrame(
          spark.sparkContext.parallelize(chunk.toSeq, 1), docs.schema)
        .write.parquet(tmp.toString)
      val part = {
        val st = java.nio.file.Files.list(tmp)
        try st.filter(_.toString.endsWith(".parquet")).findFirst.get
        finally st.close()
      }
      val dst = inDir.resolve(f"chunk$i%03d.parquet")
      java.nio.file.Files.move(part, dst)
      dst.toFile.setLastModified(60000L * (i + 1))
    }
    val cap = 10 // < docs per source at this sf, so the quota BINDS
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
    val q = datapipe.TextAnalysis.domainCapStream(
      stream, s"$root/store", s"$root/ckpt", cap)
    try q.processAllAvailable() finally q.stop()
    val streamed = datapipe.TextAnalysis.domainCapReport(spark, s"$root/store")
      .as[(String, Long, Long, Long)].collect().toSet
    val keep = datapipe.TextAnalysis.domainCapKeep(
      docs.select($"doc_id", $"source"), cap).select($"doc_id", $"rn")
    val batch = docs.join(keep, Seq("doc_id"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_kept"), sum(length($"text")).as("sum_chars"),
           max($"rn").cast("long").as("max_rank"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(streamed === batch && streamed.nonEmpty)
    assert(streamed.forall(_._2 === cap.toLong), "cap never bound")
    val firstChunk = rows.take(third).map(_.getLong(0)).toSet
    val provisional = datapipe.TextAnalysis.domainCapKeep(
        docs.filter($"doc_id".isin(firstChunk.toSeq: _*))
          .select($"doc_id", $"source"), cap)
      .select($"doc_id").as[Long].collect().toSet
    val finalIds = spark.read.parquet(s"$root/store/state")
      .select($"doc_id").as[Long].collect().toSet
    assert((provisional -- finalIds).nonEmpty,
      "no eviction across triggers — revisable-cap semantics untested")
  }

  test("streamed rollup maintenance: every state version equals the prefix rollup; final equals q86") {
    // the mergeable-state law makes the maintained view a pure function
    // of the fact SET, not the batch split — so each persisted version
    // must equal the one-shot rollup of its prefix, and the final
    // version must equal q86's batch answer exactly
    val root = java.nio.file.Files.createTempDirectory("graft_rollup")
    val inDir = root.resolve("in"); java.nio.file.Files.createDirectories(inDir)
    val orders = Tables.orders(spark, sf)
    // arrival ordered by CUSTKEY: low keys arrive only early (the
    // carry branch), high keys only late (insert), boundary keys span
    // chunks (combine) — all three merge branches provably exercised
    val rows = orders.orderBy($"o_custkey", $"o_orderkey").collect()
    val third = (rows.length + 2) / 3
    rows.grouped(third).zipWithIndex.foreach { case (chunk, i) =>
      val tmp = root.resolve(s"tmp$i")
      spark.createDataFrame(
          spark.sparkContext.parallelize(chunk.toSeq, 1), orders.schema)
        .write.parquet(tmp.toString)
      val part = {
        val st = java.nio.file.Files.list(tmp)
        try st.filter(_.toString.endsWith(".parquet")).findFirst.get
        finally st.close()
      }
      val dst = inDir.resolve(f"chunk$i%03d.parquet")
      java.nio.file.Files.move(part, dst)
      dst.toFile.setLastModified(60000L * (i + 1))
    }
    val stream = spark.readStream.schema(orders.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
    val q = operators.Extras.rollupMaintenanceStream(
      stream, s"$root/store", s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame)
        : Seq[(Long, Long, Double, Double, Double, java.sql.Timestamp)] =
      df.select($"o_custkey", $"n_orders", $"sum_price", $"min_price",
          $"max_price", $"last_order")
        .as[(Long, Long, Double, Double, Double, java.sql.Timestamp)]
        .collect().toSeq.sortBy(_._1)
    // final version == q86's one-shot batch rollup
    val streamed = canon(operators.Extras.rollupReport(spark, s"$root/store"))
    val batch = canon(operators.Extras.queries("q86_incremental_rollup")(spark, sf))
    assert(streamed === batch && streamed.nonEmpty)
    // EVERY intermediate version is the exact rollup of its prefix —
    // the invariant that makes replay (recompute version N from N-1)
    // idempotent
    (0 until 3).foreach { v =>
      val prefixKeys = rows.take(third * (v + 1)).map(_.getLong(0)).toSet
      val expect = operators.Extras.rollupState(
          orders.filter($"o_orderkey".isin(prefixKeys.toSeq: _*)))
        .select($"o_custkey", $"n_orders",
          $"sum_price_dec".cast("double").as("sum_price"),
          $"min_price", $"max_price", $"last_order")
      val got = spark.read.parquet(s"$root/store/state/batch=$v")
        .select($"o_custkey", $"n_orders",
          $"sum_price_dec".cast("double").as("sum_price"),
          $"min_price", $"max_price", $"last_order")
      assert(canon(got) === canon(expect), s"version $v != prefix rollup")
    }
    // all three merge branches exercised by the split: keys confined to
    // the first chunk (carry), keys new in a later chunk (insert), and
    // keys spanning chunks (combine)
    val c0 = rows.take(third).map(_.getLong(1)).toSet
    val later = rows.drop(third).map(_.getLong(1)).toSet
    assert((c0 -- later).nonEmpty, "no carry-only key")
    assert((later -- c0).nonEmpty, "no insert-only key")
    assert((c0 & later).nonEmpty, "no combined key")
  }

  test("streamed CDC merge: final state equals the batch three-clause merge; replay is idempotent") {
    val root = java.nio.file.Files.createTempDirectory("graft_merge")
    val inDir = root.resolve("in"); java.nio.file.Files.createDirectories(inDir)
    operators.Extras.mergeSeed(
      operators.Extras.mergeTarget(spark, sf), s"$root/store")
    // q100's exact change feed, arrival-split into 3 micro-batches by
    // key % 3 — every clause (update/delete/insert) lands in several
    // different triggers
    val feed = operators.Extras.mergeFeed(spark, sf)
    (0 until 3).foreach { i =>
      val tmp = root.resolve(s"tmp$i")
      feed.filter($"key" % 3 === i).coalesce(1).write.parquet(tmp.toString)
      val part = {
        val st = java.nio.file.Files.list(tmp)
        try st.filter(_.toString.endsWith(".parquet")).findFirst.get
        finally st.close()
      }
      val dst = inDir.resolve(f"chunk$i%03d.parquet")
      java.nio.file.Files.move(part, dst)
      dst.toFile.setLastModified(60000L * (i + 1))
    }
    val stream = spark.readStream.schema(feed.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
    val q = operators.Extras.mergeApplyStream(
      stream, s"$root/store", s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()
    // the split must not matter: streamed final state == batch q100
    val streamed = operators.Extras.mergeState(spark, s"$root/store")
      .as[(Long, Double)].collect().toSeq
    val batch = operators.Extras.queries("q100_merge_into")(spark, sf)
      .select($"key", $"bal").as[(Long, Double)].collect().toSeq
    assert(streamed === batch && streamed.nonEmpty)
    // at-least-once replay: re-running the LAST trigger's batchId with
    // the same delta must rewrite version 2 to the same state
    val lastChunk = spark.read.parquet(inDir.resolve("chunk002.parquet").toString)
    operators.Extras.mergeApplyBatch(lastChunk, 2L, s"$root/store")
    val replayed = operators.Extras.mergeState(spark, s"$root/store")
      .as[(Long, Double)].collect().toSeq
    assert(replayed === streamed, "replayed trigger changed the state")
    // a version ABOVE the replayed batchId is a stale generation
    val e = intercept[IllegalArgumentException] {
      operators.Extras.mergeApplyBatch(lastChunk, 1L, s"$root/store")
    }
    assert(e.getMessage.contains("stale generation"))
    // deletes processed in an EARLY trigger stay deleted at the end
    val deletedKeys = feed.filter($"action" === "delete" && $"key" % 3 === 0)
      .select($"key").as[Long].collect()
    assert(deletedKeys.nonEmpty, "no early-trigger delete — clause untested")
    deletedKeys.foreach(k =>
      assert(!streamed.exists(_._1 == k), s"deleted key $k resurfaced"))
  }

  test("CDC merge with event sequence: sequential apply — a delete-then-reinsert batch keeps the reinsert") {
    // the round-16 advice case: a real CDC feed can land delete and
    // reinsert for one key in ONE micro-batch; the seq-less delete-wins
    // collapse would drop the reinsert. With a `seq` column the
    // collapse must be the sequential apply: a delete RESETS the key,
    // later upserts restart the balance from their own sum.
    val root = java.nio.file.Files.createTempDirectory("graft_merge_seq")
    val target = Seq((1L, 10.0), (3L, 10.0)).toDF("key", "bal")
    operators.Extras.mergeSeed(target, s"$root/store")
    val batch = Seq(
      // key 1 (exists, bal 10): upsert +5, delete, reinsert 7 -> 7
      (1L, 5.0, "upsert", 1L), (1L, 0.0, "delete", 2L),
      (1L, 7.0, "upsert", 3L),
      // key 2 (new): upsert then delete -> absent
      (2L, 5.0, "upsert", 1L), (2L, 0.0, "delete", 2L),
      // key 3 (exists, bal 10): delete then reinsert 4 -> 4, NOT 14
      (3L, 0.0, "delete", 1L), (3L, 4.0, "upsert", 2L),
      // key 4 (new): two upserts accumulate -> 5
      (4L, 2.0, "upsert", 1L), (4L, 3.0, "upsert", 2L)
    ).toDF("key", "amt", "action", "seq")
    operators.Extras.mergeApplyBatch(batch, 0L, s"$root/store")
    val st = operators.Extras.mergeState(spark, s"$root/store")
      .as[(Long, Double)].collect().toMap
    assert(st === Map(1L -> 7.0, 3L -> 4.0, 4L -> 5.0), s"got $st")
    // the seq-LESS path on the same events is the documented
    // delete-wins contract: every deleted-at-any-point key stays out
    val root2 = java.nio.file.Files.createTempDirectory("graft_merge_seq2")
    operators.Extras.mergeSeed(target, s"$root2/store")
    operators.Extras.mergeApplyBatch(batch.drop("seq"), 0L, s"$root2/store")
    val st2 = operators.Extras.mergeState(spark, s"$root2/store")
      .as[(Long, Double)].collect().toMap
    assert(st2 === Map(4L -> 5.0), s"got $st2")
  }

  test("general streamed clause ladder: final state equals batch q114; replay idempotent; seq collapse keeps a delete-then-reinsert") {
    // round-19 verdict #2: batch (q114) and persisted merges take
    // arbitrary Merge.MergeClause ladders, but the streamed apply
    // hard-coded q100's arbitration — a streaming consumer of a
    // q114-style ladder had no path. mergeApplyStreamClauses threads
    // the caller's ladder (and an optional last-event-per-key seq
    // collapse) through the same versioned-overwrite trigger loop.
    import graft.operators.Merge
    val root = java.nio.file.Files.createTempDirectory("graft_merge_gen")
    val inDir = root.resolve("in")
    java.nio.file.Files.createDirectories(inDir)
    operators.Extras.mergeSeed(
      operators.Extras.mergeTarget(spark, sf), s"$root/store")
    // q114's exact feed, arrival-split into 2 micro-batches by key
    // parity — each key's whole event history lands in ONE trigger,
    // so the split must not change the ladder's outcome
    val feed = operators.Extras.mergeFeed(spark, sf)
    (0 until 2).foreach { i =>
      val tmp = root.resolve(s"tmp$i")
      feed.filter($"key" % 2 === i).coalesce(1).write.parquet(tmp.toString)
      val part = {
        val st = java.nio.file.Files.list(tmp)
        try st.filter(_.toString.endsWith(".parquet")).findFirst.get
        finally st.close()
      }
      val dst = inDir.resolve(f"chunk$i%03d.parquet")
      java.nio.file.Files.move(part, dst)
      dst.toFile.setLastModified(60000L * (i + 1))
    }
    val stream = spark.readStream.schema(feed.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
    val (m114, nm114) = operators.Extras.q114Ladder
    val q = operators.Extras.mergeApplyStreamClauses(
      stream, s"$root/store", s"$root/ckpt", m114, nm114)
    try q.processAllAvailable() finally q.stop()
    val streamed = operators.Extras.mergeStateClauses(spark, s"$root/store")
      .select($"key", $"bal").as[(Long, Double)].collect().toSeq
    val batch = operators.Extras.queries("q114_merge_clauses")(spark, sf)
      .select($"key", $"bal").as[(Long, Double)].collect().toSeq
    assert(streamed === batch && streamed.nonEmpty,
      "streamed general ladder diverged from batch q114")
    // at-least-once replay: the LAST trigger's batchId re-applies to
    // the same state
    val lastChunk = spark.read.parquet(
      inDir.resolve("chunk001.parquet").toString)
    operators.Extras.mergeApplyBatchClauses(lastChunk, 1L, s"$root/store",
      m114, nm114)
    val replayed = operators.Extras.mergeStateClauses(spark, s"$root/store")
      .select($"key", $"bal").as[(Long, Double)].collect().toSeq
    assert(replayed === streamed, "replayed trigger changed the state")
    val e = intercept[IllegalArgumentException] {
      operators.Extras.mergeApplyBatchClauses(lastChunk, 0L,
        s"$root/store", m114, nm114)
    }
    assert(e.getMessage.contains("stale generation"))
    // seqCol: the general STATE-CARRYING convention — last event per
    // key wins, so a delete-then-reinsert micro-batch keeps the
    // reinsert (q100's delta-summing collapse is the other, summing
    // convention and stays with its specialized entry point)
    val root2 = java.nio.file.Files.createTempDirectory("graft_merge_gen2")
    operators.Extras.mergeSeed(
      Seq((1L, 10.0), (3L, 10.0)).toDF("key", "bal"), s"$root2/store")
    val upsertM = Seq(
      Merge.delete("del", $"action" === "delete"),
      Merge.update("set", lit(true), "bal" -> $"amt"))
    val upsertNm = Seq(
      Merge.insert("ins", $"action" =!= "delete", "bal" -> $"amt"))
    val events = Seq(
      // key 1 (exists): upsert 5, delete, reinsert 7 -> 7
      (1L, 5.0, "upsert", 1L), (1L, 0.0, "delete", 2L),
      (1L, 7.0, "upsert", 3L),
      // key 2 (new): upsert then delete -> absent
      (2L, 5.0, "upsert", 1L), (2L, 0.0, "delete", 2L),
      // key 3 (exists): delete then reinsert 4 -> 4
      (3L, 0.0, "delete", 1L), (3L, 4.0, "upsert", 2L),
      // key 4 (new): two upserts, last state wins -> 3
      (4L, 2.0, "upsert", 1L), (4L, 3.0, "upsert", 2L)
    ).toDF("key", "amt", "action", "seq")
    operators.Extras.mergeApplyBatchClauses(events, 0L, s"$root2/store",
      upsertM, upsertNm, seqCol = Some("seq"))
    val st = operators.Extras.mergeStateClauses(spark, s"$root2/store")
      .select($"key", $"bal").as[(Long, Double)].collect().toMap
    assert(st === Map(1L -> 7.0, 3L -> 4.0, 4L -> 3.0), s"got $st")
  }

  test("streamed vocabulary growth: totals equal t37's quartile-4 row; per-batch attribution exact") {
    // first-seen is a pure function of arrival ORDER, so the streamed
    // store must reproduce the batch totals for any split AND charge
    // each type to exactly the batch where it first arrived
    val root = java.nio.file.Files.createTempDirectory("graft_vocab")
    val inDir = root.resolve("in"); java.nio.file.Files.createDirectories(inDir)
    val docs = Tables.documents(spark, sf)
    val rows = docs.orderBy($"doc_id").collect()
    val third = (rows.length + 2) / 3
    rows.grouped(third).zipWithIndex.foreach { case (chunk, i) =>
      val tmp = root.resolve(s"tmp$i")
      spark.createDataFrame(
          spark.sparkContext.parallelize(chunk.toSeq, 1), docs.schema)
        .write.parquet(tmp.toString)
      val part = {
        val st = java.nio.file.Files.list(tmp)
        try st.filter(_.toString.endsWith(".parquet")).findFirst.get
        finally st.close()
      }
      val dst = inDir.resolve(f"chunk$i%03d.parquet")
      java.nio.file.Files.move(part, dst)
      dst.toFile.setLastModified(60000L * (i + 1))
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
    val q = datapipe.TextAnalysis.vocabGrowthStream(
      stream, s"$root/store", s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()
    val streamed = datapipe.TextAnalysis
      .vocabGrowthReport(spark, s"$root/store")
      .as[(String, Long, Long, Long)].collect().toSet
    // batch truth: t37's quartile-4 row IS the whole-source total
    val batch = datapipe.TextAnalysis.queries("t37_vocab_growth")(spark, sf)
      .filter($"quartile" === 4)
      .select($"source", $"cum_tokens", $"cum_types")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(streamed.nonEmpty && streamed.size === batch.size)
    streamed.foreach { case (src, tok, typ, _) =>
      assert((tok, typ) === ((batch(src)._2, batch(src)._3)), s"src=$src")
    }
    // per-batch attribution: every word's first_batch equals the index
    // of the arrival chunk that first contained it (raw-text recompute)
    val firstOf = scala.collection.mutable.Map.empty[(String, String), Long]
    rows.grouped(third).zipWithIndex.foreach { case (chunk, i) =>
      chunk.foreach { r =>
        val src = r.getString(r.fieldIndex("source"))
        r.getString(r.fieldIndex("text")).split(" ").filter(_.nonEmpty)
          .foreach { w =>
            if (!firstOf.contains((src, w))) firstOf((src, w)) = i.toLong
          }
      }
    }
    def ph(x: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    }
    val expect = firstOf.map { case ((src, w), b) => (src, ph(w)) -> b }
    val store = spark.read.parquet(s"$root/store/words")
      .select($"source", $"wh", $"first_batch")
      .as[(String, Long, Long)].collect()
    assert(store.length === expect.size, "store row count != distinct types")
    store.foreach { case (src, wh, fb) =>
      assert(expect((src, wh)) === fb, s"src=$src wh=$wh")
    }
    // the split must actually exercise later-batch novelty somewhere,
    // or the anti-join is untested
    assert(store.exists(_._3 > 0), "all types arrived in batch 0 — vacuous")
  }

  test("streamed decontamination gate: decisions equal d12 batch, clean appends idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_d12s").toString
    // EXACTLY the corpus d12's batch oracle checks: bench + train with
    // the planted leaks, streamed in two micro-batches, the second
    // replaying part of the first (a retry/overlap) — the gate must
    // decide identically and never append a clean doc twice
    val (bench, train) = datapipe.Dedup.contaminationCorpus(spark, sf)
    val rows = train.as[(Long, String)].collect().sortBy(_._1)
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(Long, String)]
    val q = datapipe.Dedup.decontaminationStream(
      input.toDS().toDF("doc_id", "text"), bench,
      s"$dir/clean", s"$dir/dec", s"$dir/ckpt")
    try {
      input.addData(b1.toSeq: _*); q.processAllAvailable()
      input.addData((b2 ++ b1.take(20)).toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val dec = spark.read.parquet(s"$dir/dec")
    // batch ids 0 and 1; the replayed 20 docs decided twice, identically
    assert(dec.select($"batch_id").distinct().as[Long].collect().toSet
      === Set(0L, 1L))
    assert(dec.groupBy($"doc_id")
      .agg(countDistinct(struct($"n_hits", $"status")).as("variants"))
      .filter($"variants" > 1).isEmpty)
    // streamed contaminated decisions == the d12 batch registry output
    val streamed = dec.filter($"status" === "contaminated")
      .select($"doc_id", $"n_hits").distinct()
      .as[(Long, Long)].collect().toSet
    val batch = datapipe.Dedup.queries("d12_decontaminate")(spark, sf)
      .as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // clean sink: every train doc not contaminated, each EXACTLY once
    // despite the replayed rows
    val clean = spark.read.parquet(s"$dir/clean")
    assert(clean.count() === clean.select($"doc_id").distinct().count())
    val cleanIds = clean.select($"doc_id").as[Long].collect().toSet
    val trainIds = rows.map(_._1).toSet
    assert(cleanIds === trainIds -- batch.map(_._1))
    // decisions cover every streamed doc exactly (clean + contaminated)
    assert(dec.select($"doc_id").distinct().count() === trainIds.size)
  }

  test("streamed fuzzy decontamination: decisions equal d40 batch, clean appends idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_d40s").toString
    // EXACTLY d40's corpus (bench + paraphrase plants), streamed in two
    // micro-batches with the second replaying part of the first — the
    // fuzzy gate must decide identically and never append a clean doc
    // twice
    val (bench, train) = datapipe.Dedup.fuzzyContaminationCorpus(spark, sf)
    val rows = train.as[(Long, String)].collect().sortBy(_._1)
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(Long, String)]
    val q = datapipe.Dedup.fuzzyDecontaminationStream(
      input.toDS().toDF("doc_id", "text"), bench,
      s"$dir/clean", s"$dir/dec", s"$dir/ckpt")
    try {
      input.addData(b1.toSeq: _*); q.processAllAvailable()
      input.addData((b2 ++ b1.take(20)).toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val dec = spark.read.parquet(s"$dir/dec")
    assert(dec.select($"batch_id").distinct().as[Long].collect().toSet
      === Set(0L, 1L))
    // the replayed docs decided twice, identically (same best match,
    // same jaccard bits — the gate is a pure function of the doc)
    assert(dec.groupBy($"doc_id")
      .agg(countDistinct(struct($"bench_id", $"jaccard", $"status"))
        .as("variants"))
      .filter($"variants" > 1).isEmpty)
    // streamed contaminated decisions == the d40 batch registry output
    val streamed = dec.filter($"status" === "contaminated")
      .select($"doc_id", $"bench_id", $"jaccard").distinct()
      .as[(Long, Long, Double)].collect().toSet
    val batch = datapipe.Dedup.queries("d40_fuzzy_decontaminate")(spark, sf)
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // every plant was quarantined before reaching the clean sink
    val plantIds = rows.map(_._1).filter(_ >= datapipe.Dedup.D40_OFFSET)
    assert(plantIds.nonEmpty)
    val cleanIds = spark.read.parquet(s"$dir/clean")
      .select($"doc_id").as[Long].collect().toSet
    plantIds.foreach(id =>
      assert(!cleanIds(id), s"plant $id reached the clean sink"))
    // clean sink: every unflagged train doc exactly once despite replay
    val clean = spark.read.parquet(s"$dir/clean")
    assert(clean.count() === clean.select($"doc_id").distinct().count())
    assert(cleanIds === rows.map(_._1).toSet -- batch.map(_._1))
    assert(dec.select($"doc_id").distinct().count() === rows.length)
  }

  test("streamed index ingestion: frozen-centroid adds match the store, replays insert zero") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_vidxs").toString
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val seed = emb.filter($"vec_id" % 3 =!= 0)
    datapipe.VectorIndex.buildIndex(seed, dir)
    val nSeed = spark.read.parquet(s"$dir/assign").count()
    val rows = emb.filter($"vec_id" % 3 === 0)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(Long, Array[Float])]
    val q = datapipe.VectorIndex.indexStream(
      input.toDS().toDF("vec_id", "embedding"),
      dir, s"$dir/dec", s"$dir/ckpt")
    try {
      input.addData(b1.toSeq: _*); q.processAllAvailable()
      // second trigger replays 10 of the first batch's vectors —
      // an overlap/retry; the anti-join must insert zero for them
      input.addData((b2 ++ b1.take(10)).toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val assign = spark.read.parquet(s"$dir/assign")
    assert(assign.count() === nSeed + rows.length,
      "replayed vectors were re-inserted")
    assert(assign.select($"vec_id").distinct().count() === nSeed + rows.length)
    // every per-batch decision equals what the store recorded — the
    // stream IS addBatch, batch by batch
    val dec = spark.read.parquet(s"$dir/dec")
    assert(dec.select($"batch_id").distinct().as[Long].collect().toSet
      === Set(0L, 1L))
    val diverged = dec.select($"vec_id", $"cell")
      .join(assign.select($"vec_id", $"cell".as("stored")), Seq("vec_id"))
      .filter($"cell" =!= $"stored")
    assert(diverged.isEmpty)
    assert(dec.select($"vec_id").distinct().count() === rows.length)
  }

  test("streamed perceptual asset dedup (persistent hash store) equals m05's batch report") {
    val root = java.nio.file.Files.createTempDirectory("graft_m05s")
    val inDir = root.resolve("in")
    java.nio.file.Files.createDirectories(inDir)
    // m05's corpus (base + %11 byte-identical copies at +10000), staged
    // as three ascending-id files so arrival order = id order (first-
    // seen-wins = min-id canonical) and the planted copies land in a
    // LATER batch than their sources — cross-batch store state is the
    // thing under test
    val base = datapipe.Multimodal.imageAssets(spark, sf)
    val corpus = base.union(
      base.filter(_._1 % 11 == 0).map { case (id, p) => (id + 10000L, p) })
      .toDF("asset_id", "payload")
    val rows = corpus.orderBy($"asset_id").collect()
    val third = (rows.length + 2) / 3
    rows.grouped(third).zipWithIndex.foreach { case (chunk, i) =>
      val tmp = root.resolve(s"tmp$i")
      spark.createDataFrame(
          spark.sparkContext.parallelize(chunk.toSeq, 1), corpus.schema)
        .write.parquet(tmp.toString)
      val part = {
        val st = java.nio.file.Files.list(tmp)
        try st.filter(_.toString.endsWith(".parquet")).findFirst.get
        finally st.close()
      }
      val dst = inDir.resolve(f"chunk$i%03d.parquet")
      java.nio.file.Files.move(part, dst)
      dst.toFile.setLastModified(60000L * (i + 1))
    }
    val stream = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
    val q = datapipe.Multimodal.assetDedupStream(stream,
      s"$root/store", s"$root/decisions", s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()
    val decisions = spark.read.parquet(s"$root/decisions")
    assert(decisions.select($"batch_id").distinct().count() === 3)
    // at least one duplicate must be decided in a LATER batch than its
    // canonical's unique decision — otherwise the store never carried
    // state across a trigger and the test is vacuous
    val later = decisions.as("d").filter($"d.status" === "duplicate")
      .join(decisions.as("u").filter($"u.status" === "unique"),
        $"d.canonical_id" === $"u.asset_id" && $"d.batch_id" > $"u.batch_id")
    assert(later.count() > 0, "no cross-batch duplicate — state not exercised")
    val streamed = decisions
      .groupBy($"canonical_id", $"width", $"height", $"ahash")
      .agg(count(lit(1)).as("n_copies"))
      .filter($"n_copies" > 1)
      .select($"canonical_id", $"width", $"height", $"ahash", $"n_copies")
      .as[(Long, Int, Int, Long, Long)].collect().toSet
    val batch = datapipe.Multimodal.queries("m05_image_phash_dedup")(spark, sf)
      .as[(Long, Int, Int, Long, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("streamed line dedup: report equals batch t40; df revises across batches; replay inserts zero") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_t40s").toString
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect().sortBy(_._1)
    val third = (docs.length + 2) / 3
    val chunks = docs.grouped(third).toSeq
    val input = MemoryStream[(Long, String, String)]
    val q = datapipe.TextAnalysis.lineDedupStream(
      input.toDS().toDF("doc_id", "source", "text"),
      s"$root/store", s"$root/ckpt")
    try {
      chunks.take(2).foreach { c =>
        input.addData(c.toSeq); q.processAllAvailable() }
      // simulate a failed trigger that PARTIALLY committed one doc of
      // chunk 2 — only its first inventory row landed. The retry must
      // complete the doc: a doc_id-granular anti-join would skip it
      // and permanently lose its remaining lines (round-14 advice);
      // the (doc_id, li) key admits exactly the missing rows.
      val c2df = spark.createDataFrame(
          spark.sparkContext.parallelize(chunks(2).toSeq, 1))
        .toDF("doc_id", "source", "text")
      val inv2 = datapipe.TextAnalysis.lineInventory(c2df)
      val victim = inv2.groupBy($"doc_id").agg(count(lit(1)).as("n"))
        .filter($"n" >= 2).orderBy($"doc_id").as[(Long, Long)].head()._1
      inv2.filter($"doc_id" === victim && $"li" === 0)
        .write.mode("append").parquet(s"$root/store/lines")
      input.addData(chunks(2).toSeq)
      q.processAllAvailable()
      val victimRows = spark.read.parquet(s"$root/store/lines")
        .filter($"doc_id" === victim)
      assert(victimRows.count() ===
        inv2.filter($"doc_id" === victim).count(),
        "partial commit not completed — doc-granular skip lost lines")
      assert(victimRows.groupBy($"li").count()
        .filter($"count" > 1).count() === 0,
        "retry double-inserted the partially committed row")
      // replay a whole chunk (retried trigger / duplicate feed): the
      // anti-join must admit zero new rows
      val before = spark.read.parquet(s"$root/store/lines").count()
      input.addData(chunks(1).toSeq)
      q.processAllAvailable()
      val after = spark.read.parquet(s"$root/store/lines").count()
      assert(before === after, "replay inserted rows")
    } finally q.stop()
    val streamed = datapipe.TextAnalysis.lineDedupReport(spark, s"$root/store")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val batch = datapipe.TextAnalysis.queries("t40_line_dedup")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(streamed === batch)
    // the split must actually REVISE a verdict: some line present in
    // chunk 0 sits under DF_MIN on chunk-0 docs alone but is
    // boilerplate on the full corpus — the case frozen-at-admission
    // verdicts would get wrong
    val c0 = spark.createDataFrame(
      spark.sparkContext.parallelize(chunks(0).toSeq, 1))
      .toDF("doc_id", "source", "text")
    val inv0 = datapipe.TextAnalysis.lineInventory(c0)
    val df0 = datapipe.TextAnalysis.lineDf(inv0)
      .as[(Long, Long)].collect().toMap
    val invAll = datapipe.TextAnalysis.lineInventory(
      Tables.documents(spark, sf).select($"doc_id", $"source", $"text"))
    val dfAll = datapipe.TextAnalysis.lineDf(invAll)
      .as[(Long, Long)].collect().toMap
    assert(df0.exists { case (fp, d0) =>
      d0 < datapipe.TextAnalysis.LineDfMin &&
      dfAll(fp) >= datapipe.TextAnalysis.LineDfMin },
      "no cross-batch df crossing — the revision path is untested")
  }

  test("streamed heavy hitters: every state version replays the MG chain; the guarantee holds") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_t07s").toString
    val K = 8
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect().sortBy(_._1)
    val third = (docs.length + 2) / 3
    val chunks = docs.grouped(third).toSeq
    val input = MemoryStream[(Long, String, String)]
    val q = datapipe.TextAnalysis.heavyHittersStream(
      input.toDS().toDF("doc_id", "lang", "text"),
      s"$root/store", s"$root/ckpt", K)
    // plain-Scala replay of the deterministic TWO-LEVEL MG chain:
    // level 1 reduces each (lang, crc32-bucket) slice of the batch to
    // its own MG(K) summary; level 2 merges the slice summaries into
    // the persisted state (mirrors mgLocalReduce + mgMerge exactly)
    var state = Map.empty[String, Map[String, Long]]
    var subFired = false
    def mgReduce(rows: Seq[(String, Long)]): Seq[(String, Long)] = {
      val summed = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      val ranked = summed.sortBy { case (w, c) => (-c, w) }
      val sub = ranked.drop(K).headOption.map(_._2).getOrElse(0L)
      if (sub > 0) subFired = true
      ranked.take(K).map { case (w, c) => w -> (c - sub) }
        .filter(_._2 > 0)
    }
    def bucket(w: String): Int = {
      val c = new java.util.zip.CRC32
      c.update(w.getBytes("UTF-8"))
      (c.getValue % datapipe.TextAnalysis.MgBuckets).toInt
    }
    def mgStep(chunk: Seq[(Long, String, String)]): Unit = {
      val delta = chunk.filter(_._2 != null)
        .flatMap { case (_, l, t) => t.split(" ", -1).map(w => (l, w)) }
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val langs = state.keySet ++ delta.keys.map(_._1)
      state = langs.map { l =>
        val exact = delta.collect { case ((`l`, w), c) => w -> c }.toSeq
        val level1 = exact.groupBy { case (w, _) => bucket(w) }
          .toSeq.flatMap { case (_, slice) => mgReduce(slice) }
        l -> mgReduce(state.getOrElse(l, Map.empty).toSeq ++ level1).toMap
      }.toMap
    }
    try {
      chunks.zipWithIndex.foreach { case (c, i) =>
        input.addData(c.toSeq); q.processAllAvailable()
        mgStep(c.toSeq)
        val stored = spark.read.parquet(s"$root/store/sketch/batch=$i")
          .as[(String, String, Long)].collect()
          .groupBy(_._1).view
          .mapValues(_.map(r => r._2 -> r._3).toMap).toMap
        assert(stored === state, s"state version $i diverged from the MG chain")
      }
    } finally q.stop()
    // the maintenance was genuinely lossy (k < vocab) — otherwise the
    // sketch is an exact count table and the test proves nothing
    assert(subFired, "no merge ever subtracted — k exceeds the vocabulary")
    // the mergeable-summaries guarantee against the raw corpus: every
    // item with true count > N/(k+1) is in the final sketch
    val exact = docs.filter(_._2 != null)
      .flatMap { case (_, l, t) => t.split(" ", -1).map(w => (l, w)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val totals = exact.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val report = datapipe.TextAnalysis
      .heavyHittersReport(spark, s"$root/store")
      .as[(String, Long, Seq[String], Long)].collect()
      .map(r => r._1 -> r).toMap
    totals.foreach { case (l, n) =>
      assert(report(l)._2 === n, s"$l token total")
      val heavy = exact.collect {
        case ((`l`, w), c) if c * (K + 1) > n => w }
      val items = report(l)._3.toSet
      heavy.foreach(w => assert(items(w), s"guaranteed item '$w' missing in $l"))
      assert(report(l)._4 <= K, s"$l sketch exceeded k")
    }
    // at least one language has more vocabulary than k, so survival is
    // a real selection
    assert(exact.keys.groupBy(_._1).exists(_._2.size > K))
  }

  test("streamed index lifecycle: add/delete/compact replay equals the batch report; revival and permanence hold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_idxlc").toString
    val (sPath, bPath) = (s"$root/stream_idx", s"$root/batch_idx")
    val seed = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").filter($"vec_id" % 3 =!= 0)
    datapipe.VectorIndex.buildIndex(seed, sPath)
    datapipe.VectorIndex.buildIndex(seed, bPath)
    val arrivals = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").filter($"vec_id" % 3 === 0)
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    val third = (arrivals.length + 2) / 3
    val Seq(c1, c2, c3) = arrivals.grouped(third).toSeq
    // deletes in batch 2: half of batch-1's ids plus one SEED id (the
    // takedown of an original corpus member); a subset revives in
    // batch 3 AFTER the compact, the rest must stay dead through it
    val delStream = c1.map(_._1).filter(_ % 2 == 0)
    val seedDel = seed.orderBy($"vec_id").limit(1)
      .as[(Long, Seq[Float])].head()._1
    val dels = delStream :+ seedDel
    val reviveIds = delStream.take(2).toSet
    val revive = c1.filter(r => reviveIds(r._1))
    assert(revive.nonEmpty, "fixture too small to exercise revival")
    def adds(rows: Seq[(Long, Seq[Float])]) =
      rows.map { case (id, e) => ("add", id, e) }
    val input = MemoryStream[(String, Long, Seq[Float])]
    val q = datapipe.VectorIndex.lifecycleStream(
      input.toDS().toDF("op", "vec_id", "embedding"),
      sPath, s"$root/ckpt")
    try {
      input.addData(adds(c1.toSeq)); q.processAllAvailable()
      input.addData(adds(c2.toSeq) ++
        dels.map(id => ("delete", id, Seq.empty[Float])))
      q.processAllAvailable()
      // duplicate feed (retried trigger): both frames admit zero rows
      val na0 = spark.read.parquet(s"$sPath/assign").count()
      val nt0 = spark.read.parquet(s"$sPath/tombstones").count()
      input.addData(adds(c2.toSeq) ++
        dels.map(id => ("delete", id, Seq.empty[Float])))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$sPath/assign").count() === na0,
        "replay inserted assign rows")
      assert(spark.read.parquet(s"$sPath/tombstones").count() === nt0,
        "replay inserted tombstones")
      // compact between triggers — the operator action that folds
      // tombstones and re-opens the door for revival
      datapipe.VectorIndex.compact(spark, sPath)
      assert(!graft.weather.WeatherIngest.sinkExists(spark,
        s"$sPath/tombstones"), "compact left the tombstone frame")
      input.addData(adds(c3.toSeq ++ revive.toSeq))
      q.processAllAvailable()
    } finally q.stop()
    // the batch reference: same operation sequence through the batch API
    def df(rows: Seq[(Long, Seq[Float])]) =
      spark.createDataset(rows).toDF("vec_id", "embedding")
    datapipe.VectorIndex.addBatch(df(c1.toSeq), bPath)
    datapipe.VectorIndex.addBatch(df(c2.toSeq), bPath)
    datapipe.VectorIndex.removeBatch(
      spark.createDataset(dels.toSeq).toDF("vec_id"), bPath)
    datapipe.VectorIndex.compact(spark, bPath)
    datapipe.VectorIndex.addBatch(df(c3.toSeq ++ revive.toSeq), bPath)
    val streamed = datapipe.VectorIndex.liveAssign(spark, sPath)
      .as[(Long, Long)].collect().toSet
    val batch = datapipe.VectorIndex.liveAssign(spark, bPath)
      .as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    val liveIds = streamed.map(_._1)
    reviveIds.foreach(id =>
      assert(liveIds(id), s"revived id $id missing from live view"))
    (dels.toSet -- reviveIds).foreach(id =>
      assert(!liveIds(id), s"deleted id $id leaked back into live view"))
  }

  test("maintenance replay: re-running the last batchId rewrites its own version; true stale generation fails loud") {
    // the at-least-once contract (round-15 advice): a crash after the
    // state parquet write but before the checkpoint commit re-runs the
    // SAME batchId — the trigger must deterministically overwrite its
    // own version from N-1 + the same delta, never fail, never fork.
    // Only a version STRICTLY ABOVE batchId (fresh checkpoint over an
    // old store) is a stale generation and must fail loud.
    val root = java.nio.file.Files.createTempDirectory("graft_replay").toString
    val orders = Tables.orders(spark, sf)
    val rows = orders.orderBy($"o_orderkey").collect()
    val half = (rows.length + 1) / 2
    def chunkDf(chunk: Seq[org.apache.spark.sql.Row]) =
      spark.createDataFrame(spark.sparkContext.parallelize(chunk, 1), orders.schema)
    def canonState(path: String) =
      spark.read.parquet(path)
        .select($"o_custkey", $"n_orders",
          $"sum_price_dec".cast("double"), $"min_price", $"max_price", $"last_order")
        .as[(Long, Long, Double, Double, Double, java.sql.Timestamp)]
        .collect().toSeq.sortBy(_._1)
    val store = s"$root/rollup"
    operators.Extras.rollupMaintainBatch(chunkDf(rows.take(half).toSeq), 0, store)
    operators.Extras.rollupMaintainBatch(chunkDf(rows.drop(half).toSeq), 1, store)
    val committed = canonState(s"$store/state/batch=1")
    // replay of the latest batch: finds batch=1 already present, must
    // rewrite it from batch=0 + the same delta — identical state
    operators.Extras.rollupMaintainBatch(chunkDf(rows.drop(half).toSeq), 1, store)
    assert(canonState(s"$store/state/batch=1") === committed,
      "replayed batch diverged from its first run")
    // and the replayed chain still equals the one-shot batch rollup
    val batchQ = operators.Extras.queries("q86_incremental_rollup")(spark, sf)
      .select($"o_custkey", $"n_orders", $"sum_price", $"min_price",
        $"max_price", $"last_order")
      .as[(Long, Long, Double, Double, Double, java.sql.Timestamp)]
      .collect().toSeq.sortBy(_._1)
    val reported = operators.Extras.rollupReport(spark, store)
      .as[(Long, Long, Double, Double, Double, java.sql.Timestamp)]
      .collect().toSeq.sortBy(_._1)
    assert(reported === batchQ)
    // fresh checkpoint over the old store: batchId resets to 0 while
    // version 1 lingers — a forked chain, must fail loud
    val ex = intercept[IllegalArgumentException] {
      operators.Extras.rollupMaintainBatch(chunkDf(rows.take(half).toSeq), 0, store)
    }
    assert(ex.getMessage.contains("stale generation"))

    // same contract on the heavy-hitter maintenance
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect().sortBy(_._1)
    val dHalf = (docs.length + 1) / 2
    def docDf(chunk: Seq[(Long, String, String)]) =
      spark.createDataset(chunk).toDF("doc_id", "lang", "text")
    val hhStore = s"$root/hh"
    val K = 8
    datapipe.TextAnalysis.heavyHittersMaintainBatch(docDf(docs.take(dHalf).toSeq), 0, hhStore, K)
    datapipe.TextAnalysis.heavyHittersMaintainBatch(docDf(docs.drop(dHalf).toSeq), 1, hhStore, K)
    def canonHh(v: Long) = (
      spark.read.parquet(s"$hhStore/sketch/batch=$v")
        .as[(String, String, Long)].collect().toSet,
      spark.read.parquet(s"$hhStore/nwords/batch=$v")
        .as[(String, Long)].collect().toSet)
    val hhCommitted = canonHh(1)
    datapipe.TextAnalysis.heavyHittersMaintainBatch(docDf(docs.drop(dHalf).toSeq), 1, hhStore, K)
    assert(canonHh(1) === hhCommitted,
      "replayed heavy-hitter batch diverged from its first run")
    val hhEx = intercept[IllegalArgumentException] {
      datapipe.TextAnalysis.heavyHittersMaintainBatch(docDf(docs.take(dHalf).toSeq), 0, hhStore, K)
    }
    assert(hhEx.getMessage.contains("stale generation"))
    // report before any commit: clear refusal, not an opaque empty.max
    val emptyEx = intercept[IllegalArgumentException] {
      datapipe.TextAnalysis.heavyHittersReport(spark, s"$root/nothing_here")
    }
    assert(emptyEx.getMessage.contains("no committed heavy-hitter state"))
  }

  test("change feed source: streamed tail equals batch read, one version per batch, O(delta) planning, resume") {
    import graft.sources.{ChangeFeed, SnapshotLog}
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft_cdf")
    val dir = root.resolve("table").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    def frame(ks: Seq[Long]) = ks.map(k => (k, k * 10.0)).toDF("k", "x")
    SnapshotLog.appendVersion(frame(Seq(1L, 2L)).coalesce(1), dir)   // v1
    SnapshotLog.appendVersion(frame(Seq(3L)).coalesce(1), dir)       // v2
    SnapshotLog.compactVersion(spark, dir)                           // v3
    SnapshotLog.appendVersion(frame(Seq(4L, 5L)).coalesce(1), dir)   // v4
    // O(delta) planning unit: an append version plans exactly its
    // added files; a rewrite version plans NOTHING (dataChange=false)
    assert(ChangeFeed.addedDataFiles(dir, 2).size === 1)
    assert(ChangeFeed.addedDataFiles(dir, 3).isEmpty,
      "compaction must feed zero files")
    // batch read decodes rows with their version tags
    def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.select($"_change_version", $"k", $"x")
        .as[(Long, Long, Double)].collect().toSet
    val batch = canon(ChangeFeed.readBatch(spark, dir, fromVersion = 0))
    assert(batch === Set((1L, 1L, 10.0), (1L, 2L, 20.0), (2L, 3L, 30.0),
      (4L, 4L, 40.0), (4L, 5L, 50.0)), s"batch feed: $batch")
    // column pruning survives the parquet-layer projection
    val pruned = ChangeFeed.readBatch(spark, dir, fromVersion = 0)
      .groupBy($"_change_version").count()
      .as[(Long, Long)].collect().toMap
    assert(pruned === Map(1L -> 2L, 2L -> 1L, 4L -> 2L))
    // streamed tail: AvailableNow drains to the head, ONE VERSION PER
    // BATCH (admission control), then stops. foreachBatch sink — the
    // deployment shape AND the only local sink that supports
    // checkpoint recovery for the resume leg below.
    val ckpt = s"$root/ckpt"
    def drain(): Seq[(Long, Set[(Long, Long, Double)])] = {
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[
        (Long, (Long, Long, Double))]()
      val q = ChangeFeed.readStream(spark, dir, fromVersion = 0)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          b.select(col("_change_version"), col("k"), col("x")).collect()
            .foreach(r => buf.add(
              (id, (r.getLong(0), r.getLong(1), r.getDouble(2)))))
          ()
        }.start()
      try q.awaitTermination() finally q.stop()
      import scala.jdk.CollectionConverters._
      buf.asScala.toSeq.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (id, rs) => id -> rs.map(_._2).toSet }
    }
    val batches = drain()
    assert(batches.flatMap(_._2).toSet === batch,
      "streamed feed diverged from the batch read")
    // one committed VERSION per micro-batch, in commit order
    assert(batches.map(_._2.map(_._1)).forall(_.size == 1),
      s"a micro-batch mixed versions: $batches")
    assert(batches.map(_._2.head._1) === Seq(1L, 2L, 4L),
      s"version-per-batch order: $batches")
    // RESUME: a new commit after the drain; the same checkpoint picks
    // up ONLY the new version (the offset log is the cursor)
    SnapshotLog.appendVersion(frame(Seq(9L)).coalesce(1), dir)       // v5
    val batches2 = drain()
    assert(batches2.flatMap(_._2).toSet === Set((5L, 9L, 90.0)),
      s"resume re-emitted already-consumed versions: $batches2")
    // and the streamed feed concatenated over versions equals the
    // q104-style batch statement on the same store: per-version
    // aggregates agree (the registry q111 pin, restated locally)
    val perVersion = batches.flatMap(_._2) ++ batches2.flatMap(_._2)
    val agg = perVersion.groupBy(_._1).view
      .mapValues(rs => (rs.size, rs.map(_._3).sum)).toMap
    assert(agg === Map(1L -> ((2, 30.0)), 2L -> ((1, 30.0)),
      4L -> ((2, 90.0)), 5L -> ((1, 90.0))))
  }

  test("end-to-end CDC: the change feed replicates one store into another exactly-once") {
    // the full 100 TB replication loop, assembled from the pieces each
    // spec pins alone: ChangeFeed tails the PRIMARY's snapshot log
    // (one committed version per micro-batch, O(delta) files read) and
    // foreachBatch applies each batch into a REPLICA store through the
    // exactly-once streamed-append path (the batchId rides the
    // replica's manifest claim, so a replayed trigger no-ops) — a
    // second table stays row-identical to the primary without ever
    // scanning it. SCOPE here: an APPEND-ONLY primary (+ compactions,
    // which move bytes not rows and feed nothing) applied through the
    // exactly-once streamed-append path; the DML surface (deletes,
    // merges — explicit change files since r19) is replicated by the
    // next spec through a keyed apply.
    import graft.sources.{ChangeFeed, SnapshotLog}
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft_cdcrep")
    val primary = root.resolve("primary").toString
    val replica = root.resolve("replica").toString
    Seq(primary, replica).foreach(d =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))
    def frame(ks: Seq[Long]) = ks.map(k => (k, k * 10.0)).toDF("k", "x")
    SnapshotLog.appendVersion(frame(Seq(1L, 2L)).coalesce(1), primary)
    SnapshotLog.appendVersion(frame(Seq(3L, 4L)).coalesce(1), primary)
    SnapshotLog.compactVersion(spark, primary) // rewrite: no feed rows
    def replicate(): Unit = {
      val q = ChangeFeed.readStream(spark, primary, fromVersion = 0)
        .writeStream.option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          val rows = b.drop("_change_version", "_change_type", "_change_timestamp")
          if (!rows.isEmpty)
            SnapshotLog.appendVersionForBatch(rows.coalesce(1), replica, id)
          ()
        }.start()
      try q.awaitTermination() finally q.stop()
    }
    replicate()
    def keys(dir: String): Set[Long] =
      SnapshotLog.readVersion(spark, dir, SnapshotLog.latestVersion(dir))
        .select($"k").as[Long].collect().toSet
    assert(keys(replica) === Set(1L, 2L, 3L, 4L))
    val replicaVersions = SnapshotLog.versions(replica).size
    // primary advances; the same checkpoint ships ONLY the delta
    SnapshotLog.appendVersion(frame(Seq(9L)).coalesce(1), primary)
    replicate()
    assert(keys(replica) === Set(1L, 2L, 3L, 4L, 9L))
    assert(SnapshotLog.versions(replica).size === replicaVersions + 1,
      "catch-up run must append exactly the one new version")
    // trigger replay (crash between the replica's manifest commit and
    // the checkpoint commit): the same batchId no-ops on the replica
    val last = ChangeFeed.readBatch(spark, primary, fromVersion = 0)
      .filter($"_change_version" === SnapshotLog.latestVersion(primary))
      .drop("_change_version", "_change_type", "_change_timestamp")
    val before = keys(replica)
    // micro-batch ids are 0-based over the primary's change versions,
    // so the batch that shipped primary vN carried id N-1
    SnapshotLog.appendVersionForBatch(last.coalesce(1), replica,
      SnapshotLog.latestVersion(primary).toLong - 1)
    assert(keys(replica) === before &&
      SnapshotLog.versions(replica).size === replicaVersions + 1,
      "replayed CDC batch re-appended rows into the replica")
  }

  test("end-to-end CDC over DML: deletes and merges replicate through the feed; replica equals primary at head") {
    // the round-18 gap closed: a COW delete, a MoR delete, and a MERGE
    // each write explicit row-level change files at commit time, the
    // feed emits them one version per micro-batch, and a keyed apply
    // (remove delete/update_preimage keys, add insert/update_postimage
    // rows) keeps a replica row-identical to the primary through the
    // FULL DML surface — the replication a byte-level rewrite feed
    // cannot do. Replica state is batch-keyed deterministic overwrite
    // (the mergeApplyBatch discipline), so a replayed trigger rewrites
    // its own version identically: exactly-once end to end.
    import graft.sources.{ChangeFeed, SnapshotLog}
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft_cdcdml")
    val primary = root.resolve("primary").toString
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(primary))
    def frame(ks: Seq[Long]) = ks.map(k => (k, k * 10.0)).toDF("k", "x")
    SnapshotLog.appendVersion(frame(Seq(1L, 2L, 3L)).coalesce(1), primary) // v1
    SnapshotLog.appendVersion(frame(Seq(4L, 5L, 6L)).coalesce(1), primary) // v2
    SnapshotLog.deleteWhere(spark, primary, "k", 2L, 2L)                   // v3
    SnapshotLog.deleteWhereMoR(spark, primary, "k", 5L, 5L)                // v4
    SnapshotLog.mergeInto(spark, primary,
      Seq((3L, 7.0, "upsert"), (4L, 0.0, "delete"), (9L, 90.0, "upsert"))
        .toDF("key", "amt", "action"), "k", "x")                           // v5
    val stateDir = root.resolve("state").toString
    // seed (batch = -1, below every real trigger): the empty table
    frame(Seq.empty).write.parquet(s"$stateDir/batch=-1")
    def applyCdc(b: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      val vs = new java.io.File(stateDir).listFiles.toSeq
        .map(_.getName).filter(_.startsWith("batch="))
        .map(_.stripPrefix("batch=").toLong)
      require(!vs.exists(_ > id), "stale generation")
      val prev = spark.read.parquet(
        s"$stateDir/batch=${vs.filter(_ < id).max}")
      val dels = b.filter(
          $"_change_type".isin("delete", "update_preimage"))
        .select($"k")
      val adds = b.filter(
          $"_change_type".isin("insert", "update_postimage"))
        .select($"k", $"x")
      prev.join(dels, Seq("k"), "left_anti").unionByName(adds)
        .write.mode("overwrite").parquet(s"$stateDir/batch=$id")
    }
    def replicate(): Unit = {
      val q = ChangeFeed.readStream(spark, primary, fromVersion = 0)
        .writeStream.option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          applyCdc(b, id); ()
        }.start()
      try q.awaitTermination() finally q.stop()
    }
    replicate()
    def state(): Set[(Long, Double)] = {
      val last = new java.io.File(stateDir).listFiles.toSeq
        .map(_.getName).filter(_.startsWith("batch="))
        .map(_.stripPrefix("batch=").toLong).max
      spark.read.parquet(s"$stateDir/batch=$last")
        .as[(Long, Double)].collect().toSet
    }
    def primaryHead(): Set[(Long, Double)] =
      SnapshotLog.readVersion(spark, primary,
          SnapshotLog.latestVersion(primary))
        .select($"k", $"x").as[(Long, Double)].collect().toSet
    assert(state() === Set((1L, 10.0), (3L, 37.0), (6L, 60.0), (9L, 90.0)))
    assert(state() === primaryHead(),
      "replica diverged from the primary through DML")
    // replayed trigger (crash before checkpoint commit): deterministic
    // overwrite of its own state version — byte-identical state
    val lastBatch = ChangeFeed.readBatch(spark, primary, fromVersion = 4)
    applyCdc(lastBatch, 4L)
    assert(state() === primaryHead(), "replayed DML batch diverged")
    // the primary keeps moving: append + another delete; same
    // checkpoint ships only the delta
    SnapshotLog.appendVersion(frame(Seq(20L, 21L)).coalesce(1), primary) // v6
    SnapshotLog.deleteWhere(spark, primary, "k", 21L, 21L)               // v7
    replicate()
    assert(state() === primaryHead(),
      "catch-up through append + delete diverged")
    // and a ROLLBACK: the CDC restore states its file-diff deletes +
    // inserts, so the same keyed apply converges the replica onto the
    // restored snapshot — the feed is total over row-changing ops
    SnapshotLog.restoreVersion(spark, primary, 5)                        // v8
    replicate()
    assert(state() === primaryHead(),
      "restore did not replicate through the feed")
  }
}
