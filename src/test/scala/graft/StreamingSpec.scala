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

  test("session_window end = last event + gap (streaming construct, batch run)") {
    val out = streaming.Streaming.queries("q42_session_window")(spark, sf)
    val bad = out.filter($"sess_end" < $"sess_start" + expr("INTERVAL 30 MINUTES"))
    assert(bad.count() === 0)
  }
}
