package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streams

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("windowedEventStats aggregates per event-time window") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val events = in.toDF.toDF("ts", "event_type", "value")
    val q = Streams.windowedEventStats(events, windowLen = "1 minute")
      .writeStream.format("memory").queryName("winstats")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts(10), "click", 1.0), (ts(20), "click", 2.0), (ts(70), "view", 5.0))
      q.processAllAvailable()
      // advance watermark far enough to close both windows
      in.addData((ts(600), "late", 0.0))
      q.processAllAvailable()
      val out = spark.table("winstats")
        .select($"window_start", $"event_type", $"n_events", $"sum_value")
        .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      assert(out.contains((0L, "click", 2L, 3.0)))
      assert(out.contains((60L, "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("dedupLinks drops duplicate urls within the watermark") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val links = in.toDF.toDF("ts", "se_link")
    val q = Streams.dedupLinks(links, delay = "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts(1), "u1"), (ts(2), "u1"), (ts(3), "u2"))
      q.processAllAvailable()
      in.addData((ts(4), "u1"), (ts(5), "u3"))
      q.processAllAvailable()
      val urls = spark.table("dedup").select("se_link").as[String].collect().toSeq
      assert(urls.sorted == Seq("u1", "u2", "u3"))
    } finally q.stop()
  }

  test("sessionize accumulates per-user state across micro-batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Streams.Event]
    val q = Streams.sessionize(in.toDS)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(Streams.Event(ts(1), 1L, "click", 1.0),
        Streams.Event(ts(2), 1L, "click", 2.0),
        Streams.Event(ts(3), 2L, "view", 5.0))
      q.processAllAvailable()
      in.addData(Streams.Event(ts(4), 1L, "buy", 4.0))
      q.processAllAvailable()
      val last = spark.table("sessions")
        .groupBy($"user_id").agg(max($"n_events").as("n"), max($"sum_value").as("s"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(last(1L) == ((3L, 7.0)))
      assert(last(2L) == ((1L, 5.0)))
    } finally q.stop()
  }

  test("emitClosedSessions closes a session per gap, keeps the tail open") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Streams.Event]
    val q = Streams.emitClosedSessions(in.toDS, gapMs = 60000L)
      .writeStream.format("memory").queryName("closed")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events, then a >1min gap, then one event → 1st session
      // closes (2 events); the post-gap event stays open in state
      in.addData(Streams.Event(ts(1), 1L, "click", 1.0),
        Streams.Event(ts(2), 1L, "click", 2.0),
        Streams.Event(ts(120), 1L, "view", 4.0))
      q.processAllAvailable()
      val afterGap = spark.table("closed").as[Streams.ClosedSession].collect()
      assert(afterGap.toSeq == Seq(Streams.ClosedSession(1L, 2L, 3.0, 2000L)))
      // a second gap in a later micro-batch closes the open tail
      in.addData(Streams.Event(ts(600), 1L, "click", 8.0))
      q.processAllAvailable()
      val all = spark.table("closed").as[Streams.ClosedSession].collect().toSet
      assert(all.contains(Streams.ClosedSession(1L, 1L, 4.0, 120000L)))
    } finally q.stop()
  }

  test("emitClosedSessions event-time timeout flushes an idle user's final session") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Streams.Event]
    val q = Streams.emitClosedSessions(
        in.toDS.withWatermark("ts", "0 seconds"), gapMs = 60000L,
        eventTimeTimeout = true)
      .writeStream.format("memory").queryName("closed_to")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Streams.Event(ts(1), 1L, "click", 1.0),
        Streams.Event(ts(2), 1L, "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("closed_to").isEmpty)
      // user 1 goes idle; other-user traffic advances the watermark past
      // lastTs+gap (watermark lags one micro-batch, hence two batches)
      in.addData(Streams.Event(ts(600), 2L, "view", 5.0))
      q.processAllAvailable()
      in.addData(Streams.Event(ts(610), 2L, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("closed_to").as[Streams.ClosedSession].collect().toSet
      assert(rows.contains(Streams.ClosedSession(1L, 2L, 3.0, 2000L)))
    } finally q.stop()
  }

  test("batch-over-stream: foreachBatch reuses the batch cleaner verbatim") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, String)]
    val stream = in.toDF.toDF("ts", "title", "description")
    val sink = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = Streams.dedupLinks(
        stream.withColumn("se_link", $"title"), delay = "1 minute")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        sink += graft.clean.Cleaner
          .clean(batch, Seq("title", "description")).count()
        ()
      }
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        (ts(1), "a good long headline here", "d" * 120),      // survives
        (ts(2), "javascript cookie junk!!", "d" * 120),       // blacklisted
        (ts(3), "tiny", "d" * 120))                           // too short
      q.processAllAvailable()
      assert(sink.sum == 1)
    } finally q.stop()
  }

  test("dropRepeatedPages filters pages with repeated content hash per engine") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, String)]
    val pages = in.toDF.toDF("ts", "engine", "page_html")
    val q = Streams.dropRepeatedPages(pages)
      .writeStream.format("memory").queryName("pages")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts(1), "g", "<p>a</p>"), (ts(2), "g", "<p>a</p>"),
        (ts(3), "g", "<p>b</p>"), (ts(4), "b", "<p>a</p>"))
      q.processAllAvailable()
      val n = spark.table("pages").count()
      assert(n == 3) // g:a, g:b, b:a — second g:a dropped
    } finally q.stop()
  }
}
