package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streaming
import graft.streaming.Streaming.Evt

/** Structured Streaming semantics through MemoryStream: tumbling
  * windows close when the watermark passes, streaming dedup drops
  * repeats, sessionization assembles gap-separated sessions.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  test("windowed metrics: appended windows close as watermark advances") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Evt]
    val q = Streaming.windowedMetrics(in.toDF(), watermark = "1 minutes")
      .writeStream.format("memory").queryName("wm")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Evt(1, ts(0, 10), 1, "click", 1.50),
        Evt(2, ts(1, 20), 1, "click", 2.25),
        Evt(3, ts(6, 0), 2, "view", 4.00)) // advances watermark past window 0
      q.processAllAvailable()
      in.addData(Evt(4, ts(20, 0), 2, "view", 1.00)) // closes window 5-10
      q.processAllAvailable()
      val rows = spark.table("wm")
        .select("w_start", "event_type", "n_events", "value_sum")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .sortBy(_._1.getTime)
      assert(rows.length == 2)
      assert(rows(0) == (ts(0), "click", 2L, 3.75))
      assert(rows(1) == (ts(5), "view", 1L, 4.0))
    } finally q.stop()
  }

  test("streaming dedup drops repeated event ids") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Evt]
    val q = Streaming.dedupStream(in.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dd")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Evt(1, ts(0), 1, "click", 1.0),
        Evt(1, ts(0), 1, "click", 1.0), // dup in same batch
        Evt(2, ts(1), 1, "view", 2.0))
      q.processAllAvailable()
      in.addData(Evt(1, ts(0, 30), 1, "click", 1.0)) // dup across batches
      q.processAllAvailable()
      assert(spark.table("dd").count() == 2)
    } finally q.stop()
  }

  test("sessionize closes sessions on event-time gaps") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Evt]
    val events = in.toDF().withWatermark("ts", "0 seconds").as[Evt]
    val q = Streaming.sessionize(events, gapMs = 120000L) // 2-min gap
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Evt(1, ts(0), 1, "click", 1.0),
        Evt(2, ts(1), 1, "click", 1.0), // same session (1-min gap)
        Evt(3, ts(10), 1, "click", 1.0)) // new session after 9-min gap
      q.processAllAvailable()
      in.addData(Evt(9, ts(30), 9, "click", 1.0)) // watermark → times out open state
      q.processAllAvailable()
      in.addData(Evt(10, ts(59), 9, "click", 1.0))
      q.processAllAvailable()
      val sessions = spark.table("sess").as[Streaming.Session]
        .collect().filter(_.user_id == 1L).sortBy(_.start.getTime)
      assert(sessions.length == 2)
      assert(sessions(0).n_events == 2 && sessions(0).start == ts(0) && sessions(0).end == ts(1))
      assert(sessions(1).n_events == 1 && sessions(1).start == ts(10))
    } finally q.stop()
  }
}
