package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamWindows
import graft.streaming.StreamWindows.SessionEvent

/** Streaming window + stateful-session semantics over MemoryStream sources:
  * watermark-driven late-data drop and gap-based session closure.
  */
class StreamWindowsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling window with watermark drops data later than the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamWindows.tumblingCounts(
      input.toDF().toDF("ts", "event_type", "value"), "ts", "event_type",
      width = "10 minutes", watermark = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (ts("2025-01-26 10:01:00"), "click", 1.0),
        (ts("2025-01-26 10:04:00"), "click", 2.0))
      q.processAllAvailable()
      // advance watermark way past the 10:00 window
      input.addData((ts("2025-01-26 11:00:00"), "view", 1.0))
      q.processAllAvailable()
      // this event is older than watermark (11:00 - 5min) → dropped
      input.addData((ts("2025-01-26 10:02:00"), "click", 99.0))
      q.processAllAvailable()
      input.addData((ts("2025-01-26 12:00:00"), "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .select("window_start", "event_type", "cnt", "sum_v")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(rows.contains((ts("2025-01-26 10:00:00"), "click", 2L, 3.0)),
        s"late row must NOT be counted; got $rows")
    } finally q.stop()
  }

  test("sessionize: gap closes sessions; events within gap extend them") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val sessions = StreamWindows.sessionize(input.toDS(), gapMs = 60000L)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: three events 20s apart = one session
      input.addData(
        SessionEvent(1L, ts("2025-01-26 10:00:00"), "click"),
        SessionEvent(1L, ts("2025-01-26 10:00:20"), "click"),
        SessionEvent(1L, ts("2025-01-26 10:00:40"), "view"))
      q.processAllAvailable()
      // user 1 again after a 10-minute gap: closes session inline
      input.addData(SessionEvent(1L, ts("2025-01-26 10:10:00"), "click"))
      q.processAllAvailable()
      // push the watermark far ahead so the open session times out
      input.addData(SessionEvent(2L, ts("2025-01-26 11:00:00"), "click"))
      q.processAllAvailable()
      input.addData(SessionEvent(2L, ts("2025-01-26 12:00:00"), "click"))
      q.processAllAvailable()

      val out = spark.table("sessions")
        .as[StreamWindows.SessionSummary].collect()
        .filter(_.user_id == 1L).sortBy(_.session_start.getTime)
      assert(out.length >= 1)
      assert(out.head.n_events === 3L)
      assert(out.head.session_start === ts("2025-01-26 10:00:00"))
      assert(out.head.session_end === ts("2025-01-26 10:00:40"))
    } finally q.stop()
  }
}
