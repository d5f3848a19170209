package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamCorrelate

/** Time-bounded stream-stream left-outer correlation: matches inside the
  * gap window; unmatched requests emit null-response rows once the
  * watermark closes their window.
  */
class StreamCorrelateSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stream-stream join correlates within the gap and emits orphans after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val reqs = MemoryStream[(String, Timestamp, String)]
    val resps = MemoryStream[(String, Timestamp, Int)]
    val joined = StreamCorrelate.correlate(
      reqs.toDF().toDF("transaction_id", "req_ts", "app_id"),
      resps.toDF().toDF("transaction_id", "resp_ts", "status_code"),
      gap = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("correlated")
      .outputMode(OutputMode.Append).start()
    try {
      reqs.addData(
        ("txn-1", ts("2025-01-26 10:00:00"), "app-a"),
        ("txn-2", ts("2025-01-26 10:01:00"), "app-b"))
      resps.addData(("txn-1", ts("2025-01-26 10:05:00"), 200))
      q.processAllAvailable()
      // push both watermarks far past txn-2's join window
      reqs.addData(("txn-9", ts("2025-01-26 12:00:00"), "app-z"))
      resps.addData(("txn-9", ts("2025-01-26 12:00:01"), 204))
      q.processAllAvailable()
      reqs.addData(("txn-10", ts("2025-01-26 14:00:00"), "app-z"))
      resps.addData(("txn-10", ts("2025-01-26 14:00:01"), 204))
      q.processAllAvailable()

      val rows = spark.table("correlated")
        .select("transaction_id", "app_id", "status_code")
        .collect().map(r => (r.getString(0), r.getString(1), Option(r.get(2)))).toSet
      assert(rows.contains(("txn-1", "app-a", Some(200))), s"matched pair must join: $rows")
      assert(rows.contains(("txn-2", "app-b", None)),
        s"request with no response must emit with nulls after watermark: $rows")
    } finally q.stop()
  }

  test("malformed gap/lateness fail at call time with a named error, not in the parser") {
    implicit val sqlCtx = spark.sqlContext
    val reqs = MemoryStream[(String, Timestamp, String)]
    val resps = MemoryStream[(String, Timestamp, Int)]
    def call(gap: String, lateness: String = "0 seconds") =
      StreamCorrelate.correlate(
        reqs.toDF().toDF("transaction_id", "req_ts", "app_id"),
        resps.toDF().toDF("transaction_id", "resp_ts", "status_code"),
        gap, lateness)
    val g = intercept[IllegalArgumentException] { call("10 bananas") }
    assert(g.getMessage.contains("gap"))
    val l = intercept[IllegalArgumentException] {
      call("10 minutes", "not-an-interval")
    }
    assert(l.getMessage.contains("lateness"))
    // a value that only MEANS something to the SQL parser (the rendered-
    // fragment class) is refused before any fragment is rendered
    val inj = intercept[IllegalArgumentException] {
      call("1 minute' AND '1'='1")
    }
    assert(inj.getMessage.contains("gap"))
    // validated ≡ rendered: a spelling the VALIDATOR accepts but a naive
    // re-interpolation would break on (the leading 'interval' keyword —
    // it would render as `INTERVAL interval 10 minutes`) now builds its
    // bound from the parsed fields and analyzes clean
    call("interval 10 minutes").isStreaming
    // year-month gaps are refused outright (not just when mixed): a
    // calendar month has no fixed duration, so the join would have no
    // derivable state-eviction bound — named error, never unbounded state
    val m = intercept[IllegalArgumentException] { call("1 month") }
    assert(m.getMessage.contains("year-month"))
    val my = intercept[IllegalArgumentException] { call("2 years") }
    assert(my.getMessage.contains("year-month"))
  }
}
