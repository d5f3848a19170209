package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The watermark variant of request↔response correlation (SURVEY §2.9
  * R2/R3, §7.1 M3) — the alternative to [[IngestJob]]'s store-side merge.
  *
  * Shape: a time-bounded stream-stream LEFT OUTER join. Each side carries
  * an event-time watermark and the join condition bounds the response's
  * event time to [request, request + gap], so Spark can evict join state
  * deterministically — bounded memory under unbounded streams, the
  * textbook Structured Streaming correlation pattern.
  *
  * Trade-off vs the store merge (why [[IngestJob]] is the default): a
  * response arriving later than `gap` after its request — or before it —
  * can never match (the reference drops such responses too,
  * `reference/src/lambda/processQueue.ts:230-238`); the store merge
  * instead completes the row whenever the other half shows up. This
  * variant exists for pipelines that want append-only output with no
  * store rewrites: matched rows emit once, unmatched requests emit with
  * null response fields once the watermark passes their join window.
  */
object StreamCorrelate {

  /** @param requests  streaming frame: (transaction_id, req_ts, request cols…)
    * @param responses streaming frame: (transaction_id, resp_ts, response cols…)
    * @param gap       max response lag, e.g. "10 minutes"
    * @param lateness  extra out-of-order allowance for the watermarks
    */
  def correlate(
      requests: DataFrame,
      responses: DataFrame,
      gap: String,
      lateness: String = "0 seconds"): DataFrame = {
    // parse-validate BEFORE either string reaches a rendered SQL fragment
    // (the join condition interpolates `gap`): a malformed value fails
    // here with a named error instead of deep inside the expression
    // parser, and nothing non-interval can reach the parser at all
    Seq("gap" -> gap, "lateness" -> lateness).foreach { case (what, v) =>
      try org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(v))
      catch { case e: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"$what is not a valid interval string: '$v'", e)
      }
    }
    val req = requests.withWatermark("req_ts", lateness)
    val resp = responses
      .withColumnRenamed("transaction_id", "r_transaction_id")
      .withWatermark("resp_ts", lateness)
    req.join(resp,
      col("transaction_id") === col("r_transaction_id") &&
        col("resp_ts") >= col("req_ts") &&
        col("resp_ts") <= col("req_ts") + expr(s"INTERVAL $gap"),
      "leftOuter")
      .drop("r_transaction_id")
  }
}
