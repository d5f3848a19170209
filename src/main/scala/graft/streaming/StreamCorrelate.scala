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
    // parse-validate BEFORE either string reaches the plan, and build the
    // join bound FROM the parsed value (a canonical months/days/micros
    // re-render of its fields) rather than re-interpolating the raw
    // string — validated ≡ rendered by construction, so an exotic-but-
    // parseable spelling (a leading 'interval' keyword, say) cannot pass
    // the guard and then die in a rendered fragment the guard never saw;
    // the rendered fragment is numeric-only, so nothing hostile survives
    // the round-trip either. NOT make_interval: its typed addition wraps
    // the bound in a cast that defeats the stream-stream join's
    // watermark range-condition analysis — the bound must stay a
    // CalendarInterval literal added to the event time, the shape the
    // state-eviction checker recognizes. stringToInterval is the one
    // catalyst-internal call here: it IS the parser withWatermark
    // applies to `lateness`, which is exactly the "same dialect"
    // property the validation needs.
    def parsed(what: String, v: String) =
      try org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(v))
      catch { case e: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"$what is not a valid interval string: '$v'", e)
      }
    val gapIv = parsed("gap", gap)
    parsed("lateness", lateness)
    // year-month gaps are rejected OUTRIGHT, not just when mixed: a
    // calendar month has no fixed microsecond width, so a months-valued
    // range bound gives the stream-stream join no derivable
    // state-eviction bound — depending on join type that is either an
    // analysis failure deep in the engine or silently unbounded state.
    // A correlation window is a fixed duration by nature; callers
    // wanting "a month-ish" say '30 days'.
    if (gapIv.months != 0)
      throw new IllegalArgumentException(
        s"gap '$gap' uses year-month units — a calendar-month bound has " +
          "no fixed duration, so the stream-stream join cannot derive a " +
          "state-eviction bound; use day-time units (e.g. '30 days')")
    val gapBound =
      expr(s"INTERVAL ${gapIv.days} days ${gapIv.microseconds} microseconds")
    val req = requests.withWatermark("req_ts", lateness)
    val resp = responses
      .withColumnRenamed("transaction_id", "r_transaction_id")
      .withWatermark("resp_ts", lateness)
    req.join(resp,
      col("transaction_id") === col("r_transaction_id") &&
        col("resp_ts") >= col("req_ts") &&
        col("resp_ts") <= col("req_ts") + gapBound,
      "leftOuter")
      .drop("r_transaction_id")
  }
}
