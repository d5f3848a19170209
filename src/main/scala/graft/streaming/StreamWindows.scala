package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming time-window + custom-state operators (SURVEY §2.9).
  *
  * The reference has no time-window aggregation (R7 "not present") and keeps
  * its only cross-event state in Postgres; these complete the streaming
  * surface an analytics engine needs, on Structured Streaming primitives:
  *
  *  - [[tumblingCounts]] — watermarked tumbling window: late data beyond the
  *    watermark is dropped deterministically, state is evicted as the
  *    watermark advances (bounded memory at any scale);
  *  - [[slidingCounts]] — same machinery, overlapping windows;
  *  - [[sessionize]] — gap-based sessions via `flatMapGroupsWithState`:
  *    per-key state (the open session) lives in the state store, sessions
  *    close when the event-time watermark passes last-event + gap. This is
  *    the `KeyValueGroupedDataset` custom-state path — the shape any
  *    "reduce correlated events into an entity" pipeline takes (the
  *    reference's request↔response correlation is the degenerate two-event
  *    case, handled store-side in [[IngestJob]]).
  */
object StreamWindows {

  /** Tumbling windowed counts/sums per key with a watermark. Works on both
    * streaming and batch frames (batch ignores the watermark — same plan
    * shape as `RelationalQueries.q_tumbling_window`'s oracle-checked analog).
    */
  def tumblingCounts(
      events: DataFrame, tsCol: String, keyCol: String,
      width: String, watermark: String, valueCol: String = "value"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width), col(keyCol))
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("sum_v"))
      .select(col("window.start").as("window_start"), col(keyCol), col("cnt"), col("sum_v"))

  /** Sliding (overlapping) windowed counts per key. */
  def slidingCounts(
      events: DataFrame, tsCol: String, keyCol: String,
      width: String, slide: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width, slide), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col(keyCol), col("cnt"))

  /** Exact streaming dedup on key columns within the watermark horizon:
    * `dropDuplicatesWithinWatermark` keeps per-key state only until the
    * watermark passes, so state is bounded at any scale — the streaming
    * twin of `Dedup.exact`, and the correct guard in front of an
    * at-least-once source that redelivers (the reference's SQS redelivery,
    * `processQueue.ts:131-160`, is exactly this failure mode; its Postgres
    * unique-key writes absorb it store-side, this absorbs it in-stream).
    * A key re-sent AFTER the horizon re-emits by design — pick the
    * watermark to cover the source's redelivery window.
    */
  def dedupWithinWatermark(
      events: DataFrame, tsCol: String, keyCols: Seq[String],
      watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming CONTENT dedup: [[dedupWithinWatermark]] keyed by the
    * normalized-text fingerprint instead of an id — the streaming form of
    * [[graft.operators.Dedup.fingerprintCanonical]], for ingest paths
    * where near-identical documents (re-crawls, retries with edited
    * whitespace/case) arrive minutes apart. The fingerprint is the same
    * 128-bit md5 over lowercased, punctuation-collapsed text, computed
    * scan-side (narrow); state per distinct fingerprint is one entry,
    * expired by the watermark horizon — bounded regardless of stream
    * length. First occurrence wins (arrival order), matching the
    * at-least-once upstream's contract.
    */
  def dedupContentWithinWatermark(
      docs: DataFrame, tsCol: String, textCol: String,
      watermark: String): DataFrame =
    docs
      // THE fingerprint expression (one definition repo-wide): a
      // hand-copied normalization here would silently desynchronize
      // stream dedup from the batch operators and stored fp indexes
      .withColumn("__fp", graft.operators.Dedup.fpExpr(textCol))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("__fp"))
      .drop("__fp")

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)

  final case class SessionSummary(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Long)

  /** Per-key state: the currently open session (public — Spark's encoder
    * codegen must be able to construct it).
    */
  final case class OpenSession(start: Long, last: Long, n: Long)

  /** Gap-based sessionization: a session closes once the event-time
    * watermark passes `last event + gap`. State per key is one
    * [[OpenSession]] (bounded); emitted rows are closed sessions (Append
    * mode — safe to sink anywhere).
    */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      // milliseconds, not gapMs/1000: integer division would truncate
      // sub-second gaps to a zero watermark delay
      .withWatermark("ts", s"$gapMs milliseconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed last+gap: close and emit
            val s = state.get
            state.remove()
            Iterator.single(SessionSummary(userId,
              new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n))
          } else {
            val sorted = rows.map(e => e.ts.getTime).toSeq.sorted
            var closed = List.empty[SessionSummary]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // min() the start too: an allowed-late event may precede
                  // the open session's first-seen event
                  cur = Some(s.copy(start = math.min(s.start, t),
                    last = math.max(s.last, t), n = s.n + 1))
                case Some(s) => // gap exceeded within the batch: close inline
                  closed ::= SessionSummary(userId,
                    new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n)
                  cur = Some(OpenSession(t, t, 1))
                case None =>
                  cur = Some(OpenSession(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
