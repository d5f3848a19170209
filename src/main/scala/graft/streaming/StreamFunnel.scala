package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.EventAnalytics.funnel]]: the greedy
  * ordered-chain fold maintained INCREMENTALLY per user with
  * `mapGroupsWithState` — the chain accumulator (last-advance ts, stage)
  * is exactly the batch fold's accumulator, so state per user is two
  * numbers regardless of stream length, and replaying a stream in
  * event-time order reproduces the batch fold bit-for-bit (spec-pinned).
  *
  * Ordering contract: events are folded in event-time order WITHIN each
  * micro-batch (sorted here); ACROSS batches the fold is at-arrival — a
  * stage event arriving after the fold has already passed its slot
  * cannot retroactively advance the chain (same contract as every
  * at-arrival funnel; replay in order when exactness vs batch matters).
  * Emission is Update-mode: each batch emits the CURRENT progress row
  * for every user the batch touched.
  */
object StreamFunnel {

  final case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)

  final case class FunnelProgress(user_id: Long, reached: Long)

  /** Per-user chain accumulator (public — encoder codegen constructs it):
    * `ts` = µs timestamp of the last chain advance (−1 before stage 1),
    * `st` = stages completed so far.
    */
  final case class ChainState(ts: Long, st: Int)

  /** @param stateTtl optional per-user state retention: when set, a
    *   user's chain state is dropped after that much PROCESSING time
    *   without new events (ProcessingTimeTimeout; expiry emits the final
    *   progress row, then forgets the user — a later event restarts the
    *   chain from stage 0). When None (default) state is retained
    *   INDEFINITELY per user — bounded only by the distinct-user count,
    *   which is unbounded on a long-running stream; pass a TTL on any
    *   stream whose user space grows without bound.
    */
  def funnelProgress(events: Dataset[FunnelEvent],
                     steps: Seq[String],
                     stateTtl: Option[java.time.Duration] = None): Dataset[FunnelProgress] = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "funnel steps must be non-empty and distinct")
    import events.sparkSession.implicits._
    val stageOf = steps.zipWithIndex.map { case (s, i) => s -> (i + 1) }.toMap
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .filter(e => stageOf.contains(e.event_type))
      .groupByKey(_.user_id)
      .mapGroupsWithState[ChainState, FunnelProgress](timeoutConf)(
        foldGroup(stageOf, stateTtl))
  }

  /** Buffered event per user awaiting its watermark: µs event time +
    * stage index (public — encoder codegen constructs it).
    */
  final case class PendingEvent(ts: Long, st: Int)

  /** [[funnelProgressEventTime]]'s state: the chain accumulator plus the
    * held-back buffer and the event-time frontier already folded
    * (`foldedUpTo`, µs — events at or below it are too late by contract
    * and are discarded, mirroring Spark's own watermark drop).
    */
  final case class BufferedChainState(ts: Long, st: Int,
                                      buf: Seq[PendingEvent],
                                      foldedUpTo: Long)

  /** EVENT-TIME-correct streaming funnel — the watermark-buffered twin of
    * [[funnelProgress]]: stage events are HELD in state until the
    * watermark passes them, then folded in event-time order, so an
    * out-of-order stage event that arrives within `watermarkDelay` still
    * advances the chain exactly as the batch fold would (spec-pinned:
    * late click between an already-seen view and purchase completes the
    * chain here; the at-arrival variant stops at 2). The price is
    * bounded buffering: per-user state holds only events NEWER than the
    * watermark — the lateness horizon × that user's event rate — where
    * the at-arrival fold holds two numbers. Same trade as
    * [[StreamWindows.sessionize]]'s watermark.
    *
    * Mechanics: `withWatermark` on the event stream; the group state
    * buffers incoming events, folds the prefix at or below the current
    * watermark (sorted by (ts, stage) — the batch fold's order), and
    * arms an EventTimeTimeout at the earliest still-buffered event so
    * the tail folds as soon as the watermark reaches it, with or without
    * new data for the user. Events at or below the already-folded
    * frontier are discarded (too late by contract — Spark's watermark
    * filter makes the same promise probabilistically; doing it in-state
    * makes the fold order DETERMINISTIC). Emission is Update-mode: the
    * current chain stage for every user each invocation touches.
    */
  def funnelProgressEventTime(events: Dataset[FunnelEvent],
                              steps: Seq[String],
                              watermarkDelay: String): Dataset[FunnelProgress] = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "funnel steps must be non-empty and distinct")
    import events.sparkSession.implicits._
    val stageOf = steps.zipWithIndex.map { case (s, i) => s -> (i + 1) }.toMap
    events
      .withWatermark("ts", watermarkDelay)
      .filter(e => stageOf.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[BufferedChainState, FunnelProgress](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[FunnelEvent],
         state: GroupState[BufferedChainState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val prev = state.getOption.getOrElse(
            BufferedChainState(-1L, 0, Seq.empty, Long.MinValue))
          val incoming = rows.map(e => PendingEvent(
            e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L,
            stageOf(e.event_type))).toSeq
          // discard what the frontier already passed; hold the rest
          val held = (prev.buf ++ incoming).filter(_.ts > prev.foldedUpTo)
          val (ripe, unripe) = held.partition(_.ts <= wmUs)
          var acc = ChainState(prev.ts, prev.st)
          ripe.sortBy(p => (p.ts, p.st)).foreach { p =>
            if (p.st == acc.st + 1 && p.ts > acc.ts) acc = ChainState(p.ts, p.st)
          }
          state.update(BufferedChainState(acc.ts, acc.st, unripe, wmUs))
          if (unripe.nonEmpty) {
            // fold the tail as soon as the watermark reaches its head —
            // strictly beyond the current watermark, as the API requires
            val headMs = unripe.map(_.ts).min / 1000L
            state.setTimeoutTimestamp(math.max(headMs + 1L,
              state.getCurrentWatermarkMs() + 1L))
          }
          Iterator(FunnelProgress(userId, acc.st.toLong))
      }
  }

  /** The per-group fold [[funnelProgress]] runs — package-visible so the
    * TTL-expiry branch is unit-testable against `TestGroupState` (a live
    * ProcessingTimeTimeout stream busy-loops its no-data trigger, which a
    * spec must not depend on).
    */
  private[graft] def foldGroup(stageOf: Map[String, Int],
                               stateTtl: Option[java.time.Duration])(
      userId: Long, rows: Iterator[FunnelEvent],
      state: GroupState[ChainState]): FunnelProgress =
    if (state.hasTimedOut) {
      // TTL expiry: emit the final progress row, then forget the user
      // (state store growth is what the TTL bounds)
      val st = state.getOption.map(_.st.toLong).getOrElse(0L)
      state.remove()
      FunnelProgress(userId, st)
    } else {
      // event-time order within the batch; ties (same µs) sort by
      // stage asc like the batch fold's (ts, st) sort — an equal-ts
      // event can't advance anyway (strict >), so order among ties
      // does not change the result
      val sorted = rows
        // exact µs (getTime is ms-truncated; the nanos field carries
        // the sub-ms part) — strict-> ties must match the batch fold
        .map(e => (e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L,
          stageOf(e.event_type)))
        .toSeq.sorted
      var acc = state.getOption.getOrElse(ChainState(-1L, 0))
      sorted.foreach { case (ts, st) =>
        if (st == acc.st + 1 && ts > acc.ts) acc = ChainState(ts, st)
      }
      state.update(acc)
      stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
      FunnelProgress(userId, acc.st.toLong)
    }
}
