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
