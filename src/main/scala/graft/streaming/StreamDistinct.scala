package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.datasketches.hll.{HllSketch, TgtHllType}

/** Streaming twin of [[graft.operators.Aggregates.hllSketches]]: a
  * per-key HLL distinct-count sketch maintained INCREMENTALLY with
  * `mapGroupsWithState` — the third member of the streaming sketch
  * family, with the strongest replay story of the three:
  *
  *  - [[StreamQuantile]]/[[StreamSampler]] absorb replays by id-dedup
  *    against retained entries;
  *  - [[StreamHeavyHitters]] CANNOT absorb source-level redelivery
  *    (counter adds are not idempotent — documented there);
  *  - HLL inserts are IDEMPOTENT BY CONSTRUCTION: re-inserting an
  *    item the sketch has seen is a no-op on its state (a register
  *    only ever takes the max over item hashes), so an at-least-once
  *    source's redelivered items change NOTHING — no id plumbing, no
  *    upstream dedup stage, at any cardinality (spec-pinned: a fully
  *    replayed batch leaves state AND emission byte-identical).
  *
  * State per key is one fixed-size sketch (bounded by `lgK`, never by
  * item cardinality). Estimates equal the batch
  * `hll_sketch_estimate(hll_sketch_agg(...))` over the same rows
  * (spec-pinned — same library, same item byte encoding), and the
  * emitted sketch blob merges with batch-produced blobs through
  * `hll_union_agg` ([[graft.operators.Aggregates.hllRollup]]) — the
  * same ship-partials-not-rows contract as the CMS/HLL batch sketches,
  * so a downstream aggregator can union streamed and batch partials
  * freely.
  */
object StreamDistinct {

  final case class ItemEvent(key: String, item: String)

  final case class DistinctState(sketch: Array[Byte])

  final case class DistinctEstimate(key: String, estimate: Long,
                                    sketch: Array[Byte])

  /** The per-group fold, factored for `TestGroupState` (the
    * [[StreamFunnel.foldGroup]] pattern).
    */
  private[graft] def foldGroup(lgK: Int,
                               stateTtl: Option[java.time.Duration])(
      key: String, rows: Iterator[ItemEvent],
      state: GroupState[DistinctState]): DistinctEstimate =
    if (state.hasTimedOut) {
      val st = state.getOption.getOrElse(
        DistinctState(new HllSketch(lgK, TgtHllType.HLL_8).toUpdatableByteArray))
      state.remove()
      val sk = HllSketch.heapify(st.sketch)
      DistinctEstimate(key, Math.round(sk.getEstimate), st.sketch)
    } else {
      val sk = state.getOption
        .map(st => HllSketch.heapify(st.sketch))
        .getOrElse(new HllSketch(lgK, TgtHllType.HLL_8))
      // UTF-8 bytes: the encoding Spark's hll_sketch_agg feeds the same
      // library for string input, so estimates line up exactly
      rows.foreach(e =>
        sk.update(e.item.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      val st = DistinctState(sk.toUpdatableByteArray)
      state.update(st)
      stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
      DistinctEstimate(key, Math.round(sk.getEstimate), st.sketch)
    }

  /** @param lgK      log2 of the register count (12 ⇒ 4096 registers ⇒
    *   ~1.6% relative standard error — Spark's `hll_sketch_agg`
    *   default, kept so streamed and batch estimates are comparable at
    *   identical precision).
    * @param stateTtl optional per-key retention (the [[StreamFunnel
    *   .funnelProgress]] contract): expiry emits the final estimate and
    *   forgets the key; None retains state per key indefinitely.
    */
  def distinctCounts(events: Dataset[ItemEvent], lgK: Int = 12,
                     stateTtl: Option[java.time.Duration] = None): Dataset[DistinctEstimate] = {
    require(lgK >= 4 && lgK <= 21, s"lgK=$lgK out of [4, 21]")
    import events.sparkSession.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.key)
      .mapGroupsWithState[DistinctState, DistinctEstimate](timeoutConf)(
        foldGroup(lgK, stateTtl))
  }
}
