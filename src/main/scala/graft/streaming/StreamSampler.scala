package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.functions.TextFns.h60Local

/** Streaming twin of [[graft.operators.Sampling.importanceSample]]: the
  * priority sample (Duffield–Lund–Thorup) maintained INCREMENTALLY per
  * key with `mapGroupsWithState`. Like the KMV sketch
  * ([[StreamQuantile]]), the state is exact-by-construction mergeable:
  * top-n priorities of everything seen ≡ top-n of (previous top-n ∪
  * batch), so per-key state is EXACTLY n entries regardless of stream
  * length, arrival order cannot change the sample (commutative
  * idempotent merge), replays are absorbed (distinctBy id), and the
  * drained sample is IDENTICAL to the batch operator over the same rows
  * (spec-pinned — same md5-uniform, same BigInt priority math as the
  * batch DECIMAL form; weights above 2^43 are REJECTED loudly in both
  * forms — `w·2^20` would exceed Long range and a silent wrap would let
  * the two forms diverge). A `rand()`-reservoir stream sample has none
  * of these properties.
  *
  * Emission is Update-mode: one snapshot row per touched key per batch,
  * carrying the monotone `n_seen` counter (so "latest snapshot" is
  * recoverable from an append-style sink) and the current sample ids in
  * priority order. `n_seen` counts only ids NOVEL versus the retained
  * sample (distinct within the batch, not already in state), so a
  * replay of retained ids leaves it unchanged (spec-pinned); it is
  * exact under at-most-once delivery, and under at-least-once delivery
  * a replay of an id that was already EVICTED from the top-n recounts
  * it — exactness there would need unbounded per-key state, so treat
  * `n_seen` as a monotone sequence number with that one caveat, not as
  * an exact distinct-item count.
  */
object StreamSampler {

  final case class WeightedItem(key: String, id: Long, weight: Long)

  /** One retained sample entry. */
  final case class SampleEntry(priority: Long, id: Long, weight: Long)

  final case class SamplerState(entries: Seq[SampleEntry], nSeen: Long)

  final case class SampleSnapshot(key: String, n_seen: Long,
                                  ids: Seq[Long], priorities: Seq[Long])

  private val M = 1048576L // 2^20, the batch operator's uniform modulus

  /** Largest admissible weight: `w·M` must stay inside Long so the
    * priority never wraps (the batch form computes the same quantity in
    * DECIMAL(38,0) and casts — both forms reject beyond this bound
    * rather than silently diverge).
    */
  private[graft] val MaxWeight: Long = Long.MaxValue >> 20

  private[graft] def priorityOf(id: Long, weight: Long): Long = {
    require(weight <= MaxWeight,
      s"weight $weight exceeds the 2^43 priority bound (would wrap)")
    (BigInt(weight) * M / (math.floorMod(h60Local(id.toString), M) + 1L)).toLong
  }

  /** The per-group fold, factored for `TestGroupState` (the
    * [[StreamFunnel.foldGroup]] pattern — a live ProcessingTimeTimeout
    * stream busy-loops its no-data trigger, never assert through one).
    */
  private[graft] def foldGroup(n: Int,
                               stateTtl: Option[java.time.Duration])(
      key: String, rows: Iterator[WeightedItem],
      state: GroupState[SamplerState]): SampleSnapshot =
    if (state.hasTimedOut) {
      val st = state.getOption.getOrElse(SamplerState(Seq.empty, 0L))
      state.remove()
      SampleSnapshot(key, st.nSeen,
        st.entries.map(_.id), st.entries.map(_.priority))
    } else {
      val prev = state.getOption.getOrElse(SamplerState(Seq.empty, 0L))
      // zero/negative weights never sample — the batch contract
      val incoming = rows.filter(_.weight > 0L).map(i =>
        SampleEntry(priorityOf(i.id, i.weight), i.id, i.weight)).toSeq
      val merged = (prev.entries ++ incoming)
        .sortBy(e => (-e.priority, e.id))
        .distinctBy(_.id)
        .take(n)
      // count only ids novel vs the retained sample (see scaladoc):
      // a replayed batch of retained ids must not inflate n_seen
      val retained = prev.entries.iterator.map(_.id).toSet
      val novel = incoming.iterator.map(_.id).distinct
        .count(!retained.contains(_))
      val st = SamplerState(merged, prev.nSeen + novel)
      state.update(st)
      stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
      SampleSnapshot(key, st.nSeen,
        merged.map(_.id), merged.map(_.priority))
    }

  /** @param stateTtl optional per-key retention (the [[StreamFunnel
    *   .funnelProgress]] contract): expiry emits the final snapshot and
    *   forgets the key; None retains state per key indefinitely.
    */
  def importanceSample(items: Dataset[WeightedItem], n: Int,
                       stateTtl: Option[java.time.Duration] = None): Dataset[SampleSnapshot] = {
    require(n > 0 && n <= 65536, s"n=$n out of (0, 65536]")
    import items.sparkSession.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    items
      .groupByKey(_.key)
      .mapGroupsWithState[SamplerState, SampleSnapshot](timeoutConf)(
        foldGroup(n, stateTtl))
  }
}
