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
  * batch DECIMAL form). A `rand()`-reservoir stream sample has none of
  * these properties.
  *
  * Emission is Update-mode: one snapshot row per touched key per batch,
  * carrying the monotone `n_seen` counter (so "latest snapshot" is
  * recoverable from an append-style sink) and the current sample ids in
  * priority order.
  */
object StreamSampler {

  final case class WeightedItem(key: String, id: Long, weight: Long)

  /** One retained sample entry. */
  final case class SampleEntry(priority: Long, id: Long, weight: Long)

  final case class SamplerState(entries: Seq[SampleEntry], nSeen: Long)

  final case class SampleSnapshot(key: String, n_seen: Long,
                                  ids: Seq[Long], priorities: Seq[Long])

  private val M = 1048576L // 2^20, the batch operator's uniform modulus

  private[graft] def priorityOf(id: Long, weight: Long): Long =
    (BigInt(weight) * M / (math.floorMod(h60Local(id.toString), M) + 1L)).toLong

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
      .mapGroupsWithState[SamplerState, SampleSnapshot](timeoutConf) {
        (key: String, rows: Iterator[WeightedItem], state: GroupState[SamplerState]) =>
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
            val st = SamplerState(merged, prev.nSeen + incoming.size)
            state.update(st)
            stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            SampleSnapshot(key, st.nSeen,
              merged.map(_.id), merged.map(_.priority))
          }
      }
  }
}
