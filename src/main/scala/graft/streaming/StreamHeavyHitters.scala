package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.util.sketch.CountMinSketch

/** Streaming twin of [[graft.operators.Aggregates.cmsSketches]]: a
  * count–min sketch + top-k candidate set maintained INCREMENTALLY per
  * key with `mapGroupsWithState` — the heavy-hitter counter role the
  * reference's metrics emission plays (`reference/src/lambda/processQueue
  * .ts:256-293` counts per-category outcomes per batch) at UNBOUNDED key
  * cardinality: state per key is one fixed-size sketch (bounded by
  * eps/confidence, never by item cardinality) plus k candidates.
  *
  * Counter updates are SUMS — commutative and associative — so the
  * maintained sketch is partition-invariant: however the stream is cut
  * into micro-batches, and whatever order they arrive in, the final
  * sketch is BIT-IDENTICAL to the batch operator's blob over the same
  * rows (spec-pinned; same codec, same seed 42, same eps/confidence ⇒
  * same hash family). Exactly-once across engine replays comes from
  * Structured Streaming's per-trigger state versioning (a recovered
  * trigger reapplies against the PRE-trigger state). What a counting
  * state can NOT absorb is source-level redelivery of the same logical
  * event — each delivered row counts, exactly as a duplicated row
  * counts in the batch operator; a redelivering source must dedup
  * upstream (ids + `dropDuplicates` under a watermark, the standard
  * move) — unlike the samplers ([[StreamQuantile]]/[[StreamSampler]]),
  * whose retained-entry state makes id-dedup free. Stated here because
  * silently absorbing SOME replays would be worse than absorbing none.
  *
  * Top-k maintenance is the classic CMS+heap loop: an item's CUMULATIVE
  * estimate is reconsidered every time the item arrives (a heavy hitter
  * arrives often, by definition), and the candidate set keeps the k
  * best by (estimate desc, item asc). Emission is Update-mode: one
  * snapshot per touched key per batch with the current top-k and the
  * sketch blob itself — the mergeable partial a downstream aggregator
  * feeds to [[graft.operators.Aggregates.cmsProbe]], the same
  * ship-partials-not-rows contract as the batch sketches.
  */
object StreamHeavyHitters {

  final case class ItemEvent(key: String, item: String)

  final case class HhState(sketch: Array[Byte], items: Seq[String])

  final case class HhSnapshot(key: String, top_items: Seq[String],
                              estimates: Seq[Long], sketch: Array[Byte])

  private def toBytes(cms: CountMinSketch): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    bos.toByteArray
  }

  /** The per-group fold, factored out so the timeout branch is
    * unit-testable through `TestGroupState` (the [[StreamFunnel
    * .foldGroup]] pattern — a live ProcessingTimeTimeout stream
    * busy-loops its no-data trigger, never assert through one).
    */
  private[graft] def foldGroup(k: Int, eps: Double, confidence: Double,
                               stateTtl: Option[java.time.Duration])(
      key: String, rows: Iterator[ItemEvent],
      state: GroupState[HhState]): HhSnapshot =
    if (state.hasTimedOut) {
      val st = state.getOption.getOrElse(
        HhState(toBytes(CountMinSketch.create(eps, confidence, 42)), Seq.empty))
      state.remove()
      val cms = CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(st.sketch))
      HhSnapshot(key, st.items,
        st.items.map(cms.estimateCount(_)), st.sketch)
    } else {
      val cms = state.getOption
        .map(st => CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(st.sketch)))
        .getOrElse(CountMinSketch.create(eps, confidence, 42))
      val batchItems = scala.collection.mutable.LinkedHashSet.empty[String]
      // skip nulls to match the batch twin: `count_min_sketch(...)` skips
      // null inputs, while CountMinSketch.add(null) throws — same contract
      // as StreamDistinct's fold
      rows.foreach { e =>
        if (e.item != null) { cms.add(e.item); batchItems += e.item }
      }
      // reconsider every arrived item's CUMULATIVE estimate against
      // the retained candidates; keep the k best (est desc, item asc
      // — a total order, so the snapshot is deterministic)
      val candidates =
        (state.getOption.map(_.items).getOrElse(Seq.empty) ++ batchItems)
          .distinct
          .map(i => (i, cms.estimateCount(i)))
          .sortBy { case (i, est) => (-est, i) }
          .take(k)
      val st = HhState(toBytes(cms), candidates.map(_._1))
      state.update(st)
      stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
      HhSnapshot(key, candidates.map(_._1), candidates.map(_._2), st.sketch)
    }

  /** @param k        candidates retained/emitted per key.
    * @param eps      relative error bound (estimate ≤ true + eps·N).
    *   Default matches [[graft.operators.Aggregates.cmsSketches]] — the
    *   hash-family params (eps, confidence, seed) must agree on both
    *   sides or `CountMinSketch.mergeInPlace` / `cmsProbe` throws
    *   `IncompatibleMergeException` when mixing blobs — the two defaults
    *   are a joint contract and must move together. SIZE the default
    *   consciously: the sketch is `ceil(2/eps)` columns × `ceil(ln(1/
    *   (1−confidence)))` rows of longs PER KEY, serialized into the
    *   state store and shipped in every snapshot — ~110 KB/key at the
    *   default (eps=1e-3), ~1.1 MB/key at eps=1e-4. MIGRATION: rounds
    *   ≤ 13 defaulted to 1e-4 — a checkpoint whose state was written
    *   under the old default keeps working (the state blob carries its
    *   own geometry and the fold merges nothing across keys), but its
    *   snapshots only merge downstream with batch blobs built at an
    *   explicit `eps = 0.0001`. A stream keyed at high cardinality
    *   should still pass a coarser eps explicitly — and then build its
    *   batch-side blobs with the SAME eps to keep them mergeable.
    * @param confidence probability the bound holds per estimate.
    * @param stateTtl optional per-key retention (the [[StreamFunnel
    *   .funnelProgress]] contract): expiry emits the final snapshot and
    *   forgets the key; None retains state per key indefinitely.
    */
  def heavyHitters(events: Dataset[ItemEvent], k: Int,
                   eps: Double = 0.001, confidence: Double = 0.99,
                   stateTtl: Option[java.time.Duration] = None): Dataset[HhSnapshot] = {
    require(k > 0 && k <= 65536, s"k=$k out of (0, 65536]")
    import events.sparkSession.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.key)
      .mapGroupsWithState[HhState, HhSnapshot](timeoutConf)(
        foldGroup(k, eps, confidence, stateTtl))
  }
}
