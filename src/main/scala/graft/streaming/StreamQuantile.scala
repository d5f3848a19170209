package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.functions.TextFns.h60Local

/** Streaming twin of [[graft.operators.Aggregates.kmhQuantiles]]: the
  * bottom-k-hash quantile sketch maintained INCREMENTALLY per key with
  * `mapGroupsWithState`. The KMV identity is what makes this exact-by-
  * construction: the bottom-k under a deterministic hash of everything
  * seen so far equals the bottom-k of (previous bottom-k ∪ batch), so
  * per-key state is EXACTLY k entries regardless of stream length, and
  * the streamed sketch is BIT-IDENTICAL to the batch
  * [[graft.operators.Aggregates.kmhSample]] over the same events
  * (spec-pinned — same [[graft.functions.TextFns.h60Local]] hash, same
  * (hash, id) tie order, same interpolated percentile). Arrival order
  * cannot change the result — bottom-k is a commutative, idempotent
  * merge — which is the property a reservoir sample (random, order-
  * sensitive) and a float quantile sketch (merge-order-sensitive error)
  * both lack.
  *
  * Emission is Update-mode: each batch emits the CURRENT estimate for
  * every key it touched. Quantiles use the same linear interpolation as
  * Spark's exact `percentile` (index q·(n−1)), so a drained stream's
  * estimates equal the batch operator's output exactly.
  */
object StreamQuantile {

  final case class ValueEvent(key: String, id: Long, value: Double)

  /** One sketch entry: the rank hash, its tiebreak id, and the value. */
  final case class SketchEntry(h: Long, id: Long, value: Double)

  final case class SketchState(entries: Seq[SketchEntry])

  final case class QuantileEstimate(key: String, n_sample: Long,
                                    p50_est: Double, p90_est: Double)

  private[graft] def interpolate(sorted: IndexedSeq[Double], q: Double): Double = {
    val idx = q * (sorted.length - 1)
    val lo = math.floor(idx).toInt
    val hi = math.ceil(idx).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) + (idx - lo) * (sorted(hi) - sorted(lo))
  }

  private def r2(x: Double): Double =
    BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The per-group fold, factored for `TestGroupState` (the
    * [[StreamFunnel.foldGroup]] pattern — a live ProcessingTimeTimeout
    * stream busy-loops its no-data trigger, never assert through one).
    */
  private[graft] def foldGroup(k: Int,
                               stateTtl: Option[java.time.Duration])(
      key: String, rows: Iterator[ValueEvent],
      state: GroupState[SketchState]): QuantileEstimate =
    if (state.hasTimedOut) {
      val entries = state.getOption.map(_.entries).getOrElse(Seq.empty)
      state.remove()
      val values = entries.map(_.value).sorted.toIndexedSeq
      if (values.isEmpty) QuantileEstimate(key, 0L, 0.0, 0.0)
      else QuantileEstimate(key, entries.size.toLong,
        r2(interpolate(values, 0.5)), r2(interpolate(values, 0.9)))
    } else {
      val incoming = rows.map(e =>
        SketchEntry(h60Local(e.id.toString), e.id, e.value))
      // distinctBy(id): an at-least-once source can replay an event;
      // bottom-k ∪ dedup makes the sketch replay-idempotent (the
      // batch operator sees each id once by construction)
      val merged = (state.getOption.map(_.entries).getOrElse(Seq.empty)
          ++ incoming)
        .sortBy(e => (e.h, e.id))
        .distinctBy(_.id)
        .take(k)
      state.update(SketchState(merged))
      val values = merged.map(_.value).sorted.toIndexedSeq
      // Spark round() is BigDecimal HALF_UP — match it exactly so a
      // drained stream ≡ the batch operator's output bit-for-bit
      stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
      QuantileEstimate(key, merged.size.toLong,
        r2(interpolate(values, 0.5)), r2(interpolate(values, 0.9)))
    }

  /** @param stateTtl optional per-key retention, the [[StreamFunnel
    *   .funnelProgress]] contract: when set, a key's sketch is dropped
    *   after that much processing time without new events (expiry emits
    *   the final estimate, then forgets the key); when None, state is
    *   retained per key indefinitely — pass a TTL on any stream whose
    *   key space grows without bound.
    */
  def kmhQuantiles(events: Dataset[ValueEvent], k: Int,
                   stateTtl: Option[java.time.Duration] = None): Dataset[QuantileEstimate] = {
    require(k > 0 && k <= 65536, s"k=$k out of (0, 65536]")
    import events.sparkSession.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.key)
      .mapGroupsWithState[SketchState, QuantileEstimate](timeoutConf)(
        foldGroup(k, stateTtl))
  }
}
