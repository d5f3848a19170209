package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamDistinct
import graft.streaming.StreamDistinct.ItemEvent
import graft.operators.{Aggregates, TextAnalysis}
import graft.sources.Tables

/** The streamed HLL distinct sketch: estimates equal the batch
  * hll_sketch_agg exactly, blobs union with batch partials, and —
  * unlike any counting state — a fully replayed batch is absorbed BY
  * CONSTRUCTION (HLL inserts are idempotent), byte-for-byte.
  */
class StreamDistinctSpec extends SparkTestBase {
  import spark.implicits._

  private def latest(table: String): Map[String, (Long, Array[Byte])] =
    spark.table(table)
      .as[(String, Long, Array[Byte])].collect()
      .zipWithIndex
      .groupBy(_._1._1)
      .map { case (k, rows) => // last emission per key wins (Update mode)
        val r = rows.maxBy(_._2)._1
        k -> ((r._2, r._3))
      }

  test("streamed ≡ batch: coupon-mode exact, register-identical in HLL mode, replay byte-identical") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.Fixture(spark, sfDir).documents
    // fixture keys stay in COUPON mode (exact under every estimator);
    // one 20k-distinct key exercises HLL mode, where point estimates
    // are estimator-dependent on BOTH sides (Spark's own batch agg
    // flips HIP/composite with partitioning) and the pinned invariant
    // is REGISTER identity + rollup equality; plus a null item, which
    // both paths must skip
    val synth = (0 until 20000).map(i => ("big", s"item_$i")) :+ (("big", null: String))
    val toks = TextAnalysis.tokenRows(docs, "text", "doc_id")
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select(col("lang"), col("tok"))
      .unionByName(synth.toDF("lang", "tok"))
    val events = toks.as[(String, String)].collect()
      .map { case (k, i) => ItemEvent(k, i) }
    val input = MemoryStream[ItemEvent]
    val q = StreamDistinct.distinctCounts(input.toDS())
      .writeStream.format("memory").queryName("sdist")
      .outputMode(OutputMode.Update).start()
    try {
      val (b1, rest) = events.splitAt(events.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 3)
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
      input.addData(b3.toIndexedSeq); q.processAllAvailable()
      val drained = latest("sdist")

      // a FULL replay of the middle batch: HLL inserts are idempotent,
      // so state and emission must not move by a single byte
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
      val replayed = latest("sdist")
      assert(replayed.keySet === drained.keySet)
      for (k <- drained.keySet) {
        assert(replayed(k)._1 === drained(k)._1, s"estimate moved on replay for $k")
        assert(java.util.Arrays.equals(replayed(k)._2, drained(k)._2),
          s"sketch bytes moved on replay for $k")
      }

      // coupon-mode keys (every fixture lang is < promotion capacity):
      // exact under any estimator ⇒ streamed = batch = true count
      val batchAgg = Aggregates.hllSketches(toks, "lang", "tok")
      val batch = batchAgg
        .select(col("lang"), col("estimate"), col("sketch"))
        .as[(String, Long, Array[Byte])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(drained.keySet === batch.keySet)
      for ((k, (est, _)) <- drained if k != "big")
        assert(est === batch(k)._1, s"streamed estimate diverged for $k")

      // the HLL-mode key: the streamed estimate is estimator-NORMALIZED
      // (composite — a pure function of the registers), and this batch
      // agg merged ≥2 HLL-mode partials (20k rows over 4 partitions) so
      // its estimate is composite too ⇒ exact equality here pins both
      // register identity AND the normalized-estimator contract
      assert(drained("big")._1 === batch("big")._1,
        "streamed estimate diverged from the union-merged batch agg for big")
      // register identity probed independently of the agg: a single-blob
      // rollup reads each sketch's registers (both sides composite after
      // normalization), so equal outputs ⇔ equal registers
      def regProbe(blob: Array[Byte]): Long =
        Aggregates.hllRollup(Seq(Tuple1(blob)).toDF("sketch"))
          .collect().head.getLong(0)
      assert(regProbe(drained("big")._2) === regProbe(batch("big")._2),
        "streamed registers diverged from a batch-built sketch for big")
      // and the emitted estimate stays inside the sketch's error bound
      assert(math.abs(drained("big")._1 - 20000).toDouble / 20000 < 0.05,
        s"big estimate ${drained("big")._1} outside the error bound")

      // the emitted blob is a mergeable partial: union the streamed
      // sketches through the BATCH rollup path — the merged estimate
      // must EXACTLY equal the rollup of batch-produced partials (both
      // read identical registers through the same estimator), at any
      // cardinality
      val streamBlobs = drained.values.map(_._2).toSeq.toDF("sketch")
      val merged = Aggregates.hllRollup(streamBlobs)
        .collect().head.getLong(0)
      val global = toks.select(col("tok")).distinct().count()
      val direct = Aggregates.hllRollup(batchAgg.select(col("sketch")))
        .collect().head.getLong(0)
      assert(merged === direct,
        "streamed partials must union to the same estimate as batch partials")
      assert(math.abs(merged - global).toDouble / global < 0.05,
        s"union estimate $merged too far from exact $global")
    } finally q.stop()
  }

  test("TTL path: expiry emits the final estimate and forgets the key") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import graft.streaming.StreamDistinct.DistinctState
    val ttl = Some(java.time.Duration.ofMinutes(5))
    val s1 = TestGroupState.create[DistinctState](
      optionalState = org.apache.spark.api.java.Optional.empty[DistinctState](),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val out1 = StreamDistinct.foldGroup(12, ttl)(
      "k", Iterator(ItemEvent("k", "a"), ItemEvent("k", "b"),
        ItemEvent("k", "a")), s1)
    assert(out1.estimate === 2L)
    assert(s1.getTimeoutTimestampMs.get() === 1000L + 5L * 60L * 1000L)
    val s2 = TestGroupState.create[DistinctState](
      optionalState = org.apache.spark.api.java.Optional.of(s1.get),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L + 6L * 60L * 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = true)
    val out2 = StreamDistinct.foldGroup(12, ttl)("k", Iterator.empty, s2)
    assert(out2.estimate === 2L)
    assert(s2.isRemoved)
  }
}
