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

  test("streamed estimates equal batch hll_sketch_agg; replayed batch is byte-identical") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.Fixture(spark, sfDir).documents
    val toks = TextAnalysis.tokenRows(docs, "text", "doc_id")
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select(col("lang"), col("tok"))
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

      // estimates ≡ the batch operator's, per key
      val batch = Aggregates.hllSketches(toks, "lang", "tok")
        .select(col("lang"), col("estimate"))
        .as[(String, Long)].collect().toMap
      assert(drained.keySet === batch.keySet)
      for ((k, (est, _)) <- drained)
        assert(est === batch(k), s"streamed estimate diverged for $k")

      // the emitted blob is a mergeable partial: union the streamed
      // sketches through the BATCH rollup path — the merged estimate
      // must equal one batch sketch over the whole column
      val streamBlobs = drained.values.map(_._2).toSeq.toDF("sketch")
      val merged = Aggregates.hllRollup(streamBlobs)
        .collect().head.getLong(0)
      val global = toks.select(col("tok")).distinct().count()
      val direct = Aggregates.hllRollup(
        Aggregates.hllSketches(toks, "lang", "tok").select(col("sketch")))
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
