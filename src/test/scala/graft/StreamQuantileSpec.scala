package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamQuantile
import graft.streaming.StreamQuantile.ValueEvent
import graft.operators.Aggregates
import graft.sources.Tables

/** The streamed bottom-k quantile sketch must equal the batch operator
  * BIT-FOR-BIT over the same events — the KMV merge identity plus a
  * shared hash make "streaming ≡ batch" an exact claim here, not an
  * approximation bound.
  */
class StreamQuantileSpec extends SparkTestBase {
  import spark.implicits._

  private def latest(table: String): Map[String, (Long, Double, Double)] =
    spark.table(table).as[(String, Long, Double, Double)].collect()
      .zipWithIndex
      .groupBy(_._1._1)
      .map { case (k, rows) => // last emission per key wins (Update mode)
        val r = rows.maxBy(_._2)._1
        k -> ((r._2, r._3, r._4))
      }

  test("drained stream equals the batch kmhQuantiles exactly; replays are idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.Fixture(spark, sfDir).events
      .select("event_type", "event_id", "value")
      .as[(String, Long, Double)].collect()
      .map { case (k, id, v) => ValueEvent(k, id, v) }
    val k = 64
    val input = MemoryStream[ValueEvent]
    val q = StreamQuantile.kmhQuantiles(input.toDS(), k)
      .writeStream.format("memory").queryName("squant")
      .outputMode(OutputMode.Update).start()
    try {
      // three arbitrary micro-batches, then a full REPLAY of the middle
      // batch (at-least-once source behavior) — the sketch must not move
      val (b1, rest) = events.splitAt(events.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 3)
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
      input.addData(b3.toIndexedSeq); q.processAllAvailable()
      val drained = latest("squant")
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
      assert(latest("squant") === drained, "replayed batch moved the sketch")

      val batch = Aggregates.kmhQuantiles(
          Tables.Fixture(spark, sfDir).events, "event_type", "event_id", "value", k)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
        .toMap
      assert(drained === batch,
        s"streamed sketch diverged from batch operator:\n$drained\nvs\n$batch")
    } finally q.stop()
  }

  test("TTL path: data arms the deadline, expiry emits the final estimate and forgets the key") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import graft.streaming.StreamQuantile.SketchState
    val ttl = Some(java.time.Duration.ofMinutes(5))
    val s1 = TestGroupState.create[SketchState](
      optionalState = org.apache.spark.api.java.Optional.empty[SketchState](),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val out1 = StreamQuantile.foldGroup(64, ttl)(
      "k", Iterator(ValueEvent("k", 1L, 10.0), ValueEvent("k", 2L, 20.0)), s1)
    assert(out1.n_sample === 2L)
    assert(s1.getTimeoutTimestampMs.get() === 1000L + 5L * 60L * 1000L)
    val s2 = TestGroupState.create[SketchState](
      optionalState = org.apache.spark.api.java.Optional.of(s1.get),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L + 6L * 60L * 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = true)
    val out2 = StreamQuantile.foldGroup(64, ttl)("k", Iterator.empty, s2)
    assert(out2 === out1, "expiry emission must equal the last snapshot")
    assert(s2.isRemoved)
  }
}
