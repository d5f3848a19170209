package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamSampler
import graft.streaming.StreamSampler.WeightedItem
import graft.operators.Sampling

/** The streamed priority sample must equal the batch operator exactly
  * over the same rows — the top-n merge identity under a shared
  * deterministic hash, like the KMV sketch.
  */
class StreamSamplerSpec extends SparkTestBase {
  import spark.implicits._

  test("drained stream equals batch importanceSample per key; replay and order are absorbed") {
    implicit val sqlCtx = spark.sqlContext
    val items = (0L until 500L).map { id =>
      WeightedItem(if (id % 2 == 0) "a" else "b", id, (id % 97L) + 1L)
    }
    val n = 20
    val input = MemoryStream[WeightedItem]
    val q = StreamSampler.importanceSample(input.toDS(), n)
      .writeStream.format("memory").queryName("ssamp")
      .outputMode(OutputMode.Update).start()
    try {
      // reversed order, three batches, middle batch replayed
      val rev = items.reverse
      val (b1, rest) = rev.splitAt(150)
      val (b2, b3) = rest.splitAt(150)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable() // replay
      input.addData(b3); q.processAllAvailable()

      val snaps = spark.table("ssamp")
        .as[(String, Long, Seq[Long], Seq[Long])].collect()
      val finalByKey = snaps.groupBy(_._1)
        .map { case (k, rows) => k -> rows.maxBy(_._2)._3 }
      for (key <- Seq("a", "b")) {
        val batch = Sampling.importanceSample(
            items.filter(_.key == key).map(i => (i.id, i.weight)).toDF("id", "w"),
            "w", "id", n)
          .collect().map(_.getLong(0)).toSeq
        assert(finalByKey(key) === batch,
          s"streamed sample for $key diverged from batch: ${finalByKey(key)} vs $batch")
      }
    } finally q.stop()
  }

  test("replayed batch of retained ids leaves n_seen unchanged") {
    implicit val sqlCtx = spark.sqlContext
    // n=20 > 10 items: every id stays retained, so the replay is a pure
    // duplicate delivery — both the sample AND the n_seen counter must
    // be byte-identical to the pre-replay snapshot
    val b = (0L until 10L).map(id => WeightedItem("k", id, id + 1L))
    val input = MemoryStream[WeightedItem]
    val q = StreamSampler.importanceSample(input.toDS(), 20)
      .writeStream.format("memory").queryName("ssamp_replay")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(b); q.processAllAvailable()
      input.addData(b); q.processAllAvailable() // replay
      val snaps = spark.table("ssamp_replay")
        .as[(String, Long, Seq[Long], Seq[Long])].collect()
      assert(snaps.length === 2)
      assert(snaps(0)._2 === 10L && snaps(1)._2 === 10L,
        s"n_seen inflated on replay: ${snaps.map(_._2).toSeq}")
      assert(snaps(0)._3 === snaps(1)._3, "sample changed on replay")
    } finally q.stop()
  }

  test("TTL path: data arms the deadline, expiry emits the final snapshot and forgets the key") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import graft.streaming.StreamSampler.SamplerState
    val ttl = Some(java.time.Duration.ofMinutes(5))
    val s1 = TestGroupState.create[SamplerState](
      optionalState = org.apache.spark.api.java.Optional.empty[SamplerState](),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val out1 = StreamSampler.foldGroup(5, ttl)(
      "k", Iterator(WeightedItem("k", 1L, 10L), WeightedItem("k", 2L, 20L)), s1)
    assert(out1.n_seen === 2L && out1.ids.toSet === Set(1L, 2L))
    assert(s1.getTimeoutTimestampMs.get() === 1000L + 5L * 60L * 1000L)
    val s2 = TestGroupState.create[SamplerState](
      optionalState = org.apache.spark.api.java.Optional.of(s1.get),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L + 6L * 60L * 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = true)
    val out2 = StreamSampler.foldGroup(5, ttl)("k", Iterator.empty, s2)
    assert(out2 === out1, "expiry emission must equal the last snapshot")
    assert(s2.isRemoved)
  }

  test("weights past the 2^43 priority bound are rejected loudly") {
    val ex = intercept[IllegalArgumentException] {
      StreamSampler.priorityOf(1L, (Long.MaxValue >> 20) + 1L)
    }
    assert(ex.getMessage.contains("priority bound"))
    // the bound itself is admissible and cannot wrap
    assert(StreamSampler.priorityOf(1L, Long.MaxValue >> 20) > 0L)
    // the batch twin raises through the plan instead of wrapping
    val over = Seq((1L, (Long.MaxValue >> 20) + 1L)).toDF("id", "w")
    val thrown = intercept[Throwable] {
      Sampling.importanceSample(over, "w", "id", 1).collect()
    }
    assert(org.apache.commons.lang3.exception.ExceptionUtils
      .getRootCauseMessage(thrown).contains("priority bound"),
      s"expected a priority-bound raise, got $thrown")
    // and the bound itself still samples (no false raise)
    val ok = Sampling.importanceSample(
      Seq((1L, Long.MaxValue >> 20)).toDF("id", "w"), "w", "id", 1).collect()
    assert(ok.length === 1 && ok(0).getAs[Long]("priority") > 0L)
  }
}
