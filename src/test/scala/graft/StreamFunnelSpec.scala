package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamFunnel
import graft.streaming.StreamFunnel.FunnelEvent

/** Incremental funnel state: cross-batch chain continuation, at-arrival
  * semantics for late stages, and batch-fold equivalence for in-order
  * replay.
  */
class StreamFunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)
  private val steps = Seq("view", "click", "purchase")

  /** Current per-user progress from the Update-mode memory sink: the
    * chain stage is MONOTONE non-decreasing, so max over emitted rows ≡
    * the latest row (no reliance on sink row order).
    */
  private def latest(table: String): Map[Long, Long] =
    spark.table(table).as[(Long, Long)].collect()
      .groupBy(_._1)
      .map { case (u, rows) => u -> rows.map(_._2).max }

  test("funnel progresses across micro-batches; late stage events are at-arrival") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val q = StreamFunnel.funnelProgress(input.toDS(), steps)
      .writeStream.format("memory").queryName("sfun")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: u1 view; u2 click (can't start a chain)
      input.addData(FunnelEvent(1L, ts(10), "view"), FunnelEvent(2L, ts(10), "click"))
      q.processAllAvailable()
      assert(latest("sfun") === Map(1L -> 1L, 2L -> 0L))
      // batch 2: u1 click (advances, later ts); u2 view (starts now)
      input.addData(FunnelEvent(1L, ts(20), "click"), FunnelEvent(2L, ts(20), "view"))
      q.processAllAvailable()
      assert(latest("sfun") === Map(1L -> 2L, 2L -> 1L))
      // batch 3: u1 purchase completes; u2's click arrives with ts BEFORE
      // its chain start — at-arrival fold folds it (sorted within batch)
      // but strict ts > chain-start rejects it
      input.addData(FunnelEvent(1L, ts(30), "purchase"), FunnelEvent(2L, ts(15), "click"))
      q.processAllAvailable()
      assert(latest("sfun") === Map(1L -> 3L, 2L -> 1L))
      // batch 4: out-of-order WITHIN the batch is sorted before folding —
      // u3's purchase/click/view arrive in one batch in reverse order
      input.addData(FunnelEvent(3L, ts(30), "purchase"),
        FunnelEvent(3L, ts(20), "click"), FunnelEvent(3L, ts(10), "view"))
      q.processAllAvailable()
      assert(latest("sfun")(3L) === 3L)
    } finally q.stop()
  }

  test("stateTtl fold: events register a timeout; expiry emits final progress and removes state") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import graft.streaming.StreamFunnel.ChainState
    val stageOf = steps.zipWithIndex.map { case (s, i) => s -> (i + 1) }.toMap
    val ttl = Some(java.time.Duration.ofMinutes(5))

    // data batch: fold advances AND arms the processing-time timeout
    val s1 = TestGroupState.create[ChainState](
      optionalState = org.apache.spark.api.java.Optional.empty[ChainState](),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val out1 = StreamFunnel.foldGroup(stageOf, ttl)(
      1L, Iterator(FunnelEvent(1L, ts(10), "view"),
        FunnelEvent(1L, ts(20), "click")), s1)
    assert(out1 === StreamFunnel.FunnelProgress(1L, 2L))
    assert(s1.get === ChainState(20L * 1000000L, 2))
    assert(s1.getTimeoutTimestampMs.get() === 1000L + 5L * 60L * 1000L)

    // expiry invocation: emits the last reached stage, then removes state
    val s2 = TestGroupState.create[ChainState](
      optionalState = org.apache.spark.api.java.Optional.of(ChainState(20L * 1000000L, 2)),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L + 6L * 60L * 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = true)
    val out2 = StreamFunnel.foldGroup(stageOf, ttl)(1L, Iterator.empty, s2)
    assert(out2 === StreamFunnel.FunnelProgress(1L, 2L))
    assert(s2.isRemoved)

    // without a TTL the NoTimeout path never arms a deadline
    val s3 = TestGroupState.create[ChainState](
      optionalState = org.apache.spark.api.java.Optional.empty[ChainState](),
      timeoutConf = GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    StreamFunnel.foldGroup(stageOf, None)(
      2L, Iterator(FunnelEvent(2L, ts(10), "view")), s3)
    assert(!s3.getTimeoutTimestampMs.isPresent)
  }

  test("event-time variant: a late stage event inside the watermark still advances the chain") {
    implicit val sqlCtx = spark.sqlContext
    // u1's click arrives AFTER its purchase was seen — the at-arrival fold
    // (previous test's contract) stops at 2; the watermark-buffered fold
    // must reach 3, matching the batch fold over the same events.
    val input = MemoryStream[FunnelEvent]
    val q = StreamFunnel.funnelProgressEventTime(input.toDS(), steps, "1 minute")
      .writeStream.format("memory").queryName("sfun_et")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(FunnelEvent(1L, ts(10), "view"), FunnelEvent(1L, ts(30), "purchase"))
      q.processAllAvailable()
      // late click lands between them, within the 1-minute horizon
      input.addData(FunnelEvent(1L, ts(20), "click"))
      q.processAllAvailable()
      // push the watermark far past u1's events (240 s > 30 s)...
      input.addData(FunnelEvent(2L, ts(300), "view"))
      q.processAllAvailable()
      // ...and run one more batch so the armed event-time timeout fires
      input.addData(FunnelEvent(2L, ts(301), "view"))
      q.processAllAvailable()
      assert(latest("sfun_et")(1L) === 3L,
        "buffered event-time fold must complete the chain from the late click")
    } finally q.stop()

    // the SAME sequence through the at-arrival fold cannot reach 3: the
    // purchase was folded past before the click arrived
    val input2 = MemoryStream[FunnelEvent]
    val q2 = StreamFunnel.funnelProgress(input2.toDS(), steps)
      .writeStream.format("memory").queryName("sfun_et_aa")
      .outputMode(OutputMode.Update).start()
    try {
      input2.addData(FunnelEvent(1L, ts(10), "view"), FunnelEvent(1L, ts(30), "purchase"))
      q2.processAllAvailable()
      input2.addData(FunnelEvent(1L, ts(20), "click"))
      q2.processAllAvailable()
      assert(latest("sfun_et_aa")(1L) === 2L,
        "at-arrival fold must NOT retro-advance past the folded purchase")
    } finally q2.stop()
  }

  test("event-time variant: in-order stream converges to the batch fold") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 5L, "purchase"), (2L, 10L, "view"), (2L, 20L, "click"))
    val input = MemoryStream[FunnelEvent]
    val q = StreamFunnel.funnelProgressEventTime(input.toDS(), steps, "10 seconds")
      .writeStream.format("memory").queryName("sfun_et2")
      .outputMode(OutputMode.Update).start()
    try {
      events.sortBy(e => (e._2, e._1)).foreach { case (u, t, et) =>
        input.addData(FunnelEvent(u, ts(t), et)); q.processAllAvailable()
      }
      // flush: advance the watermark past everything, then fire timeouts
      input.addData(FunnelEvent(9L, ts(1000), "view")); q.processAllAvailable()
      input.addData(FunnelEvent(9L, ts(1001), "view")); q.processAllAvailable()
      // batch-fold expectations (EventAnalyticsSpec): u1=3, u2=2
      assert(latest("sfun_et2")(1L) === 3L)
      assert(latest("sfun_et2")(2L) === 2L)
    } finally q.stop()
  }

  test("in-order replay reproduces the batch fold's per-user reached") {
    implicit val sqlCtx = spark.sqlContext
    // the EventAnalyticsSpec corpus, replayed one event per batch in ts order
    val events = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 5L, "purchase"), (2L, 10L, "view"), (2L, 20L, "click"),
      (4L, 10L, "view"), (4L, 10L, "click"), (4L, 40L, "click"))
    val input = MemoryStream[FunnelEvent]
    val q = StreamFunnel.funnelProgress(input.toDS(), steps)
      .writeStream.format("memory").queryName("sfun2")
      .outputMode(OutputMode.Update).start()
    try {
      events.sortBy(e => (e._2, e._1)).foreach { case (u, t, et) =>
        input.addData(FunnelEvent(u, ts(t), et)); q.processAllAvailable()
      }
      // batch-fold expectations from EventAnalyticsSpec: u1=3, u2=2, u4=2
      assert(latest("sfun2") === Map(1L -> 3L, 2L -> 2L, 4L -> 2L))
    } finally q.stop()
  }
}
