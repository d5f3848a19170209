package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamHeavyHitters
import graft.streaming.StreamHeavyHitters.ItemEvent
import graft.operators.{Aggregates, TextAnalysis}
import graft.sources.Tables

/** The streamed CMS heavy-hitter state must equal the batch sketch
  * BIT-FOR-BIT over the same rows — counter updates are sums, so the
  * final sketch is invariant to how the stream was cut into batches —
  * and the emitted top-k must carry exactly the batch sketch's
  * estimates.
  */
class StreamHeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  private val eps = 0.001
  private val conf = 0.99

  private def latest(table: String): Map[String, (Seq[String], Seq[Long], Array[Byte])] =
    spark.table(table)
      .as[(String, Seq[String], Seq[Long], Array[Byte])].collect()
      .zipWithIndex
      .groupBy(_._1._1)
      .map { case (k, rows) => // last emission per key wins (Update mode)
        val r = rows.maxBy(_._2)._1
        k -> ((r._2, r._3, r._4))
      }

  test("streamed sketch is bit-identical to the batch CMS; top-k carries its estimates") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.Fixture(spark, sfDir).documents
    val toks = TextAnalysis.tokenRows(docs, "text", "doc_id")
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select(col("lang"), col("tok"))
    val events = toks.as[(String, String)].collect()
      .map { case (k, i) => ItemEvent(k, i) }
    val k = 10
    val input = MemoryStream[ItemEvent]
    val q = StreamHeavyHitters.heavyHitters(input.toDS(), k, eps, conf)
      .writeStream.format("memory").queryName("shh")
      .outputMode(OutputMode.Update).start()
    try {
      val (b1, rest) = events.splitAt(events.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 3)
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
      input.addData(b3.toIndexedSeq); q.processAllAvailable()
      val drained = latest("shh")

      // batch sketches over the same rows, same eps/confidence/seed
      val batch = Aggregates.cmsSketches(toks, "lang", "tok", eps, conf)
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
      assert(drained.keySet === batch.keySet)
      for ((key, (items, ests, sketch)) <- drained) {
        assert(java.util.Arrays.equals(sketch, batch(key)),
          s"streamed sketch for $key not bit-identical to the batch blob")
        // the emitted estimates ARE the batch sketch's estimates
        val probed = Aggregates.cmsProbe(
          Seq(Tuple1(batch(key))).toDF("sketch"), items)
        assert(ests === items.map(probed(_)),
          s"top-k estimates for $key diverged from the batch sketch")
        // CMS one-sidedness carries over: never undercount a true count
        val trueCounts = toks.filter(col("lang") === key)
          .groupBy("tok").count().as[(String, Long)].collect().toMap
        items.zip(ests).foreach { case (i, e) =>
          assert(e >= trueCounts(i), s"undercount for $i in $key")
        }
      }
      // and the top-k candidates contain the true heavy hitter per key
      for ((key, (items, _, _)) <- drained) {
        val top = toks.filter(col("lang") === key).groupBy("tok").count()
          .orderBy(col("count").desc, col("tok")).limit(1)
          .as[(String, Long)].collect().head._1
        assert(items.contains(top), s"true top token $top missing for $key")
      }
    } finally q.stop()
  }

  test("batch-cut invariance: a different split yields the identical final snapshot") {
    implicit val sqlCtx = spark.sqlContext
    val events = (0 until 400).map(i =>
      ItemEvent("k", s"tok${i % 17}")) ++ (0 until 50).map(_ => ItemEvent("k", "hot"))
    def runSplit(cuts: Seq[Seq[ItemEvent]], name: String) = {
      val input = MemoryStream[ItemEvent]
      val q = StreamHeavyHitters.heavyHitters(input.toDS(), 5, eps, conf)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update).start()
      try {
        cuts.foreach { c => input.addData(c.toIndexedSeq); q.processAllAvailable() }
        latest(name)
      } finally q.stop()
    }
    val a = runSplit(Seq(events.take(100), events.drop(100)), "shh_a")
    val b = runSplit(Seq(events.take(313), events.slice(313, 377),
      events.drop(377)), "shh_b")
    // the SKETCH is what the operator guarantees cut-invariant (sums
    // commute); the candidate top-k is path-dependent in general — an
    // item evicted early only re-enters on re-arrival — so it is NOT
    // asserted across cuts. "hot" arrives only in the tail (indices
    // ≥ 400), which lies inside the FINAL batch of both cuts, so its
    // cumulative estimate is reconsidered there and must be retained —
    // that is the assertable guarantee.
    assert(java.util.Arrays.equals(a("k")._3, b("k")._3),
      "final sketch depends on where the stream was cut")
    assert(a("k")._1.contains("hot") && b("k")._1.contains("hot"),
      "true heavy hitter missing from a cut's final candidates")
  }

  test("TTL path: data arms the deadline, expiry emits the final snapshot and forgets the key") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import graft.streaming.StreamHeavyHitters.HhState
    val ttl = Some(java.time.Duration.ofMinutes(5))
    // data batch: counts fold in AND the processing-time timeout arms
    val s1 = TestGroupState.create[HhState](
      optionalState = org.apache.spark.api.java.Optional.empty[HhState](),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val out1 = StreamHeavyHitters.foldGroup(3, eps, conf, ttl)(
      "k", Iterator(ItemEvent("k", "a"), ItemEvent("k", "a"), ItemEvent("k", "b")), s1)
    assert(out1.top_items === Seq("a", "b") && out1.estimates === Seq(2L, 1L))
    assert(s1.getTimeoutTimestampMs.get() === 1000L + 5L * 60L * 1000L)

    // expiry invocation: emits the retained candidates' estimates from
    // the retained sketch, then removes state
    val s2 = TestGroupState.create[HhState](
      optionalState = org.apache.spark.api.java.Optional.of(s1.get),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L + 6L * 60L * 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = true)
    val out2 = StreamHeavyHitters.foldGroup(3, eps, conf, ttl)(
      "k", Iterator.empty, s2)
    assert(out2.top_items === Seq("a", "b") && out2.estimates === Seq(2L, 1L))
    assert(s2.isRemoved)
  }

  test("null items are skipped, matching the batch count_min_sketch agg") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import graft.streaming.StreamHeavyHitters.HhState
    val s = TestGroupState.create[HhState](
      optionalState = org.apache.spark.api.java.Optional.empty[HhState](),
      timeoutConf = GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    // a null item must neither crash the fold (CountMinSketch.add(null)
    // throws) nor enter the candidate set
    val out = StreamHeavyHitters.foldGroup(3, eps, conf, None)(
      "k", Iterator(ItemEvent("k", "a"), ItemEvent("k", null), ItemEvent("k", "a")), s)
    assert(out.top_items === Seq("a") && out.estimates === Seq(2L))
  }

  test("default eps matches the batch cmsSketches default (mergeable blobs)") {
    // blobs built with each side's DEFAULTS must be mergeable — a
    // differing default makes mergeInPlace/cmsProbe throw
    // IncompatibleMergeException despite the mergeable-partial framing
    import spark.implicits._
    val streamed = StreamHeavyHitters.heavyHitters(
      Seq(ItemEvent("k", "a")).toDS(), k = 3)
    val defaultEpsBlob = Aggregates.cmsSketches(
      Seq(("k", "a")).toDF("lang", "tok"), "lang", "tok")
      .collect()(0).getAs[Array[Byte]]("sketch")
    val streamedBlob = streamed.collect()(0).sketch
    val merged = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(streamedBlob))
    merged.mergeInPlace(org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(defaultEpsBlob))) // throws if defaults diverge
    assert(merged.estimateCount("a") === 2L)
  }
}
