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
}
