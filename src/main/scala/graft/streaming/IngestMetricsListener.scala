package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.jdk.CollectionConverters._

/** Metrics sink (SURVEY §2.9 R6): the reference pushes per-batch counters
  * (RequestsProcessed / ResponsesProcessed / FailedRecords / ProcessingTime)
  * to CloudWatch, swallowing failures
  * (`reference/src/lambda/processQueue.ts:256-293`). Here the stream's
  * `observe("ingest", ...)` aggregates surface through the listener — no
  * separate metric write path, no extra job, and a real metrics backend
  * would subscribe exactly the same way.
  *
  * The buffer is a RING capped at `maxBatches` (oldest dropped): a
  * listener on a long-running stream accumulating one row per trigger
  * forever is a slow driver leak. A backend that wants every row
  * subscribes in `onQueryProgress` itself; this buffer is the
  * inspection window.
  */
final class IngestMetricsListener(maxBatches: Int = 10000)
    extends StreamingQueryListener {

  final case class BatchMetrics(
      batchId: Long,
      requestsProcessed: Long,
      responsesProcessed: Long,
      failedRecords: Long,
      processingTimeMs: Long)

  private val buf = new ConcurrentLinkedQueue[BatchMetrics]()

  def batches: Seq[BatchMetrics] = buf.iterator().asScala.toSeq

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    Option(p.observedMetrics.get("ingest")).foreach { row =>
      buf.add(BatchMetrics(
        p.batchId,
        row.getAs[Long]("requests_processed"),
        row.getAs[Long]("responses_processed"),
        row.getAs[Long]("failed_records"),
        p.batchDuration))
      while (buf.size > maxBatches) buf.poll()
    }
  }
}
