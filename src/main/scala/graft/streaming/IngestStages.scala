package graft.streaming

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import org.apache.spark.sql.SparkSession

/** Per-batch stage plumbing shared by the ingest loops: named stages (a
  * Spark job description per stage, so `graft.JobProfile`'s per-job wall
  * breakdown is self-describing) and CONCURRENT submission of the
  * independent ones.
  *
  * Why concurrency here at all, in a declarative-Spark codebase: an
  * ingest trigger's cost at micro-batch size is not data — it is the
  * per-JOB fixed overhead (plan + submit + task launch + parquet commit,
  * ~0.3–0.6 s each at sf0.1) times the NUMBER of store writes, and the
  * writes are independent appends to disjoint directories reading one
  * already-materialized (localCheckpoint'd) batch. Submitting them from
  * one thread serializes pure overhead; submitting them concurrently
  * overlaps it — the scheduler interleaves the small jobs exactly as it
  * would concurrent queries. This changes WHEN jobs run, never what they
  * write: each write's content and layout stay deterministic, so the
  * replay/exactly-once contracts are untouched (spec-pinned by the
  * existing store-equality suites, which run against this path).
  *
  * The pool is CACHED (unbounded), not fixed: [[inParallel]] blocks its
  * calling thread until its stages settle, and the unified loop nests —
  * a family-level stage can itself fan out store-level stages. A fixed
  * pool whose threads all block in the outer Await is a deadlock waiting
  * for load; a cached pool cannot deadlock, and the thread count is
  * naturally bounded by the handful of concurrent stages a trigger has
  * (threads are submission-bound, not CPU-bound, and idle ones are
  * reclaimed). Daemon threads — never blocks JVM exit.
  */
private[streaming] object IngestStages {
  private lazy val pool: ExecutionContext = ExecutionContext.fromExecutorService(
    Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-ingest-stage")
      t.setDaemon(true)
      t
    }))

  /** Run `f`'s Spark jobs under a stage label (thread-local on the
    * calling thread — safe under the concurrent submission below, where
    * each stage runs on its own pool thread).
    */
  def stage[T](spark: SparkSession, label: String)(f: => T): T = {
    spark.sparkContext.setJobDescription(label)
    try f finally spark.sparkContext.setJobDescription(null)
  }

  /** Run the named stages CONCURRENTLY and wait for all; the first
    * failure propagates (the trigger must fail loudly, not half-write —
    * every stage is an idempotent batch-keyed overwrite, so the replay
    * after a propagated failure is safe by each store's own contract).
    */
  def inParallel(spark: SparkSession, stages: (String, () => Unit)*): Unit = {
    implicit val ec: ExecutionContext = pool
    val futs = stages.map { case (label, f) =>
      Future(stage(spark, label)(f()))
    }
    // surface the FIRST failure but only after every stage settles —
    // cancelling sibling writes mid-flight would leave more torn work
    // for the replay to overwrite than letting them finish
    val settled = Future.sequence(futs.map(_.transform(scala.util.Success(_))))
    Await.result(settled, Duration.Inf).foreach(_.get)
  }
}
