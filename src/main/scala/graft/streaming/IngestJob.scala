package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** The reference's ingestion pipeline (SURVEY §3.1), re-expressed as ONE
  * Structured Streaming job.
  *
  * Reference flow: HTTP middleware serializes request/response envelopes to
  * S3 (`reference/src/middleware/audit.middleware.ts:44-88`), S3 events fan
  * through SQS to a Lambda (`reference/src/lambda/processQueue.ts:100-113`)
  * that classifies each blob by key (`:113`), batches ≤100 (`:5,245-248`),
  * then INSERTs request rows and UPDATE-joins response rows into Postgres
  * (`:162-244`) with per-batch transactions and retries (`:131-160`).
  *
  * Spark realization: a file source replaces S3→SQS→Lambda discovery (new
  * files ARE the event stream; `maxFilesPerTrigger` is the batch-size
  * analog), `foreachBatch` replaces the Lambda body, and checkpointing +
  * idempotent merge gives exactly-once per epoch — strictly stronger than
  * the reference's at-least-once with 3 retries.
  *
  * Merge semantics: request and response sub-events correlate on
  * `transaction_id` (`processQueue.ts:230-238`). The reference silently
  * drops a response that arrives before its request (its UPDATE matches 0
  * rows — SURVEY §2.9 R3). We deliberately deviate (SURVEY §7.4): an early
  * response is kept as a pending row with null request fields and completes
  * when the request lands — the merge is a single `groupBy(transaction_id)`
  * with null-skipping `max` aggregates, which is order-insensitive,
  * idempotent under batch replay, and one shuffle at any scale. A second
  * deliberate deviation: if a transaction receives MULTIPLE conflicting
  * responses (retries), `max` keeps the highest value per field — the
  * reference's sequential UPDATEs are last-write-wins, but SQS redelivery
  * makes its "last" arrival-order-dependent; `max` is deterministic.
  *
  * Store layout: date-partitioned Parquet (`dt=yyyy-MM-dd`), mirroring the
  * reference's `audit/{date}/...` object scheme (`s3.service.ts:33-34`) and
  * giving partition pruning on time-ranged queries. At 100 TB the
  * rewrite-on-merge becomes a Delta/Iceberg MERGE (merge-on-read); the
  * batch-side plan (union + hash-agg on the key) is unchanged.
  */
object IngestJob {

  /** Raw envelope schema — union of the request shape
    * (`processQueue.ts:116-123`) and response shape (`:124-128`).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("transactionId", StringType),
    StructField("appId", StringType),
    StructField("endpoint", StringType),
    StructField("workflowId", StringType),
    StructField("action", StringType),
    StructField("timestamp", StringType),
    StructField("statusCode", IntegerType),
    StructField("requestS3Key", StringType),
    StructField("responseS3Key", StringType)))

  /** The `api_audit` analog (DDL `reference/src/scripts/setup-db.ts:55-68`;
    * `BIGSERIAL id` deliberately omitted — SURVEY §7.4).
    */
  val storeSchema: StructType = StructType(Seq(
    StructField("transaction_id", StringType, nullable = false),
    StructField("app_id", StringType),
    StructField("endpoint", StringType),
    StructField("workflow_id", StringType),
    StructField("action", StringType),
    StructField("status_code", IntegerType),
    StructField("timestamp", TimestampType),
    StructField("request_s3_key", StringType),
    StructField("response_s3_key", StringType)))

  /** Classification + projection: the Lambda's key-based routing
    * (`processQueue.ts:113-128`). `srcKey` is the file path (the S3-key
    * analog); request envelopes contribute request fields, response
    * envelopes only (status_code, response_s3_key).
    */
  def toRecords(envelopes: DataFrame): DataFrame = {
    // match the full file name, exactly like the reference's
    // `key.includes('request.json')` — a bare "request" substring would
    // misroute paths whose transaction id happens to contain it
    val isReq = col("srcKey").contains("request.json")
    envelopes.select(
      col("transactionId").as("transaction_id"),
      when(isReq, col("appId")).as("app_id"),
      when(isReq, col("endpoint")).as("endpoint"),
      when(isReq, col("workflowId")).as("workflow_id"),
      when(isReq, col("action")).as("action"),
      when(!isReq, col("statusCode")).as("status_code"),
      when(isReq, to_timestamp(col("timestamp"))).as("timestamp"),
      when(isReq, col("requestS3Key")).as("request_s3_key"),
      when(!isReq, col("responseS3Key")).as("response_s3_key"))
  }

  /** Set-based merge of any mix of store rows / request rows / response
    * rows: one hash aggregation on the key; null-skipping `max` picks the
    * populated value per field. Insert, update-join, AND the out-of-order
    * case fall out of the same plan (the reference needs three code paths:
    * `processQueue.ts:162-198` insert, `:199-244` update, drop-on-miss).
    */
  def merge(store: DataFrame, records: DataFrame): DataFrame =
    store.unionByName(records)
      .groupBy(col("transaction_id"))
      .agg(
        max("app_id").as("app_id"),
        max("endpoint").as("endpoint"),
        max("workflow_id").as("workflow_id"),
        max("action").as("action"),
        max("status_code").as("status_code"),
        max("timestamp").as("timestamp"),
        max("request_s3_key").as("request_s3_key"),
        max("response_s3_key").as("response_s3_key"))

  /** Read the current store; if the primary directory is missing because a
    * crash landed inside [[writeStore]]'s swap, fall back to the `.bak`
    * generation (always the last fully-written store — see the swap
    * protocol below), so epoch replay re-merges against good data instead
    * of an empty frame.
    */
  def readStore(spark: SparkSession, storeDir: String): DataFrame = {
    val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val candidate = Seq(storeDir, storeDir + ".bak").find(p => fs.exists(new Path(p)))
    candidate match {
      case Some(p) =>
        spark.read.schema(StructType(storeSchema.fields :+ StructField("dt", StringType)))
          .parquet(p).drop("dt")
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], storeSchema)
    }
  }

  /** Write-then-swap so the store is never read and overwritten in the same
    * job (Parquet reads lazily during write). Swap protocol: write `.tmp`,
    * rotate current → `.bak`, promote `.tmp`, drop `.bak`. At every crash
    * point either the primary or `.bak` holds the last fully-written
    * generation ([[readStore]] checks both), and checkpointed epoch replay
    * re-merges to the identical result — no window loses the store.
    */
  private def writeStore(spark: SparkSession, merged: DataFrame, storeDir: String): Unit = {
    val withDt = merged.withColumn("dt", date_format(col("timestamp"), "yyyy-MM-dd"))
    val tmp = storeDir + ".tmp"
    withDt.write.mode("overwrite").partitionBy("dt").parquet(tmp)
    val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new Path(storeDir)
    val bak = new Path(storeDir + ".bak")
    if (fs.exists(bak)) fs.delete(bak, true) // stale backup from a past crash
    if (fs.exists(dst)) fs.rename(dst, bak)
    fs.rename(new Path(tmp), dst)
    fs.delete(bak, true)
  }

  /** One micro-batch = the Lambda body (`processQueue.ts:22-80`). */
  def processBatch(spark: SparkSession, batch: DataFrame, storeDir: String): Unit = {
    val merged = merge(readStore(spark, storeDir), toRecords(batch))
    writeStore(spark, merged, storeDir)
  }

  /** Start the ingestion stream over a directory of request/response JSON
    * envelopes. `maxFilesPerTrigger` mirrors the Lambda batch cap of 100
    * (`processQueue.ts:5`); `observe` mirrors its CloudWatch counters
    * (`:256-281` — RequestsProcessed / ResponsesProcessed), surfaced through
    * any registered `StreamingQueryListener`.
    */
  def run(
      spark: SparkSession,
      inDir: String,
      storeDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 100,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val envelopes = spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(inDir)
      .withColumn("srcKey", col("_metadata.file_path"))
      .observe("ingest",
        count(when(col("srcKey").contains("request.json"), 1)).as("requests_processed"),
        count(when(!col("srcKey").contains("request.json"), 1)).as("responses_processed"),
        count(when(col("transactionId").isNull, 1)).as("failed_records"))
    envelopes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(spark, batch, storeDir)
      }
      .start()
  }
}
