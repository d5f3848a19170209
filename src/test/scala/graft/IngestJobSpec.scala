package graft

import java.nio.file.{Files, Path}
import graft.streaming.{IngestJob, IngestMetricsListener}

/** End-to-end streaming smoke for the §3.1 pipeline, mirroring the
  * reference's Lambda fixtures (txn `test-789`,
  * `reference/src/scripts/test-lambda.ts:8-52`) including the
  * response-before-request case the reference silently drops
  * (SURVEY §2.9 R3 / §7.4 — we merge it correctly as a deliberate
  * deviation).
  */
class IngestJobSpec extends SparkTestBase {

  private def tmpDir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  private def writeJson(dir: Path, name: String, json: String): Unit =
    Files.writeString(dir.resolve(name), json)

  private def request(txn: String, ts: String): String =
    s"""{"transactionId":"$txn","appId":"test-app","endpoint":"/api/users",
       |"workflowId":"registration","action":"create","timestamp":"$ts",
       |"requestS3Key":"audit/2025-01-26/$txn/request.json"}""".stripMargin.replaceAll("\n", "")

  private def response(txn: String, status: Int): String =
    s"""{"transactionId":"$txn","statusCode":$status,
       |"responseS3Key":"audit/2025-01-26/$txn/response.json"}""".stripMargin.replaceAll("\n", "")

  test("ingest merges request+response on transaction_id, both arrival orders") {
    val in = tmpDir("graft-in")
    val store = tmpDir("graft-store").resolve("audit").toString
    val cp = tmpDir("graft-cp").toString

    val listener = new IngestMetricsListener
    spark.streams.addListener(listener)
    try {
      // batch 1: normal order for test-789; EARLY response for txn-early
      writeJson(in, "b1-test-789-request.json", request("test-789", "2025-01-26T10:00:00Z"))
      writeJson(in, "b1-txn-early-response.json", response("txn-early", 503))
      val q1 = IngestJob.run(spark, in.toString, store, cp, maxFilesPerTrigger = 10)
      q1.awaitTermination()

      val afterB1 = spark.read.parquet(store)
      assert(afterB1.count() === 2)
      val early = afterB1.filter("transaction_id = 'txn-early'").collect().head
      assert(early.getAs[Integer]("status_code") === 503,
        "early response must be kept pending, not dropped (deviation from reference R3)")
      assert(early.getAs[String]("endpoint") === null)

      // batch 2: the response for test-789 and the LATE request for txn-early
      writeJson(in, "b2-test-789-response.json", response("test-789", 200))
      writeJson(in, "b2-txn-early-request.json", request("txn-early", "2025-01-26T09:59:00Z"))
      val q2 = IngestJob.run(spark, in.toString, store, cp, maxFilesPerTrigger = 10)
      q2.awaitTermination()

      val rows = spark.read.parquet(store)
      assert(rows.count() === 2)
      val done = rows.filter("transaction_id = 'test-789'").collect().head
      assert(done.getAs[Integer]("status_code") === 200)
      assert(done.getAs[String]("app_id") === "test-app")
      assert(done.getAs[String]("request_s3_key").endsWith("test-789/request.json"))
      assert(done.getAs[String]("response_s3_key").endsWith("test-789/response.json"))
      // partition-column type inference reads dt back as DATE
      assert(done.getAs[AnyRef]("dt").toString === "2025-01-26")

      val merged = rows.filter("transaction_id = 'txn-early'").collect().head
      assert(merged.getAs[Integer]("status_code") === 503)
      assert(merged.getAs[String]("endpoint") === "/api/users",
        "late request must complete the pending response row")

      // R6: observed metrics reached the listener (CloudWatch analog)
      val batches = listener.batches
      assert(batches.map(_.requestsProcessed).sum === 2)
      assert(batches.map(_.responsesProcessed).sum === 2)
      assert(batches.map(_.failedRecords).sum === 0)
    } finally spark.streams.removeListener(listener)
  }

  test("transaction ids containing 'request' still classify by file name") {
    val in = tmpDir("graft-in3")
    val store = tmpDir("graft-store3").resolve("audit").toString
    writeJson(in, "request-retry-1-request.json", request("request-retry-1", "2025-01-26T10:00:00Z"))
    writeJson(in, "request-retry-1-response.json", response("request-retry-1", 200))
    val q = IngestJob.run(spark, in.toString, store, tmpDir("graft-cp3").toString)
    q.awaitTermination()
    val row = spark.read.parquet(store).collect().head
    assert(row.getAs[Integer]("status_code") === 200,
      "response for a txn id containing 'request' must not be misrouted")
    assert(row.getAs[String]("app_id") === "test-app")
  }

  test("store survives a crash between swap renames (.bak recovery)") {
    val store = tmpDir("graft-store4").resolve("audit").toString
    import org.apache.spark.sql.functions.lit
    val b1 = spark.read.schema(IngestJob.rawSchema)
      .json(spark.createDataset(Seq(request("txn-a", "2025-01-26T10:00:00Z")))(
        org.apache.spark.sql.Encoders.STRING))
      .withColumn("srcKey", lit("a-request.json"))
    IngestJob.processBatch(spark, b1, store)
    // simulate the crash window: primary renamed away, promotion not done
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(store), new org.apache.hadoop.fs.Path(store + ".bak"))
    assert(IngestJob.readStore(spark, store).count() === 1,
      "readStore must fall back to the .bak generation")
    // epoch replay after the crash must restore the full store
    IngestJob.processBatch(spark, b1, store)
    assert(spark.read.parquet(store).count() === 1)
  }

  test("batch replay is idempotent (exactly-once per epoch)") {
    val in = tmpDir("graft-in2")
    val store = tmpDir("graft-store2").resolve("audit").toString
    writeJson(in, "r.json", request("txn-r", "2025-01-26T10:00:00Z"))
    // same batch content merged twice against the store must not duplicate
    val batch = spark.read.schema(IngestJob.rawSchema).json(in.toString)
      .withColumn("srcKey", org.apache.spark.sql.functions.lit("r-request.json"))
    IngestJob.processBatch(spark, batch, store)
    IngestJob.processBatch(spark, batch, store)
    assert(spark.read.parquet(store).count() === 1)
  }
}
