package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.sources.Sinks

/** The JDBC sink round-trip against EMBEDDED DERBY (ships with the Spark
  * distribution) — the one reference sink shape with no parquet twin:
  * `reference/src/lambda/processQueue.ts:162-244` writes Postgres
  * `api_audit` with chunked INSERTs then a temp-table UPDATE-join. Both
  * shapes here: plain append, and upsert with [[graft.streaming
  * .IngestJob.merge]]'s null-skipping-max semantics.
  */
class JdbcSinkSpec extends SparkTestBase {
  import spark.implicits._

  private def derbyUrl(): String = {
    val dir = Files.createTempDirectory("graft-derby")
    dir.toFile.deleteOnExit()
    s"jdbc:derby:$dir/db;create=true"
  }

  test("append sink round-trips rows in batchsize chunks") {
    val url = derbyUrl()
    val b1 = Seq(("t1", "app-a", 200), ("t2", "app-a", 404))
      .toDF("transaction_id", "app_id", "status_code")
    val b2 = Seq(("t3", "app-b", 201)).toDF("transaction_id", "app_id", "status_code")
    Sinks.writeJdbc(b1, url, "api_audit", batchSize = 2)
    Sinks.writeJdbc(b2, url, "api_audit", batchSize = 2)
    val back = Sinks.readJdbc(spark, url, "api_audit")
      .orderBy("transaction_id").collect().map(r =>
        (r.getAs[String]("transaction_id"), r.getAs[String]("app_id"),
          r.getAs[Int]("status_code")))
    assert(back.toSeq === Seq(("t1", "app-a", 200), ("t2", "app-a", 404),
      ("t3", "app-b", 201)))
  }

  test("upsert merges on the key with null-skipping max, like the ingest store") {
    val url = derbyUrl()
    // request rows land first: status unknown (the reference's INSERT path)
    val requests = Seq(
      Row("t1", "app-a", null), Row("t2", "app-a", null), Row("t3", "app-b", null))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("transaction_id",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("app_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("status_code",
        org.apache.spark.sql.types.IntegerType)))
    val reqDf = spark.createDataFrame(
      spark.sparkContext.parallelize(requests), schema)
    Sinks.writeJdbc(reqDf, url, "api_audit")
    // response batch: t1 completes, t2 gets CONFLICTING retries (the max
    // wins deterministically), t4 arrives response-first (kept, not
    // dropped — the deliberate R3 deviation)
    val responses = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("t1", null, Integer.valueOf(200)),
      Row("t2", null, Integer.valueOf(500)), Row("t2", null, Integer.valueOf(503)),
      Row("t4", null, Integer.valueOf(201)))), schema)
    Sinks.upsertJdbc(spark, responses, url, "api_audit", "transaction_id")
    val back = Sinks.readJdbc(spark, url, "api_audit")
      .orderBy("transaction_id").collect().map(r =>
        (r.getAs[String]("transaction_id"), r.getAs[String]("app_id"),
          r.getAs[Integer]("status_code")))
    assert(back.toSeq === Seq(
      ("t1", "app-a", Integer.valueOf(200)),
      ("t2", "app-a", Integer.valueOf(503)),
      ("t3", "app-b", null: Integer),
      ("t4", null, Integer.valueOf(201))))
    // idempotent under replay: re-upserting the same batch changes nothing
    Sinks.upsertJdbc(spark, responses, url, "api_audit", "transaction_id")
    assert(Sinks.readJdbc(spark, url, "api_audit").count() === 4)
  }

  test("upsert into a missing table bootstraps it") {
    val url = derbyUrl()
    val updates = Seq(("t1", "app-a", 200)).toDF("transaction_id", "app_id", "status_code")
    Sinks.upsertJdbc(spark, updates, url, "fresh_table", "transaction_id")
    assert(Sinks.readJdbc(spark, url, "fresh_table").count() === 1)
  }

  test("upsert into a key-only table dedups on the key") {
    val url = derbyUrl()
    Sinks.writeJdbc(Seq("t1", "t2").toDF("transaction_id"), url, "seen_ids")
    Sinks.upsertJdbc(spark, Seq("t2", "t3").toDF("transaction_id"),
      url, "seen_ids", "transaction_id")
    val back = Sinks.readJdbc(spark, url, "seen_ids")
      .orderBy("transaction_id").collect().map(_.getString(0))
    assert(back.toSeq === Seq("t1", "t2", "t3"))
  }

  test("upsert preserves the target's DDL (the reference's b-tree index survives)") {
    val url = derbyUrl()
    val b1 = Seq(("t1", "app-a", 200)).toDF("transaction_id", "app_id", "status_code")
    Sinks.writeJdbc(b1, url, "idx_audit")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      // the reference's setup-db.ts b-tree (on the INT column here —
      // Spark's Derby dialect maps StringType to CLOB, not indexable)
      conn.createStatement().executeUpdate(
        """CREATE INDEX idx_txn ON idx_audit ("status_code")""")
      Sinks.upsertJdbc(spark,
        Seq(("t2", "app-b", 201)).toDF("transaction_id", "app_id", "status_code"),
        url, "idx_audit", "transaction_id")
      // a drop-and-recreate overwrite would have silently discarded it
      val rs = conn.getMetaData.getIndexInfo(null, null, "IDX_AUDIT", false, false)
      var names = Set.empty[String]
      while (rs.next()) names += Option(rs.getString("INDEX_NAME")).getOrElse("")
      assert(names.contains("IDX_TXN"),
        s"upsert must not rebuild the table and drop its indexes, saw $names")
      // and the staging table was reclaimed
      val ts = conn.getMetaData.getTables(null, null, "IDX_AUDIT_GRAFT_STAGE", null)
      assert(!ts.next(), "staging table must be dropped after the swap")
    } finally conn.close()
    assert(Sinks.readJdbc(spark, url, "idx_audit").count() === 2)
  }
}
