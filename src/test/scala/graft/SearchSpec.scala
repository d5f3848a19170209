package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Search

/** The reference's search path, including its six manual filter cases
  * ported verbatim from `reference/src/scripts/test-search.ts:4-11` onto a
  * synthetic `api_audit`-shaped table.
  */
class SearchSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val audit: DataFrame = Seq(
    // transaction_id, app_id, endpoint, workflow_id, action, status_code, ts_offset_s
    ("test-789", "test-app", "/api/users", "registration", "create", 200, 10),
    ("txn-2", "test-app", "/api/users", "registration", "create", 500, 20),
    ("txn-3", "test-app", "/api/orders", "checkout", "create", 200, 30),
    ("txn-4", "other-app", "/api/orders", "checkout", "update", 200, 40),
    ("txn-5", "other-app", "/api/users", "registration", "create", 404, 50))
    .toDF("transaction_id", "app_id", "endpoint", "workflow_id", "action", "status_code", "off")
    .withColumn("timestamp", expr("timestamp'2025-01-26 00:00:00' + make_interval(0,0,0,0,0,0,off)"))
    .drop("off")

  private def ids(df: DataFrame): Set[String] =
    df.select("transaction_id").as[String].collect().toSet

  test("test-search case 1: {appId}") {
    assert(ids(Search.dynamicFilter(audit, Map("app_id" -> "test-app"))) ===
      Set("test-789", "txn-2", "txn-3"))
  }

  test("test-search case 2: {statusCode: 200}") {
    assert(ids(Search.dynamicFilter(audit, Map("status_code" -> 200))) ===
      Set("test-789", "txn-3", "txn-4"))
  }

  test("test-search case 3: {workflowId: registration}") {
    assert(ids(Search.dynamicFilter(audit, Map("workflow_id" -> "registration"))) ===
      Set("test-789", "txn-2", "txn-5"))
  }

  test("test-search case 4: {appId, statusCode}") {
    assert(ids(Search.dynamicFilter(audit,
      Map("app_id" -> "test-app", "status_code" -> 200))) === Set("test-789", "txn-3"))
  }

  test("test-search case 5: {appId, workflowId}") {
    assert(ids(Search.dynamicFilter(audit,
      Map("app_id" -> "test-app", "workflow_id" -> "registration"))) ===
      Set("test-789", "txn-2"))
  }

  test("test-search case 6: {transactionId}") {
    assert(ids(Search.dynamicFilter(audit, Map("transaction_id" -> "test-789"))) ===
      Set("test-789"))
  }

  test("zero filters = no WHERE (audit.services.ts:143-145)") {
    assert(Search.dynamicFilter(audit, Map.empty).count() === audit.count())
  }

  test("search: newest-first cap, like ORDER BY timestamp DESC LIMIT 100") {
    val top2 = Search.search(audit, Map.empty, "timestamp", "transaction_id", 2)
    assert(top2.select("transaction_id").as[String].collect().toSeq === Seq("txn-5", "txn-4"))
  }

  test("search plan: filters reach the scan; top-K plans as TakeOrderedAndProject") {
    val events = sources.Tables.Fixture(spark, sfDir).events
    val q = Search.search(events, Map("event_type" -> "purchase"), "ts", "event_id", 100)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("TakeOrderedAndProject"), s"expected top-K physical op:\n$physical")
    val scan = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]"),
      s"expected pushed filter in scan:\n$scan")
  }

  test("enrich: left join keeps unmatched rows with nulls (J2/J3)") {
    val payloads = Seq(("test-789", "req-body")).toDF("transaction_id", "payload")
    val out = Search.enrich(audit, payloads.withColumnRenamed("transaction_id", "txn"),
      col("transaction_id") === col("txn"))
    assert(out.count() === audit.count())
    assert(out.filter(col("payload").isNotNull).count() === 1)
  }
}
