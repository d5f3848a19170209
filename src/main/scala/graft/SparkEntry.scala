package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All declared queries live as [[QuerySpec]]s in per-domain modules
  * ([[RelationalQueries]], …); this object just flattens them into the
  * driver's two maps and exposes the flagship entry point.
  */
object SparkEntry {

  /** Every declared query, across all waves. */
  def allSpecs: Seq[QuerySpec] =
    RelationalQueries.specs ++ NsQueries.specs ++ PipelineQueries.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's flagship read path: filter* → ORDER BY ts DESC →
    * LIMIT 100 (`reference/src/services/audit.services.ts:148-163`).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
