package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's flagship read path — `GET /api/audit/search` — as a
  * declarative DataFrame pipeline.
  *
  * Reference behavior (`reference/src/services/audit.services.ts:109-163`):
  * a WHERE clause is built only from the filters actually present (0–5
  * optional equality predicates AND-ed), then
  * `ORDER BY timestamp DESC LIMIT 100` with an explicit column list.
  *
  * Spark realization: `foldLeft` over the filter map produces chained
  * `Filter` nodes that Catalyst collapses and pushes into the Parquet scan
  * (`PushedFilters` in `.explain`); sort+limit plans as
  * `TakeOrderedAndProject` — no global sort is materialized, each partition
  * keeps a size-N heap and the driver merges, which is exactly the plan you
  * want at 100 TB (scan-local top-K, single narrow exchange of N·partitions
  * rows).
  */
object Search {

  /** Dynamic conjunctive equality filter (SURVEY §2.2 F1).
    * Only filters present in the map contribute a predicate — the WHERE is
    * omitted entirely for an empty map, mirroring
    * `audit.services.ts:143-145`.
    */
  def dynamicFilter(df: DataFrame, filters: Map[String, Any]): DataFrame =
    filters.foldLeft(df) { case (d, (c, v)) => d.filter(col(c) === lit(v)) }

  /** Top-K by explicit sort columns (SURVEY §2.6 T1). Always pair limit with
    * a total order (unique tiebreak) — a bare LIMIT is nondeterministic.
    */
  def topK(df: DataFrame, sort: Seq[Column], k: Int): DataFrame =
    df.orderBy(sort: _*).limit(k)

  /** Full search path: filter* → sort desc → limit → project.
    * `sortKey` newest-first with `tiebreak` for determinism; reference caps
    * at 100 rows (`audit.services.ts:161-162`).
    */
  def search(
      df: DataFrame,
      filters: Map[String, Any],
      sortKey: String,
      tiebreak: String,
      limit: Int = 100): DataFrame =
    topK(dynamicFilter(df, filters), Seq(col(sortKey).desc, col(tiebreak).desc), limit)

  /** Detail-fetch enrichment (SURVEY §2.3 J2, §3.3): the reference does N×2
    * parallel S3 GETs per result row; here the top-K result (tiny) is
    * left-joined to the payload table with the *dimension* side broadcast,
    * so no shuffle of the big side ever happens.
    */
  def enrich(results: DataFrame, payloads: DataFrame, cond: Column): DataFrame =
    results.join(broadcast(payloads), cond, "left")
}
