package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function surface (SURVEY §2.8) — everything the reference does to
  * individual values, re-expressed as codegen'd Catalyst built-ins (no UDFs
  * anywhere: a Scala UDF breaks whole-stage codegen and null-tracking).
  */
object Scalars {

  /** X1: day-partition key — `new Date().toISOString().split('T')[0]`
    * (`reference/src/services/s3.service.ts:33`).
    */
  def dayKey(ts: Column): Column = date_format(ts, "yyyy-MM-dd")

  /** X4: S3-style object key construction
    * (`reference/src/services/s3.service.ts:34`):
    * `audit/{date}/{txn}/{type}.json`.
    */
  def objectKey(prefix: String, dt: Column, txn: Column, kind: Column): Column =
    concat_ws("/", lit(prefix), dt, txn, concat(kind, lit(".json")))

  /** X5: schema-on-read JSON field extraction — the Lambda's
    * `JSON.parse` + projection (`reference/src/lambda/processQueue.ts:112-128`).
    */
  def jsonField(json: Column, path: String): Column = get_json_object(json, path)

  /** X7: duration-ms math with the reference's `toFixed(2)` rounding
    * (`reference/src/middleware/audit.middleware.ts:90-92`).
    */
  def durationMs(seconds: Column, nanos: Column): Column =
    round(seconds * 1000 + nanos / 1e6, 2)
}
