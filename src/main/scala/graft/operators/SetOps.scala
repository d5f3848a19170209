package graft.operators

import org.apache.spark.sql.DataFrame

/** Set operations (SURVEY §2.7).
  *
  * The reference maintains disjoint request/response sub-batches that land
  * in one table (`reference/src/lambda/processQueue.ts:30-33,44-47`) — a
  * union. Intersect/except are standard SQL parity (both DISTINCT-semantics,
  * matching SQL `INTERSECT`/`EXCEPT`).
  */
object SetOps {
  /** UNION ALL, resolved by column name — safe against projection reorder. */
  def unionAll(a: DataFrame, b: DataFrame): DataFrame = a.unionByName(b)
  def intersect(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)
  def except(a: DataFrame, b: DataFrame): DataFrame = a.except(b)
}
