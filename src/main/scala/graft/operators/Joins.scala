package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join operators (SURVEY §2.3).
  *
  * Every reference join is an equi-join on `transaction_id`, either
  * app-orchestrated (per-row S3 fetch, `audit.services.ts:210-242`) or
  * delegated to Postgres (temp-table UPDATE-join,
  * `reference/src/lambda/processQueue.ts:230-238`). Spark-first: declare the
  * join, let Catalyst/AQE pick broadcast vs shuffled-hash vs sort-merge from
  * stats; hint `broadcast()` only where we *know* one side is small (dims,
  * top-K results).
  */
object Joins {

  /** Update-join / merge (J1, S7): base records enriched with the latest
    * status from an updates batch — the batch analog of the reference's
    * temp-table UPDATE. Inner equi-join; at scale both sides shuffle on the
    * key unless co-bucketed.
    */
  def mergeUpdates(base: DataFrame, updates: DataFrame, key: String): DataFrame =
    base.join(updates, Seq(key), "inner")

  def leftJoin(l: DataFrame, r: DataFrame, keys: Seq[String]): DataFrame =
    l.join(r, keys, "left_outer")

  /** Filter-by-existence (J4) — EXISTS without materializing right columns;
    * Spark builds only a key set for the probe.
    */
  def semiJoin(l: DataFrame, r: DataFrame, cond: Column): DataFrame =
    l.join(r, cond, "left_semi")

  /** Orphan detection (J5) — requests whose response never landed. */
  def antiJoin(l: DataFrame, r: DataFrame, cond: Column): DataFrame =
    l.join(r, cond, "left_anti")

  /** As-of join (J7 — an operator Spark lacks natively): for every left
    * row, the most recent right row with `right.ts <= left.ts` per key.
    *
    * Implemented by COMPOSITION, not a theta join: union both sides, ONE
    * shuffle+sort by (key, ts), then `last(value, ignoreNulls)` over the
    * running window fills each left row with the latest preceding right
    * value. A naive `l.join(r, l.ts >= r.ts)` + argmax would plan a
    * per-key O(|L|·|R|) nested loop; this is O((|L|+|R|) log) and scales
    * like any other single-sort window.
    *
    * Contract: right must be unique per (key, ts) (pre-aggregate if not)
    * with non-null value columns; coincident timestamps match (right rows
    * sort before left rows at equal ts via the marker).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               valueCols: Seq[String]): DataFrame = {
    // a left frame already carrying a value column would feed its OWN
    // values into the ignoreNulls fold, where they beat earlier right
    // values — a silently corrupted fill, not an error. The comparison
    // must mirror the session's resolver: under the default
    // caseSensitive=false, a left 'V' RESOLVES against valueCols("v")
    // (withColumn replaces it), so a case-sensitive guard would wave the
    // exact corruption through
    val caseSensitive = left.sparkSession.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    val clash = valueCols.filter(v => left.columns.exists(l =>
      if (caseSensitive) l == v else l.equalsIgnoreCase(v)))
    require(clash.isEmpty,
      s"asofJoin value column(s) ${clash.mkString(", ")} already exist on " +
        "the left side — rename or drop them before joining")
    val r = right
      .select((Seq(key, tsCol) ++ valueCols).map(col): _*)
      .withColumn("__m", lit(0))
    val u = left.withColumn("__m", lit(1)).unionByName(r, allowMissingColumns = true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col(tsCol), col("__m"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    valueCols.foldLeft(u) { (df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
      .filter(col("__m") === 1).drop("__m")
  }

  /** Range (interval-containment) join: left points `ts` matched to right
    * intervals `[startCol, endCol]` sharing `key`. A naive
    * `l.join(r, ts between ...)` plans a per-key nested loop (O(L·R));
    * here intervals explode into the fixed-width time buckets they cover,
    * the point's bucket equi-joins against them (hash join, shuffles on
    * (key, bucket)), and the exact BETWEEN refines. A point lies in exactly
    * one bucket, so containment matches are emitted exactly once. Bucket
    * width should approximate the typical interval length (wider → fewer
    * replicas per interval; narrower → tighter candidate sets).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
                tsCol: String, startCol: String, endCol: String,
                bucketSeconds: Long): DataFrame = {
    // DIV 0 below would null every bucket and return an empty join with
    // no error — the silently-empty class, refused loudly instead
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    val b = bucketSeconds * 1000000L
    // DIV, not `/`: Column./ is double division; exact integer bucketing
    // needs floor division (timestamps here are post-epoch ⇒ non-negative).
    // The column names are caller DATA — backtick-quoted into the one
    // fragment the parser still sees (DIV has no Column-API form).
    def qn(n: String): String = "`" + n.replace("`", "``") + "`"
    val p = points.withColumn("__bucket", expr(s"unix_micros(${qn(tsCol)}) DIV ${b}L"))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(expr(s"unix_micros(${qn(startCol)}) DIV ${b}L"),
        expr(s"unix_micros(${qn(endCol)}) DIV ${b}L"))))
    p.join(iv, Seq(key, "__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Skew-resistant equi-join by salting (the manual fallback where AQE's
    * runtime skew-join split doesn't apply, e.g. non-sort-merge plans or
    * pathological single keys): the big side's hot keys are spread across
    * `buckets` salted sub-keys (deterministic `pmod(hash(...))`, no rand()),
    * the small side is replicated `buckets`× via a `sequence` explode, and
    * the join runs on (key, salt). Result is row-identical to the unsalted
    * join; the hot key's rows now land on `buckets` tasks instead of one.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    // pmod(_, 0) nulls every salt and the join returns empty with no
    // error — same silently-empty class as rangeJoin's bucket width
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val saltedBig = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(buckets)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Multi-way star join (J6): fact ⋈ dims. Dims are broadcast explicitly —
    * at 100 TB the fact table must never shuffle for a <10 MB dimension.
    */
  def starJoin(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
}
