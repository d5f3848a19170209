package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-analytics shapes over the `events` table (reference-absent;
  * [NS] extensions in the spirit of SURVEY §2.10's "what the reference's
  * users would run next"): ordered funnels and cohort retention. Both are
  * one-or-two-shuffle plans built from partial-agg-friendly primitives —
  * no windows over the full event stream, no driver-side iteration — so
  * the shapes hold at 100 TB where per-user event lists are the only
  * working-set bound.
  */
object EventAnalytics {

  /** Ordered conversion funnel: a user "reaches" stage k when events of
    * type `steps(0) … steps(k-1)` exist at STRICTLY increasing
    * timestamps (the earliest-first greedy chain, which is optimal for
    * existence: taking the earliest completion of stage i can only help
    * stage i+1). Returns one row per step: (step, step_name, n_users,
    * pct_of_first_x100) with integer-exact percentages.
    *
    * Plan: project events down to (user, µs-ts, stage) with a
    * `when`-chain stage map and a pushed `isin` filter (only funnel-
    * relevant types ever shuffle), ONE groupBy(user) collecting the
    * per-user (ts, stage) pairs, then a codegen'd `aggregate` fold over
    * the sorted pairs — the accumulator advances exactly when the next
    * element is the next stage at a later timestamp. The final per-step
    * rollup is a single-row conditional-sum aggregate exploded with
    * `stack`. Per-user state is bounded by that user's funnel-relevant
    * events (not the corpus), the fold is sequential within a row and
    * deterministic, and the whole chain is two exchanges at any scale.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "funnel steps must be non-empty and distinct")
    val k = steps.size
    val stage = steps.zipWithIndex.foldLeft(lit(null).cast("long")) {
      case (acc, (s, i)) => when(col(typeCol) === s, lit((i + 1).toLong)).otherwise(acc)
    }
    val perUser = events
      .filter(col(typeCol).isin(steps.map(lit): _*))
      .select(col(userCol),
        struct(unix_micros(col(tsCol)).as("ts"), stage.as("st")).as("ev"))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(col("ev"))).as("evs"))
      .select(
        aggregate(
          col("evs"),
          struct(lit(-1L).as("ts"), lit(0L).as("st")),
          // advance ⇔ next stage AND strictly later ts; the element
          // itself is then exactly the new accumulator state
          (acc, e) => when(e("st") === acc("st") + 1L && e("ts") > acc("ts"), e)
            .otherwise(acc)
        )("st").as("reached"))
    // coalesce: a global agg over ZERO users yields NULL sums — the empty
    // funnel must report 0s, not nulls
    val sums = (1 to k).map(i =>
      coalesce(sum(when(col("reached") >= i.toLong, 1L).otherwise(0L)), lit(0L)).as(s"s$i"))
    val stackArgs = (1 to k).map { i =>
      s"CAST($i AS BIGINT), '${steps(i - 1)}', s$i, (100 * s$i) DIV greatest(s1, 1)"
    }.mkString(", ")
    perUser.agg(sums.head, sums.tail: _*)
      .selectExpr(s"stack($k, $stackArgs) AS (step, step_name, n_users, pct_of_first_x100)")
      .orderBy("step")
  }

  /** Session-scoped ordered funnel: the [[funnel]] chain evaluated WITHIN
    * each activity session ([[Windows.sessionAgg]]'s gap rule — a new
    * session starts after `gapSeconds` of silence, over ALL events, not
    * just funnel types: the session boundary is an activity property).
    * One row per step: (step, step_name, n_sessions, n_users) — sessions
    * completing the chain through step k, and distinct users owning at
    * least one such session.
    *
    * Plan: ONE window sort per user assigns session ids (the same
    * exchange the sessionization operator pays), then the type-pruned
    * fold groups by (user, session) — the window's user partitioning is
    * reusable by the groupBy — and the rollup is a single-row aggregate
    * over per-session rows (the Expand for the per-step distinct-user
    * counts runs over sessions, orders of magnitude below events).
    */
  def sessionFunnel(events: DataFrame, userCol: String, tsCol: String,
                    tiebreakCol: String, typeCol: String,
                    steps: Seq[String], gapSeconds: Long): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "funnel steps must be non-empty and distinct")
    val k = steps.size
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tiebreakCol))
    val run = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val stage = steps.zipWithIndex.foldLeft(lit(null).cast("long")) {
      case (acc, (s, i)) => when(col(typeCol) === s, lit((i + 1).toLong)).otherwise(acc)
    }
    val perSession = events
      .withColumn("__delta_us",
        unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(w)))
      .withColumn("__new_sess",
        when(col("__delta_us").isNull || col("__delta_us") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("__session_id", sum(col("__new_sess")).over(run))
      .filter(col(typeCol).isin(steps.map(lit): _*))
      .select(col(userCol), col("__session_id"),
        struct(unix_micros(col(tsCol)).as("ts"), stage.as("st")).as("ev"))
      .groupBy(col(userCol), col("__session_id"))
      .agg(sort_array(collect_list(col("ev"))).as("evs"))
      .select(col(userCol),
        aggregate(col("evs"), struct(lit(-1L).as("ts"), lit(0L).as("st")),
          (acc, e) => when(e("st") === acc("st") + 1L && e("ts") > acc("ts"), e)
            .otherwise(acc))("st").as("reached"))
    val aggs = (1 to k).flatMap(i => Seq(
      coalesce(sum(when(col("reached") >= i.toLong, 1L).otherwise(0L)), lit(0L)).as(s"s$i"),
      countDistinct(when(col("reached") >= i.toLong, col(userCol))).as(s"u$i")))
    val stackArgs = (1 to k).map { i =>
      s"CAST($i AS BIGINT), '${steps(i - 1)}', s$i, u$i"
    }.mkString(", ")
    perSession.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack($k, $stackArgs) AS (step, step_name, n_sessions, n_users)")
      .orderBy("step")
  }

  /** Top-k event-type PATHS: the most common length-`n` consecutive
    * event-type sequences across users (the "what do users actually do"
    * report behind funnel design). One window sort per user builds the
    * n-gram via `lead` chains (no collect_list — the sequence never
    * materializes per user), then a partial-agg'd count keyed by the
    * path string and a TakeOrdered top-k (count desc, path asc).
    * Deterministic: the window orders by (ts, tiebreak) which is unique.
    */
  def eventPaths(events: DataFrame, userCol: String, tsCol: String,
                 tiebreakCol: String, typeCol: String,
                 n: Int = 3, k: Int = 10): DataFrame = {
    require(n >= 2 && n <= 8, s"path length $n out of [2, 8]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tiebreakCol))
    val steps = (0 until n).map(i =>
      if (i == 0) col(typeCol) else lead(col(typeCol), i).over(w))
    val withSteps = steps.zipWithIndex.foldLeft(events) {
      case (df, (c, i)) => df.withColumn(s"__s$i", c)
    }
    withSteps
      .filter((1 until n).map(i => col(s"__s$i").isNotNull).reduce(_ && _))
      .select(concat_ws(">", (0 until n).map(i => col(s"__s$i")): _*).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("path"))
      .limit(k)
  }

  /** Cohort retention: cohort = each user's first active day, offset =
    * days since cohort day; one row per (cohort_day, offset_days) with
    * the distinct active-user count. Plan: per-user min-date is ONE
    * partial-agg'd groupBy (shuffles user ids + a date, not events);
    * activity days are a distinct on (user, day) — both exchanges hash
    * on the user key so AQE coalesces them — then the matrix rollup
    * aggregates (cohort, offset) pairs. No windows, no driver state.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstDay = events
      .groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    val activeDays = events
      .select(col(userCol), to_date(col(tsCol)).as("day"))
      .distinct()
    activeDays.join(firstDay, userCol)
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("offset_days"),
        col(userCol))
      .groupBy("cohort_day", "offset_days")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "offset_days")
  }
}
