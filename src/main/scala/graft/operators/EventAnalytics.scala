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
    * rollup is a single-row conditional-sum aggregate exploded as a
    * struct array (step names ride as lit() data, never SQL text). Per-user state is bounded by that user's funnel-relevant
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
    // per-step rollup rows via explode of a struct array, NOT a rendered
    // stack() string: step names are caller data and must ride as lit()
    // values, never be interpolated into SQL text (a quote in a step name
    // would throw — or inject — at parse time)
    perUser.agg(sums.head, sums.tail: _*)
      .select(explode(array((1 to k).map { i =>
        struct(lit(i.toLong).as("step"), lit(steps(i - 1)).as("step_name"),
          col(s"s$i").as("n_users"),
          expr(s"(100 * s$i) DIV greatest(s1, 1)").as("pct_of_first_x100"))
      }: _*)).as("r"))
      .select("r.step", "r.step_name", "r.n_users", "r.pct_of_first_x100")
      .orderBy("step")
  }

  /** Funnel TIME-TO-CONVERT: the [[funnel]] chain with per-stage advance
    * TIMESTAMPS carried through the fold, reporting for every step ≥ 2
    * the median and p95 stage-to-stage latency (µs) across the users who
    * reached it — the first question any funnel report prompts ("where
    * do converting users stall?"). One row per step: (step, step_name,
    * n_users, p50_lat_us, p95_lat_us); step 1 has no inbound latency
    * (nulls), as does any step no user reached.
    *
    * Semantics: the fold's advance timestamps ARE the greedy min-chain's
    * m_k (after reaching stage k−1 at time T, the sorted fold advances at
    * the first stage-k element with ts > T ≡ min{ts : stage k, ts > T}),
    * so latency step k = m_k − m_{k−1} per user, and the exchange
    * argument that makes the greedy chain optimal for EXISTENCE also
    * makes these the earliest-possible per-stage completion times.
    * Percentiles are `percentile` (exact, linear interpolation — the
    * same quantile_cont definition DuckDB uses), floored to integer µs
    * so the oracle compare never rides on float rounding.
    *
    * Plan: the same two-exchange shape as [[funnel]] — type-pruned scan,
    * ONE groupBy(user) fold (accumulator gains the timestamp array,
    * still O(k) per user), then one row per (user, reached step ≥ 2) —
    * O(users·k), orders below events — into a partial-aggregated
    * percentile hash aggregate keyed by step (no window: a rank-based
    * exact percentile would sort each step's users in ONE task — the
    * percentile agg merges per-partition buffers instead). The step-count
    * rollup reuses the fold output; the final join is k rows ⋈ k rows.
    */
  def funnelTimes(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2 && steps.distinct.size == steps.size,
      "funnelTimes needs >= 2 distinct steps")
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
          struct(lit(-1L).as("ts"), lit(0L).as("st"),
            array().cast("array<long>").as("tss")),
          (acc, e) => when(e("st") === acc("st") + 1L && e("ts") > acc("ts"),
            struct(e("ts").as("ts"), e("st").as("st"),
              concat(acc("tss"), array(e("ts"))).as("tss")))
            .otherwise(acc)).as("a"))
      .select(col("a.st").as("reached"), col("a.tss").as("tss"))
      .localCheckpoint(false) // feeds BOTH rollups below; fold runs once
    // one (step, lat) row per user per reached step >= 2
    val lats = perUser
      .select(explode(transform(sequence(lit(2), lit(k)), i =>
        struct(i.cast("long").as("step"),
          when(size(col("tss")) >= i,
            element_at(col("tss"), i) - element_at(col("tss"), i - 1))
            .as("lat")))).as("sl"))
      .select(col("sl.step"), col("sl.lat"))
      .filter(col("lat").isNotNull)
      .groupBy("step")
      .agg(
        floor(percentile(col("lat"), lit(0.5))).cast("long").as("p50_lat_us"),
        floor(percentile(col("lat"), lit(0.95))).cast("long").as("p95_lat_us"))
    val sums = (1 to k).map(i =>
      coalesce(sum(when(col("reached") >= i.toLong, 1L).otherwise(0L)), lit(0L)).as(s"s$i"))
    perUser.agg(sums.head, sums.tail: _*)
      .select(explode(array((1 to k).map { i =>
        struct(lit(i.toLong).as("step"), lit(steps(i - 1)).as("step_name"),
          col(s"s$i").as("n_users"))
      }: _*)).as("r"))
      .select("r.step", "r.step_name", "r.n_users")
      .join(lats, Seq("step"), "left")
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
    // explode-of-structs rollup, not a rendered stack() string — step
    // names are lit() data, never SQL text (see [[funnel]])
    perSession.agg(aggs.head, aggs.tail: _*)
      .select(explode(array((1 to k).map { i =>
        struct(lit(i.toLong).as("step"), lit(steps(i - 1)).as("step_name"),
          col(s"s$i").as("n_sessions"), col(s"u$i").as("n_users"))
      }: _*)).as("r"))
      .select("r.step", "r.step_name", "r.n_sessions", "r.n_users")
      .orderBy("step")
  }

  /** Top-k event-type PATHS: the most common length-`n` consecutive
    * event-type sequences across users (the "what do users actually do"
    * report behind funnel design). One window sort per user builds the
    * n-gram via `lead` chains (no collect_list — the sequence never
    * materializes per user), then a partial-agg'd count keyed by the
    * STRUCT of the n step types — not the '>'-joined string, under which
    * event types containing '>' would make distinct paths collide (e.g.
    * ('a>b','c') vs ('a','b>c')) and miscount; the joined string is only
    * RENDERED in the final projection. TakeOrdered top-k (count desc,
    * path asc, struct as final tiebreak for '>'-bearing types).
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
      .select(struct((0 until n).map(i => col(s"__s$i").as(s"p$i")): _*).as("ps"))
      .groupBy("ps").agg(count(lit(1)).as("n_occ"))
      .select(concat_ws(">", (0 until n).map(i => col(s"ps.p$i")): _*).as("path"),
        col("n_occ"), col("ps"))
      .orderBy(col("n_occ").desc, col("path"), col("ps"))
      .limit(k)
      .select("path", "n_occ")
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
