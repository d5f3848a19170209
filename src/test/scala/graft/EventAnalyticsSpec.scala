package graft

import java.sql.Timestamp
import graft.operators.EventAnalytics

class EventAnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("funnel: greedy ordered chain — strict ts, no regression past reached stage") {
    val events = Seq(
      // user 1: full ordered chain view(10) < click(20) < purchase(30)
      (1L, ts(10), "view"), (1L, ts(20), "click"), (1L, ts(30), "purchase"),
      // user 2: purchase BEFORE the view→click chain → reaches only click
      (2L, ts(5), "purchase"), (2L, ts(10), "view"), (2L, ts(20), "click"),
      // user 3: click/purchase only, no view → stage 0
      (3L, ts(10), "click"), (3L, ts(20), "purchase"),
      // user 4: equal timestamps — click at the SAME ts as view must NOT
      // advance (strict >); the later click does
      (4L, ts(10), "view"), (4L, ts(10), "click"), (4L, ts(40), "click"),
      // user 5: irrelevant types ignored entirely
      (5L, ts(1), "error"), (5L, ts(2), "signup"))
      .toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // reached: u1=3, u2=2, u3=0, u4=2, u5=(absent)
    assert(out(0) === ((1L, "view", 3L, 100L)))
    assert(out(1) === ((2L, "click", 3L, 100L)))
    assert(out(2) === ((3L, "purchase", 1L, 33L)))
  }

  test("funnel: later cheaper chain beats a stuck early prefix (greedy restarts not needed)") {
    // view(10), purchase(20), click(30), purchase(40): greedy takes
    // view(10) → click(30) → purchase(40) — the chain exists even though
    // the first purchase precedes the click
    val events = Seq(
      (1L, ts(10), "view"), (1L, ts(20), "purchase"),
      (1L, ts(30), "click"), (1L, ts(40), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(2))
    assert(out.toSeq === Seq(1L, 1L, 1L))
  }

  test("session funnel: chain must complete inside one gap-session") {
    val events = Seq(
      // u1 session A: full chain inside the session
      (1L, ts(100), 1L, "view"), (1L, ts(200), 2L, "click"), (1L, ts(300), 3L, "purchase"),
      // u1 session B (after > 1000 s gap): only view→click
      (1L, ts(5000), 4L, "view"), (1L, ts(5100), 5L, "click"),
      // u2: chain SPLIT by a session boundary — view in one session,
      // click/purchase in the next → neither session completes past click
      (2L, ts(100), 6L, "view"),
      (2L, ts(5000), 7L, "click"), (2L, ts(5100), 8L, "purchase"),
      // u2's second session has no view: click alone can't start a chain
      // u3: non-funnel event keeps the session ALIVE across the gap the
      // funnel types alone would have split
      (3L, ts(100), 9L, "view"), (3L, ts(600), 10L, "error"),
      (3L, ts(1100), 11L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.sessionFunnel(events, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click", "purchase"), gapSeconds = 1000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // sessions reaching ≥1 (a view): u1-A, u1-B, u2-A, u3-A = 4 (u2-B has no view)
    // ≥2: u1-A, u1-B, u3-A = 3 sessions over users {1, 3}
    // ≥3: u1-A only
    assert(out(0) === ((1L, "view", 4L, 3L)))
    assert(out(1) === ((2L, "click", 3L, 2L)))
    assert(out(2) === ((3L, "purchase", 1L, 1L)))
  }

  test("cohort retention: cohort day from min ts, distinct users per offset") {
    val events = Seq(
      // u1 first seen day 0 (two events same day → one active day), active day 2
      (1L, ts(3600), "a"), (1L, ts(7200), "b"), (1L, ts(86400 * 2 + 10), "c"),
      // u2 first seen day 0, active day 0 only
      (2L, ts(100), "a"),
      // u3 first seen day 1, active days 1 and 2
      (3L, ts(86400 + 5), "a"), (3L, ts(86400 * 2 + 5), "b"))
      .toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.cohortRetention(events, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("1970-01-01", 0L, 2L), // u1, u2 on their cohort day
      ("1970-01-01", 2L, 1L), // u1 returns at offset 2
      ("1970-01-02", 0L, 1L), // u3 cohort day
      ("1970-01-02", 1L, 1L))) // u3 returns at offset 1
  }

  test("eventPaths: lead-chain n-grams respect per-user order; incomplete tails drop") {
    val events = Seq(
      // u1: a b c d → paths a>b>c, b>c>d
      (1L, ts(10), 1L, "a"), (1L, ts(20), 2L, "b"),
      (1L, ts(30), 3L, "c"), (1L, ts(40), 4L, "d"),
      // u2: a b c → a>b>c (second occurrence)
      (2L, ts(10), 5L, "a"), (2L, ts(20), 6L, "b"), (2L, ts(30), 7L, "c"),
      // u3: only 2 events → no complete 3-path; must NOT splice into u1
      (3L, ts(10), 8L, "x"), (3L, ts(20), 9L, "y"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.eventPaths(events, "user_id", "ts", "event_id",
        "event_type", n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("a>b>c", 2L), ("b>c>d", 1L)))
  }

  test("funnelTimes: hand-computed stage latencies; exact interpolated percentiles floored") {
    val events = Seq(
      // u1: view(10) click(20) purchase(40) → lat2 = 10 s, lat3 = 20 s
      (1L, ts(10), "view"), (1L, ts(20), "click"), (1L, ts(40), "purchase"),
      // u2: view(10) click(50) → lat2 = 40 s
      (2L, ts(10), "view"), (2L, ts(50), "click"),
      // u3: view only
      (3L, ts(10), "view"),
      // u4: greedy chain picks the EARLIEST qualifying click (20), not
      // the later one (30) — latency measures the earliest completion
      (4L, ts(10), "view"), (4L, ts(20), "click"), (4L, ts(30), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.funnelTimes(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
    // step2 lats (µs): [10e6, 10e6, 40e6] → p50 = 10e6;
    // p95: idx = 0.95·2 = 1.9 → 10e6 + 0.9·30e6 = 37e6
    // step3 lats: [20e6] → p50 = p95 = 20e6
    assert(out(0) === ((1L, "view", 4L, -1L, -1L)))
    assert(out(1) === ((2L, "click", 3L, 10000000L, 37000000L)))
    assert(out(2) === ((3L, "purchase", 1L, 20000000L, 20000000L)))
  }

  test("funnel: step names with quotes/backslashes are data, not SQL") {
    // names that would throw (or inject) under a rendered stack() string
    val events = Seq(
      (1L, ts(10), "o'brien's step"), (1L, ts(20), "pay\\done"))
      .toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
        Seq("o'brien's step", "pay\\done"))
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(("o'brien's step", 1L), ("pay\\done", 1L)))
  }

  test("eventPaths: '>' inside an event type cannot collide distinct paths") {
    // ('a>b', 'c', 'c') vs ('a', 'b>c', 'c') both render "a>b>c>c" but
    // are DIFFERENT paths — struct grouping must count them separately
    val events = Seq(
      (1L, ts(10), 1L, "a>b"), (1L, ts(20), 2L, "c"), (1L, ts(30), 3L, "c"),
      (2L, ts(10), 4L, "a"), (2L, ts(20), 5L, "b>c"), (2L, ts(30), 6L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.eventPaths(events, "user_id", "ts", "event_id",
        "event_type", n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // two rows, each count 1 — a string-keyed count would report one row of 2
    assert(out.length === 2 && out.forall(_._2 === 1L))
    assert(out.forall(_._1 === "a>b>c>c"))
  }

  test("dsir: hand-checked bucket weights on a two-doc corpus") {
    import org.apache.spark.sql.functions.col
    // One target doc ("en") and one raw-only doc sharing no tokens.
    // With B buckets and disjoint tokens, target-doc tokens get weight
    // > scale (target-enriched) and raw-only tokens < scale, so the
    // target doc must out-score the raw doc. Exact values are pinned by
    // recomputing the formula here, not by trusting the operator.
    val docs = Seq(
      (1L, "alpha beta gamma", "en"),
      (2L, "delta epsilon zeta", "de"))
      .toDF("doc_id", "text", "lang")
    val b = 16
    val out = graft.operators.Curation.dsirScore(docs, "text", "doc_id",
        col("lang") === "en", buckets = b, scale = 1000L)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // recompute expected driver-side with the same md5 bucketing
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 15), 16)
    }
    val toks1 = Seq("alpha", "beta", "gamma")
    val toks2 = Seq("delta", "epsilon", "zeta")
    val rc = new Array[Long](b); val tc = new Array[Long](b)
    toks1.foreach { t => val k = (h60(t) % b).toInt; rc(k) += 1; tc(k) += 1 }
    toks2.foreach { t => val k = (h60(t) % b).toInt; rc(k) += 1 }
    val rawTot = BigInt(rc.sum) + b; val tgtTot = BigInt(tc.sum) + b
    def w(k: Int): Long =
      ((BigInt(1000) * (BigInt(tc(k)) + 1) * rawTot) /
        ((BigInt(rc(k)) + 1) * tgtTot)).toLong
    val exp1 = toks1.map(t => w((h60(t) % b).toInt) - 1000L).sum
    val exp2 = toks2.map(t => w((h60(t) % b).toInt) - 1000L).sum
    assert(out.toSeq === Seq((1L, exp1), (2L, exp2)))
    assert(exp1 > exp2, s"target doc must out-score raw doc: $exp1 vs $exp2")
  }
}
