package graft

import org.apache.spark.sql.functions._
import graft.operators.{Aggregates, Joins}
import graft.sources.Tables.Fixture

class JoinsSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin returns exactly the rows of the plain join under heavy skew") {
    // 10k rows all sharing ONE key — the pathological hot key
    val big = spark.range(10000).select(
      when(col("id") < 9000, "hot").otherwise(concat(lit("k"), col("id"))).as("k"),
      col("id"))
    val small = Seq(("hot", "H"), ("k9001", "A"), ("missing", "Z")).toDF("k", "v")
    val plain = big.join(small, Seq("k"), "inner")
    val salted = Joins.saltedJoin(big, small, "k", buckets = 8)
    assert(salted.count() === plain.count())
    assert(salted.select(sum("id")).collect().head.getLong(0) ===
      plain.select(sum("id")).collect().head.getLong(0))
    assert(!salted.columns.contains("__salt"), "salt column must not leak to output")
  }

  test("asofJoin: picks most recent right value, matches coincident ts, null before any") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, "u1", ts("2025-01-26 10:00:00")), // before any right row → null
      (2L, "u1", ts("2025-01-26 11:00:00")), // exact-ts match → 5.0
      (3L, "u1", ts("2025-01-26 12:30:00")), // after both → latest = 7.0
      (4L, "u2", ts("2025-01-26 12:00:00"))) // other key, no right rows → null
      .toDF("event_id", "k", "ts")
    val right = Seq(("u1", ts("2025-01-26 11:00:00"), 5.0), ("u1", ts("2025-01-26 12:00:00"), 7.0))
      .toDF("k", "ts", "v")
    val out = Joins.asofJoin(left, right, "k", "ts", Seq("v"))
      .select("event_id", "v").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out === Map(1L -> None, 2L -> Some(5.0), 3L -> Some(7.0), 4L -> None))
  }

  test("rangeJoin: containment matches emitted exactly once, boundaries inclusive") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val points = Seq(
      (1L, "u1", ts("2025-01-26 10:30:00")), // inside iv A
      (2L, "u1", ts("2025-01-26 11:00:00")), // exactly at iv A end (inclusive)
      (3L, "u1", ts("2025-01-26 23:00:00")), // in no interval
      (4L, "u2", ts("2025-01-26 10:30:00"))) // same time, other key
      .toDF("event_id", "k", "ts")
    val ivs = Seq(
      ("u1", "A", ts("2025-01-26 10:00:00"), ts("2025-01-26 11:00:00")),
      ("u1", "B", ts("2025-01-26 12:00:00"), ts("2025-01-26 14:00:00")),
      ("u2", "C", ts("2025-01-26 10:00:00"), ts("2025-01-26 11:00:00")))
      .toDF("k", "iv", "start", "end")
    val out = Joins.rangeJoin(points, ivs, "k", "ts", "start", "end", bucketSeconds = 900L)
      .select("event_id", "iv").as[(Long, String)].collect().sorted.toSeq
    assert(out === Seq((1L, "A"), (2L, "A"), (4L, "C")))
  }

  test("silent-empty and silent-corruption parameter classes are refused loudly") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq((1L, "u1", ts("2025-01-26 10:00:00"), 9.0))
      .toDF("event_id", "k", "ts", "v") // already carries the value col
    val right = Seq(("u1", ts("2025-01-26 09:00:00"), 5.0)).toDF("k", "ts", "v")
    // a left-side value column would feed its own values into the fill
    // fold (beating earlier right values) — corrupt output, not an error
    val a = intercept[IllegalArgumentException] {
      Joins.asofJoin(left, right, "k", "ts", Seq("v"))
    }
    assert(a.getMessage.contains("already exist"))
    // zero-width buckets: DIV 0 / pmod(_, 0) null out the join key class
    // and both joins would return empty with no error
    val r = intercept[IllegalArgumentException] {
      Joins.rangeJoin(left.drop("v"), right.withColumnRenamed("ts", "start")
        .withColumn("end", col("start")), "k", "ts", "start", "end", 0L)
    }
    assert(r.getMessage.contains("bucketSeconds"))
    val s = intercept[IllegalArgumentException] {
      Joins.saltedJoin(left, right.drop("ts", "v"), "k", buckets = 0)
    }
    assert(s.getMessage.contains("buckets"))
  }

  test("merge/semi/anti joins agree on partitioning of matched vs orphan rows") {
    val f = Fixture(spark, sfDir)
    val semi = Joins.semiJoin(f.customer, f.orders, col("c_custkey") === col("o_custkey")).count()
    val anti = Joins.antiJoin(f.customer, f.orders, col("c_custkey") === col("o_custkey")).count()
    assert(semi + anti === f.customer.count())
  }

  test("approx_count_distinct lands within 5% of exact (A6, the 100TB distinct)") {
    val f = Fixture(spark, sfDir)
    val exact = f.events.select("user_id").distinct().count().toDouble
    val approx = Aggregates.approxDistinct(f.events, "user_id")
      .collect().head.getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("approx percentiles track exact percentiles (100TB percentile path)") {
    val f = Fixture(spark, sfDir)
    val exact = Aggregates.percentiles(f.events, "event_type", "value")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = Aggregates.approxPercentiles(f.events, "event_type", "value")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, p50) =>
      assert(math.abs(approx(k) - p50) <= math.max(1.0, 0.05 * math.abs(p50)),
        s"p50 drifted for $k: approx=${approx(k)} exact=$p50")
    }
  }
}
