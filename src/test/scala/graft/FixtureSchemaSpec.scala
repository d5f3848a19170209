package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables
import graft.sources.Tables.Fixture

/** The fixture boundary is the one part of the engine the environment can
  * change out from under the code (the driver regenerates
  * `/root/testdata` between rounds — it has shipped `events.ts` both as
  * parquet TIMESTAMP(NANOS) and as timestamp[us]). These specs pin the
  * contract for BOTH generations plus the failure modes, so the next
  * schema drift produces one clear named error instead of dozens of
  * correlated analysis failures.
  */
class FixtureSchemaSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpSfDir(): String =
    Files.createTempDirectory("graft-fixture-spec").toString

  /** Clone the tiny real fixture dir via symlinks, minus `events`, so
    * Fixture can resolve every other table while we substitute events.
    */
  private def cloneFixture(dst: String, skip: Set[String] = Set("events")): Unit =
    Tables.names.filterNot(skip).foreach { n =>
      Files.createSymbolicLink(
        java.nio.file.Paths.get(s"$dst/$n.parquet"),
        java.nio.file.Paths.get(s"$sfDir/$n.parquet"))
    }

  test("legacy int64-nanos events fixture: ns→µs exact truncation to TimestampType") {
    val dir = tmpSfDir()
    cloneFixture(dir)
    // 2021-01-01T00:00:00.000001999Z in nanos: the trailing 999 ns must
    // TRUNCATE (not round) to …000001 µs — bit-identical to DuckDB's own
    // ns→µs handling of the old fixture.
    val nanos = Seq(
      (1L, 1609459200000001999L, 10L, "purchase", 1.5),
      (2L, 1609459200999999999L, 11L, "view", 2.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    nanos.write.parquet(s"$dir/events.parquet")

    val ev = Fixture(spark, dir).events
    assert(ev.schema("ts").dataType == TimestampType)
    val got = ev.orderBy("event_id").select("ts").as[Timestamp].collect()
    assert(got(0) == Timestamp.valueOf("2021-01-01 00:00:00.000001"))
    assert(got(1) == Timestamp.valueOf("2021-01-01 00:00:00.999999"))
  }

  test("timestamp_ntz(µs) events fixture (current generation): micros pass through unchanged") {
    // the real driver-generated fixture — parquet timestamp[us],
    // isAdjustedToUTC=false → Spark reads TIMESTAMP_NTZ
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType,
      s"precondition: driver fixture is timestamp[us] ntz, got ${raw.schema("ts").dataType}")

    val ev = Fixture(spark, sfDir).events
    assert(ev.schema("ts").dataType == TimestampType)
    // session tz is UTC, so the micros value must be numerically identical
    // to the naive reading DuckDB's oracle uses
    val viaCast = raw.select(unix_micros(col("ts").cast(TimestampType)).as("us"))
      .agg(sum("us"), count("*")).first()
    val viaLoader = ev.select(unix_micros(col("ts")).as("us"))
      .agg(sum("us"), count("*")).first()
    assert(viaLoader == viaCast)
  }

  test("already-TimestampType events fixture passes through untouched") {
    val dir = tmpSfDir()
    cloneFixture(dir)
    Seq((1L, Timestamp.valueOf("2021-06-01 12:00:00.123456"), 5L, "view", 0.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val ev = Fixture(spark, dir).events
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select("ts").as[Timestamp].head() == Timestamp.valueOf("2021-06-01 12:00:00.123456"))
  }

  test("missing fixture table fails with one named error, not a plan-deep path failure") {
    val dir = tmpSfDir() // empty — no tables at all
    val e = intercept[IllegalStateException] { Tables.load(spark, dir, "events") }
    assert(e.getMessage.contains("'events'") && e.getMessage.contains(dir))
  }

  test("renamed/missing column fails with one named schema-drift error") {
    val dir = tmpSfDir()
    cloneFixture(dir)
    // a drifted generation: `ts` renamed to `event_ts`
    Seq((1L, 1609459200000000000L, 5L, "view", 0.5))
      .toDF("event_id", "event_ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] { Fixture(spark, dir).events }
    assert(e.getMessage.contains("'events'") && e.getMessage.contains("ts"))
  }

  test("documents/embeddings drift also fails with a named error (text-op hot paths)") {
    val dir = tmpSfDir()
    cloneFixture(dir, skip = Set("events", "documents", "embeddings"))
    Files.createSymbolicLink(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    Seq((1L, "body only")).toDF("doc_id", "body")
      .write.parquet(s"$dir/documents.parquet")
    Seq((1L, Seq(0.1f))).toDF("vec_id", "vec")
      .write.parquet(s"$dir/embeddings.parquet")
    val ed = intercept[IllegalArgumentException] { Fixture(spark, dir).documents }
    assert(ed.getMessage.contains("'documents'") && ed.getMessage.contains("text"))
    val ee = intercept[IllegalArgumentException] { Fixture(spark, dir).embeddings }
    assert(ee.getMessage.contains("'embeddings'") && ee.getMessage.contains("embedding"))
  }

  test("every declared query is constructible against the current fixtures (coverage tripwire)") {
    // Plan-only (no execution): catches analysis-time breakage of the whole
    // declared surface in seconds — the check that would have caught the
    // 117→59 coverage collapse the moment the fixture schema drifted.
    val broken = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      try { SparkEntry.queries(name)(spark, sfDir).queryExecution.analyzed; None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(broken.isEmpty, s"${broken.size} declared queries fail analysis:\n${broken.mkString("\n")}")
  }
}
