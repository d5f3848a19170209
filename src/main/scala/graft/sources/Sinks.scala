package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sinks (SURVEY §2.1 S4/S6).
  *
  * The reference writes date-partitioned JSON blobs keyed
  * `audit/{yyyy-MM-dd}/{txn}/{type}.json` (`reference/src/services/
  * s3.service.ts:32-34`) through a hand-rolled batched queue (batch 10 /
  * 100 ms, `:69-106`), and appends relational rows in chunked multi-row
  * INSERTs (≤100, `reference/src/lambda/processQueue.ts:162-198`). Spark
  * subsumes both batching schemes structurally — writes are per-partition
  * and columnar — so the only semantics to keep are the LAYOUTS.
  */
object Sinks {

  /** S4: date-partitioned JSON, the blob-store layout. Partition pruning on
    * `dt` replaces key-prefix listing.
    */
  def writePartitionedJson(df: DataFrame, tsCol: String, outDir: String): Unit =
    df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("dt").json(outDir)

  /** S6: relational append sink — the Parquet analog of the chunked INSERT
    * path. `maxRecordsPerFile` bounds file sizes the way the reference
    * chunks its VALUES lists.
    */
  def appendRecords(df: DataFrame, outDir: String, maxRecordsPerFile: Long = 1000000L): Unit =
    df.write.mode("append")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .parquet(outDir)

  /** S6/S7 alternative path — the RELATIONAL sink the reference actually
    * writes (`reference/src/lambda/processQueue.ts:162-244`: chunked
    * multi-row INSERTs, then a temp-table UPDATE-join into Postgres
    * `api_audit`), expressed through Spark's JDBC source. Each partition
    * opens one connection and writes its rows in `batchsize` chunks — the
    * reference's ≤100-row VALUES chunking (`:177-186`), parallelized
    * across executors. Works against any JDBC database; the spec exercises
    * it against embedded Derby (in the Spark distribution) with exactly
    * the reference's two write shapes: plain append, and upsert-by-merge.
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
                mode: String = "append", batchSize: Int = 100): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("batchsize", batchSize.toString)
      .mode(mode).save()

  def readJdbc(spark: org.apache.spark.sql.SparkSession, url: String,
               table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).load()

  /** UPSERT into a JDBC table — the reference's response-arrival path
    * (`processQueue.ts:199-244`: UPDATE rows whose key already exists)
    * plus its insert path, as ONE set-based merge: union the current
    * table with the updates, one hash aggregation per key keeping the
    * null-skipping max of every other column ([[graft.streaming.IngestJob
    * .merge]]'s semantics — order-insensitive, idempotent under replay).
    * The merge lands in a STAGING table (Spark-parallel write), then
    * swaps into the target via one server-side transactional
    * DELETE+INSERT — the reference's own temp-table pattern: the
    * target's DDL/indexes survive, and a failure at any point rolls
    * back to the pre-upsert rows (a drop-and-recreate overwrite has an
    * unrecoverable window between the DROP and the last partition's
    * commit). Most warehouses take a real MERGE here; plain JDBC has no
    * portable one.
    */
  def upsertJdbc(spark: org.apache.spark.sql.SparkSession, updates: DataFrame,
                 url: String, table: String, key: String): Unit = {
    val current =
      try Some(readJdbc(spark, url, table))
      catch {
        case e: Exception =>
          // only a MISSING TABLE may fall through to the bootstrap write:
          // SQLState class 42 covers object-not-found everywhere (Derby
          // 42X05, Postgres 42P01, MySQL 42S02). Anything else —
          // connection 08xxx, auth 28xxx, timeouts — MUST rethrow;
          // treating a transient read failure as absence would let the
          // bootstrap write below replace the live table with one batch.
          val sqlState = Iterator.iterate(e: Throwable)(_.getCause)
            .takeWhile(_ != null)
            .collectFirst { case s: java.sql.SQLException =>
              Option(s.getSQLState) }
            .flatten
          if (sqlState.exists(_.startsWith("42"))) None else throw e
      }
    current match {
      case None => writeJdbc(updates, url, table, mode = "overwrite")
      case Some(cur) =>
        val others = cur.columns.filter(_ != key)
        val merged =
          if (others.isEmpty) cur.unionByName(updates).distinct()
          else cur.unionByName(updates)
            .groupBy(col(key))
            .agg(max(others.head).as(others.head),
              others.tail.map(c => max(c).as(c)).toIndexedSeq: _*)
            .select(cur.columns.map(col).toIndexedSeq: _*)
        val staging = table + "_graft_stage"
        writeJdbc(merged, url, staging, mode = "overwrite")
        // Spark's JDBC writer creates columns QUOTED (exact case) —
        // reference them the same way, with embedded quotes doubled
        val cols = cur.columns
          .map(c => "\"" + c.replace("\"", "\"\"") + "\"").mkString(", ")
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val st = conn.createStatement()
          try {
            st.executeUpdate(s"DELETE FROM $table")
            st.executeUpdate(
              s"INSERT INTO $table ($cols) SELECT $cols FROM $staging")
            conn.commit()
          } catch { case e: Throwable => conn.rollback(); throw e }
          finally st.close()
        } finally {
          try { // staging is scratch: best-effort cleanup, never masks
            conn.setAutoCommit(true)
            val st = conn.createStatement()
            try st.executeUpdate(s"DROP TABLE $staging") finally st.close()
          } catch { case scala.util.control.NonFatal(_) => () }
          conn.close()
        }
    }
  }

  /** Bucketed-and-sorted table layout: the shuffle-free-join story at
    * 100 TB. Two tables bucketed by their join key into the SAME bucket
    * count join with NO exchange on either side (and no sort, thanks to
    * `sortBy`) — the shuffle is paid once at write time instead of on
    * every join. This is Spark's answer to the reference's Postgres
    * b-tree on `transaction_id` (`setup-db.ts:70-74`): both make the
    * correlate-by-key path not scan-and-shuffle.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Directory-partitioned parquet layout — the partition-PRUNING story
    * (where [[writeBucketed]] is the shuffle-free-JOIN story). An ANN
    * table written partitioned by its LSH `bucket` / IVF `cell` turns a
    * probe's `bucket = q` filter into a PartitionFilter: the scan lists
    * and reads only the probed directories — at 100 TB, ~1/2^planes (or
    * nprobe/nlist) of the corpus, pinned in PlanAuditSpec.
    */
  def writePartitioned(df: DataFrame, partCol: String, outDir: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(outDir)

  /** Z-ORDERED layout: cluster rows along the Morton curve of two key
    * columns so parquet row-group min/max stats prune scans filtered on
    * EITHER key (a single-column sort only skips for its leading column).
    * SURVEY §7.2's deferred file-skipping demonstration, made real.
    *
    * Both keys are normalized to 16-bit ranks via a driver-held min/max
    * (one tiny agg), bit-interleaved into a 32-bit z-value, then
    * range-partitioned and sorted by it — each output file covers a small
    * z-range, i.e. a small rectangle in (a, b) space, so its min/max
    * stats are tight in both dimensions. The interleave runs in a
    * higher-order fold: write-time one-pass cost, never a query-path
    * expression. Skipping is engine-native from here — parquet readers
    * drop row groups whose stats exclude the pushed predicate
    * (pinned by scan-metric comparison in PlanAuditSpec).
    */
  def writeZOrdered(
      df: DataFrame, colA: String, colB: String, outDir: String,
      files: Int = 64): Unit = {
    val mm = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    // empty input (or all-null keys): min/max are null — there is nothing
    // to cluster, write the degenerate layout instead of NPE-ing on unbox
    if (mm.isNullAt(0) || mm.isNullAt(2)) {
      df.write.mode("overwrite").parquet(outDir)
      return
    }
    def norm(c: String, lo: Double, hi: Double) =
      if (hi <= lo) lit(0L)
      else least(lit(65535L),
        floor((col(c).cast("double") - lit(lo)) * 65536.0 / (hi - lo)).cast("long"))
    df.withColumn("__za", norm(colA, mm.getDouble(0), mm.getDouble(1)))
      .withColumn("__zb", norm(colB, mm.getDouble(2), mm.getDouble(3)))
      .withColumn("__z", expr(
        """aggregate(sequence(0, 15), 0L, (acc, i) ->
          |  acc | shiftleft(shiftright(__za, i) & 1, 2 * i)
          |      | shiftleft(shiftright(__zb, i) & 1, 2 * i + 1))""".stripMargin))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__za", "__zb", "__z")
      .write.mode("overwrite").parquet(outDir)
  }

  /** TRAINING-SHARD layout: materialize
    * [[graft.operators.Sampling.shuffleShard]]'s deterministic
    * (shard, pos) order as one on-disk partition per shard, rows stored in
    * `pos` order — the export format a training loader streams: each of N
    * readers opens `shard=k` and reads rows already in its decorrelated
    * global-shuffle order, resumable at any (shard, pos) offset.
    *
    * One exchange (hash by shard) + per-shard sort, the same cost shape as
    * the operator itself; `partitionBy` writes each shard's directory from
    * its own task, so no global sort and no driver funnel. Parquet
    * preserves within-file row order, which is what makes `pos` order on
    * disk real rather than advisory (spec-pinned by read-back).
    */
  def writeTrainingShards(
      docs: DataFrame, idCol: String, nShards: Int, outDir: String): Unit = {
    val assigned = graft.operators.Sampling.shuffleShard(docs, idCol, nShards)
    docs.join(assigned, idCol)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }
}
