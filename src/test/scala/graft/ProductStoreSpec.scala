package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.ProductStore

/** The curated-product storage discipline: provenance-stamped epoch
  * writes, the bounded newest-first serving walk (≡ the full-scan
  * answer, reading only the newest partitions), the provenance-
  * preserving fold, and the torn-free snapshot under a raced epoch
  * replay.
  */
class ProductStoreSpec extends SparkTestBase {

  private def tmp(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p.toString
  }

  import spark.implicits._

  /** A product of `n` monotone-id epochs (the ingest gate's contract):
    * epoch e holds ids (100·e, 100·e+rows], lang alternates en/de by id
    * parity so filters have selectivity to bite on.
    */
  private def writeProduct(outDir: String, epochs: Int, rows: Int = 40): Unit =
    (0 until epochs).foreach { e =>
      val view = (1 to rows).map { i =>
        val id = 100L * e + i
        (id, if (id % 2 == 0) "en" else "de", 10L * id)
      }.toDF("doc_id", "pred_lang", "score")
      ProductStore.writeEpoch(spark, view, outDir, e.toLong)
    }

  private def fullWant(outDir: String, filters: Map[String, Any],
                       limit: Int): Seq[Long] =
    graft.operators.Search.search(
      ProductStore.readProduct(spark, outDir), filters, "doc_id", "batch_id",
      limit).select("doc_id").collect().map(_.getLong(0)).toSeq

  test("writeEpoch/readProduct roundtrip: semantic batch_id, no marker residue") {
    val out = tmp("graft-prod-rt")
    writeProduct(out, 3)
    val got = ProductStore.readProduct(spark, out)
    assert(got.columns.toSet === Set("doc_id", "pred_lang", "score", "batch_id"),
      "src_batch is a storage detail — reads restore semantic batch_id")
    assert(got.schema("batch_id").dataType ===
      org.apache.spark.sql.types.LongType)
    val byEpoch = got.groupBy("batch_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(byEpoch === Map(0L -> 40L, 1L -> 40L, 2L -> 40L))
    assert(!new java.io.File(s"$out/_WRITING").exists(),
      "a committed write must clear its marker")
  }

  test("bounded walk: unselective top-K reads ONE partition and equals the full scan") {
    val out = tmp("graft-prod-walk")
    writeProduct(out, 5)
    val (df, segs) = ProductStore.searchProductWalked(
      spark, out, Map.empty, "doc_id", limit = 10, maxWalk = 16)
    assert(segs === Some(Seq(4L)),
      s"an unfiltered top-10 must stop after the newest epoch, read $segs")
    assert(df.select("doc_id").collect().map(_.getLong(0)).toSeq ===
      fullWant(out, Map.empty, 10))

    // filtered (en = half the rows): still satisfied by the newest epoch
    val (dfF, segsF) = ProductStore.searchProductWalked(
      spark, out, Map("pred_lang" -> "en"), "doc_id", limit = 10, maxWalk = 16)
    assert(segsF === Some(Seq(4L)))
    assert(dfF.select("doc_id").collect().map(_.getLong(0)).toSeq ===
      fullWant(out, Map("pred_lang" -> "en"), 10))

    // a limit deeper than one epoch's matches walks exactly as many
    // epochs as it needs (20 en rows per epoch → top-30 needs two)
    val (dfD, segsD) = ProductStore.searchProductWalked(
      spark, out, Map("pred_lang" -> "en"), "doc_id", limit = 30, maxWalk = 16)
    assert(segsD === Some(Seq(4L, 3L)), s"top-30 over 20/epoch: read $segsD")
    assert(dfD.select("doc_id").collect().map(_.getLong(0)).toSeq ===
      fullWant(out, Map("pred_lang" -> "en"), 30))
  }

  test("bounded walk: a starved filter falls back to the full scan and stays correct") {
    val out = tmp("graft-prod-starve")
    writeProduct(out, 5)
    // score matches only the OLDEST epoch's rows → maxWalk=2 starves
    val filters = Map[String, Any]("score" -> 150L)
    val (df, segs) = ProductStore.searchProductWalked(
      spark, out, filters, "doc_id", limit = 1, maxWalk = 2)
    assert(segs === None, "a starved walk must fall back to the full scan")
    assert(df.select("doc_id").collect().map(_.getLong(0)).toSeq ===
      fullWant(out, filters, 1))
    // fewer matches than the limit corpus-wide: the walk exhausts every
    // segment and still answers exactly (no fallback needed)
    val (dfX, segsX) = ProductStore.searchProductWalked(
      spark, out, filters, "doc_id", limit = 5, maxWalk = 16)
    assert(segsX === Some(Seq(4L, 3L, 2L, 1L, 0L)))
    assert(dfX.select("doc_id").collect().map(_.getLong(0)).toSeq ===
      fullWant(out, filters, 5))
  }

  test("bounded walk reads each walked partition ONCE — the IO pin") {
    // r16 verdict's efficiency notch: the old walk paid a probe count()
    // per partition AND a final top-K re-scan of the same files — every
    // walked partition read twice. The rewrite collects each partition's
    // filtered top-`needed` in its single scan, so total parquet records
    // read must be AT MOST one partition's rows for an unselective top-K
    // (40/epoch here), where the double-read shape read 80.
    val out = tmp("graft-prod-oneread")
    writeProduct(out, 5)
    // the oracle answer is computed OUTSIDE the listener window — its
    // full scan must not count against the walk's IO
    val want = fullWant(out, Map.empty, 10)
    val records = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) {
          records.addAndGet(te.taskMetrics.inputMetrics.recordsRead); ()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val (df, segs) = ProductStore.searchProductWalked(
        spark, out, Map.empty, "doc_id", limit = 10, maxWalk = 16)
      // the returned frame re-serves the walk's collected rows — this
      // collect must add ZERO parquet reads
      assert(df.select("doc_id").collect().map(_.getLong(0)).toSeq === want)
      assert(segs === Some(Seq(4L)))
      // drain the listener bus: poll until the counter is stable
      val deadline = System.currentTimeMillis() + 10000
      var last = -1L
      while (System.currentTimeMillis() < deadline && last != records.get()) {
        last = records.get(); Thread.sleep(250)
      }
      assert(records.get() > 0L, "the walk must have scanned the newest partition")
      assert(records.get() <= 40L,
        s"walk + result must read ≤ one 40-row partition once, read ${records.get()} records")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("walkDirty: a write cycle touching a WALKED segment dirties the walk; an unwalked one is the clean pre-epoch snapshot") {
    val out = tmp("graft-prod-dirty")
    writeProduct(out, 3)
    val commit0 = Some(scala.io.Source.fromFile(s"$out/_LAST_COMMIT")
      .mkString.trim)
    // quiet store: clean for any walked set
    assert(!ProductStore.walkDirty(spark, out, commit0, Set(0L, 1L, 2L)))
    // a replay's marker comes up mid-walk naming a segment the walk READ:
    // its rows may have been read torn/empty — dirty; a marker naming an
    // unwalked epoch is a brand-new partition — clean (pre-epoch snapshot)
    java.nio.file.Files.write(new java.io.File(s"$out/_WRITING").toPath,
      "2".getBytes("UTF-8"))
    assert(ProductStore.walkDirty(spark, out, commit0, Set(2L)))
    assert(!ProductStore.walkDirty(spark, out, commit0, Set(0L, 1L)))
    new java.io.File(s"$out/_WRITING").delete()
    // ANY commit-record change dirties the walk — even one naming an
    // UNWALKED epoch, because the record only shows the LAST commit: a
    // replay tearing walked partition k can hide behind a newer epoch's
    // commit, so the eager walk must forfeit on any commit activity
    // (readProduct's lazy path keeps the walked-ids-only predicate — its
    // torn reads fail loudly at execution). The .crc sidecar from the
    // writer's own commit must go with the direct overwrite, or the
    // local ChecksumFileSystem refuses the read.
    new java.io.File(s"$out/._LAST_COMMIT.crc").delete()
    java.nio.file.Files.write(new java.io.File(s"$out/_LAST_COMMIT").toPath,
      "1@99999".getBytes("UTF-8"))
    assert(ProductStore.walkDirty(spark, out, commit0, Set(1L)))
    assert(ProductStore.walkDirty(spark, out, commit0, Set(0L, 2L)),
      "the masking case: a changed record must dirty EVERY walk, not just " +
        "walks that read the epoch it happens to name")
    // a walk that captured the NEW record is clean again
    assert(!ProductStore.walkDirty(spark, out, Some("1@99999"), Set(1L)))
  }

  test("compactProduct preserves every row's semantic batch_id and stays walkable") {
    val out = tmp("graft-prod-fold")
    writeProduct(out, 5)
    val before = ProductStore.readProduct(spark, out)
      .collect().map(_.toSeq).sortBy(_.toString)
    val want10 = fullWant(out, Map("pred_lang" -> "en"), 10)
    val wantDeep = fullWant(out, Map("pred_lang" -> "en"), 70)

    // tier-fold epochs 0..2, keep 3,4 live
    assert(ProductStore.compactProduct(spark, out, 2L, fromExclusive = -1L)
      === Seq(0L, 1L, 2L))
    val dirs = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("batch_id=")).toSet
    assert(dirs === Set("batch_id=-4", "batch_id=3", "batch_id=4"))
    assert(ProductStore.readProduct(spark, out)
      .collect().map(_.toSeq).sortBy(_.toString) === before,
      "the fold must be invisible to readers — layout only")

    // the walk orders live epochs before the tier and still early-stops
    val (df, segs) = ProductStore.searchProductWalked(
      spark, out, Map("pred_lang" -> "en"), "doc_id", limit = 10, maxWalk = 16)
    assert(segs === Some(Seq(4L)))
    assert(df.select("doc_id").collect().map(_.getLong(0)).toSeq === want10)
    // a deep limit descends INTO the tier (4, 3, then the −4 tier) and
    // the restored provenance keeps the answer identical
    val (dfD, segsD) = ProductStore.searchProductWalked(
      spark, out, Map("pred_lang" -> "en"), "doc_id", limit = 70, maxWalk = 16)
    assert(segsD === Some(Seq(4L, 3L, -4L)))
    assert(dfD.select("doc_id").collect().map(_.getLong(0)).toSeq === wantDeep)

    // full fold absorbs the tier into the base; answers still identical
    ProductStore.compactProduct(spark, out, 4L)
    val dirs2 = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("batch_id=")).toSet
    assert(dirs2 === Set("batch_id=-1"))
    assert(ProductStore.readProduct(spark, out)
      .collect().map(_.toSeq).sortBy(_.toString) === before)
    assert(fullWant(out, Map("pred_lang" -> "en"), 10) === want10)
  }

  test("compactProduct refuses a pre-stamp product instead of erasing provenance") {
    val out = tmp("graft-prod-prestamp")
    (0 to 1).foreach { e =>
      Seq((100L * e + 1L, "en")).toDF("doc_id", "pred_lang")
        .withColumn("batch_id", lit(e.toLong))
        .write.mode("append").partitionBy("batch_id").parquet(out)
    }
    val e = intercept[IllegalArgumentException] {
      ProductStore.compactProduct(spark, out, 1L)
    }
    assert(e.getMessage.contains("src_batch"))
  }

  test("a raced epoch replay serves the complete pre-epoch snapshot, never a torn partition") {
    val out = tmp("graft-prod-torn")
    writeProduct(out, 3)
    val preEpoch = ProductStore.readProduct(spark, out)
      .filter(col("batch_id") =!= 2L).collect().map(_.toSeq).sortBy(_.toString)
    // simulate a replayed trigger mid-overwrite of epoch 2: the marker is
    // up and the partition's files are half (here: fully) gone
    val f = new java.io.File(s"$out/_WRITING")
    java.nio.file.Files.write(f.toPath, "2".getBytes("UTF-8"))
    val part = new java.io.File(s"$out/batch_id=2")
    part.listFiles().foreach(_.delete())
    // snapshot read: complete pre-epoch rows, no error, torn files never
    // opened (the exclusion is a partition prune)
    assert(ProductStore.readProduct(spark, out)
      .collect().map(_.toSeq).sortBy(_.toString) === preEpoch)
    // the bounded walk skips the replaying epoch the same way
    val (df, segs) = ProductStore.searchProductWalked(
      spark, out, Map.empty, "doc_id", limit = 5, maxWalk = 16)
    assert(segs === Some(Seq(1L)),
      s"the walk must skip the _WRITING epoch and stop at the next: $segs")
    assert(df.select("doc_id").collect().map(_.getLong(0)).toSeq ===
      (136L to 140L by 1L).reverse.toSeq)
  }

  test("PipelineIngest.run invalidates a serving cache per committed epoch — SCOPED to its outDir") {
    val f = graft.sources.Tables.Fixture(spark, sfDir)
    val docs = f.documents.filter(col("doc_id") <= 40L).localCheckpoint(true)
    val inDir = tmp("graft-prod-inval-in")
    docs.coalesce(1).write.mode("overwrite").parquet(inDir)
    val cache = new graft.ResultCache()
    val outDir = tmp("graft-prod-inval-out") + "/out"
    // one entry for THIS stream — keyed through a path ALIAS (trailing
    // slash) to pin the normalization: the loop's invalidation must hit
    // aliased reader keys too — and one for an unrelated stream
    cache.getOrCompute(cache.keyOf(Map("pred_lang" -> "en"), 5) +
      ProductStore.cacheKeySuffix(spark, outDir + "/"))(docs.limit(1))
    cache.getOrCompute(cache.keyOf(Map.empty, 5) + "@/other/stream")(
      docs.limit(1))
    assert(cache.size === 2)
    graft.streaming.PipelineIngest.run(spark, inDir,
      tmp("graft-prod-inval-root"), docs.schema, "text", "doc_id", None,
      col("lang") === "en", "lang", tmp("graft-prod-inval-cp"),
      outDir = Some(outDir),
      invalidate = Some(cache)).awaitTermination()
    assert(cache.size === 1,
      "a committed epoch must clear THIS stream's entries only")
    assert(cache.contains(cache.keyOf(Map.empty, 5) + "@/other/stream"),
      "the other stream's still-valid entry must survive")
  }

  test("warmServe: each committed epoch leaves the unfiltered top-100 cache-hot") {
    val f = graft.sources.Tables.Fixture(spark, sfDir)
    val docs = f.documents.filter(col("doc_id") <= 40L).localCheckpoint(true)
    val inDir = tmp("graft-prod-warm-in")
    docs.coalesce(1).write.mode("overwrite").parquet(inDir)
    val cache = new graft.ResultCache()
    val outDir = tmp("graft-prod-warm-out") + "/out"
    graft.streaming.PipelineIngest.run(spark, inDir,
      tmp("graft-prod-warm-root"), docs.schema, "text", "doc_id", None,
      col("lang") === "en", "lang", tmp("graft-prod-warm-cp"),
      cfg = graft.streaming.PipelineIngest.Config(warmServe = true),
      outDir = Some(outDir),
      invalidate = Some(cache)).awaitTermination()
    val key = cache.keyOf(Map.empty, 100) +
      ProductStore.cacheKeySuffix(spark, outDir)
    assert(cache.contains(key),
      "the flagship unfiltered top-100 must be pre-warmed after the commit")
    // the warmed entry answers identically to a fresh uncached search
    val warmed = graft.streaming.PipelineIngest.searchCurated(
      spark, outDir, Map.empty, "doc_id", limit = 100, cache = Some(cache))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(warmed === ProductStore.searchProduct(spark, outDir, Map.empty,
      "doc_id", 100).select("doc_id").collect().map(_.getLong(0)).toSeq)
  }

  test("mixed-schema epochs (reidBatch provenance): the walk null-fills, the fold normalizes") {
    val out = tmp("graft-prod-mixed")
    // epoch 0: plain; epoch 1: carries orig_id (a re-id'd late batch)
    ProductStore.writeEpoch(spark,
      (1 to 20).map(i => (i.toLong, "en")).toDF("doc_id", "pred_lang"),
      out, 0L)
    ProductStore.writeEpoch(spark,
      (101 to 120).map(i => (i.toLong, "en", i - 100L))
        .toDF("doc_id", "pred_lang", "orig_id"),
      out, 1L)
    // a walk spanning both epochs must union with null-fill, not crash
    val (df, segs) = ProductStore.searchProductWalked(
      spark, out, Map.empty, "doc_id", limit = 30, maxWalk = 16)
    assert(segs === Some(Seq(1L, 0L)))
    val rows = df.collect()
    assert(rows.length === 30)
    assert(df.columns.contains("orig_id"))
    // epoch-0 rows surface with null orig_id, epoch-1 rows with theirs
    assert(rows.count(_.isNullAt(df.columns.indexOf("orig_id"))) === 10)
    // readProduct (the full snapshot) is mixed-schema-safe the same way
    assert(ProductStore.readProduct(spark, out).count() === 40)
    // folding the mixed range NORMALIZES to the union schema via its own
    // null-fill source (never the whole-dir read, whose footer-luck
    // schema could silently drop orig_id) — rows, per-row batch_id, and
    // the minority column's values all survive the fold
    val before = ProductStore.readProduct(spark, out)
      .select("doc_id", "pred_lang", "orig_id", "batch_id")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(ProductStore.compactProduct(spark, out, 1L) === Seq(0L, 1L))
    val dirs = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("batch_id=")).toSet
    assert(dirs === Set("batch_id=-1"))
    assert(ProductStore.readProduct(spark, out)
      .select("doc_id", "pred_lang", "orig_id", "batch_id")
      .collect().map(_.toSeq).sortBy(_.toString) === before,
      "folding mixed-schema epochs must preserve rows, provenance, and orig_id")
  }
}
