package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Curation
import graft.sources.Tables.Fixture
import graft.streaming.CurateIngest

/** The incremental curation contract: after ingesting batches B₁…Bₙ,
  * `curateProbe(Bₙ₊₁)` (and `processBatch`'s returned view) must equal
  * `Curation.curate(B₁ ∪ … ∪ Bₙ₊₁)` restricted to Bₙ₊₁'s ids — the
  * composed-store capstone over DocIndexIngest + GraphIngest + the fp
  * store. Pinned over the fixture corpus (arbitrary real text, id-range
  * batch cuts) AND a synthetic corpus with engineered cross-batch
  * exact/near/filter cases whose failures read loudly.
  */
class CurateIngestSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p.toString
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.select(col("doc_id"), col("pred_lang"), col("score"))
      .collect().map(_.toSeq).toSet

  private def docsDf(rs: Seq[(Long, String)]): DataFrame =
    rs.toDF("doc_id", "text")

  // ~95 distinct en tokens + stopwords → pred_lang=en, score well ≥ 500;
  // suffix variants differ only in trailing words (shingle overlap ≫ 80%)
  private def enText(seed: Int, tail: String = ""): String = {
    val words = (0 until 90).map(i => s"w${seed}x$i")
    s"the quick report of ${words.mkString(" ")} and the findings in $tail".trim
  }
  private val lowQuality = "spam spam spam spam spam spam spam spam"
  private val spanish = "el informe de la casa y el perro en la calle " +
    (0 until 60).map(i => s"p$i").mkString(" ")

  test("fixture corpus, 3 id-range batches: probe ≡ batch curate restricted, ingest view ≡ probe") {
    val docs = Fixture(spark, sfDir).documents.localCheckpoint(true)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val cuts = Seq(maxId / 3, 2 * maxId / 3, maxId)
    val root = tmp("graft-curate-fix")
    var lo = Long.MinValue
    cuts.zipWithIndex.foreach { case (hi, i) =>
      val batch = docs.filter(col("doc_id") > lo && col("doc_id") <= hi)
      val expect = rows(
        Curation.curate(docs.filter(col("doc_id") <= hi), "text", "doc_id")
          .filter(col("doc_id") > lo))
      val probe = rows(
        CurateIngest.curateProbe(spark, root, batch, "text", "doc_id"))
      assert(probe === expect, s"batch $i: probe diverged from batch curate")
      val view = rows(
        CurateIngest.processBatch(spark, batch, root, "text", "doc_id", i.toLong))
      assert(view === expect, s"batch $i: ingest view diverged")
      lo = hi
    }
    // the in-memory twin (the declared q_curate_incr form) agrees with
    // the disk probe it models: re-probe the LAST batch against the
    // first two thirds, disk stores vs derived-in-query stores
    val root2 = tmp("graft-curate-fix2")
    val corpus = docs.filter(col("doc_id") <= cuts(1))
    val batch3 = docs.filter(col("doc_id") > cuts(1))
    CurateIngest.processBatch(spark, corpus, root2, "text", "doc_id", 0L)
    assert(
      rows(CurateIngest.curateProbe(spark, root2, batch3, "text", "doc_id")) ===
        rows(CurateIngest.curateProbeWithCorpus(corpus, batch3, "text", "doc_id")),
      "disk probe diverged from the in-memory twin")
  }

  test("engineered cross-batch cases: exact dup, near dup, dup-of-a-dropped-doc, filters") {
    val root = tmp("graft-curate-syn")
    val b0 = docsDf(Seq(
      1L -> enText(1),                  // kept: canonical A
      2L -> enText(2),                  // kept: canonical B
      3L -> lowQuality,                 // filtered: quality
      4L -> spanish))                   // filtered: language
    val b1 = docsDf(Seq(
      10L -> enText(1),                 // exact dup of A → dropped (fp store)
      11L -> enText(1, "appended tail " + (0 until 4).map(i => s"t$i").mkString(" ")),
                                        // near dup of A → dropped (LSH vs stored node 1)
      12L -> enText(3)))                // kept: new canonical C
    val b2 = docsDf(Seq(
      20L -> enText(3),                 // exact dup of C (stored last batch) → dropped
      21L -> enText(1, "appended tail " + (0 until 4).map(i => s"u$i").mkString(" ")),
                                        // near dup of the DROPPED 11 → must still drop:
                                        // 11 is a graph node (exact-canonical) even
                                        // though it lost near-dup — comp chains to 1
      22L -> enText(4)))                // kept
    val all = b0.unionByName(b1).unionByName(b2)
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      val probe = rows(CurateIngest.curateProbe(spark, root, b, "text", "doc_id"))
      val ids = b.select("doc_id").as[Long].collect().toSet
      val expect = rows(Curation.curate(
          all.filter(col("doc_id") <= ids.max), "text", "doc_id")
        .filter(col("doc_id").isInCollection(ids)))
      assert(probe === expect, s"batch $i diverged")
      CurateIngest.processBatch(spark, b, root, "text", "doc_id", i.toLong)
    }
    // the loud hand-checks on the final batch's outcome
    val last = CurateIngest.curateProbe(spark, root,
      docsDf(Seq(30L -> enText(1), 31L -> enText(5))), "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(last === Set(31L), "exact dup of a stored doc must drop; fresh text must keep")
    // fp store holds one row per fingerprint ever — batch appends never
    // duplicate a stored fingerprint
    val fp = CurateIngest.readFp(spark, root)
    assert(fp.count() === fp.select("fp").distinct().count())
    // kept canonicals across the whole run: 1 (A), 2 (B), 12 (C), 22
    val kept = rows(Curation.curate(all, "text", "doc_id")).map(_.head)
    assert(kept === Set(1L, 2L, 12L, 22L))
  }

  test("pairwise (non-transitive) mode: probe ≡ batch curate with transitive=false") {
    val cfg = Curation.Config(transitive = false)
    val root = tmp("graft-curate-pw")
    // chain A ~ A' ~ A'' where pairwise keeps chain survivors transitive
    // mode would drop
    val b0 = docsDf(Seq(1L -> enText(7), 2L -> enText(8)))
    val b1 = docsDf(Seq(
      10L -> enText(7, "tail one two three four five six seven"),
      11L -> enText(8)))
    CurateIngest.processBatch(spark, b0, root, "text", "doc_id", 0L, cfg)
    val probe = rows(CurateIngest.curateProbe(spark, root, b1, "text", "doc_id", cfg))
    val expect = rows(Curation.curate(b0.unionByName(b1), "text", "doc_id", cfg)
      .filter(col("doc_id") >= 10L))
    assert(probe === expect)
  }

  test("replayed batch leaves stores and probe results unchanged (exactly-once)") {
    val root = tmp("graft-curate-replay")
    val b0 = docsDf(Seq(1L -> enText(1), 2L -> enText(2)))
    val b1 = docsDf(Seq(10L -> enText(1), 11L -> enText(3)))
    CurateIngest.processBatch(spark, b0, root, "text", "doc_id", 0L)
    CurateIngest.processBatch(spark, b1, root, "text", "doc_id", 1L)
    val probeB = docsDf(Seq(20L -> enText(3), 21L -> enText(9)))
    val before = rows(CurateIngest.curateProbe(spark, root, probeB, "text", "doc_id"))
    val fpBefore = CurateIngest.readFp(spark, root).collect().map(_.toSeq).toSet
    // replay batch 1 (crash-after-write, re-delivered trigger)
    CurateIngest.processBatch(spark, b1, root, "text", "doc_id", 1L)
    assert(rows(CurateIngest.curateProbe(spark, root, probeB, "text", "doc_id")) === before)
    assert(CurateIngest.readFp(spark, root).collect().map(_.toSeq).toSet === fpBefore)
  }

  test("id-monotonicity gate raises loudly on out-of-order ids") {
    val root = tmp("graft-curate-mono")
    CurateIngest.processBatch(spark, docsDf(Seq(10L -> enText(1))),
      root, "text", "doc_id", 0L)
    val fpBefore = CurateIngest.readFp(spark, root).collect().map(_.toSeq).toSet
    val e = intercept[IllegalArgumentException] {
      CurateIngest.processBatch(spark, docsDf(Seq(5L -> enText(2))),
        root, "text", "doc_id", 1L)
    }
    assert(e.getMessage.contains("monotonicity"))
    assert(e.getMessage.contains("reidBatch"),
      "the gate's error must point at the executable escape hatch")
    // the gate and the canonical pass submit CONCURRENTLY (r18) — the
    // write-safety claim is that a violated batch still writes NOTHING:
    // no fingerprint rows, no meta floor movement (the violated epoch's
    // meta row must not land), and the probe view is byte-stable
    assert(CurateIngest.readFp(spark, root).collect().map(_.toSeq).toSet
      === fpBefore, "a violated batch must not append fingerprints")
    assert(CurateIngest.storedMaxId(spark, root) === Some(10L),
      "a violated batch must not move the stored id floor")
    val probeB = docsDf(Seq(20L -> enText(1), 21L -> enText(4)))
    assert(rows(CurateIngest.curateProbe(spark, root, probeB, "text", "doc_id"))
      === rows(Curation.curate(
          docsDf(Seq(10L -> enText(1))).unionByName(probeB), "text", "doc_id")
        .filter(col("doc_id") >= 20L)),
      "the store must still satisfy the probe contract after a violation")
  }

  test("reidBatch: a late batch re-ids past the stored max and curates like a fresh-id batch") {
    // the late batch's enText(1) near-dups stored doc 100 → the re-id'd
    // copy must LOSE (first ingested wins); enText(3) survives;
    // lowQuality fails the quality filter
    val seedRows = Seq(100L -> enText(1), 200L -> enText(2, "unique tail"))
    val late = Seq(5L -> enText(3), 7L -> enText(1), 9L -> lowQuality)
    val rootB = tmp("graft-curate-reid-b")
    CurateIngest.processBatch(spark, docsDf(seedRows), rootB, "text", "doc_id", 0L)
    // the gate refuses the raw late batch...
    intercept[IllegalArgumentException] {
      CurateIngest.processBatch(spark, docsDf(late), rootB, "text", "doc_id", 1L)
    }
    // ...and reidBatch makes it ingestible: fresh ids above the stored max
    val reid = CurateIngest.reidBatch(spark, rootB, docsDf(late), "doc_id")
      .localCheckpoint(true)
    val ids = reid.select("doc_id", "orig_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ids.keys.forall(_ > 200L), s"fresh ids must exceed the stored max: $ids")
    assert(ids.values.toSet === Set(5L, 7L, 9L), "orig_id must carry the source ids")
    // deterministic: a retried re-id assigns the identical mapping
    val again = CurateIngest.reidBatch(spark, rootB, docsDf(late), "doc_id")
      .select("doc_id", "orig_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(again === ids, "re-id must be retry-stable (replay contract)")
    val view = CurateIngest.processBatch(spark, reid, rootB, "text", "doc_id", 1L)
      .localCheckpoint(true)
    // REPLAY determinism inside a trigger: epoch 1's meta row is now
    // committed with the re-id'd max — a replayed trigger re-running
    // reidBatch must exclude ITS OWN epoch from the floor (the
    // requireMonotone self-exclusion) or the retry computes a shifted
    // base and mints different ids than the ones the stores already hold
    val replay = CurateIngest.reidBatch(spark, rootB, docsDf(late), "doc_id",
        excludeEpoch = 1L)
      .select("doc_id", "orig_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(replay === ids,
      "a replayed trigger's re-id (excludeEpoch) must assign identical ids")
    // the hazard the parameter closes: WITHOUT the exclusion, the
    // committed meta row shifts the floor and the ids diverge
    val shifted = CurateIngest.reidBatch(spark, rootB, docsDf(late), "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(shifted.intersect(ids.keys.toSet).isEmpty,
      "without excludeEpoch the replayed base shifts — the documented hazard")
    // survivors by ORIGINAL id: the near-dup of stored doc 100 loses,
    // the unique doc survives, the low-quality row is filtered
    val survOrig = view.select("orig_id").collect().map(_.getLong(0)).toSet
    assert(survOrig === Set(5L), s"expected only the unique late doc to survive: $survOrig")
    // provenance flows into the product stream unchanged
    val out = tmp("graft-curate-reid-out")
    graft.streaming.ProductStore.writeEpoch(spark, view, out, 1L)
    val prod = graft.streaming.ProductStore.readProduct(spark, out)
    assert(prod.columns.contains("orig_id"))
    assert(prod.select("orig_id").collect().map(_.getLong(0)).toSet === Set(5L))
    // and the export capstone consumes the product as-is, keyed by the
    // NEW id (orig_id stays joinable through the product)
    val exp = tmp("graft-curate-reid-exp")
    val rpt = graft.operators.TrainingExport.exportCurated(
      prod, "text", "doc_id", exp, nShards = 2)
    assert(rpt.n_rows_written === 1L)
    val expIds = spark.read.parquet(exp).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(expIds === prod.select("doc_id").collect().map(_.getLong(0)).toSet)
    // duplicate source ids are an upstream bug, surfaced not laundered
    val dup = intercept[IllegalArgumentException] {
      CurateIngest.reidBatch(spark, rootB,
        docsDf(Seq(1L -> enText(8), 1L -> enText(9))), "doc_id")
    }
    assert(dup.getMessage.contains("duplicate"))
  }

  test("empty batch is a no-op with an empty curated view") {
    val root = tmp("graft-curate-empty")
    CurateIngest.processBatch(spark, docsDf(Seq(1L -> enText(1))),
      root, "text", "doc_id", 0L)
    val view = CurateIngest.processBatch(spark,
      docsDf(Seq.empty), root, "text", "doc_id", 1L)
    assert(view.isEmpty)
    assert(rows(CurateIngest.curateProbe(spark, root,
      docsDf(Seq(10L -> enText(1))), "text", "doc_id")).isEmpty)
  }

  test("batch with zero filter survivors: empty view, schema intact, stores untouched") {
    // pins the stagePrefix short-circuit: zero stage-1–3 survivors means
    // no touched fmods, and the empty-fmods "no prune" convention must
    // NOT be reached (it would anti-join an empty left side against the
    // full corpus-scale fp store)
    val root = tmp("graft-curate-allfiltered")
    CurateIngest.processBatch(spark, docsDf(Seq(1L -> enText(1))),
      root, "text", "doc_id", 0L)
    val allFiltered = docsDf(Seq(10L -> lowQuality, 11L -> spanish))
    val view = CurateIngest.processBatch(
      spark, allFiltered, root, "text", "doc_id", 1L)
    assert(view.isEmpty)
    assert(view.columns.toSet ===
      Set("doc_id", "text", "pred_lang", "score"))
    assert(rows(CurateIngest.curateProbe(spark, root, allFiltered,
      "text", "doc_id")).isEmpty)
    // the survivor from batch 0 still probes identically afterwards
    assert(rows(CurateIngest.curateProbe(spark, root,
      docsDf(Seq(20L -> enText(9))), "text", "doc_id")) ===
      rows(Curation.curate(
        docsDf(Seq(1L -> enText(1), 20L -> enText(9))), "text", "doc_id")
        .filter(col("doc_id") === 20L)))
  }

  test("streaming run(): file-discovered micro-batches curate incrementally; outDir carries the survivors") {
    val root = tmp("graft-curate-stream")
    val inDir = tmp("graft-curate-stream-in")
    val cp = tmp("graft-curate-stream-cp")
    val out = tmp("graft-curate-stream-out")
    val b0 = docsDf(Seq(1L -> enText(1), 2L -> enText(2), 3L -> lowQuality))
    val b1 = docsDf(Seq(10L -> enText(1), 11L -> enText(3))) // exact dup + fresh
    def landFile(df: DataFrame, name: String, mtime: Long): Unit = {
      val stage = tmp(s"graft-curate-stage-$name")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      val dst = java.nio.file.Paths.get(inDir, s"$name.parquet")
      Files.move(part, dst)
      dst.toFile.setLastModified(mtime); ()
    }
    val t0 = System.currentTimeMillis() - 60000
    landFile(b0, "f0", t0)
    landFile(b1, "f1", t0 + 10000)
    CurateIngest.run(spark, inDir, root, b0.schema, "text", "doc_id", cp,
      outDir = Some(out), maxFilesPerTrigger = 1).awaitTermination()
    // the persisted survivor stream equals batch curate restricted per batch
    val all = b0.unionByName(b1)
    val got = spark.read.parquet(out)
      .select(col("doc_id"), col("pred_lang"), col("score"), col("batch_id"))
      .collect().map(_.toSeq).toSet
    val expect = rows(Curation.curate(all, "text", "doc_id"))
      .map(r => r :+ (if (r.head.asInstanceOf[Long] < 10L) 0L else 1L))
    assert(got === expect, s"streamed curated output diverged\n got=$got\nwant=$expect")
  }

  test("compaction folds the fp/meta stores without changing probe results") {
    val root = tmp("graft-curate-compact")
    CurateIngest.processBatch(spark, docsDf(Seq(1L -> enText(1))),
      root, "text", "doc_id", 0L)
    CurateIngest.processBatch(spark, docsDf(Seq(10L -> enText(2))),
      root, "text", "doc_id", 1L)
    val probeB = docsDf(Seq(20L -> enText(1), 21L -> enText(6)))
    val before = rows(CurateIngest.curateProbe(spark, root, probeB, "text", "doc_id"))
    CurateIngest.compactStores(spark, root, 1L)
    assert(rows(CurateIngest.curateProbe(spark, root, probeB, "text", "doc_id")) === before)
    // and the monotone gate still sees the folded meta max
    val e = intercept[IllegalArgumentException] {
      CurateIngest.processBatch(spark, docsDf(Seq(5L -> enText(3))),
        root, "text", "doc_id", 2L)
    }
    assert(e.getMessage.contains("monotonicity"))
  }
}
