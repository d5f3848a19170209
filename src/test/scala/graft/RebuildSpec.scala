package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables.Fixture
import graft.streaming.{CurateIngest, DocIndexIngest, EmbIndexIngest,
  GraphIngest, PipelineIngest, StoreCompaction, TextModelIngest}

/** [[PipelineIngest.rebuild]] — the executable form of SURVEY §7.4's
  * backfill answer. The pinned claims:
  *
  *  1. a rebuilt root's stores are ROW-IDENTICAL to a plain epoch-0
  *     [[PipelineIngest.processBatch]] over the same corpus, with every
  *     batch-keyed partition resting in the `batch_id=-1` base (the
  *     rebase rewrote layout, never rows);
  *  2. a resumed fresh-checkpoint stream's epoch 0 — THE collision the
  *     rebase exists for — appends without clobbering one rebuilt row,
  *     its curated view matches the in-memory twin over (corpus ∪
  *     batch), and a replay of that epoch rewrites every family
  *     unchanged;
  *  3. the fresh-root and lone-partition guards raise instead of
  *     corrupting.
  */
class RebuildSpec extends SparkTestBase {

  private def tmp(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p.toString
  }

  private val targetPred = col("lang") === "en"
  private val cfg = PipelineIngest.Config(
    emb = EmbIndexIngest.Config(nlist = 4),
    dedupMinCosine = Some(0.25))

  /** docs ⟕ embeddings on id, vector present on the low id-range only
    * (exercises null-vector routing through the rebuild's one batch).
    */
  private lazy val union: DataFrame = {
    val f = Fixture(spark, sfDir)
    f.documents
      .join(f.embeddings.select(col("vec_id").as("doc_id"), col("embedding")),
        Seq("doc_id"), "left")
      .withColumn("embedding",
        when(col("doc_id") > lit(250L), lit(null)).otherwise(col("embedding")))
      .localCheckpoint(true)
  }
  /** A post-rebuild batch: ids strictly above the rebuilt corpus max,
    * texts genuinely new (an exact-duplicate batch would be fully
    * absorbed by the fingerprint store and land no epoch-0 partition —
    * the collision under test needs one).
    */
  private lazy val resumeBatch: DataFrame = union
    .filter(col("doc_id") <= 40L)
    .withColumn("doc_id", col("doc_id") + lit(100000L))
    .withColumn("text", concat(col("text"), lit(" resumed-"), col("doc_id")))
    .localCheckpoint(true)

  private def rowBag(df: DataFrame): Map[Seq[Any], Int] =
    df.collect().map(_.toSeq).groupBy(identity).map { case (k, v) => (k, v.length) }

  /** Every batch-keyed store of every family (name, dir) — the
    * [[PipelineIngestSpec]] walk, minus the epoch-frozen model dirs the
    * rebase never touches (df dictionary, centroids, codebooks).
    */
  private def batchKeyedStores(root: String): Seq[(String, String)] = {
    val docs = PipelineIngest.docsRoot(root)
    val text = PipelineIngest.textRoot(root)
    val emb = PipelineIngest.embRoot(root)
    val docEpoch = DocIndexIngest.currentEpoch(spark, docs)
    val embEpoch = EmbIndexIngest.currentEpoch(spark, emb)
    Seq(
      "corpus" -> DocIndexIngest.corpusDir(docs),
      "lsh" -> DocIndexIngest.lshDir(docs),
      "pairs" -> DocIndexIngest.pairsDir(docs),
      "bm25_postings" -> DocIndexIngest.bm25PostingsDir(docs),
      "bm25_stats" -> DocIndexIngest.bm25StatsDir(docs),
      "pos_postings" -> DocIndexIngest.posPostingsDir(docs),
      "degrees" -> GraphIngest.degreesDir(docs),
      "remap" -> GraphIngest.remapDir(docs),
      "fp" -> CurateIngest.fpDir(docs),
      "meta" -> CurateIngest.metaDir(docs),
      "dsir" -> TextModelIngest.dsirDir(text),
      "tagger" -> TextModelIngest.taggerDir(text),
      "lm_c1" -> TextModelIngest.lmC1Dir(text),
      "lm_c2" -> TextModelIngest.lmC2Dir(text)) ++
      docEpoch.map(e => "prefix" -> DocIndexIngest.prefixDir(docs, e)) ++
      embEpoch.toSeq.flatMap(e => Seq(
        "vectors" -> EmbIndexIngest.vectorsDir(emb, e),
        "codes" -> EmbIndexIngest.codesDir(emb, e)))
  }

  private def batchDirs(dir: String): Set[String] = {
    val f = new java.io.File(dir)
    if (!f.exists()) Set.empty
    else f.listFiles().toSeq.map(_.getName).filter(_.startsWith("batch_id=")).toSet
  }

  // shared across tests: one rebuilt root (the expensive half)
  private lazy val rebuiltRoot: String = {
    val root = s"${tmp("graft-rebuild")}/new"
    PipelineIngest.rebuild(spark, union, root, "text", "doc_id",
      Some("embedding"), targetPred, "lang", cfg, outDir = Some(s"$root.out"))
    root
  }

  test("rebuilt stores ≡ plain epoch-0 build row-for-row, resting in the -1 base") {
    val plain = tmp("graft-rebuild-plain")
    PipelineIngest.processBatch(spark, union, plain, "text", "doc_id",
      Some("embedding"), targetPred, "lang", 0L, cfg)
    assert(new java.io.File(s"$rebuiltRoot/_REBUILT").exists(),
      "the commit marker must exist after a completed rebuild")
    batchKeyedStores(rebuiltRoot).zip(batchKeyedStores(plain)).foreach {
      case ((name, a), (_, b)) =>
        assert(batchDirs(a) === Set("batch_id=-1"),
          s"$name: a rebuilt store must hold only the base, got ${batchDirs(a)}")
        assert(rowBag(spark.read.parquet(a).drop("batch_id")) ===
          rowBag(spark.read.parquet(b).drop("batch_id")),
          s"$name: rebase changed rows")
    }
    // frozen-model state carried over unchanged: same epoch, same df dict
    assert(DocIndexIngest.currentEpoch(spark,
      PipelineIngest.docsRoot(rebuiltRoot)) === Some(0L))
    assert(EmbIndexIngest.currentEpoch(spark,
      PipelineIngest.embRoot(rebuiltRoot)) === Some(0L))
    assert(rowBag(DocIndexIngest.readDf(spark, PipelineIngest.docsRoot(rebuiltRoot))) ===
      rowBag(DocIndexIngest.readDf(spark, PipelineIngest.docsRoot(plain))))
  }

  test("the curated outDir is the batch pipeline's survivor set, REBASED off epoch 0") {
    val got = spark.read.parquet(s"$rebuiltRoot.out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = graft.operators.Curation
      .curate(union.drop("embedding"), "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === want)
    // the product gets the same rebase as the stores: resting at
    // batch_id=0 it would be dynamic-overwritten by a resumed
    // fresh-checkpoint stream's first trigger — the rebuilt corpus view
    // silently replaced by one batch's survivors
    assert(batchDirs(s"$rebuiltRoot.out") === Set("batch_id=-1"),
      "the rebuilt product must rest in the -1 base, not at epoch 0")
    // semantic provenance survives the rename via the src_batch stamp
    val prod = graft.streaming.ProductStore.readProduct(spark, s"$rebuiltRoot.out")
    assert(prod.select("batch_id").distinct().collect().map(_.getLong(0)).toSeq
      === Seq(0L))
    // and a resumed epoch-0 product write lands BESIDE the base
    import org.apache.spark.sql.functions.lit
    graft.streaming.ProductStore.writeEpoch(spark,
      prod.limit(1).drop("batch_id"), s"$rebuiltRoot.out", 0L)
    assert(batchDirs(s"$rebuiltRoot.out") ===
      Set("batch_id=-1", "batch_id=0"),
      "a resumed epoch 0 must append beside the rebased product")
    assert(graft.streaming.ProductStore.readProduct(spark, s"$rebuiltRoot.out")
      .count() === got.size + 1L)
  }

  test("resumed epoch 0 appends without clobbering; view ≡ the in-memory twin; replay unchanged") {
    val docsR = PipelineIngest.docsRoot(rebuiltRoot)
    val fpBefore = rowBag(spark.read.parquet(CurateIngest.fpDir(docsR))
      .drop("batch_id"))
    val view = PipelineIngest.processBatch(spark, resumeBatch, rebuiltRoot,
      "text", "doc_id", Some("embedding"), targetPred, "lang", 0L, cfg)
    // the collision the rebase exists for: epoch 0's batch-keyed
    // overwrite must land BESIDE the base, never replace it
    val fpAfter = spark.read.parquet(CurateIngest.fpDir(docsR))
    assert(batchDirs(CurateIngest.fpDir(docsR)) ===
      Set("batch_id=-1", "batch_id=0"))
    assert(fpBefore.keySet.subsetOf(rowBag(fpAfter.drop("batch_id")).keySet),
      "resumed epoch 0 clobbered rebuilt fingerprints")
    assert(rowBag(view) === rowBag(CurateIngest.curateProbeWithCorpus(
        union.drop("embedding"), resumeBatch.drop("embedding"),
        "text", "doc_id", cfg.curation)),
      "resumed batch's curated view diverged from the in-memory twin")
    // replay of the resumed epoch: every family store unchanged
    val before = batchKeyedStores(rebuiltRoot).map { case (name, d) =>
      name -> rowBag(spark.read.parquet(d)) }
    PipelineIngest.processBatch(spark, resumeBatch, rebuiltRoot,
      "text", "doc_id", Some("embedding"), targetPred, "lang", 0L, cfg)
    batchKeyedStores(rebuiltRoot).zip(before).foreach {
      case ((name, d), (_, want)) =>
        assert(rowBag(spark.read.parquet(d)) === want,
          s"replaying the resumed epoch changed store $name")
    }
  }

  test("the full §7.4 sequence: rebuild, then resume the STREAMING loop with fresh checkpoint/inDir") {
    // the operational story end-to-end: rebuild at a fresh root, then
    // PipelineIngest.run over a fresh input dir (post-rebuild files only)
    // with a fresh checkpoint — its epochs restart at 0 against the
    // rebased base, and the drained stores must equal the same batches
    // applied via processBatch to a second rebuilt twin
    val root = s"${tmp("graft-rebuild-resume")}/new"
    PipelineIngest.rebuild(spark, union, root, "text", "doc_id",
      Some("embedding"), targetPred, "lang", cfg)
    val twin = s"${tmp("graft-rebuild-resume-twin")}/new"
    PipelineIngest.rebuild(spark, union, twin, "text", "doc_id",
      Some("embedding"), targetPred, "lang", cfg)
    // two post-rebuild monotone micro-batches
    val b1 = resumeBatch
    val b2 = resumeBatch.withColumn("doc_id", col("doc_id") + lit(100000L))
      .withColumn("text", concat(col("text"), lit(" second")))
      .localCheckpoint(true)
    val inDir = tmp("graft-rebuild-resume-in")
    val t0 = System.currentTimeMillis() - 60000
    Seq(b1, b2).zipWithIndex.foreach { case (b, i) =>
      val stage = tmp(s"graft-rebuild-resume-stage$i")
      b.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      val dst = java.nio.file.Paths.get(inDir, s"b$i.parquet")
      Files.move(part, dst)
      dst.toFile.setLastModified(t0 + i * 10000L); ()
    }
    PipelineIngest.run(spark, inDir, root, b1.schema, "text", "doc_id",
      Some("embedding"), targetPred, "lang", tmp("graft-rebuild-resume-cp"),
      cfg, maxFilesPerTrigger = 1).awaitTermination()
    Seq(b1, b2).zipWithIndex.foreach { case (b, i) =>
      PipelineIngest.processBatch(spark, b, twin, "text", "doc_id",
        Some("embedding"), targetPred, "lang", i.toLong, cfg)
    }
    batchKeyedStores(root).zip(batchKeyedStores(twin)).foreach {
      case ((name, a), (_, b)) =>
        assert(rowBag(spark.read.parquet(a).drop("batch_id")) ===
          rowBag(spark.read.parquet(b).drop("batch_id")),
          s"$name: resumed stream diverged from the processBatch twin")
    }
    // and the resumed store answers a probe like the twin does
    val probeB = union.drop("embedding").filter(col("doc_id") <= 20L)
      .withColumn("doc_id", col("doc_id") + lit(500000L))
    assert(rowBag(CurateIngest.curateProbe(spark, PipelineIngest.docsRoot(root),
        probeB, "text", "doc_id", cfg.curation, cfg.partitionMod)) ===
      rowBag(CurateIngest.curateProbe(spark, PipelineIngest.docsRoot(twin),
        probeB, "text", "doc_id", cfg.curation, cfg.partitionMod)))
  }

  test("rebuild refuses an existing root; rebase refuses a multi-batch store") {
    val e = intercept[IllegalArgumentException] {
      PipelineIngest.rebuild(spark, union, rebuiltRoot, "text", "doc_id",
        Some("embedding"), targetPred, "lang", cfg)
    }
    assert(e.getMessage.contains("FRESH root"))
    // a store holding base + live epoch (the resumed-ingest state) must
    // never be rebased over — the guard is what keeps rebase a
    // bootstrap-only move
    val fpDir = CurateIngest.fpDir(PipelineIngest.docsRoot(rebuiltRoot))
    assume(batchDirs(fpDir).size > 1)
    val g = intercept[IllegalArgumentException] {
      StoreCompaction.rebase(spark, fpDir, 0L)
    }
    assert(g.getMessage.contains("only batch_id=0"))
  }

  test("a crashed rebuild (_REBUILDING without _REBUILT) refuses resume; a committed one passes") {
    val root = tmp("graft-rebuild-crash")
    // simulate rebuild dying anywhere between its first store write and
    // the commit marker — possibly mid-rebase, stores half at -1, half
    // still at 0, where a resumed epoch 0 would clobber the un-rebased
    Files.createFile(java.nio.file.Paths.get(root, "_REBUILDING"))
    val e = intercept[RuntimeException] {
      PipelineIngest.requireNotMidRebuild(spark, root)
    }
    assert(e.getMessage.contains("CRASHED rebuild"))
    // run() is the guarded resume path — it must refuse BEFORE any
    // checkpoint state exists
    val e2 = intercept[RuntimeException] {
      PipelineIngest.run(spark, tmp("graft-rebuild-crash-in"), root,
        union.schema, "text", "doc_id", Some("embedding"), targetPred,
        "lang", tmp("graft-rebuild-crash-cp"), cfg)
    }
    assert(e2.getMessage.contains("CRASHED rebuild"))
    // both markers = rebuild committed, cleanup of the in-progress
    // marker died — resumable (the commit marker wins)
    Files.createFile(java.nio.file.Paths.get(root, "_REBUILT"))
    PipelineIngest.requireNotMidRebuild(spark, root)
    // the real completed rebuild passes the guard too
    PipelineIngest.requireNotMidRebuild(spark, rebuiltRoot)
  }
}
