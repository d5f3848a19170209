package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables.Fixture
import graft.streaming.{CurateIngest, DocIndexIngest, EmbIndexIngest,
  GraphIngest, PipelineIngest, StoreCompaction, TextModelIngest}

/** The unified-loop contract: N batches through [[PipelineIngest]] (one
  * streaming query, one checkpoint, one epoch id) leave every store
  * family row- and layout-identical to the per-family entry points run
  * over the same batch sequence — the loop composes, it never diverges.
  * Plus the composed exactly-once: a replayed epoch rewrites every
  * family unchanged.
  */
class PipelineIngestSpec extends SparkTestBase {

  private def tmp(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p.toString
  }

  private val targetPred = col("lang") === "en"
  private val cfg = PipelineIngest.Config(
    emb = EmbIndexIngest.Config(nlist = 4),
    dedupMinCosine = Some(0.25))

  /** docs ⟕ embeddings on id — every row a document, vector present
    * except in the MIDDLE id-range batch (exercises the vector-less-
    * batch mux arm). localCheckpoint: five consumers, one scan.
    */
  private lazy val combined: DataFrame = {
    val f = Fixture(spark, sfDir)
    f.documents
      .join(f.embeddings.select(col("vec_id").as("doc_id"), col("embedding")),
        Seq("doc_id"), "left")
      .withColumn("embedding",
        when(col("doc_id") > lit(166L) && col("doc_id") <= lit(333L), lit(null))
          .otherwise(col("embedding")))
      .localCheckpoint(true)
  }
  private lazy val batches: Seq[DataFrame] = {
    val cuts = Seq((Long.MinValue, 166L), (166L, 333L), (333L, Long.MaxValue))
    cuts.map { case (lo, hi) =>
      combined.filter(col("doc_id") > lo && col("doc_id") <= hi) }
  }

  /** Multiset of rows (embedding arrays compare via WrappedArray equals;
    * a Seq sort is unavailable over Any). */
  private def rowBag(df: DataFrame): Map[Seq[Any], Int] =
    df.collect().map(_.toSeq).groupBy(identity).map { case (k, v) => (k, v.length) }

  /** Relative partition-directory layout under a store dir. */
  private def layout(dir: String): Set[String] = {
    def walk(f: java.io.File, rel: String): Seq[String] =
      if (!f.isDirectory) Seq.empty
      else f.listFiles().toSeq.filter(_.isDirectory)
        .flatMap(d => (rel + "/" + d.getName) +: walk(d, rel + "/" + d.getName))
    walk(new java.io.File(dir), "").toSet
  }

  private def assertStoreEqual(a: String, b: String, what: String): Unit = {
    val (fa, fb) = (new java.io.File(a).exists(), new java.io.File(b).exists())
    assert(fa === fb, s"$what: existence diverged (unified=$fa per-family=$fb)")
    if (!fa) return
    assert(layout(a) === layout(b), s"$what: partition layout diverged")
    val (da, db) = (spark.read.parquet(a), spark.read.parquet(b))
    assert(da.columns.sorted.toSeq === db.columns.sorted.toSeq,
      s"$what: columns diverged")
    assert(rowBag(da) === rowBag(db), s"$what: rows diverged")
  }

  /** Every store dir of every family, relative to its family root. */
  private def docStores(root: String): Seq[(String, String)] = {
    val epoch = DocIndexIngest.currentEpoch(spark, root).getOrElse(0L)
    Seq(
      "corpus" -> DocIndexIngest.corpusDir(root),
      "lsh" -> DocIndexIngest.lshDir(root),
      "pairs" -> DocIndexIngest.pairsDir(root),
      "bm25_postings" -> DocIndexIngest.bm25PostingsDir(root),
      "bm25_stats" -> DocIndexIngest.bm25StatsDir(root),
      "pos_postings" -> DocIndexIngest.posPostingsDir(root),
      "prefix" -> DocIndexIngest.prefixDir(root, epoch),
      "df" -> DocIndexIngest.dfDir(root, epoch),
      "degrees" -> GraphIngest.degreesDir(root),
      "remap" -> GraphIngest.remapDir(root),
      "fp" -> CurateIngest.fpDir(root),
      "meta" -> CurateIngest.metaDir(root))
  }
  private def textStores(root: String): Seq[(String, String)] = Seq(
    "dsir" -> TextModelIngest.dsirDir(root),
    "tagger" -> TextModelIngest.taggerDir(root),
    "lm_c1" -> TextModelIngest.lmC1Dir(root),
    "lm_c2" -> TextModelIngest.lmC2Dir(root))
  private def embStores(root: String): Seq[(String, String)] = {
    val epoch = EmbIndexIngest.currentEpoch(spark, root).getOrElse(0L)
    Seq(
      "cents" -> EmbIndexIngest.centsDir(root, epoch),
      "books" -> EmbIndexIngest.booksDir(root, epoch),
      "vectors" -> EmbIndexIngest.vectorsDir(root, epoch),
      "codes" -> EmbIndexIngest.codesDir(root, epoch))
  }

  /** Every family store of `rootA` ≡ `rootB` row-for-row once the
    * layout-only `batch_id` is dropped (folds retile partitions, never
    * rewrite content; the curated outDir's SEMANTIC batch_id is not a
    * store and is checked separately where it matters).
    */
  private def assertRowsEqualModBatch(rootA: String, rootB: String,
                                      ctx: String): Unit =
    for ((what, dirs) <- Seq(
        "docs" -> docStores _, "text" -> textStores _, "emb" -> embStores _);
         famRoot = (r: String) => what match {
           case "docs" => PipelineIngest.docsRoot(r)
           case "text" => PipelineIngest.textRoot(r)
           case _ => PipelineIngest.embRoot(r)
         };
         ((name, a), (_, b)) <- dirs(famRoot(rootA)).zip(dirs(famRoot(rootB))))
      if (new java.io.File(a).exists() || new java.io.File(b).exists())
        assert(rowBag(spark.read.parquet(a).drop("batch_id")) ===
          rowBag(spark.read.parquet(b).drop("batch_id")),
          s"$what/$name rows diverged $ctx")

  /** Drive the per-family entry points over the same batch sequence the
    * unified loop consumed (epoch ids 0..n−1, same projections).
    */
  private def runPerFamily(root: String): Unit =
    batches.zipWithIndex.foreach { case (b, i) =>
      val docB = b.drop("embedding")
      CurateIngest.processBatch(spark, docB, PipelineIngest.docsRoot(root),
        "text", "doc_id", i.toLong, cfg.curation, cfg.partitionMod)
      TextModelIngest.processBatch(spark, docB, PipelineIngest.textRoot(root),
        "text", "doc_id", targetPred, "lang", i.toLong, cfg.textModel)
      val vecs = b.filter(col("embedding").isNotNull)
        .select(col("doc_id"), col("embedding"))
      if (!vecs.isEmpty)
        EmbIndexIngest.processBatchDedup(spark, vecs,
          PipelineIngest.embRoot(root), "doc_id", "embedding", i.toLong,
          cfg.dedupMinCosine.get, cfg.emb)
    }

  private def landFiles(inDir: String): Unit = {
    val t0 = System.currentTimeMillis() - 60000
    batches.zipWithIndex.foreach { case (b, i) =>
      val stage = tmp(s"graft-pipe-stage$i")
      b.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      val dst = java.nio.file.Paths.get(inDir, s"b$i.parquet")
      Files.move(part, dst)
      dst.toFile.setLastModified(t0 + i * 10000L); ()
    }
  }

  // shared across tests: one streamed unified run (the expensive half)
  private lazy val unifiedRoot: String = {
    val root = tmp("graft-pipe-uni")
    val inDir = tmp("graft-pipe-in")
    landFiles(inDir)
    PipelineIngest.run(spark, inDir, root, combined.schema, "text", "doc_id",
      Some("embedding"), targetPred, "lang", tmp("graft-pipe-cp"), cfg,
      outDir = Some(s"$root/out"), maxFilesPerTrigger = 1).awaitTermination()
    root
  }

  test("unified loop ≡ per-family loops: every store row- and layout-identical") {
    val perFam = tmp("graft-pipe-fam")
    runPerFamily(perFam)
    assert(DocIndexIngest.currentEpoch(spark,
        PipelineIngest.docsRoot(unifiedRoot)) ===
      DocIndexIngest.currentEpoch(spark, PipelineIngest.docsRoot(perFam)))
    assert(EmbIndexIngest.currentEpoch(spark,
        PipelineIngest.embRoot(unifiedRoot)) ===
      EmbIndexIngest.currentEpoch(spark, PipelineIngest.embRoot(perFam)))
    for ((what, dirs) <- Seq(
        "docs" -> docStores _, "text" -> textStores _, "emb" -> embStores _);
         root = (r: String) => what match {
           case "docs" => PipelineIngest.docsRoot(r)
           case "text" => PipelineIngest.textRoot(r)
           case _ => PipelineIngest.embRoot(r)
         };
         ((name, a), (_, b)) <- dirs(root(unifiedRoot)).zip(dirs(root(perFam))))
      assertStoreEqual(a, b, s"$what/$name")
  }

  test("the vector-less middle batch skipped the embedding family") {
    val epoch = EmbIndexIngest.currentEpoch(spark,
      PipelineIngest.embRoot(unifiedRoot)).get
    val vecDir = new java.io.File(
      EmbIndexIngest.vectorsDir(PipelineIngest.embRoot(unifiedRoot), epoch))
    val batchDirs = vecDir.listFiles().toSeq
      .map(_.getName).filter(_.startsWith("batch_id=")).toSet
    assert(batchDirs === Set("batch_id=0", "batch_id=2"),
      s"expected batches 0 and 2 only, got $batchDirs")
  }

  test("replayed epoch rewrites every family unchanged (composed exactly-once)") {
    val before = (docStores(PipelineIngest.docsRoot(unifiedRoot)) ++
      textStores(PipelineIngest.textRoot(unifiedRoot)) ++
      embStores(PipelineIngest.embRoot(unifiedRoot)))
      .map { case (name, d) => name -> rowBag(spark.read.parquet(d)) }
    PipelineIngest.processBatch(spark, batches(2), unifiedRoot, "text",
      "doc_id", Some("embedding"), targetPred, "lang", 2L, cfg)
    (docStores(PipelineIngest.docsRoot(unifiedRoot)) ++
      textStores(PipelineIngest.textRoot(unifiedRoot)) ++
      embStores(PipelineIngest.embRoot(unifiedRoot)))
      .zip(before).foreach { case ((name, d), (_, want)) =>
        assert(rowBag(spark.read.parquet(d)) === want,
          s"replay changed store $name")
      }
  }

  test("curated outDir carries each batch's survivors under its epoch") {
    val out = spark.read.parquet(s"$unifiedRoot/out")
    assert(out.columns.contains("batch_id"))
    // survivors ≡ the batch pipeline over the whole corpus, restricted
    // per batch (CurateIngest's spec-pinned contract — checked here as
    // plumbing: the unified loop persisted exactly the processBatch view)
    val got = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val want = graft.operators.Curation
      .curate(combined.drop("embedding"), "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === want)
  }

  test("doc-only pipeline (vecCol=None) never touches an embedding root") {
    val root = tmp("graft-pipe-doconly")
    PipelineIngest.processBatch(spark, batches(0).drop("embedding"), root,
      "text", "doc_id", None, targetPred, "lang", 0L, cfg)
    assert(!new java.io.File(PipelineIngest.embRoot(root)).exists())
    assert(new java.io.File(PipelineIngest.docsRoot(root)).exists())
    assert(new java.io.File(PipelineIngest.textRoot(root)).exists())
  }

  test("searchCurated serves the reference's filter→top-K shape over the curated product, cache included") {
    val outDir = s"$unifiedRoot/out"
    val all = spark.read.parquet(outDir)
    // unfiltered: newest-first top-5 ≡ a plain desc sort over the product
    val got = PipelineIngest.searchCurated(spark, outDir, Map.empty, "doc_id",
      limit = 5).select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    val want = all.orderBy(col("doc_id").desc, col("batch_id").desc)
      .limit(5).select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    assert(got === want)
    // filtered: every served row satisfies the predicate, newest-first
    val lang = all.select(col("pred_lang")).head().getString(0)
    val filt = PipelineIngest.searchCurated(spark, outDir,
      Map("pred_lang" -> lang), "doc_id", limit = 3)
    assert(filt.filter(col("pred_lang") =!= lang).count() === 0)
    val wantF = all.filter(col("pred_lang") === lang)
      .orderBy(col("doc_id").desc).limit(3)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    assert(filt.select(col("doc_id")).collect().map(_.getLong(0)).toSeq === wantF)
    // cached: second identical call is a cache hit serving the same rows
    val cache = new graft.ResultCache()
    val c1 = PipelineIngest.searchCurated(spark, outDir,
      Map("pred_lang" -> lang), "doc_id", 3, Some(cache)).collect()
    assert(cache.size === 1)
    val c2 = PipelineIngest.searchCurated(spark, outDir,
      Map("pred_lang" -> lang), "doc_id", 3, Some(cache)).collect()
    assert(cache.size === 1, "second call must hit, not re-cache")
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
  }

  test("the streamed curated product exports to training shards without re-curation") {
    // ingest → product stream → TrainingExport, end-to-end over the REAL
    // streaming outDir (not hand-built processBatch views): the loop's
    // product is directly consumable by the export capstone, batch_id
    // provenance riding along harmlessly
    val product = spark.read.parquet(s"$unifiedRoot/out")
    val exportDir = tmp("graft-pipe-export")
    val rpt = graft.operators.TrainingExport.exportCurated(
      product, "text", "doc_id", exportDir, nShards = 4,
      chunk = Some(graft.operators.TrainingExport.Chunk(32, 24)))
    assert(rpt.n_curated === product.count(),
      "curation happened upstream — the export must not drop rows before its own stages")
    assert(rpt.n_rows_written > 0L)
    val shards = spark.read.parquet(exportDir)
    assert(shards.count() === rpt.n_rows_written)
    // every exported row's provenance id is a curated survivor
    val prodIds = product.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val expIds = shards.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(expIds.subsetOf(prodIds), "export emitted ids outside the curated product")
  }

  test("embCuratedOnly: embedding store ≡ EmbIndexIngest over the curated survivor stream") {
    val gatedCfg = cfg.copy(embCuratedOnly = true)
    val uniRoot = tmp("graft-pipe-gated-uni")
    val survivors = batches.zipWithIndex.map { case (b, i) =>
      PipelineIngest.processBatch(spark, b, uniRoot, "text", "doc_id",
        Some("embedding"), targetPred, "lang", i.toLong, gatedCfg)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    }
    // hand-composed twin: curate each batch, hand ONLY the survivors'
    // vectors to a standalone EmbIndexIngest — the composition the flag
    // promises to equal, store-layout included
    val handRoot = tmp("graft-pipe-gated-hand")
    batches.zipWithIndex.foreach { case (b, i) =>
      val curated = CurateIngest.processBatch(spark, b.drop("embedding"),
        PipelineIngest.docsRoot(handRoot), "text", "doc_id", i.toLong,
        cfg.curation, cfg.partitionMod).localCheckpoint(true)
      val vecs = b.filter(col("embedding").isNotNull)
        .select(col("doc_id"), col("embedding"))
        .join(curated.select(col("doc_id")), Seq("doc_id"), "left_semi")
      if (!vecs.isEmpty)
        EmbIndexIngest.processBatchDedup(spark, vecs,
          PipelineIngest.embRoot(handRoot), "doc_id", "embedding", i.toLong,
          cfg.dedupMinCosine.get, cfg.emb)
    }
    for (((name, a), (_, b)) <- embStores(PipelineIngest.embRoot(uniRoot))
        .zip(embStores(PipelineIngest.embRoot(handRoot))))
      assertStoreEqual(a, b, s"emb/$name (embCuratedOnly)")
    // the gate is LIVE, not vacuous: curation rejected at least one
    // vector-bearing doc, and none of the rejected ids reached the store
    val rejectedVecIds = batches.zipWithIndex.flatMap { case (b, i) =>
      b.filter(col("embedding").isNotNull).select(col("doc_id"))
        .collect().map(_.getLong(0)).filterNot(survivors(i))
    }.toSet
    assert(rejectedVecIds.nonEmpty,
      "fixture produced no curation-rejected vector rows — the gate is untested")
    val embEpoch = EmbIndexIngest.currentEpoch(
      spark, PipelineIngest.embRoot(uniRoot)).get
    val storedIds = spark.read.parquet(EmbIndexIngest.vectorsDir(
        PipelineIngest.embRoot(uniRoot), embEpoch))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(storedIds.intersect(rejectedVecIds).isEmpty,
      "curation-rejected vectors leaked into the gated embedding store")
    // while the DEFAULT (ungated) unified store DOES hold rejected ids —
    // the per-family equivalence contract the default preserves
    val unEpoch = EmbIndexIngest.currentEpoch(
      spark, PipelineIngest.embRoot(unifiedRoot)).get
    val ungatedIds = spark.read.parquet(EmbIndexIngest.vectorsDir(
        PipelineIngest.embRoot(unifiedRoot), unEpoch))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ungatedIds.intersect(rejectedVecIds).nonEmpty,
      "expected the ungated store to index some curation-rejected vectors")
  }

  test("a typo'd vecCol raises instead of silently dropping every vector") {
    val root = tmp("graft-pipe-typo")
    val e = intercept[IllegalArgumentException] {
      PipelineIngest.processBatch(spark, batches(0), root, "text", "doc_id",
        Some("embeddings_oops"), targetPred, "lang", 0L, cfg)
    }
    assert(e.getMessage.contains("vecCol"))
  }

  test("compactEvery tier cadence: same rows, same probes, tiered layout, outDir untouched") {
    // the in-loop maintenance form: every 2nd trigger tier-folds the
    // prior 2 committed batches (O(tier), never O(corpus)) — the stores
    // must stay row-identical (mod the layout-only batch_id) and
    // probe-identical to the uncadenced unified run
    val root = tmp("graft-pipe-tiercad")
    val inDir = tmp("graft-pipe-tiercad-in")
    landFiles(inDir)
    PipelineIngest.run(spark, inDir, root, combined.schema, "text", "doc_id",
      Some("embedding"), targetPred, "lang", tmp("graft-pipe-tiercad-cp"),
      cfg.copy(compactEvery = Some(2)), outDir = Some(s"$root/out"),
      maxFilesPerTrigger = 1).awaitTermination()

    // rows: every store ≡ the uncadenced run once the layout-only
    // batch_id is dropped (outDir's batch_id is semantic — checked below)
    assertRowsEqualModBatch(root, unifiedRoot, "under the tier cadence")

    // layout: the epoch-2 trigger folded batches (−1,1] → tier −3; the
    // live batch 2 stays; the vector store had only batch 0 in range
    // (the middle batch is vector-less) → a 1-partition range is a no-op
    def bdirs(d: String): Set[String] = new java.io.File(d).listFiles().toSeq
      .map(_.getName).filter(_.startsWith("batch_id=")).toSet
    assert(bdirs(graft.streaming.DocIndexIngest.lshDir(
        PipelineIngest.docsRoot(root))) === Set("batch_id=-3", "batch_id=2"))
    assert(bdirs(CurateIngest.metaDir(PipelineIngest.docsRoot(root))) ===
      Set("batch_id=-3", "batch_id=2"))
    val embEpoch = EmbIndexIngest.currentEpoch(spark,
      PipelineIngest.embRoot(root)).get
    assert(bdirs(EmbIndexIngest.vectorsDir(PipelineIngest.embRoot(root),
      embEpoch)) === Set("batch_id=0", "batch_id=2"))
    // the curated outDir folds on the SAME cadence (epochs 0,1 → tier
    // −3; live epoch 2) — its semantic batch_id survives as the
    // src_batch stamp, so the serving table's partition count stays
    // bounded WITHOUT losing per-row provenance
    assert(bdirs(s"$root/out") === Set("batch_id=-3", "batch_id=2"),
      "the curated outDir must fold on the cadence (provenance-stamped)")
    val foldedOut = graft.streaming.ProductStore.readProduct(spark, s"$root/out")
      .select(col("doc_id"), col("batch_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unfoldedOut = graft.streaming.ProductStore
      .readProduct(spark, s"$unifiedRoot/out")
      .select(col("doc_id"), col("batch_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(foldedOut === unfoldedOut,
      "folding the product must preserve every row's semantic batch_id")

    // the maintenance-posture rollup reads the tiered layout correctly
    // (pure listing — the monitor's view of the cadence keeping up)
    val st = PipelineIngest.storeStats(spark, root)
    val lshSt = st.find(_.dir == graft.streaming.DocIndexIngest.lshDir(
      PipelineIngest.docsRoot(root))).get
    assert(lshSt.tierRuns === 1 && lshSt.liveBatches === 1 && !lshSt.hasBase,
      s"lsh store stats misread the tiered layout: $lshSt")
    assert(st.forall(s => s.files > 0 && s.bytes > 0),
      s"every pipeline store should have data here: ${st.filter(_.files == 0)}")

    // probes: the composed read path answers identically over the tiers
    val probeB = combined.drop("embedding").filter(col("doc_id") <= 20L)
      .withColumn("doc_id", col("doc_id") + lit(1000L))
    assert(rowBag(CurateIngest.curateProbe(spark, PipelineIngest.docsRoot(root),
        probeB, "text", "doc_id", cfg.curation, cfg.partitionMod)) ===
      rowBag(CurateIngest.curateProbe(spark, PipelineIngest.docsRoot(unifiedRoot),
        probeB, "text", "doc_id", cfg.curation, cfg.partitionMod)),
      "curate probe diverged over the tiered store")
    assert(rowBag(TextModelIngest.dsirProbe(spark, PipelineIngest.textRoot(root),
        probeB, "text", "doc_id", cfg.textModel)) ===
      rowBag(TextModelIngest.dsirProbe(spark, PipelineIngest.textRoot(unifiedRoot),
        probeB, "text", "doc_id", cfg.textModel)),
      "dsir probe diverged over the tiered store")
  }

  test("crash/replay property: any subset of a trigger's writes can vanish; replay heals every family") {
    // The loop's fault model: processBatch fans each family's batch-keyed
    // dynamic overwrites out concurrently, so a driver death mid-trigger
    // leaves an ARBITRARY subset of that epoch's partition writes on disk
    // (whole `batch_id=<k>` dirs, or partial task output inside one) with
    // the checkpoint uncommitted; Structured Streaming then replays the
    // same batch under the same epoch id. The healing claims under walk:
    // every store read inside a trigger excludes the in-flight epoch (the
    // excludeBatch guard — a family must never curate/dedup/monotone-gate
    // a batch against its own crashed remnants) and every write is a
    // batch-keyed overwrite, so a replay lands exactly the clean
    // trigger's state whatever the crash left. One cadence trigger is
    // crashed mid-fold too (a subset of family folds completed before
    // death; the replayed trigger re-runs the full fold, which no-ops
    // over the already-emptied ranges).
    val rnd = new scala.util.Random(20260815L)
    val maxId = combined.agg(max(col("doc_id"))).head().getLong(0)
    val step = maxId / 5 + 1
    val walkBatches = (0 until 5).map { i =>
      combined.filter(
        col("doc_id") > i * step && col("doc_id") <= (i + 1) * step)
    }
    def ingest(root: String, k: Int): Unit = {
      PipelineIngest.processBatch(spark, walkBatches(k), root, "text",
        "doc_id", Some("embedding"), targetPred, "lang", k.toLong, cfg)
      ()
    }
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmTree)
      f.delete(); ()
    }
    def epochDirs(root: String, k: Int): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (!f.isDirectory) Seq.empty
        else f.listFiles().toSeq.flatMap(d =>
          if (d.isDirectory && d.getName == s"batch_id=$k") Seq(d)
          else walk(d))
      walk(new java.io.File(root))
    }
    val walkRoot = tmp("graft-pipe-walk")
    var crashes = 0
    walkBatches.indices.foreach { k =>
      if (k == 3) { // the in-loop cadence point, crashed mid-fold
        CurateIngest.compactStores(spark, PipelineIngest.docsRoot(walkRoot),
          k - 1L, fromExclusive = -1L)
        TextModelIngest.compactStores(spark, PipelineIngest.textRoot(walkRoot),
          k - 1L, fromExclusive = -1L)
        PipelineIngest.compactStores(spark, walkRoot, k - 1L, cfg,
          fromExclusive = -1L) // the replayed trigger's full cadence
      }
      ingest(walkRoot, k)
      if (rnd.nextBoolean() || k == 1) { // crash: some of epoch k's writes vanish
        crashes += 1
        epochDirs(walkRoot, k).foreach { d =>
          rnd.nextInt(5) match {
            case 0 | 1 => rmTree(d) // this store's write never committed
            case 2 => // partial commit: one task file / cell dir missing
              val kids = d.listFiles()
              if (kids.nonEmpty) rmTree(kids(rnd.nextInt(kids.length)))
            case _ => () // this write survived intact
          }
        }
        ingest(walkRoot, k) // the replay
      }
    }
    assert(crashes >= 2, s"the seed must exercise the crash arm, got $crashes")
    // the clean twin: same batches, same epoch ids, no crashes, no folds
    val refRoot = tmp("graft-pipe-walkref")
    walkBatches.indices.foreach(k => ingest(refRoot, k))
    assertRowsEqualModBatch(walkRoot, refRoot, "after the crash/replay walk")
    // and the composed read path answers identically over the walked store
    val probeB = combined.drop("embedding").filter(col("doc_id") <= 20L)
      .withColumn("doc_id", col("doc_id") + lit(1000L))
    assert(rowBag(CurateIngest.curateProbe(spark,
        PipelineIngest.docsRoot(walkRoot), probeB, "text", "doc_id",
        cfg.curation, cfg.partitionMod)) ===
      rowBag(CurateIngest.curateProbe(spark,
        PipelineIngest.docsRoot(refRoot), probeB, "text", "doc_id",
        cfg.curation, cfg.partitionMod)),
      "curate probe diverged after the crash/replay walk")
  }

  test("healStores rolls a crashed fold forward so probes can read before restart") {
    // a compaction that died between its commit marker and the swap
    // leaves the store readable but STALE-SHAPED; the loop heals on its
    // next trigger, but a probe running while the loop is down reads a
    // torn store unless this explicit heal runs first
    val dsir = TextModelIngest.dsirDir(PipelineIngest.textRoot(unifiedRoot))
    val before = rowBag(spark.read.parquet(dsir).drop("batch_id"))
    StoreCompaction.stage(spark, dsir, Seq.empty, upToBatch = 2L)
    assert(new java.io.File(s"$dsir.tmp/_COMMIT").exists())
    PipelineIngest.healStores(spark, unifiedRoot)
    assert(!new java.io.File(s"$dsir.tmp").exists(),
      "heal must resolve the staged fold")
    assert(rowBag(spark.read.parquet(dsir).drop("batch_id")) === before,
      "healing must preserve content (layout-only fold)")
  }

  test("compactStores folds every family; probes answer identically") {
    // compact the unified root's stores (batches 0..2 all committed) and
    // re-check one probe per family against its pre-compaction answer
    val docsR = PipelineIngest.docsRoot(unifiedRoot)
    val textR = PipelineIngest.textRoot(unifiedRoot)
    val probeB = combined.drop("embedding").filter(col("doc_id") <= 20L)
      .withColumn("doc_id", col("doc_id") + lit(1000L))
    def curateP() = rowBag(CurateIngest.curateProbe(spark, docsR, probeB,
      "text", "doc_id", cfg.curation, cfg.partitionMod))
    def dsirP() = rowBag(TextModelIngest.dsirProbe(spark, textR, probeB,
      "text", "doc_id", cfg.textModel))
    val (c0, d0) = (curateP(), dsirP())
    PipelineIngest.compactStores(spark, unifiedRoot, upToBatch = 2L, cfg)
    assert(curateP() === c0, "curate probe diverged after unified compaction")
    assert(dsirP() === d0, "dsir probe diverged after unified compaction")
  }
}
