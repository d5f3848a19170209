package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFns.h60
import graft.operators.{Curation, Dedup}

/** INCREMENTAL curation — the stored-index form of [[Curation.curate]]:
  * the end-to-end pipeline (language filter → quality filter → exact
  * dedup → near dedup → connected components) re-runs from raw text per
  * invocation, even though every ingredient already has a maintained
  * store: [[DocIndexIngest]] keeps the corpus + LSH band index (near-dup
  * candidates without re-shingling), [[GraphIngest]] keeps the
  * component-merge log (labels without re-deriving pairs). This job adds
  * the one missing store — the exact-dedup FINGERPRINT index — and
  * composes all three, so an incoming batch is curated in O(batch) work
  * plus pruned index reads, never O(corpus). The reference's analogous
  * loop is its ingest path maintaining everything the search path reads
  * (`reference/src/lambda/processQueue.ts:162-244` feeding
  * `reference/src/services/audit.services.ts:148-163`).
  *
  * Store layout under `root/` (all parquet, exactly-once via batch-keyed
  * dynamic overwrite like every store in this package):
  *  - `curate/fp/`   — `(fp, id)`: the 128-bit normalized-text
  *    fingerprint of every ingested exact-canonical doc, partitioned by
  *    `(batch_id, fmod)` with `fmod = pmod(h60(fp), partitionMod)` — the
  *    probe's static partition prune. One row per fingerprint EVER (a
  *    batch only appends fingerprints it did not find stored), so the
  *    store is itself the dedup index, no re-aggregation on read.
  *  - `curate/meta/` — one `(min_id, max_id)` row per batch: the
  *    ID-MONOTONICITY gate (below), enforced loudly instead of assumed.
  *  - everything else is [[DocIndexIngest.processBatch]]'s stores over
  *    the batch's curation SURVIVORS of stages 1–3 (corpus, LSH, prefix,
  *    pairs) plus [[GraphIngest]]'s derived graph (degrees, merge log).
  *
  * RESULT CONTRACT (spec-pinned, the [[Dedup.similarityJoinIncremental]]
  * pattern): after ingesting batches B₁…Bₙ, `curateProbe(Bₙ₊₁)` returns
  * exactly `Curation.curate(B₁ ∪ … ∪ Bₙ₊₁)` restricted to Bₙ₊₁'s ids —
  * same rows, same columns (`pred_lang`/`score` attached). This holds
  * under the ID-MONOTONICITY contract: each batch's ids exceed every
  * previously ingested id (the natural property of ingest-assigned ids).
  * Monotonicity is what makes "first ingested wins" coincide with the
  * batch pipeline's "min id per duplicate cluster wins" — without it an
  * incremental system would have to RETRACT already-emitted survivors
  * when a smaller id arrives late, which no append-only store can. The
  * gate is enforced per batch against the stored max (`curate/meta/`),
  * raising rather than silently diverging from the contract.
  *
  * One more boundary, stated rather than hidden: the equivalence is
  * EXACT while every LSH bucket stays under `maxBucket`. An overflowed
  * bucket's skew-capped chain pairing ([[Dedup.minhashPairs]]) links
  * consecutive members of the bucket AS OF each ingest, so the
  * accumulated pair set can differ from a from-scratch run's chain over
  * the final membership — every accumulated pair is still a VERIFIED
  * near-dup pair, but component labels may differ among docs sharing an
  * overflowed bucket (exactly the overflow case [[Dedup.minhashPairs]]
  * already reports). Under the cap, candidate generation is
  * membership-order-independent and the contract is exact.
  *
  * Why each stage composes exactly:
  *  - stages 1–2 (lang/quality) are per-row — [[Curation
  *    .curateCandidates]] runs identically on a batch or the corpus;
  *  - stage 3 (exact dedup): a filtered batch doc survives iff its
  *    fingerprint is new within the batch (min id, [[Dedup
  *    .fingerprintCanonical]]) AND absent from the fp store — under
  *    monotone ids the stored holder IS the cluster's min id;
  *  - stage 4 (near dedup): the corpus-side graph NODES are exactly the
  *    ingested survivors of stages 1–3 (what [[DocIndexIngest]] holds
  *    here), pairs come from [[Dedup.minhashPairsIncremental]]'s
  *    restricted-equality contract, and full-graph component labels for
  *    batch ids come from connected components over (stored merge log ∪
  *    batch pairs): every non-root member of a stored component has a
  *    log row chaining to the component's final root — its min id — so
  *    the union's component minima equal the full pair list's
  *    ([[GraphIngest.ccLabelsProbe]]'s argument, plus batch edges).
  *
  * Scale shape per batch: one narrow scan of the batch for stages 1–2;
  * one batch-keyed aggregate for stage 3 plus a fingerprint anti-join
  * that reads only the batch's touched `fmod` partitions (static isin,
  * bounded by the modulus); stage 4 is the pruned LSH probe; the label
  * resolution is CC over (log ∪ batch pairs) — log-sized, orders below
  * the corpus, with [[Curation.connectedComponents]]'s own
  * driver-vs-distributed switch. Corpus text is read only for verified
  * near-dup candidates (the probe's broadcast semi-filter).
  */
object CurateIngest {

  def fpDir(root: String): String = s"$root/curate/fp"
  def metaDir(root: String): String = s"$root/curate/meta"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new Path(dir))

  private def overwriteParts(df: DataFrame, partCols: Seq[String], dir: String): Unit =
    IngestStages.overwriteParts(df, partCols, dir)

  /** The stored fingerprint index `(fp, id)`; `fmods` non-empty prunes
    * the read to those partition classes (static isin over the `fmod`
    * partition column — a plan-time prune, the [[DocIndexIngest
    * .readLsh]] pattern). `excludeBatch` is the replay guard shared by
    * every store here.
    */
  def readFp(spark: SparkSession, root: String,
             excludeBatch: Long = Long.MinValue,
             fmods: Seq[Long] = Seq.empty): DataFrame =
    if (exists(spark, fpDir(root))) {
      val base = StoreCompaction.readStore(spark, fpDir(root))
        .filter(col("batch_id") =!= excludeBatch)
      val pruned =
        if (fmods.nonEmpty) base.filter(col("fmod").isin(fmods.map(Long.box): _*))
        else base
      pruned.select(col("fp"), col("id"))
    } else {
      import spark.implicits._
      Seq.empty[(String, Long)].toDF("fp", "id")
    }

  /** Stages 1–3 on a batch alone: filter, then one canonical row per
    * fingerprint (min id), with the fingerprint attached as `__fp`.
    */
  private def batchCanonical(batch: DataFrame, textCol: String,
                             idCol: String, cfg: Curation.Config): DataFrame =
    Dedup.fingerprintCanonical(
        Curation.curateCandidates(batch, textCol, idCol, cfg), textCol, idCol)
      .withColumn("__fp", Dedup.fpExpr(textCol))

  /** Stages 1–3 against a fingerprint store: the batch's canonical rows
    * and the subset whose fingerprint is NOT already stored. ONE copy of
    * this prefix — [[curateCore]] (probe/twin) and [[processBatch]]
    * (ingest) both run it, so a fix here can never split the spec-pinned
    * probe ≡ ingest-view contract. An empty `touched` set (every batch
    * row failed the filters) short-circuits: `fpFor`'s empty-fmods
    * convention is "no prune", and anti-joining an EMPTY left side
    * against the full fp store would scan the corpus-scale store to
    * produce zero rows.
    */
  private def stagePrefix(
      fpFor: Seq[Long] => DataFrame, batch: DataFrame,
      textCol: String, idCol: String, cfg: Curation.Config,
      partitionMod: Int): DataFrame = {
    // checkpointed: feeds the touched-fmod collect and the anti-join —
    // un-checkpointed, each consumer replays the batch's scan + the
    // fingerprint shuffle (measured +1.1 s on the benched 1% probe)
    val canon = batchCanonical(batch, textCol, idCol, cfg).localCheckpoint(true)
    val touched = canon
      .select(pmod(h60(col("__fp")), lit(partitionMod.max(1).toLong)).as("fmod"))
      .distinct().collect().map(_.getLong(0)).toSeq
    if (touched.isEmpty) canon // no canonical rows ⇒ nothing to anti-join
    else {
      val fp = fpFor(touched)
      // A provably-empty fingerprint store — a fresh root, where [[readFp]]
      // returns an empty LOCAL relation because the store dir does not
      // exist yet — makes the anti-join an identity (left_anti against an
      // empty right keeps every left row and only left columns). Skip it
      // AND its eager checkpoint, which would otherwise copy the
      // corpus-sized canonical set (text included) a SECOND time for
      // nothing: this is the one-shot build path (curate_store_build /
      // pipeline_rebuild ingest epoch 0 against an empty store). Plan-level
      // check only — a store that EXISTS is never assumed empty.
      val provablyEmpty = fp.queryExecution.analyzed match {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
          l.data.isEmpty
        case _ => false
      }
      if (provablyEmpty) canon
      else canon
        .join(fp.select(col("fp").as("__fp")), Seq("__fp"), "left_anti")
        .localCheckpoint(true)
    }
  }

  /** Stage-5 loser drop, shared by both entry points: `edges` is any
    * edge list whose connected components equal (stored pair graph ∪
    * this batch's pairs)'s — probe passes merge-log ∪ batch pairs,
    * ingest passes the post-fold log (same components by construction).
    */
  private def dropLosers(exactSurv: DataFrame, pairs: DataFrame,
                         edges: => DataFrame, idCol: String,
                         cfg: Curation.Config): DataFrame = {
    val losers =
      if (cfg.transitive)
        Curation.connectedComponents(edges, "old", "new")
          .filter(col("comp") =!= col("id"))
          .select(col("id").as(idCol))
      else
        // pairwise mode: batch docs only ever appear on the id_b side of
        // a cross pair (monotone ids keep the min(a,b)<max(a,b)
        // orientation pointing at the batch), so the stored pairs can't
        // name a batch loser — the batch-touching pairs suffice
        pairs.select(col("id_b").as(idCol)).distinct()
    exactSurv.drop("__fp").join(losers, Seq(idCol), "left_anti")
  }

  /** The shared probe pipeline over explicit store frames — the read
    * path ([[curateProbe]]) and the in-memory twin funnel here;
    * [[processBatch]] composes the same [[stagePrefix]]/[[dropLosers]]
    * halves around its store writes. `fpFor(touchedFmods)` supplies the
    * fingerprint index (pruned or not); `storedEdges` is any edge list
    * whose connected components equal the stored pair graph's — the
    * merge log (disk path) or the stored pairs themselves (twin).
    */
  private def curateCore(
      fpFor: Seq[Long] => DataFrame,
      lshStore: DataFrame, corpus: DataFrame, storedEdges: DataFrame,
      batch: DataFrame, textCol: String, idCol: String,
      cfg: Curation.Config, partitionMod: Int): DataFrame = {
    val exactSurv = stagePrefix(fpFor, batch, textCol, idCol, cfg, partitionMod)
    // checkpointed: connectedComponents sizes its driver-vs-distributed
    // switch with a count and then consumes the edges again — without
    // this the whole LSH probe replays per consumption
    val pairs = Dedup.minhashPairsIncremental(
        lshStore, corpus, exactSurv, textCol, idCol,
        cfg.minhashK, cfg.minhashBands, cfg.minJaccPct, cfg.maxBucket,
        partitionMod)
      .localCheckpoint(true)
    dropLosers(exactSurv, pairs,
      storedEdges.unionByName(pairs.select(
        col("id_a").cast("long").as("old"),
        col("id_b").cast("long").as("new"))),
      idCol, cfg)
  }

  /** Curate one incoming batch against the on-disk store WITHOUT
    * modifying it — the recurring read path ([[processBatch]] is the
    * write path and returns the same view). Parameters must match the
    * store's build parameters (the [[DocIndexIngest.Config]] contract) —
    * ENFORCED against the store's persisted config when present
    * (drifted band/prefix/partition parameters silently miss pairs).
    * Probes never heal (a read path must not race a live writer's swap);
    * after a crashed compaction with the loop still down, run
    * [[PipelineIngest.healStores]] (or restart the loop) before probing,
    * or a mid-swap store silently misses its folded rows.
    */
  def curateProbe(spark: SparkSession, root: String, batch: DataFrame,
                  textCol: String, idCol: String,
                  cfg: Curation.Config = Curation.Config(),
                  partitionMod: Int = 64,
                  excludeBatch: Long = Long.MinValue): DataFrame = {
    val idxCfg = DocIndexIngest.Config(cfg.minhashK, cfg.minhashBands,
      cfg.minJaccPct, cfg.maxBucket, partitionMod)
    DocIndexIngest.storedConfig(spark, root).foreach(st =>
      require(st == idxCfg,
        s"store at $root was built with $st but this probe derives " +
          s"$idxCfg from its Curation.Config - pass the store's own parameters"))
    curateCore(
      fmods => readFp(spark, root, excludeBatch, fmods),
      DocIndexIngest.readLsh(spark, root, idCol, excludeBatch),
      DocIndexIngest.readCorpus(spark, root, batch, excludeBatch),
      GraphIngest.readRemap(spark, root, excludeBatch),
      batch, textCol, idCol, cfg, partitionMod)
  }

  /** In-memory twin of [[curateProbe]]: derives the stores a full ingest
    * of `corpus` would hold (canonical survivors, their band buckets,
    * their verified pairs) inside the query — the declared
    * `q_curate_incr` form, and the spec's second witness that the disk
    * probe reads what ingest wrote. Store-derivation here is O(corpus)
    * by nature; the disk probe is the amortized path.
    *
    * The band buckets below are DELIBERATELY derived twice (`lsh`, and
    * again inside `minhashPairs`): sharing the subtree through an eager
    * `localCheckpoint` of the buckets measured SLOWER (7.8 → 8.8 s
    * isolated at sf0.1) — the extra materialization job outweighs
    * recomputing the signature pipeline over the already-checkpointed
    * survivor set, whose scan is the cheap part.
    */
  def curateProbeWithCorpus(corpus: DataFrame, batch: DataFrame,
                            textCol: String, idCol: String,
                            cfg: Curation.Config = Curation.Config()): DataFrame = {
    // what ingest holds after corpus is ingested (any batch cut): the
    // lang/quality survivors, exact-deduped — batch-cut-invariant under
    // the monotone-id contract
    val storedCanon = Dedup.fingerprintCanonical(
        Curation.curateCandidates(corpus, textCol, idCol, cfg),
        textCol, idCol)
      .localCheckpoint(true)
    val fpStore = storedCanon
      .select(Dedup.fpExpr(textCol).as("fp"), col(idCol).cast("long").as("id"))
    val lsh = Dedup.bandBuckets(storedCanon, textCol, idCol,
      cfg.minhashK, cfg.minhashBands)
    // stored pairs stand in for the merge log: identical components
    val edges = Dedup.minhashPairs(storedCanon, textCol, idCol,
        cfg.minhashK, cfg.minhashBands, cfg.minJaccPct, cfg.maxBucket)
      .select(col("id_a").cast("long").as("old"),
        col("id_b").cast("long").as("new"))
    curateCore(_ => fpStore, lsh, storedCanon, edges,
      batch, textCol, idCol, cfg, partitionMod = 0)
  }

  /** The stored max id (the monotonicity gate's floor), or None for a
    * root with no ingested batches yet. Shared by the gate and
    * [[reidBatch]] so the two can never disagree on the floor.
    * `excludeEpoch`: drop that epoch's own meta row from the floor (the
    * same self-exclusion [[requireMonotone]] applies) — what makes
    * [[reidBatch]] replay-deterministic inside a replayable trigger.
    */
  def storedMaxId(spark: SparkSession, root: String,
                  excludeEpoch: Long = Long.MinValue): Option[Long] =
    if (!exists(spark, metaDir(root))) None
    else {
      val r = StoreCompaction.readStore(spark, metaDir(root))
        .filter(col("batch_id") =!= excludeEpoch)
        .agg(max(col("max_id"))).head()
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    }

  /** The EXECUTABLE backfill escape hatch the monotonicity gate's error
    * points at: assign FRESH monotone ids to a late batch (a vendor
    * drop, a re-crawl slice) whose original ids sit at or below the
    * stored max, carrying the original id as `orig_id` provenance. New
    * ids are `storedMax + rank`, ranked by `(md5(orig id), orig id)` —
    * deterministic (a retried re-id assigns identical ids, so the
    * batch-keyed replay contract holds through it) and input-order-free.
    * The re-id'd batch then curates EXACTLY like a fresh-id batch —
    * "first ingested wins" is the incremental contract's semantics, and
    * a late batch is by definition ingested after everything stored —
    * while `orig_id` rides every downstream surface keyed by row
    * (curated views, the product stream), so joins back to the source's
    * own keying stay possible. The INDEX stores never persist it
    * (processBatch strips it before the store writes — persisting a
    * batch-dependent extra column would fork the corpus store's schema
    * across epochs); the store reads null-fill it for alignment.
    *
    * The rank is a single-partition window over the BATCH (not the
    * corpus) — trigger-batch-sized by contract; a corpus-sized backfill
    * is [[PipelineIngest.rebuild]]'s job, not a re-id.
    *
    * Duplicate original ids are REJECTED: two rows sharing an id would
    * silently become two distinct documents under fresh ids, and a
    * duplicated source id is an upstream bug this helper must surface,
    * not launder.
    *
    * `excludeEpoch` — REQUIRED for a re-id inside a replayable trigger
    * (pass the trigger's own epochId): a replayed trigger whose meta row
    * already committed would otherwise see ITS OWN re-id'd max as the
    * stored floor and assign SHIFTED fresh ids on the retry, breaking
    * the "a retried re-id assigns identical ids" contract above. With
    * the trigger's epoch excluded, the floor is the pre-epoch max both
    * times — the exact self-exclusion [[requireMonotone]] already
    * applies to the gate. Outside a replayable trigger (a one-shot
    * backfill driver), the default excludes nothing.
    */
  def reidBatch(spark: SparkSession, root: String, batch: DataFrame,
                idCol: String, excludeEpoch: Long = Long.MinValue): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dup = batch.groupBy(col(idCol)).count().filter(col("count") > 1)
      .limit(1).collect()
    require(dup.isEmpty,
      s"reidBatch: duplicate original id ${dup.head.get(0)} in the batch — " +
        "re-iding would mint two documents from one source id; dedup the " +
        "source first")
    val base = storedMaxId(spark, root, excludeEpoch).getOrElse(0L)
    batch
      .withColumn("orig_id", col(idCol))
      .withColumn(idCol,
        lit(base) + row_number().over(
          Window.orderBy(md5(col(idCol).cast("string")), col(idCol)))
          .cast("long"))
  }

  /** The id-monotonicity gate: raises unless every batch id exceeds the
    * stored max (see the object doc for why the contract needs it), then
    * records this batch's `(min_id, max_id)` row. Replay-safe: the check
    * excludes this batch's own meta row.
    */
  private def requireMonotone(spark: SparkSession, root: String,
                              batch: DataFrame, idCol: String,
                              epochId: Long): Unit = {
    val mm = batch.agg(min(col(idCol)).cast("long"), max(col(idCol)).cast("long")).head()
    val (bMin, bMax) = (mm.getLong(0), mm.getLong(1))
    // ONE floor computation with reidBatch ([[storedMaxId]] with the
    // same self-exclusion) — the shared helper its doc promises, so the
    // gate and the re-id can never disagree on the floor
    storedMaxId(spark, root, excludeEpoch = epochId).foreach { prevMax =>
      require(prevMax < bMin,
          s"id-monotonicity violated: batch min id $bMin ≤ stored max id " +
            s"$prevMax — the incremental contract (probe ≡ batch " +
            "curate restricted to the batch) only holds for ingest-ordered " +
            "ids; re-id the late batch with CurateIngest.reidBatch (fresh " +
            "monotone ids, original id kept as orig_id) or rebuild the " +
            "full corpus at a fresh root (PipelineIngest.rebuild)")
    }
    import spark.implicits._
    overwriteParts(
      Seq((bMin, bMax)).toDF("min_id", "max_id")
        .withColumn("batch_id", lit(epochId)),
      Seq("batch_id"), metaDir(root))
  }

  /** Ingest one batch: curate it against the store, fold its survivors
    * in (corpus, LSH, prefix, pairs, graph via [[DocIndexIngest
    * .processBatch]], fingerprints here), and return the batch's curated
    * view — the same rows [[curateProbe]] would have returned against
    * the pre-batch store. Empty batches return empty and write nothing
    * but their meta row is skipped too (no ids to gate on).
    */
  def processBatch(spark: SparkSession, batch: DataFrame, root: String,
                   textCol: String, idCol: String, epochId: Long,
                   cfg: Curation.Config = Curation.Config(),
                   partitionMod: Int = 64): DataFrame = {
    Seq(fpDir(root), metaDir(root)).foreach(StoreCompaction.heal(spark, _))
    // gated: the unified loop hands in an already-checkpointed batch
    // (column-pruned) — re-materializing it is one more full-copy job
    // per trigger for nothing ([[IngestStages.materialize]])
    val b = IngestStages.materialize(batch)
    val emptyView = b
      .withColumn("pred_lang", lit("")).withColumn("score", lit(0L))
      .limit(0)
    if (b.isEmpty) return emptyView
    // the monotonicity gate (one min/max agg + the meta write) and the
    // stage-1–3 prefix are independent reads of the checkpointed batch —
    // CONCURRENT submission overlaps the gate's fixed per-job overhead
    // with the canonical pass ([[IngestStages]]'s per-trigger argument).
    // Write-safety is unchanged: stagePrefix writes nothing, every store
    // write below runs only after inParallel settles, and a gate failure
    // still propagates before any of them — the only cost of a violated
    // batch is one wasted (uncommitted) canonical pass.
    var exactSurvV: DataFrame = null
    IngestStages.inParallel(spark,
      "curate:monotone_gate" -> (() =>
        requireMonotone(spark, root, b, idCol, epochId)),
      "curate:stage_prefix" -> (() => {
        exactSurvV = stagePrefix(
          fmods => readFp(spark, root, epochId, fmods),
          b, textCol, idCol, cfg, partitionMod)
      }))
    val exactSurv = exactSurvV

    // near-dup probe + all index folds over the stage-1–3 survivors
    // (returns the batch-touching verified pairs, already folded into
    // the graph stores), CONCURRENT with the fingerprint append — both
    // read the checkpointed survivor set and write disjoint stores
    // ([[IngestStages]]'s per-trigger-overhead argument). The fp append
    // writes only fingerprints NOT already stored (the stagePrefix
    // anti-join guarantees it), so the store stays one-row-per-fp.
    val idxCfg = DocIndexIngest.Config(cfg.minhashK, cfg.minhashBands,
      cfg.minJaccPct, cfg.maxBucket, partitionMod)
    var pairs: DataFrame = null
    IngestStages.inParallel(spark,
      "curate:doc_index" -> (() => {
        // orig_id ([[reidBatch]]'s provenance) rides the VIEW and the
        // product stream, never the index stores — persisting it would
        // fork the corpus store's schema across epochs (mixed-schema
        // parquet dirs read as whichever file's footer wins)
        pairs = DocIndexIngest.processBatch(spark,
          exactSurv.drop("__fp", "pred_lang", "score", "orig_id"),
          root, textCol, idCol, epochId, idxCfg)
      }),
      "curate:fp_append" -> (() => overwriteParts(
        exactSurv.select(col("__fp").as("fp"), col(idCol).cast("long").as("id"))
          .withColumn("fmod", pmod(h60(col("fp")), lit(partitionMod.max(1).toLong)))
          .withColumn("batch_id", lit(epochId)),
        Seq("batch_id", "fmod"), fpDir(root))))

    // the curated view: labels over the post-fold merge log ≡ pre-fold
    // log ∪ this batch's pairs (what curateProbe computes) — structural
    // probe ≡ ingest-view equality
    dropLosers(exactSurv, pairs, GraphIngest.readRemap(spark, root), idCol, cfg)
  }

  /** Fold committed batches of the curation-only stores into their
    * `batch_id=-1` bases ([[StoreCompaction]]; [[DocIndexIngest
    * .compactStores]] covers the shared corpus/index/graph stores —
    * call both, same `upToBatch` discipline).
    */
  def compactStores(spark: SparkSession, root: String, upToBatch: Long,
                    fromExclusive: Long = Long.MinValue): Unit = {
    StoreCompaction.compact(spark, fpDir(root), Seq("fmod"), upToBatch, fromExclusive = fromExclusive)
    StoreCompaction.compact(spark, metaDir(root), Seq.empty, upToBatch, fromExclusive = fromExclusive)
  }

  /** Streaming entry point — the [[DocIndexIngest.run]] twin for the
    * full curation loop: file-discovered micro-batches are curated
    * against the store-so-far and folded in ([[processBatch]]), with
    * checkpointed exactly-once per epoch on top of the batch-keyed
    * overwrites. `outDir`, when set, persists each batch's curated view
    * (survivors + `pred_lang`/`score`) partitioned by `batch_id` under
    * the same dynamic-overwrite idempotence — the queryable product
    * stream, the role `pairs/` plays for [[DocIndexIngest]].
    */
  def run(spark: SparkSession, inDir: String, root: String,
          schema: org.apache.spark.sql.types.StructType,
          textCol: String, idCol: String, checkpointDir: String,
          cfg: Curation.Config = Curation.Config(),
          partitionMod: Int = 64,
          outDir: Option[String] = None,
          maxFilesPerTrigger: Int = 100,
          trigger: org.apache.spark.sql.streaming.Trigger =
            org.apache.spark.sql.streaming.Trigger.AvailableNow(),
          compactEvery: Option[Int] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    compactEvery.foreach(n =>
      require(n > 0, s"compactEvery must be positive, got $n"))
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        // cadence folds BOTH store groups this loop maintains (the doc
        // index/graph stores written via DocIndexIngest.processBatch,
        // and the fp/meta curation stores) PLUS the curated outDir —
        // its semantic batch_id survives folding as the src_batch stamp
        // ([[ProductStore]]), so the product's partition count stays
        // bounded too. A refused product fold (pre-stamp/mixed-schema
        // epochs) warns and skips rather than killing the stream.
        StoreCompaction.cadence(epochId, compactEvery) { upTo =>
          val idxCfg = DocIndexIngest.Config(cfg.minhashK, cfg.minhashBands,
            cfg.minJaccPct, cfg.maxBucket, partitionMod)
          DocIndexIngest.compactStores(spark, root, upTo, idxCfg,
            fromExclusive = -1L)
          compactStores(spark, root, upTo, fromExclusive = -1L)
          outDir.foreach { d =>
            try ProductStore.compactProduct(spark, d, upTo, fromExclusive = -1L)
            catch { case e: IllegalArgumentException =>
              System.err.println(s"[curate] product fold skipped: ${e.getMessage}")
            }
          }
        }
        val view = processBatch(spark, batch, root, textCol, idCol,
          epochId, cfg, partitionMod)
        // provenance-stamped, write-bracketed product write
        // ([[ProductStore]]) — external readers get torn-free snapshots
        // and the product stays foldable without losing its semantic
        // batch_id
        outDir.foreach(d => ProductStore.writeEpoch(spark, view, d, epochId))
        ()
      }
      .start()
  }
}
