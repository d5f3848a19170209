package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFns.tokenCount

/** END-TO-END dataset-construction capstone — the construction-side
  * analog of [[Curation.curate]] (the N7 curation capstone): ONE call
  * takes a raw corpus to resumable on-disk training shards through the
  * stages every pretraining export runs, each of which is individually
  * oracle-checked elsewhere:
  *
  *   1. curation ([[Curation.curate]] — language → quality → exact dedup
  *      → near dedup),
  *   2. eval-set decontamination ([[Curation.decontaminate]], optional —
  *      contaminated docs anti-joined out),
  *   3. mixture sampling to a token budget
  *      ([[Sampling.mixtureByTokenBudget]], optional — per-source
  *      shares, hash-order greedy),
  *   4. context-window chunking ([[Sampling.chunkDocs]], optional —
  *      fixed-size token chunks with stride; the written row id becomes
  *      `<doc_id>#<chunk_id>` so the shard shuffle keys on unique rows),
  *   5. the deterministic shuffle-shard layout
  *      ([[graft.sources.Sinks.writeTrainingShards]] — md5 global order,
  *      one directory per shard, rows in resumable `pos` order).
  *
  * Everything downstream of the raw scan is hash-deterministic, so the
  * same corpus and config always produce byte-stable shard membership —
  * re-running an export never reshuffles what a previous run shipped
  * (the retry/resume property every stage's own scaladoc carries). The
  * composed pre-write frame is itself an oracle-checked declared query
  * (`q_export` — [[exportRows]]), not just spec-pinned to its stages.
  *
  * Returns the [[Report]] funnel — the survivorship accounting an
  * export job must emit to be operable ([[Curation.filterFunnel]]'s
  * role, here across the composed stages).
  *
  * STAGING: by default each stage is eagerly materialized
  * (`localCheckpoint`) before its count so the report costs cached-block
  * reads, not stage replays — fine at test scale, but block-manager
  * checkpoints die with the driver, and the 100 TB export is exactly the
  * job that dies at hour 9. Pass `stageDir` to materialize each stage as
  * a parquet write with a `_DONE` marker instead: a killed export re-run
  * with the same `stageDir` SKIPS every completed stage (reads its
  * staged parquet; no recompute, no executor-memory pressure from
  * corpus-sized cached blocks) and resumes at the first incomplete one —
  * and stage determinism makes the resumed product byte-identical to a
  * one-shot run (spec-pinned). A `stageDir` belongs to ONE (corpus,
  * config) export: the CONFIG half is ENFORCED — the first staged run
  * records a fingerprint of the export shape (columns, shard count,
  * eval-set presence, mixture/chunk/curation params) and any later run
  * with a different shape FAILS LOUDLY instead of resuming stale stages
  * — while the CORPUS half stays a documented contract (hashing a
  * 100 TB input to guard a resume costs more than the resume saves):
  * clear the stageDir (or pick a fresh one) when the input changes.
  *
  * Written shard schema: `(sample_id, <idCol>, chunk_id, n_tok, text,
  * shard, pos)` — provenance is the source doc id; doc-level metadata
  * (pred_lang, score, source) stays with the curated corpus the caller
  * already has, keyed by that id.
  */
object TrainingExport {

  /** Per-source mixture parameters ([[Sampling.mixtureByTokenBudget]]). */
  final case class Mixture(sourceCol: String,
                           permilleBySource: Map[String, Int],
                           totalBudget: Long,
                           defaultPermille: Int = 0)

  /** Chunking parameters ([[Sampling.chunkDocs]]). */
  final case class Chunk(chunkTokens: Int, stride: Int)

  /** The export funnel: docs in → curated → decontaminated → sampled →
    * rows/tokens actually written across `n_shards` directories.
    */
  final case class Report(n_input: Long, n_curated: Long,
                          n_decontaminated: Long, n_sampled: Long,
                          n_rows_written: Long, n_tokens_written: Long,
                          n_shards: Int)

  /** Stages 2–4 composed over an already-curated corpus; `mat(name, f)`
    * decides how each stage's output is materialized (localCheckpoint /
    * staged parquet / not at all) — the ONE composition [[exportRows]],
    * [[exportCurated]] and the resumable path all share. The stage
    * frame is passed as a THUNK: a resumed staged export must be able
    * to skip a completed stage without even CONSTRUCTING its plan
    * (some upstream builders — [[Curation.curate]] — run eager jobs at
    * call time; a strict argument would re-pay them just to discard
    * the result against the `_DONE` marker).
    */
  private def stageFrames(curated: DataFrame, textCol: String, idCol: String,
                          evalSet: Option[DataFrame], mixture: Option[Mixture],
                          chunk: Option[Chunk],
                          mat: (String, () => DataFrame) => DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    // 2. decontaminate: anti-join the contaminated ids out
    val clean = evalSet.fold(curated) { ev =>
      mat("clean", () => curated.join(
        Curation.decontaminate(curated, ev, textCol, idCol).select(col(idCol)),
        Seq(idCol), "left_anti"))
    }
    // 3. mixture sample (the operator projects ids — semi-join the full
    // rows back so chunking/writing keep the text)
    val sampled = mixture.fold(clean) { m =>
      mat("sampled", () => clean.join(
        Sampling.mixtureByTokenBudget(clean, textCol, idCol, m.sourceCol,
          m.permilleBySource, m.totalBudget, m.defaultPermille)
          .select(col(idCol)),
        Seq(idCol), "left_semi"))
    }
    // 4. chunk (or pass whole docs through under the same row schema)
    val rows = mat("rows", () => chunk.fold(
      sampled.select(
        col(idCol).cast("string").as("sample_id"),
        col(idCol), lit(1L).as("chunk_id"),
        tokenCount(col(textCol)).as("n_tok"),
        col(textCol).as("text"))) { c =>
      Sampling.chunkDocs(sampled, textCol, idCol, c.chunkTokens, c.stride)
        .select(
          concat(col(idCol).cast("string"), lit("#"), col("chunk_id"))
            .as("sample_id"),
          col(idCol), col("chunk_id"), col("n_tok"),
          col("chunk_text").as("text"))
    })
    (clean, sampled, rows)
  }

  /** The PRE-WRITE frame of an export over an already-curated corpus:
    * stages 2–4 plus each row's deterministic `(shard, pos)` assignment
    * — exactly what [[graft.sources.Sinks.writeTrainingShards]] lays on
    * disk, as a queryable DataFrame. This is the capstone's DECLARED
    * QUERY surface (`q_export` composes [[Curation.curate]] with this
    * and is oracle-checked end-to-end against a DuckDB CTE pipeline);
    * everything is hash-deterministic, so the frame IS the written
    * product minus the file layout.
    */
  def exportRows(curated: DataFrame, textCol: String, idCol: String,
                 nShards: Int,
                 evalSet: Option[DataFrame] = None,
                 mixture: Option[Mixture] = None,
                 chunk: Option[Chunk] = None): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    // Stages materialize via LAZY localCheckpoint (r18; the r17 round
    // tried EAGER checkpoints and reverted them — isolated-faster but
    // in-suite unstable, because each call paid three extra full-copy
    // materialization JOBS that churned the warm session's block
    // manager). The lazy form keeps the one property that matters —
    // `clean`/`sampled`/`rows` are each COMPUTED ONCE and every second
    // consumer reads blocks instead of replaying the decontam/mixture/
    // chunk subtrees (the replay plan carried 87 Exchanges / 28 RDD
    // scans; see plans/r18/q_export_before.txt) — while materialization
    // happens INSIDE the consuming job's own execution, so there are no
    // extra jobs and nothing is computed that the query does not
    // consume. Blocks are ContextCleaner-reclaimed when the frame is
    // GC'd, exactly like every other checkpoint here; nothing registers
    // in the CacheManager, so repeated calls can never read a previous
    // call's blocks.
    val (_, _, rows) = stageFrames(curated, textCol, idCol, evalSet, mixture,
      chunk, (_, f) => f().localCheckpoint(false))
    rows.join(Sampling.shuffleShard(rows, "sample_id", nShards), "sample_id")
  }

  def export(docs: DataFrame, textCol: String, idCol: String,
             outDir: String, nShards: Int,
             curation: Curation.Config = Curation.Config(),
             evalSet: Option[DataFrame] = None,
             mixture: Option[Mixture] = None,
             chunk: Option[Chunk] = None,
             stageDir: Option[String] = None): Report = {
    // fingerprint FIRST — before the curated stage can resume against a
    // stageDir that belongs to a different config. Checked ONCE here
    // (exportStages below does not re-check): the eval identity is a
    // Spark aggregate now, and paying it twice per call — once here,
    // once in a delegated exportCurated — would double a scan that can
    // be the whole upstream when the eval set derives from the corpus.
    stageDir.foreach(writeOrCheckFingerprint(docs.sparkSession, _,
      fingerprint(textCol, idCol, nShards, evalSet, mixture, chunk,
        "cfg:" + curation.toString)))
    val nInput = docs.count()
    // 1. curate (pred_lang/score ride along; dropped at the write) —
    // staged like every other stage, and built ONLY if its _DONE marker
    // is absent (Curation.curate runs eager jobs at call time; a
    // resumed export must skip the O(corpus) re-curation entirely, not
    // recompute-and-discard it)
    val curated = materializer(docs.sparkSession, stageDir)(
      "curated", () => Curation.curate(docs, textCol, idCol, curation))
    exportStages(curated, textCol, idCol, outDir, nShards, evalSet,
      mixture, chunk, stageDir)
      .copy(n_input = nInput)
  }

  /** Stages 2–5 over an ALREADY-CURATED corpus — the entry point for the
    * incremental world: [[graft.streaming.CurateIngest.run]] /
    * [[graft.streaming.PipelineIngest.run]] persist each batch's curated
    * survivors under `outDir`, and exporting that product stream must
    * not pay the O(corpus) re-curation [[export]] runs (`spark.read
    * .parquet(curatedOutDir)` IS this function's input). `n_input` in
    * the report equals `n_curated` here — curation happened upstream.
    */
  def exportCurated(curated: DataFrame, textCol: String, idCol: String,
                    outDir: String, nShards: Int,
                    evalSet: Option[DataFrame] = None,
                    mixture: Option[Mixture] = None,
                    chunk: Option[Chunk] = None,
                    stageDir: Option[String] = None,
                    fpCuration: String = "upstream"): Report = {
    stageDir.foreach(writeOrCheckFingerprint(curated.sparkSession, _,
      fingerprint(textCol, idCol, nShards, evalSet, mixture, chunk,
        fpCuration)))
    exportStages(curated, textCol, idCol, outDir, nShards, evalSet,
      mixture, chunk, stageDir)
  }

  /** Stages 2–5 with the fingerprint already checked by the caller —
    * the shared body of [[export]] and [[exportCurated]], split out so
    * each public entry point fingerprints exactly once.
    */
  private def exportStages(curated: DataFrame, textCol: String, idCol: String,
                           outDir: String, nShards: Int,
                           evalSet: Option[DataFrame],
                           mixture: Option[Mixture],
                           chunk: Option[Chunk],
                           stageDir: Option[String]): Report = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val mat = materializer(curated.sparkSession, stageDir)
    // the INPUT frame is not re-staged here: this entry point's contract
    // is an already-durable curated product (a streaming loop's outDir,
    // or [[export]]'s own staged `curated/` — which lands in `stageDir`
    // before this call), and parquet-copying a corpus-sized durable
    // input just to re-read it would double the disk for nothing.
    // Callers holding an EXPENSIVE lazy frame stage it themselves or go
    // through [[export]].
    val nCurated = curated.count()
    val (clean, sampled, rows) = stageFrames(curated, textCol, idCol, evalSet,
      mixture, chunk, mat)
    val nClean = clean.count()
    val nSampled = sampled.count()
    val totals = rows.agg(count(lit(1)), coalesce(sum(col("n_tok")), lit(0L)))
      .head()
    // 5. deterministic shard layout, resumable at any (shard, pos)
    graft.sources.Sinks.writeTrainingShards(rows, "sample_id", nShards, outDir)
    Report(nCurated, nCurated, nClean, nSampled,
      totals.getLong(0), totals.getLong(1), nShards)
  }

  /** Order-free CONTENT identity of the eval set — row count plus a
    * commutative sum-fold of per-row 60-bit text hashes: deterministic
    * under any partitioning or row order, and one small aggregate over a
    * set that is KB–MB by construction (an eval set is a benchmark).
    * This closes the one silent-stale-resume path the presence-only
    * `eval=true` fingerprint left (r16 verdict): a CHANGED eval set
    * under an otherwise-identical config would resume the staged
    * `clean` stage — decontaminated against the OLD set — and ship
    * contaminated shards. Identity is TEXT-only: decontamination
    * matches on text content ([[Curation.decontaminate]] shingles the
    * eval text), so a re-keyed eval set with identical text genuinely
    * may resume; hashing ids too would only refuse valid resumes.
    */
  private def evalIdentity(ev: DataFrame, textCol: String): String = {
    val r = ev.agg(count(lit(1)),
      coalesce(sum(graft.functions.TextFns.h60(col(textCol))), lit(0L))).head()
    s"n=${r.getLong(0)};h=${r.getLong(1)}"
  }

  /** The staged export's CONFIG FINGERPRINT — what makes stage-name-only
    * resume keys safe: a `stageDir` belongs to ONE export shape, and
    * reusing it after the curation/mixture/chunk params, eval-set
    * CONTENT ([[evalIdentity]]), shard count, or column choice changed
    * would silently resume STALE `_DONE` stages and ship wrong training
    * data. The canonical rendering below is deterministic (mixture
    * permilles sorted, eval identity order-free); corpus identity is
    * deliberately out of scope — hashing a 100 TB input to guard a
    * resume would cost more than the resume saves, and a changed corpus
    * under an unchanged config is the one hazard the scaladoc still has
    * to carry (clear the stageDir when the input changes).
    */
  private def fingerprint(textCol: String, idCol: String, nShards: Int,
                          evalSet: Option[DataFrame], mixture: Option[Mixture],
                          chunk: Option[Chunk], curation: String): String = {
    val mix = mixture.fold("none")(m =>
      s"src=${m.sourceCol};budget=${m.totalBudget};default=${m.defaultPermille};" +
        "pm=" + m.permilleBySource.toSeq.sorted
          .map { case (k, v) => s"$k:$v" }.mkString(","))
    val ch = chunk.fold("none")(c => s"${c.chunkTokens}/${c.stride}")
    val ev = evalSet.fold("none")(evalIdentity(_, textCol))
    s"v2|text=$textCol|id=$idCol|shards=$nShards|eval=$ev|" +
      s"mixture=$mix|chunk=$ch|curation=$curation"
  }

  /** First staged run records the fingerprint (`_FINGERPRINT` at the
    * stageDir root, before any stage); every later run REFUSES a
    * mismatch instead of resuming — the [[graft.streaming
    * .TextModelIngest]] writeOrCheckConfig discipline applied to the
    * resume path.
    */
  private def writeOrCheckFingerprint(spark: SparkSession, stageDir: String,
                                      fp: String): Unit = {
    val p = new Path(s"$stageDir/_FINGERPRINT")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) {
      // a stageDir with completed stages but NO fingerprint predates the
      // guard (or lost the file): silently adopting the CURRENT config's
      // fingerprint would resume those stages as if they matched it —
      // the exact laundering this check exists to refuse
      val base = new Path(stageDir)
      val orphaned = f.exists(base) && f.listStatus(base).exists(s =>
        s.isDirectory && f.exists(new Path(s.getPath, "_DONE")))
      if (orphaned)
        sys.error(s"stageDir $stageDir holds completed (_DONE) stages but " +
          "no _FINGERPRINT record - cannot prove they were staged under " +
          "THIS config; clear the stageDir (or, after verifying the " +
          "config matches by hand, write _FINGERPRINT yourself)")
      f.mkdirs(base)
      val out = f.create(p, true)
      out.write(fp.getBytes("UTF-8"))
      out.close()
    } else {
      val in = f.open(p)
      val stored = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                   finally in.close()
      if (stored != fp)
        sys.error(s"stageDir $stageDir was staged under a DIFFERENT export " +
          s"config:\n  stored:  $stored\n  current: $fp\nresuming would " +
          "ship stale stages as if they matched this config - clear the " +
          "stageDir (or pick a fresh one) when the export shape changes")
    }
  }

  /** The per-stage materializer: default = `localCheckpoint` (fast,
    * driver-lifetime); with `stageDir` = staged parquet + `_DONE` marker
    * (durable, resumable — a stage whose marker exists is READ, and its
    * thunk is never even INVOKED, so upstream eager work is skipped
    * too, not recomputed-and-discarded). The marker is written only
    * after the parquet commit, so a kill mid-write leaves no marker and
    * the re-run rewrites the stage (mode overwrite) — at-most-once
    * visibility of half-written stages, exactly the batch-keyed
    * stores' discipline.
    */
  private def materializer(spark: SparkSession, stageDir: Option[String])
      : (String, () => DataFrame) => DataFrame =
    stageDir match {
      // lazy (r18, §2.6): every stage is consumed immediately by its
      // report count, which materializes the blocks in its own job — the
      // eager form paid a separate full-copy job per stage first
      case None => (_, f) => f().localCheckpoint(false)
      case Some(root) => (name, mk) => {
        val dir = s"$root/$name"
        val done = new Path(s"$dir/_DONE")
        val f = done.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!f.exists(done)) {
          mk().write.mode("overwrite").parquet(dir)
          f.create(done, true).close()
        }
        spark.read.parquet(dir)
      }
    }
}
