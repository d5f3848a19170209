package graft.operators

import org.apache.spark.sql.DataFrame
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
  * (the retry/resume property every stage's own scaladoc carries).
  *
  * Returns the [[Report]] funnel — the survivorship accounting an
  * export job must emit to be operable ([[Curation.filterFunnel]]'s
  * role, here across the composed stages). Each stage is eagerly
  * materialized (`localCheckpoint`) before its count so the report costs
  * cached-block reads, not stage replays — [[Curation.curate]]'s own
  * internal discipline; a cluster-scale run would swap the checkpoints
  * for store writes (same note as curate's).
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

  def export(docs: DataFrame, textCol: String, idCol: String,
             outDir: String, nShards: Int,
             curation: Curation.Config = Curation.Config(),
             evalSet: Option[DataFrame] = None,
             mixture: Option[Mixture] = None,
             chunk: Option[Chunk] = None): Report = {
    val nInput = docs.count()
    // 1. curate (pred_lang/score ride along; dropped at the write)
    exportCurated(
      Curation.curate(docs, textCol, idCol, curation).localCheckpoint(true),
      textCol, idCol, outDir, nShards, evalSet, mixture, chunk)
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
                    chunk: Option[Chunk] = None): Report = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val nCurated = curated.count()

    // 2. decontaminate: anti-join the contaminated ids out
    val clean = evalSet.fold(curated) { ev =>
      curated.join(
        Curation.decontaminate(curated, ev, textCol, idCol).select(col(idCol)),
        Seq(idCol), "left_anti")
        .localCheckpoint(true)
    }
    val nClean = clean.count()

    // 3. mixture sample (the operator projects ids — semi-join the full
    // rows back so chunking/writing keep the text)
    val sampled = mixture.fold(clean) { m =>
      clean.join(
        Sampling.mixtureByTokenBudget(clean, textCol, idCol, m.sourceCol,
          m.permilleBySource, m.totalBudget, m.defaultPermille)
          .select(col(idCol)),
        Seq(idCol), "left_semi")
        .localCheckpoint(true)
    }
    val nSampled = sampled.count()

    // 4. chunk (or pass whole docs through under the same row schema)
    val rows = chunk.fold(
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
    }.localCheckpoint(true)
    val totals = rows.agg(count(lit(1)), coalesce(sum(col("n_tok")), lit(0L)))
      .head()

    // 5. deterministic shard layout, resumable at any (shard, pos)
    graft.sources.Sinks.writeTrainingShards(rows, "sample_id", nShards, outDir)

    Report(nCurated, nCurated, nClean, nSampled,
      totals.getLong(0), totals.getLong(1), nShards)
  }
}
