package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition the [NS] operators exist
  * for: the standard pre-training data pipeline
  * (language filter → quality filter → exact dedup → near dedup), as one
  * declarative DataFrame program.
  *
  * Scale shape per stage (nothing here breaks at 100 TB):
  *  1. language + quality scoring — ONE narrow pass appending columns to
  *     the corpus scan (no join, no shuffle);
  *  2. exact dedup — canonical = min id per 128-bit normalized-text
  *     fingerprint, one shuffle of the surviving rows keyed by fingerprint
  *     (at cluster scale, a corpus laid out partitioned-by-fingerprint
  *     makes this shuffle-free);
  *  3. near dedup — MinHash+LSH candidate generation + row-join Jaccard
  *     verify ([[Dedup.minhashPairs]]); only (band, bucket, id) tuples and
  *     candidate shingle rows shuffle;
  *  4. the final anti-join drops the larger id of every VERIFIED pair.
  *     Note this is pairwise, not transitive: a connected component
  *     {A<B<C} with verified pairs (A,B),(B,C) but not (A,C) keeps A and
  *     C. The stricter one-canonical-per-component policy needs a
  *     connected-components pass (iterative min-id propagation) — a
  *     deliberate non-goal here.
  */
object Curation {

  final case class Config(
      langs: Set[String] = Set("en"),
      minQualityScore: Long = 500L,
      minJaccPct: Int = 80,
      minhashK: Int = 16,
      minhashBands: Int = 4)

  /** Returns the curated corpus: one row per surviving doc with its
    * language prediction and quality score attached.
    */
  def curate(docs: DataFrame, textCol: String, idCol: String,
             cfg: Config = Config()): DataFrame = {
    // 1.+2. one narrow pass: languageId and qualityScore both append their
    // columns to the input, so scoring+filtering is a single scan, no join
    val keepCols = docs.columns.map(col).toSeq :+ col("pred_lang") :+ col("score")
    val candidates =
      TextAnalysis.qualityScore(TextAnalysis.languageId(docs, textCol, idCol), textCol, idCol)
        .filter(col("pred_lang").isInCollection(cfg.langs) &&
          col("score") >= cfg.minQualityScore)
        .select(keepCols: _*)

    // 3. exact dedup on the normalized fingerprint (canonical = min id)
    val exactKept = Dedup.fingerprint(candidates, textCol, idCol)
      .filter(col("is_canonical"))
      .drop("fp", "is_canonical")

    // 4. near dedup: drop the larger id of every verified near-dup pair
    val nearDupLosers = Dedup.minhashPairs(exactKept, textCol, idCol,
        cfg.minhashK, cfg.minhashBands, cfg.minJaccPct)
      .select(col("id_b").as(idCol)).distinct()
    exactKept.join(nearDupLosers, Seq(idCol), "left_anti")
  }
}
