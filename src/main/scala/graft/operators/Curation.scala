package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition the [NS] operators exist
  * for: the standard pre-training data pipeline
  * (language filter → quality filter → exact dedup → near dedup), as one
  * declarative DataFrame program.
  *
  * Scale shape per stage (nothing here breaks at 100 TB):
  *  1. language/quality scoring — narrow per-row maps, no shuffle;
  *  2. exact dedup — one hash-partitioned aggregation on a 128-bit
  *     fingerprint (16 bytes/doc cross the wire, not documents);
  *  3. near dedup — MinHash+LSH candidate generation + row-join Jaccard
  *     verify ([[Dedup.minhashPairs]]); only (band, bucket, id) tuples and
  *     candidate shingle rows shuffle;
  *  4. the final anti-join removes every non-canonical near-duplicate
  *     (keep = smallest id per pair component, computed without collecting
  *     anything to the driver).
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
    // 1. language ID + filter
    val lang = TextAnalysis.languageId(docs, textCol, idCol)
      .select(col(idCol), col("pred_lang"))
      .filter(col("pred_lang").isInCollection(cfg.langs))
    // 2. quality score + filter
    val quality = TextAnalysis.qualityScore(docs, textCol, idCol)
      .select(col(idCol), col("score"))
      .filter(col("score") >= cfg.minQualityScore)
    val candidates = docs.join(lang, Seq(idCol)).join(quality, Seq(idCol))

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
