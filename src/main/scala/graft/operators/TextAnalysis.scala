package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns._

/** Text analysis for training-data curation ([NS], SURVEY §2.10 N3):
  * language ID, quality scoring, token counting, token frequency.
  *
  * All per-document metrics are narrow (no shuffle at all — the 100 TB case
  * is a pure map over the corpus); only the corpus-level rollups
  * ([[tokenCountsByKey]], [[tokenFrequencies]]) shuffle, and those are
  * partial-aggregated map-side first.
  *
  * Determinism: every emitted ratio is exact integer math (`DIV`,
  * `floor(x*100)`) — see [[graft.functions.TextFns]] portability notes.
  */
object TextAnalysis {

  /** Function-word marker sets for the n-gram-free language-ID heuristic.
    * Real corpora would use char-n-gram profiles; marker words keep the
    * operator deterministic and oracle-expressible.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "es" -> Seq("el", "la", "los", "de", "y", "que", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "fr" -> Seq("le", "les", "et", "est", "que", "une"))

  /** One row per token — explode of a plain `split` (codegen'd; the
    * empty-token filter runs on rows, not inside an interpreted HOF lambda).
    */
  def tokenRows(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol), explode(split(lower(col(textCol)), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")

  /** Per-doc whitespace-token stats: counts only (exact, portable).
    * ONE scan + ONE hash aggregation: per-doc scalars (chars, subtoken
    * count) ride along the exploded token rows and are recovered with
    * `max`; empty/whitespace-only docs still emit their row because `split`
    * yields at least [""] and empties are discounted inside the aggregates,
    * never dropped by a row filter.
    */
  def textStats(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol),
      // regexp_count (no match-array materialization) — same value as
      // the oracle's len(regexp_extract_all(...))
      expr(s"cast(regexp_count(lower($textCol), '[a-z]+|[0-9]|[^a-z0-9\\\\s]') as bigint)")
        .as("sub"),
      length(col(textCol)).cast("long").as("chars"),
      explode(split(lower(col(textCol)), "\\s+")).as("tok"))
      .groupBy(col(idCol)).agg(
        count(when(col("tok") =!= "", 1)).as("n_tokens"),
        count_distinct(when(col("tok") =!= "", col("tok"))).as("n_uniq"),
        max(col("sub")).as("n_subtokens"),
        max(col("chars")).as("n_chars"),
        sum(when(col("tok") =!= "", length(col("tok"))).otherwise(0)).as("sum_len"))
      .select(col(idCol), col("n_tokens"), col("n_uniq"), col("n_subtokens"), col("n_chars"),
        expr("(100 * sum_len) DIV greatest(n_tokens, 1)").as("avg_tok_len_x100"))

  /** Language ID: argmax of marker-word scores with a deterministic
    * priority-order tiebreak; 'und' when no marker hits at all.
    */
  /** Appends `s_<lang>` scores and `pred_lang` to the input (all other
    * columns pass through, so pipelines compose without a re-join).
    */
  def languageId(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val scored = docs.select(
      (col("*") +: langMarkers.map { case (l, m) => markerScore(toks, m).as(s"s_$l") }): _*)
    val best = langMarkers.map(l => col(s"s_${l._1}")).reduce((a, b) => greatest(a, b))
    val pred = langMarkers.foldRight(lit("und")) { case ((l, _), els) =>
      when(col(s"s_$l") === best && best > 0, l).otherwise(els)
    }
    scored.withColumn("pred_lang", pred)
  }

  /** Quality score in integer points (0–1000):
    *   4·min(n_tokens,100)        — length credit (≤400)
    *   (300·n_uniq) DIV n_tokens  — lexical diversity (≤300)
    *   300 − (300·n_stop) DIV n_tokens — stopword-density penalty (≤300)
    */
  def qualityScore(docs: DataFrame, textCol: String, idCol: String,
                   stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")): DataFrame = {
    val toks = tokens(col(textCol))
    docs.select(
      col("*"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_uniq"),
      markerScore(toks, stopwords).as("n_stop"))
      .withColumn("score",
        least(col("n_tokens"), lit(100L)) * 4
          + expr("(300 * n_uniq) DIV greatest(n_tokens, 1)")
          + lit(300L) - expr("(300 * n_stop) DIV greatest(n_tokens, 1)"))
  }

  /** Corpus token accounting per key (lang/source): documents, whitespace
    * tokens, regex subword tokens. Partial+final hash agg — one shuffle of
    * tiny per-key partials.
    */
  def tokenCountsByKey(docs: DataFrame, textCol: String, keyCol: String): DataFrame =
    docs.select(col(keyCol),
      // ws-token count HOF-free: \s+ splitting never yields interior
      // empties, so trim + split + empty-string guard ≡ tokens().size
      when(trim(lower(col(textCol))) === "", 0)
        .otherwise(size(split(trim(lower(col(textCol))), "\\s+"))).cast("long").as("t"),
      expr(s"cast(regexp_count(lower($textCol), '[a-z]+|[0-9]|[^a-z0-9\\\\s]') as bigint)").as("st"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("n_tokens"), sum(col("st")).as("n_subtokens"))

  /** Token frequency table: explode → hash-aggregate. The explode is the
    * UDTF/Generator path (SURVEY §2.10 N3); Spark partial-aggregates each
    * partition's counts before the shuffle, so the wire carries the vocab,
    * not the corpus.
    */
  def tokenFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
}
