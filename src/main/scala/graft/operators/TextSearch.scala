package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Lexical relevance search over the corpus — BM25 top-k (Robertson et
  * al., Okapi at TREC-3, 1994), the retrieval operator a training-data /
  * RAG pipeline needs beside the ANN embedding probes: "which documents
  * match these query terms best" where the query is words, not a vector.
  * The reference's search surface is conjunctive field filters
  * (`audit.services.ts:49-96`); ranked relevance is part of the
  * north-star [NS] surface.
  *
  * Scoring is the classic shape — idf(term) · tf·(k1+1)/(tf + k1·(1−b +
  * b·dl/avgdl)) with k1=1.2, b=0.75 — made integer-exact so a DuckDB
  * oracle can replay it bit-for-bit (float `log` idf is not bit-portable;
  * float sums are order-dependent). With k1=6/5 and b=3/4 the tf-norm is
  * rational, so with `avgdl_x1000 = (1000·T) DIV N` (T = corpus tokens,
  * N = corpus docs):
  *
  *   idf_x1000 = (1000·(2·(N−df)+1)) DIV (2·df+1)     — the Robertson
  *     idf ARGUMENT (N−df+0.5)/(df+0.5) scaled ×1000, log dropped: log is
  *     monotone, so per-term ranking is preserved and rare terms still
  *     dominate; what changes vs log-idf is only the relative WEIGHT of
  *     idf extremes, documented as this operator's contract.
  *   tfn_x1000 = (22000·tf·avgdl_x1000) DIV
  *               (10·tf·avgdl_x1000 + 3·avgdl_x1000 + 9000·dl)
  *     — exactly tf·2.2/(tf + 1.2·(0.25 + 0.75·dl/avgdl)) ×1000, floor.
  *   score_x1m = Σ_terms idf_x1000 · tfn_x1000        — integer sum:
  *     order-independent, overflow-safe to N ≈ 4e12 docs (idf_x1000 ≤
  *     2000·N, tfn_x1000 ≤ 2200, ≤ ~100 query terms under Long.Max).
  *
  * Two paths, one scorer:
  *  - [[bm25TopK]] builds the needed postings in-query (one token explode
  *    of one corpus scan, filtered to the query terms BEFORE the tf
  *    aggregation — only query-term rows ever shuffle; df is a window
  *    count over the tf rows, the [[TextAnalysis.tfIdfTopTerms]] trick
  *    that avoids planning the explode twice).
  *  - [[bm25Index]] materializes the full inverted index (term_h 60-bit
  *    hash, tf, dl, df per posting) for a `pmod(term_h, m)`-partitioned
  *    store, and [[bm25Probe]] reads it back touching ONLY the query
  *    terms' hash classes (static `isin` → partition prune at plan time,
  *    the same layout contract as the LSH/prefix/IVF stores). At 100 TB
  *    the index build is the one-time ingest cost; a query then reads a
  *    handful of term partitions, never the corpus.
  *
  * Exactness is modulo the repo-wide 60-bit md5 convention: two distinct
  * terms colliding in h60 (~2^-60) would merge their postings on the
  * probe path.
  */
object TextSearch {

  /** Query tokenization — the Scala twin of [[TextFns.tokens]] (lowercase,
    * whitespace split, empties dropped), distinct because a repeated query
    * term is one term.
    */
  private[graft] def queryTerms(query: String): Seq[String] =
    query.toLowerCase(java.util.Locale.ROOT).split("\\s+")
      .filter(_.nonEmpty).distinct.toSeq

  /** One-row corpus stats (doc count, total whitespace tokens) — the two
    * globals BM25 normalizes by; persisted beside the index so a probe
    * never rescans the corpus.
    */
  def corpusStats(docs: DataFrame, textCol: String): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(TextFns.tokenCount(col(textCol))), lit(0L)).as("total_toks"))

  /** tf rows for one corpus scan: (id, dl, tok, tf), optionally
    * pre-filtered to a term set (the filter runs on the exploded rows,
    * BEFORE any shuffle). dl rides the groupBy keys (functionally
    * dependent on the id — no join, no second scan).
    */
  private def tfRows(docs: DataFrame, textCol: String, idCol: String,
      terms: Option[Seq[String]]): DataFrame = {
    val exploded = docs.select(col(idCol),
        TextFns.tokenCount(col(textCol)).as("dl"),
        explode(split(lower(col(textCol)), "\\s+")).as("tok"))
    terms.fold(exploded.filter(col("tok") =!= ""))(t =>
        exploded.filter(col("tok").isin(t: _*)))
      .groupBy(col(idCol), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
  }

  /** df as a window count over the tf rows (the count of (doc,term)
    * groups per term IS the document frequency — no second explode).
    * Restricting the tf rows to the query terms first does not change
    * df: every posting of a surviving term survives the filter.
    */
  private def withDf(tf: DataFrame): DataFrame =
    tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("tok"))))

  /** The shared scorer: postings (id, tf, dl, df, …) × one-row stats →
    * top-k by integer BM25, total order (score desc, id asc).
    */
  private def scoreAndRank(postings: DataFrame, stats: DataFrame,
      idCol: String, k: Int): DataFrame =
    postings.crossJoin(broadcast(stats))
      .withColumn("avgdl_x1000", expr("(1000 * total_toks) DIV n_docs"))
      .withColumn("idf_x1000",
        expr("(1000 * (2 * (n_docs - df) + 1)) DIV (2 * df + 1)"))
      .withColumn("tfn_x1000",
        expr("(22000 * tf * avgdl_x1000) DIV " +
          "(10 * tf * avgdl_x1000 + 3 * avgdl_x1000 + 9000 * dl)"))
      .groupBy(col(idCol))
      .agg(sum(expr("idf_x1000 * tfn_x1000")).as("score_x1m"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score_x1m").desc, col(idCol))
      .limit(k)

  /** In-query BM25 top-k: one corpus scan, query-term rows only past the
    * explode. Docs matching no query term are absent (score 0); ties
    * break by id. `excludeId` drops that doc from the RANKED list only
    * (after df/stats — it stays a corpus member for scoring), the
    * lexical mirror of [[Similarity.cosineTopKRaw]]'s self-exclusion.
    */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
      query: String, k: Int, excludeId: Long = Long.MinValue): DataFrame = {
    val terms = queryTerms(query)
    require(terms.nonEmpty, "query has no tokens")
    scoreAndRank(withDf(tfRows(docs, textCol, idCol, Some(terms)))
        .filter(col(idCol) =!= excludeId),
      corpusStats(docs, textCol), idCol, k)
  }

  /** The full inverted index: one posting row per (term, doc) with the
    * scorer's per-row inputs baked in (tf, dl, df), terms as h60 hashes
    * (8 bytes in the store, never the string). Write it partitioned by
    * `pmod(term_h, m)` (e.g. via [[graft.sources.Sinks.writePartitioned]])
    * so [[bm25Probe]] partition-prunes; df is frozen at build time —
    * incremental maintenance would version it per epoch exactly like the
    * prefix index's df dictionary ([[graft.streaming.DocIndexIngest]]).
    * Returns (postings, one-row stats).
    */
  def bm25Index(docs: DataFrame, textCol: String,
      idCol: String): (DataFrame, DataFrame) = {
    val postings = withDf(tfRows(docs, textCol, idCol, None))
      .select(TextFns.h60(col("tok")).as("term_h"), col(idCol),
        col("tf"), col("dl"), col("df"))
    (postings, corpusStats(docs, textCol))
  }

  /** Probe the stored index: query terms hash to literals at plan time,
    * so with `partitionMod` > 0 (a `tmod = pmod(term_h, mod)` partitioned
    * store) the scan reads exactly the query's hash classes — corpus size
    * never enters the probe's cost, only the touched postings lists.
    */
  def bm25Probe(postings: DataFrame, stats: DataFrame, idCol: String,
      query: String, k: Int, partitionMod: Long = 0L): DataFrame = {
    val hs = queryTerms(query).map(TextFns.h60Local)
    require(hs.nonEmpty, "query has no tokens")
    val pruned =
      if (partitionMod > 0L)
        postings.filter(col("tmod")
          .isin(hs.map(_ % partitionMod).distinct.map(Long.box): _*))
      else postings
    scoreAndRank(pruned.filter(col("term_h").isin(hs.map(Long.box): _*)),
      stats, idCol, k)
  }

  /** df-free posting rows `(term_h, id, tf, dl)` — the INCREMENTALLY
    * maintainable form of the index: every row depends on its own doc
    * alone, so a batch appends its rows and nothing already stored ever
    * changes (contrast [[bm25Index]], which bakes the corpus-global df
    * into each row and so goes stale the moment a later batch adds
    * postings for an existing term).
    */
  def postingsRows(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    tfRows(docs, textCol, idCol, None)
      .select(TextFns.h60(col("tok")).as("term_h"), col(idCol),
        col("tf"), col("dl"))

  /** Probe a df-free postings store (see [[postingsRows]]) + a stats
    * store of per-batch `(n_docs, total_toks)` rows. df is recomputed
    * IN-PROBE as a window count over the pruned query-term postings —
    * exactly the true document frequency, because pruning to a term's
    * partition keeps every posting of that term — and the corpus globals
    * are the SUM of the per-batch stats rows. Result ≡ [[bm25TopK]] over
    * the concatenated corpus, with no epoch/refresh machinery at all:
    * unlike the PPJoin prefix index (where a frozen df ORDER stays exact
    * and df only tunes performance), BM25's df enters the score, so the
    * incremental contract here is "store nothing derived, derive at
    * probe time from O(touched postings + batches) rows".
    */
  def bm25ProbeIncr(postings: DataFrame, statsStore: DataFrame, idCol: String,
      query: String, k: Int, partitionMod: Long = 0L): DataFrame = {
    val hs = queryTerms(query).map(TextFns.h60Local)
    require(hs.nonEmpty, "query has no tokens")
    val pruned =
      if (partitionMod > 0L)
        postings.filter(col("tmod")
          .isin(hs.map(_ % partitionMod).distinct.map(Long.box): _*))
      else postings
    val mine = pruned.filter(col("term_h").isin(hs.map(Long.box): _*))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term_h"))))
    val stats = statsStore.agg(
      coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
      coalesce(sum(col("total_toks")), lit(0L)).as("total_toks"))
    scoreAndRank(mine, stats, idCol, k)
  }

  /** Ordered (not distinct!) phrase tokens — a phrase is a SEQUENCE. */
  private[graft] def phraseTokens(phrase: String): Seq[String] =
    phrase.toLowerCase(java.util.Locale.ROOT).split("\\s+")
      .filter(_.nonEmpty).toSeq

  /** Exact phrase search, in-query: docs whose token stream contains the
    * phrase's tokens CONSECUTIVELY, with per-doc occurrence counts
    * (overlapping occurrences count — "a a a" contains "a a" twice).
    * Same positional-intersection core as [[phraseProbe]], on token
    * STRINGS (no hashing): posexplode → `isin` filter to the phrase's
    * tokens BEFORE any shuffle (the corpus leaves the scan as only the
    * phrase-term positions), broadcast slot join, `(id, base)` slot
    * count. The array-scan formulation this replaces — per-row
    * `filter(sequence(0, size−m), i -> conj)` — is the DuckDB oracle's
    * definition but benched 4× slower in Spark (interpreted HOF lambda +
    * a size-dl index array allocated per row); the two are equivalent by
    * construction and the oracle pins it. Output `(id, n_matches > 0)`,
    * ordered by id.
    */
  def phraseCount(docs: DataFrame, textCol: String, idCol: String,
      phrase: String): DataFrame = {
    val terms = phraseTokens(phrase)
    require(terms.nonEmpty, "phrase has no tokens")
    val m = terms.length
    val spark = docs.sparkSession
    import spark.implicits._
    val slotDf = terms.zipWithIndex.map { case (t, j) => (j.toLong, t) }
      .toDF("slot", "tok")
    docs
      .select(col(idCol),
        posexplode(expr(s"filter(split(lower(`$textCol`), '\\\\s+'), t -> t != '')")))
      .withColumnRenamed("col", "tok")
      .filter(col("tok").isin(terms.distinct: _*))
      .join(broadcast(slotDf), Seq("tok"))
      .select(col(idCol), (col("pos") - col("slot")).as("base"), col("slot"))
      .filter(col("base") >= 0)
      .groupBy(col(idCol), col("base"))
      .agg(countDistinct(col("slot")).as("n_slots"))
      .filter(col("n_slots") === m)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matches"))
      .orderBy(col(idCol))
  }

  /** Positional postings `(term_h, id, pos)` — the phrase-capable index
    * (strictly more informative than [[postingsRows]]: tf is the count
    * of positions). `pos` is the 0-based index in the FILTERED token
    * stream (empties dropped), the same positions [[phraseCount]] scans.
    * Like [[postingsRows]] every row is per-doc data, so incremental
    * maintenance is pure append.
    */
  def positionalPostings(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol),
        posexplode(expr(s"filter(split(lower(`$textCol`), '\\\\s+'), t -> t != '')")))
      .select(TextFns.h60(col("col")).as("term_h"), col(idCol),
        col("pos").cast("long").as("pos"))

  /** Phrase search over the stored positional index — the classic IR
    * positional-intersection query: slot j of the phrase contributes its
    * postings re-based to `pos − j`, and a doc position starts an
    * occurrence iff ALL m slots land on the same `(id, base)`. The scan
    * touches ONLY the phrase terms' `tmod` partitions (plan-time literal
    * `isin`, the [[bm25Probe]] layout contract); a duplicated phrase
    * term joins once per slot it fills, which is exactly its semantics.
    * Result ≡ [[phraseCount]] over the indexed corpus (spec-pinned).
    */
  def phraseProbe(postings: DataFrame, idCol: String, phrase: String,
      partitionMod: Long = 0L): DataFrame = {
    val terms = phraseTokens(phrase)
    require(terms.nonEmpty, "phrase has no tokens")
    val m = terms.length
    val slots = terms.zipWithIndex.map { case (t, j) => (j.toLong, TextFns.h60Local(t)) }
    val hs = slots.map(_._2).distinct
    val spark = postings.sparkSession
    import spark.implicits._
    val slotDf = slots.toDF("slot", "term_h")
    val pruned =
      if (partitionMod > 0L)
        postings.filter(col("tmod")
          .isin(hs.map(_ % partitionMod).distinct.map(Long.box): _*))
      else postings
    pruned.filter(col("term_h").isin(hs.map(Long.box): _*))
      .join(broadcast(slotDf), Seq("term_h"))
      .select(col(idCol), (col("pos") - col("slot")).as("base"), col("slot"))
      .filter(col("base") >= 0)
      .groupBy(col(idCol), col("base"))
      .agg(countDistinct(col("slot")).as("n_slots"))
      .filter(col("n_slots") === m)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matches"))
      .orderBy(col(idCol))
  }

  /** Hybrid retrieval — reciprocal rank fusion (Cormack/Clarke/Buettcher,
    * SIGIR 2009) of the lexical BM25 list and the exact-cosine vector
    * list over a shared id space (documents ↔ their embeddings):
    *
    *   rrf_x1m(doc) = Σ_lists 1000000 DIV (rrfK + rank_list(doc))
    *
    * with the canonical rrfK = 60. Ranks come from each list's own total
    * order (BM25: integer score desc, id; cosine: raw double sim desc, id
    * — both cross-engine exact), so the integer fusion is too. A doc
    * absent from a list contributes nothing (the standard RRF convention);
    * `n_lists` reports how many lists carried each survivor. The ANCHOR
    * doc (`queryVecId`) is excluded from BOTH legs before each limit —
    * asymmetric exclusion (vector-only, the naive composition) would let
    * the seed document back into the results at a half-strength fused
    * score, losing to docs worse on both signals.
    *
    * Scale shape: the two retrieval legs are the proven operators (BM25
    * one filtered scan / pruned probe; cosine one broadcast-scored scan →
    * `TakeOrderedAndProject`); everything after them — rank windows,
    * union, fusion groupBy — runs on ≤ 2·kPerList rows by construction,
    * so the un-partitioned `row_number` windows are bounded, not a
    * single-partition scan of anything.
    */
  def hybridRrf(docs: DataFrame, textCol: String, idCol: String,
      emb: DataFrame, embIdCol: String, vecCol: String,
      query: String, queryVecId: Long, kPerList: Int, k: Int,
      rrfK: Long = 60L): DataFrame = {
    // rrfK ≤ 0 puts `rrfK + rank = 0` in range (rank ≥ 1): DIV 0 nulls
    // that list's contribution out of the sum — a silently mis-fused
    // ranking, not an error. Negative rrfK also inverts the rank order.
    require(rrfK > 0L, s"rrfK must be positive, got $rrfK")
    val lex = bm25TopK(docs, textCol, idCol, query, kPerList,
        excludeId = queryVecId)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score_x1m").desc, col(idCol))))
      .select(col(idCol), col("rank"))
    val vec = Similarity.cosineTopKRaw(emb, embIdCol, vecCol, queryVecId, kPerList)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("sim").desc, col(embIdCol))))
      .select(col(embIdCol).as(idCol), col("rank"))
    lex.unionByName(vec)
      .groupBy(col(idCol))
      .agg(sum(expr(s"CAST(1000000 DIV ($rrfK + rank) AS BIGINT)")).as("rrf_x1m"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_x1m").desc, col(idCol))
      .limit(k)
  }
}
