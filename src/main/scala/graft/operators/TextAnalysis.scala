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

  /** Regex subword-token count — the BPE-ish `letters | digit | symbol`
    * segmentation both stats surfaces report. Column-API `regexp_count`
    * (no match-array materialization; the text column is a caller NAME
    * and must never be rendered into SQL text), same value as the
    * oracle's `len(regexp_extract_all(...))`.
    */
  private def subTokenCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9\\s]")).cast("long")

  /** Function-word marker sets for the n-gram-free language-ID heuristic.
    * Real corpora would use char-n-gram profiles; marker words keep the
    * operator deterministic and oracle-expressible.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "es" -> Seq("el", "la", "los", "de", "y", "que", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "fr" -> Seq("le", "les", "et", "est", "que", "une"))

  /** Token-distribution DRIFT report between two corpus snapshots (the
    * data-ops check before mixing a new crawl into training data: what
    * shifted?): hashed-unigram rates per million on each side, top-k
    * buckets by absolute rate delta, each with its most-common example
    * token from the union (count desc, token asc — deterministic, and a
    * rare tie-token can't mask what the bucket is actually about).
    * All integer: rate_pm = (cnt·10^6) DIV tot per side.
    *
    * Plan: one explode→groupBy(bucket) per side (partial-agg'd, ≤B result
    * rows each), a full outer join of the two B-row tables (trivial), and
    * the example token from a (bucket, token) count aggregate — the only
    * vocabulary-sized shuffle; top-k is a TakeOrdered.
    */
  def corpusDrift(corpusA: DataFrame, corpusB: DataFrame, textCol: String,
                  buckets: Int = 256, k: Int = 20): DataFrame = {
    val union = corpusA.select(col(textCol)).unionByName(corpusB.select(col(textCol)))
    driftReport(
      driftBucketCounts(corpusA, textCol, buckets, "ca"),
      driftBucketCounts(corpusB, textCol, buckets, "cb"),
      driftExamples(union, textCol, buckets), k)
  }

  /** One side's hashed-unigram bucket counts `(bkt, cname)` — the SAME
    * bucketing as [[Curation.dsirBucketCounts]]' raw counts (pmod of
    * h60 over the shared tokenizer), which is what lets
    * [[graft.streaming.TextModelIngest.driftProbe]] use the persisted
    * dsir store as the corpus side of a drift report without rescanning
    * the corpus.
    */
  def driftBucketCounts(df: DataFrame, textCol: String, buckets: Int,
                        cname: String): DataFrame = {
    // pmod(_, 0) nulls every bucket into ONE garbage row with no error —
    // that hazard is the whole guard; any positive count is well-defined
    // under pmod, so no upper bound (an upper bound would be an API
    // contract change for callers with large drift histograms)
    require(buckets > 0, s"buckets must be positive, got $buckets")
    df.select(explode(tokens(col(textCol))).as("tok"))
      .select(pmod(h60(col("tok")), lit(buckets.toLong)).as("bkt"))
      .groupBy("bkt").agg(count(lit(1)).as(cname))
  }

  /** Most-common example token per bucket (count desc, token asc) from
    * whatever corpus slice the caller wants examples drawn from.
    */
  def driftExamples(df: DataFrame, textCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    df.select(explode(tokens(col(textCol))).as("tok"))
      .select(pmod(h60(col("tok")), lit(buckets.toLong)).as("bkt"), col("tok"))
      .groupBy("bkt", "tok").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bkt"))
          .orderBy(col("n").desc, col("tok"))))
      .filter(col("rn") === 1)
      .select(col("bkt"), col("tok").as("example_token"))
  }

  /** The comparison half of [[corpusDrift]] over pre-computed bucket
    * counts `(bkt, ca)` / `(bkt, cb)` and an example table — the entry
    * point for probes whose corpus-side counts come from a STORE
    * ([[graft.streaming.TextModelIngest.driftProbe]]). Same expressions
    * as the in-query form, so probe ≡ in-query is structural on the
    * rate/drift columns.
    */
  def driftReport(a: DataFrame, b: DataFrame, example: DataFrame,
                  k: Int): DataFrame = {
    val totA = a.agg(sum(col("ca")).as("ta"))
    val totB = b.agg(sum(col("cb")).as("tb"))
    a.join(b, Seq("bkt"), "full_outer")
      .crossJoin(broadcast(totA)).crossJoin(broadcast(totB))
      .select(col("bkt"),
        expr("(coalesce(ca, 0) * 1000000) DIV greatest(ta, 1)").as("rate_a_pm"),
        expr("(coalesce(cb, 0) * 1000000) DIV greatest(tb, 1)").as("rate_b_pm"))
      .withColumn("drift_pm", abs(col("rate_a_pm") - col("rate_b_pm")))
      .join(example, Seq("bkt"), "left")
      .orderBy(col("drift_pm").desc, col("bkt"))
      .limit(k)
      .select("bkt", "example_token", "rate_a_pm", "rate_b_pm", "drift_pm")
  }

  /** One row per token — explode of a plain `split` (codegen'd; the
    * empty-token filter runs on rows, not inside an interpreted HOF lambda).
    */
  def tokenRows(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol), explode(split(lower(col(textCol)), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")

  /** PII patterns for [[scrubPii]], applied in order (emails before the
    * bare-digit fallback so an address is never half-eaten). RE2-safe
    * syntax only (no lookaround/backrefs) — portable between Spark's Java
    * regex and DuckDB's RE2, and safe for any engine a scrub might be
    * pushed into.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "https?://[^ \\t\\n]+" -> "<URL>",
    "[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}" -> "<PHONE>",
    "[0-9]{6,}" -> "<NUM>")

  /** PII scrubbing: replace emails/URLs/phone-shaped/long-digit spans with
    * typed placeholder tags, and count what was hit per doc (the counts
    * are the audit trail — a scrub that reports nothing is
    * indistinguishable from a scrub that did nothing). Each pattern's
    * count runs against the text AFTER the previous replacements — so the
    * digits inside an already-replaced email/URL/phone are not double-
    * counted and every count states what that pattern actually replaced.
    * Narrow per-row `regexp_replace`/`regexp_count` chain: a pure map at
    * 100 TB.
    */
  def scrubPii(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    // steps(i) = the text after patterns 0..i-1 have been replaced;
    // pattern i is counted and then applied against exactly steps(i)
    val steps = piiPatterns.scanLeft(col(textCol)) {
      case (acc, (pat, tag)) => regexp_replace(acc, pat, tag)
    }
    val counts = piiPatterns.zip(steps).map { case ((pat, tag), prior) =>
      regexp_count(prior, lit(pat)).cast("long")
        .as("n_" + tag.stripPrefix("<").stripSuffix(">").toLowerCase)
    }
    docs.select(col(idCol) +: steps.last.as("scrubbed") +: counts: _*)
  }

  /** Top-`k` distinctive terms per document by tf/df — TF-IDF with the
    * rank-equivalent integer score `(tf·1e6) DIV df` (a float `log` IDF is
    * not bit-portable across engines; integer tf/df preserves the per-doc
    * ranking for a fixed corpus). Plan: ONE token explode of ONE corpus
    * scan builds the per-(doc,term) `tf` aggregate, and `df` is a window
    * count over the tf rows keyed by term — the number of (doc,term)
    * groups per term IS the document frequency, so there is no second
    * explode, no second scan, and no join (an earlier tf⋈df form planned
    * the whole explode+aggregate subtree TWICE — Catalyst prunes the two
    * consumers differently, so the exchange is never reused). Three keyed
    * shuffles total — (doc,term), term, doc — each partial-aggregated or
    * sorted within its partition; plan-audited to exactly one Generate.
    * No N² anywhere.
    */
  def tfIdfTopTerms(docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val tf = tokenRows(docs, textCol, idCol)
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val wDf = org.apache.spark.sql.expressions.Window.partitionBy(col("tok"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score_x1m").desc, col("tok"))
    tf.withColumn("df", count(lit(1)).over(wDf))
      .withColumn("score_x1m", expr("(tf * 1000000) DIV df"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("tok").as("term"), col("tf"), col("df"),
        col("score_x1m"), col("rnk").cast("long").as("rnk"))
  }

  /** Corpus-wide TOP-K FREQUENT 3-GRAMS — the boilerplate report (what
    * phrase is pasted everywhere?) that motivates span-level dedup
    * thresholds: `(ngram, n_occ, n_docs)`, ordered (n_occ desc, ngram).
    * One aggregation keyed by the 60-bit shingle HASH — per-occurrence
    * rows shuffle as 8-byte keys, the string rides only as a `min(s)`
    * agg buffer (one string per distinct hash per map partition, not
    * one per occurrence) — then `TakeOrderedAndProject` on the distinct-
    * hash rows. An h60 collision would merge two distinct n-grams'
    * counts under the min string (repo-wide hashing caveat).
    */
  def topNgrams(docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame =
    graft.operators.Dedup.shingleRows(docs, textCol, idCol)
      .select(col(idCol), h60(col("s")).as("h"), col("s"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col(idCol)).as("n_docs"),
        min(col("s")).as("ngram"))
      .orderBy(col("n_occ").desc, col("ngram"))
      .limit(k)
      .select(col("ngram"), col("n_occ"), col("n_docs"))

  /** Per-doc whitespace-token stats: counts only (exact, portable), as a
    * PURE MAP — no explode, no aggregation, no shuffle (an earlier
    * explode+agg form paid an Expand for the distinct count and a full
    * shuffle of the token rows; this is a narrow scan at any scale):
    *  - token count: the shared whitespace-robust `tokenCount` primitive;
    *  - distinct count: `array_distinct` per row (codegen'd hash set) over
    *    the `wsNorm`-normalized split (empty-free by construction);
    *  - summed token length ≡ length of the text with all whitespace
    *    stripped — one regexp_replace instead of a per-token sum.
    */
  def textStats(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = wsNorm(col(textCol))
    val toks = split(t, " ")
    val nTokens = tokenCount(col(textCol))
    docs.select(col(idCol),
      nTokens.as("n_tokens"),
      when(t === "", 0L).otherwise(size(array_distinct(toks)).cast("long")).as("n_uniq"),
      subTokenCount(col(textCol)).as("n_subtokens"),
      length(col(textCol)).cast("long").as("n_chars"),
      (length(regexp_replace(t, "\\s+", "")).cast("long") * 100)
        .as("sum_len_x100"))
      .select(col(idCol), col("n_tokens"), col("n_uniq"), col("n_subtokens"), col("n_chars"),
        expr("sum_len_x100 DIV greatest(n_tokens, 1)").as("avg_tok_len_x100"))
  }

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

  /** Gopher-style repetition signals per doc — the within-document
    * repetition filters of Rae et al. 2021 (Gopher, table A1) that corpus
    * curation applies alongside [[qualityScore]]:
    *  - `dup_line_pct`: % of (non-whitespace) lines whose exact text occurs
    *    ≥2× in the doc, counted WITH multiplicity — boilerplate/navigation
    *    pages score high;
    *  - `top_2gram_pct`: % of word-2-grams taken by the single most
    *    frequent one — degenerate keyword-stuffed text scores high.
    * Integer-exact (`DIV`), so bit-portable to the oracle.
    *
    * Scale shape: two explode→count aggregations, each partial-aggregated
    * and keyed by (doc, line|gram) then by doc — the corpus never shuffles
    * unaggregated, and the 2-gram array is the same narrow shifted-slice
    * zip as [[Dedup.shingleRows]] (no window, no HOF lambda on the hot
    * path). Whitespace-only lines are dropped by a whitespace-robust
    * filter (`regexp_replace`, not space-only `trim`).
    */
  def repetitionSignals(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val lineAgg = docs
      .select(col(idCol), explode(split(col(textCol), "\n")).as("line"))
      .filter(regexp_replace(col("line"), "\\s+", "") =!= "")
      .groupBy(col(idCol), col("line")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum("c").as("n_lines"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("n_dup_lines"))
    val t = wsNorm(col(textCol))
    val toks = split(t, " ")
    val n = size(toks)
    val gramStruct = "array<struct<a:string,b:string>>"
    val grams = when(t === "" || n < 2, expr(s"CAST(array() AS $gramStruct)"))
      .otherwise(arrays_zip(
        slice(toks, lit(1), n - 1).as("a"), slice(toks, lit(2), n - 1).as("b")))
    val gramAgg = docs
      .select(col(idCol), explode(grams).as("g"))
      .select(col(idCol), concat_ws(" ", col("g.a"), col("g.b")).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum("c").as("n_2grams"), max("c").as("top_2gram"))
    docs.select(col(idCol))
      .join(lineAgg, Seq(idCol), "left")
      .join(gramAgg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        expr("(100 * coalesce(n_dup_lines, 0)) DIV greatest(coalesce(n_lines, 0), 1)")
          .as("dup_line_pct"),
        coalesce(col("n_2grams"), lit(0L)).as("n_2grams"),
        expr("(100 * coalesce(top_2gram, 0)) DIV greatest(coalesce(n_2grams, 0), 1)")
          .as("top_2gram_pct"))
  }

  /** Winnowing document fingerprints (the MOSS scheme, Schleimer et al.
    * SIGMOD 2003): hash every character `k`-gram of the whitespace-
    * normalized text, then keep the MINIMUM hash of each sliding window of
    * `w` consecutive k-grams. The distinct minima are the doc's fingerprint
    * set — the rolling-hash fingerprint a plagiarism/near-dup index stores.
    * Guarantee: two docs sharing any substring of ≥ `w + k - 1` chars share
    * at least one fingerprint (the shared stretch covers a full window).
    * Selecting *window minima* (rather than tie-position bookkeeping) makes
    * the set well-defined and engine-portable: the chosen hash VALUES are
    * identical under any tie-breaking rule.
    *
    * Scale shape: scan → per-char-position explode → substr+md5 (all
    * narrow), then ONE shuffle keyed by doc for the per-doc position sort
    * the sliding-window min needs; the window-start cutoff is computed from
    * the text length, not a second windowed count. Docs shorter than `k`
    * chars collapse to one whole-text gram; blank docs emit nothing.
    * Output: distinct `(id, fp)` rows.
    */
  def winnowFingerprints(docs: DataFrame, textCol: String, idCol: String,
                         k: Int = 8, w: Int = 16): DataFrame = {
    val t = wsNorm(col(textCol))
    // number of k-grams (≥1 once blank docs are filtered): short docs have
    // exactly one gram — the whole normalized text
    val nGrams = greatest(length(col("t")) - (k - 1), lit(1))
    val grams = docs
      .select(col(idCol), t.as("t"))
      .filter(col("t") =!= "")
      .select(col(idCol), nGrams.as("ng"),
        explode(sequence(lit(1), nGrams)).as("pos"), col("t"))
      .select(col(idCol), col("ng"), col("pos"),
        h60(when(length(col("t")) >= k, col("t").substr(col("pos"), lit(k)))
          .otherwise(col("t"))).as("h"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos")).rowsBetween(0, w - 1)
    grams
      .withColumn("fp", min(col("h")).over(win))
      // keep only full windows (clamped to ≥1 so short docs keep their one
      // whole-window minimum)
      .filter(col("pos") <= greatest(col("ng") - (w - 1), lit(1)))
      .select(col(idCol), col("fp"))
      .distinct()
  }

  /** Corpus token accounting per key (lang/source): documents, whitespace
    * tokens, regex subword tokens. Partial+final hash agg — one shuffle of
    * tiny per-key partials.
    */
  def tokenCountsByKey(docs: DataFrame, textCol: String, keyCol: String): DataFrame =
    docs.select(col(keyCol),
      tokenCount(col(textCol)).as("t"),
      subTokenCount(col(textCol)).as("st"))
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

  /** Corpus-wide BPE pair statistics (the counting half of one BPE
    * training iteration, Sennrich et al. 2016): top-k adjacent intra-word
    * char pairs by count. ONE Generate (per-doc pair arrays flattened
    * before the explode) + one partial-agg'd hash aggregate — the wire
    * carries the pair vocabulary (≤ alphabet², tiny), never the corpus.
    * Top-k is a TakeOrdered (count desc, pair asc), no global sort. The
    * 1-char-word guard is load-bearing: Spark's `sequence(1, 0)` DESCENDS
    * instead of returning empty.
    */
  def bpePairStats(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(flatten(transform(tokens(col(textCol)), w =>
        when(length(w) >= 2,
          transform(sequence(lit(1), length(w) - 1), i => w.substr(i, lit(2))))
          .otherwise(array())))).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("pair"))
      .limit(k)

  /** Greedy left-to-right merge of ONE symbol pair inside a symbol array
    * — the apply half of a BPE iteration, as a pure codegen'd fold: the
    * accumulator's last symbol + the incoming symbol match (p1, p2) ⇒
    * replace the last with the merged symbol; overlapping runs ("aaa"
    * under (a,a)) merge left-first exactly like the reference BPE.
    */
  private[graft] def mergePair(syms: Column, p1: String, p2: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === p1 && s === p2,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(p1 + p2))))
        .otherwise(concat(acc, array(s))))

  /** BPE training loop (Sennrich et al. 2016): `iterations` rounds of
    * count-top-pair → merge-everywhere, each round ONE distributed
    * pair-count aggregate (collecting a single row) and a narrow fold
    * applying the merge — the corpus never shuffles; driver state is the
    * merge list. Returns the learned merges in order. Deterministic: ties
    * break lexicographically smaller pair first, matching
    * [[bpePairStats]]' total order.
    */
  def bpeTrain(docs: DataFrame, textCol: String, iterations: Int): Seq[(String, String)] = {
    var syms = docs.select(tokens(col(textCol)).as("toks"))
      .select(explode(col("toks")).as("w"))
      // explicit substr char split (split(w, "") edge behavior differs
      // across engines/versions; this form is unambiguous)
      .select(transform(sequence(lit(1), length(col("w"))), i =>
        col("w").substr(i, lit(1))).as("syms"))
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    for (_ <- 0 until iterations) {
      val top = syms
        .select(explode(when(size(col("syms")) >= 2,
          transform(sequence(lit(1), size(col("syms")) - 1), i =>
            struct(element_at(col("syms"), i.cast("int")).as("p1"),
              element_at(col("syms"), (i + 1).cast("int")).as("p2"))))
          .otherwise(array())).as("p"))
        .groupBy(col("p")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("p.p1"), col("p.p2"))
        .limit(1).collect()
      if (top.isEmpty) return merges.toSeq
      val row = top.head.getStruct(0)
      val (p1, p2) = (row.getString(0), row.getString(1))
      merges += ((p1, p2))
      // LAZY checkpoint (r18, §2.6): the next round's pair-count job
      // computes the fold and persists its blocks as one job — the eager
      // form ran a separate full-copy materialization job per round
      // (2·iterations driver round trips instead of iterations), and
      // paid one wasted final fold the loop never consumes. Lineage
      // still truncates at materialization; merge bytes are identical.
      syms = syms.select(mergePair(col("syms"), p1, p2).as("syms"))
        .localCheckpoint(false)
    }
    merges.toSeq
  }

  /** [[bpeTrain]] over a deterministic md5 hash-sample of the corpus
    * (`keep`/`mod` of the docs, [[Sampling.sampleByHash]]) — how BPE is
    * actually trained at corpus scale: pair statistics are frequency
    * RANKS, which a representative sample preserves up to permutations
    * among near-tied pairs (sampling noise can swap ranks whose counts
    * differ by less than its standard error — the fixture's ranks 2–5
    * sit within 6% of each other and do permute; spec-pinned: the
    * clear-margin top merge and the learned merge SET survive a
    * half-corpus sample), while the full-corpus loop pays `iterations`
    * localCheckpoints of EVERY document's symbol table. Here only the initial tokenize scans the corpus (the
    * sample filter is pushed to it); every iteration's count + merge +
    * checkpoint runs over the SAMPLE — driver round trips and cached
    * state bounded by the sample size regardless of corpus size.
    */
  def bpeTrainSampled(docs: DataFrame, textCol: String, idCol: String,
                      iterations: Int, mod: Int = 20,
                      keep: Int = 1): Seq[(String, String)] =
    bpeTrain(graft.operators.Sampling.sampleByHash(docs, idCol, mod, keep),
      textCol, iterations)

  /** Apply a trained BPE merge list ([[bpeTrain]]'s output) to every
    * document — the ENCODE half of the tokenizer: per word, char-split
    * then each merge in training order as a [[mergePair]] fold, all
    * composed INSIDE one `transform` over the doc's words (expression
    * depth = merge count, bounded at 64; no explode — the corpus never
    * leaves its row). Returns (id, bpe_tokens, n_bpe_tokens) — the token
    * count under the trained tokenizer is what batch/packing budgets
    * consume. Spec-pinned (round-trip + hand-computed encodings); not
    * oracle-declared: the only DuckDB fold primitive is `list_reduce`,
    * measured nondeterministic (see the funnel oracles).
    */
  def bpeEncode(docs: DataFrame, textCol: String, idCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    require(merges.size <= 64, s"${merges.size} merges > 64 — expression-depth bound")
    val encodeWord = (w: Column) => {
      val chars = transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))
      merges.foldLeft(chars) { case (acc, (p1, p2)) => mergePair(acc, p1, p2) }
    }
    docs.select(col(idCol),
      flatten(transform(tokens(col(textCol)), encodeWord)).as("bpe_tokens"))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")).cast("long"))
  }

  /** Bigram language-model quality score (the CCNet/KenLM role: rank
    * documents by how "fluent" they are under an n-gram LM; Wenzek et
    * al. 2020) — integer-exact add-one-smoothed bigram probabilities,
    * self-trained on `lmCorpus` (pass the trusted corpus there; scoring
    * corpus may differ):
    *   p_x100k(w1 w2) = (100000·(c2(w1,w2)+1)) DIV (c1(w1)+V),
    *   lm_score_x100k(doc) = Σ p_x100k DIV n_bigrams  (0 if <2 tokens).
    * No float log (the no-float-log rule) — the per-bigram DIV loses
    * magnitude information a log-sum would keep, but preserves the
    * fluency RANKING a filter consumes.
    *
    * Scale shape: the LM is two vocabulary-sized count tables; scoring
    * joins the exploded bigram stream against them — bigram join keyed
    * (w1,w2), unigram join keyed w1, both partial-agg'd upstream; at
    * production scale the LM tables are bucketed by their key so the
    * scoring join co-locates. The per-doc rollup is one hash aggregate.
    */
  /** One row per ADJACENT token pair — the shared bigram stream for
    * [[lmScore]] and [[collocations]]. `idCols` ride through (empty for
    * corpus-level counting); docs with <2 tokens emit nothing.
    */
  private[graft] def bigramRows(df: DataFrame, textCol: String,
                                idCols: Seq[String]): DataFrame = {
    val ids = idCols.map(col)
    df.select(ids :+ tokens(col(textCol)).as("__toks"): _*)
      .select(ids :+
        explode(when(size(col("__toks")) >= 2,
          transform(sequence(lit(1), size(col("__toks")) - 1), i =>
            struct(element_at(col("__toks"), i.cast("int")).as("w1"),
              element_at(col("__toks"), (i + 1).cast("int")).as("w2"))))
          .otherwise(array())).as("bg"): _*)
      .select(ids ++ Seq(col("bg.w1").as("w1"), col("bg.w2").as("w2")): _*)
  }

  def lmScore(docs: DataFrame, textCol: String, idCol: String,
              lmCorpus: Option[DataFrame] = None): DataFrame = {
    val (c1, c2) = lmCounts(lmCorpus.getOrElse(docs), textCol)
    lmScoreWithModel(docs, textCol, idCol, c1, c2)
  }

  /** The TRAINING half of [[lmScore]]: the two vocabulary-sized count
    * tables — `(w1, c1)` unigrams and `(w1, w2, c2)` bigrams. Both are
    * ADDITIVE across corpus slices (per-key sums of per-slice counts ≡
    * whole-corpus counts), which is what makes the LM maintainable per
    * ingest micro-batch ([[graft.streaming.TextModelIngest]]) instead of
    * rebuilt per scoring query.
    */
  def lmCounts(train: DataFrame, textCol: String): (DataFrame, DataFrame) = {
    val c2 = bigramRows(train, textCol, Seq.empty)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = train.select(explode(tokens(col(textCol))).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    (c1, c2)
  }

  /** The SCORING half of [[lmScore]] against caller-supplied count
    * tables (in-query from [[lmCounts]], or summed from a persisted
    * per-batch store — [[graft.streaming.TextModelIngest.lmProbe]]; same
    * plan either way, so probe ≡ in-query is structural). V = |vocab| is
    * re-aggregated from `c1` — one tiny count, never a third corpus
    * explode.
    */
  def lmScoreWithModel(docs: DataFrame, textCol: String, idCol: String,
                       c1: DataFrame, c2: DataFrame): DataFrame = {
    val v = c1.agg(count(lit(1)).as("v"))
    val scored = bigramRows(docs, textCol, Seq(idCol))
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .select(col(idCol),
        expr("(100000 * (coalesce(c2, 0) + 1)) DIV (coalesce(c1, 0) + v)").as("p_x100k"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_x100k")).as("sp"))
      .select(col(idCol), col("n_bigrams"),
        expr("sp DIV n_bigrams").as("lm_score_x100k"))
    // docs with <2 tokens emit no bigram rows — restore them with score 0
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_score_x100k"), lit(0L)).as("lm_score_x100k"))
  }

  /** Top-k collocations by integer LIFT over adjacent bigrams —
    * PMI's argument without its log (the no-float-log rule; log is
    * monotone, so the lift RANKING equals the PMI ranking):
    *   lift_x1000(w1 w2) = (c2·T·1000) DIV (cl(w1)·cr(w2)),
    * where cl/cr are the bigram-position marginals and T the total
    * bigram count. `minCount` floors c2 — lift is variance-dominated on
    * hapax pairs. Plan: one bigram Generate feeds three partial-agg'd
    * count aggregates (pair + two vocabulary-sized marginals); the
    * scored join is marginal⋈marginal over DISTINCT PAIRS (≪ corpus),
    * T broadcast as a 1-row scalar; TakeOrdered for the top-k. The
    * c2·T·1000 product is computed in DECIMAL(38,0) — in BIGINT it
    * overflows past ~10^9 total bigrams, and with ANSI off it would
    * WRAP silently instead of throwing; the decimal form holds to
    * ~10^17 bigrams, and the final lift re-narrows to BIGINT exactly
    * (lift ≤ 1000·T/max(cl,cr) at any magnitude a corpus produces).
    */
  def collocations(docs: DataFrame, textCol: String, k: Int,
                   minCount: Long = 5L): DataFrame = {
    val bg = bigramRows(docs, textCol, Seq.empty)
    // marginals as WINDOW sums over the pair table, not joins of
    // re-aggregated subtrees: cl(w1) = Σ_w2 c2 and cr(w2) = Σ_w1 c2 are
    // contingency-table identities, and expressing them as windows keyed
    // by w1/w2 keeps ONE bigram Generate in the plan (separate
    // aggregate consumers get pruned differently, so Catalyst re-plans
    // the whole explode subtree per consumer — the tfIdf lesson). Only
    // the scalar T keeps its own consumer (one partial-agg'd scan; a
    // global window would serialize the pair table to one partition).
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val wL = org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))
    val wR = org.apache.spark.sql.expressions.Window.partitionBy(col("w2"))
    val t = bg.agg(count(lit(1)).as("t"))
    c2.withColumn("cl", sum(col("c2")).over(wL))
      .withColumn("cr", sum(col("c2")).over(wR))
      .filter(col("c2") >= minCount)
      .crossJoin(broadcast(t))
      .select(col("w1"), col("w2"), col("c2"),
        // DECIMAL(38,0) numerator/denominator: BIGINT wraps past ~10^9
        // bigrams with ANSI off (see scaladoc); DIV re-narrows to BIGINT
        expr("CAST((CAST(c2 AS DECIMAL(38,0)) * t * 1000) DIV " +
          "(CAST(cl AS DECIMAL(38,0)) * cr) AS BIGINT)").as("lift_x1000"))
      .orderBy(col("lift_x1000").desc, col("w1"), col("w2"))
      .limit(k)
  }
}
