package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns._

/** Deduplication operators for training-data pipelines ([NS], SURVEY §2.10).
  *
  * The reference deduplicates implicitly — one row per `transaction_id`,
  * enforced by its update-join (`reference/src/lambda/processQueue.ts:230-238`).
  * At 100 TB corpus scale the real need is content dedup; each operator here
  * is a declarative pipeline whose only wide operations are hash-partitioned
  * aggregations/joins on dedup keys:
  *
  *  - exact: one shuffle keyed by the full text (map-side partial agg first);
  *  - fingerprint: same shuffle but on a 128-bit digest of normalized text —
  *    at scale the digest (16 bytes) shuffles instead of the document;
  *  - MinHash+LSH: per-doc signatures are embarrassingly parallel; only
  *    (band, bucket) keys + doc ids shuffle, candidate verification re-joins
  *    signatures by id — the document text itself never shuffles twice;
  *  - SimHash: signature is a per-row scalar; near-dup = small Hamming
  *    distance between signatures.
  */
object Dedup {

  /** Candidate-volume metric for the PPJoin family (r18 verdict ask):
    * with `GRAFT_CAND_STATS` set, print how many candidate pairs survive
    * the prefix+prune stage and reach the exact verify. The frame is
    * always already checkpointed, so the count is one cheap narrow job —
    * and entirely absent (no job, no branch cost) unless the env var is
    * set, so bench/production paths are untouched.
    */
  private def logCandStats(name: String, cand: DataFrame): DataFrame = {
    if (sys.env.contains("GRAFT_CAND_STATS"))
      System.err.println(s"[candstats] $name: ${cand.count()} candidate pairs")
    cand
  }

  /** Exact dedup: keep the smallest id per identical text (deterministic
    * canonical pick), with the duplicate count.
    */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("n_copies"))

  /** Normalized fingerprint: lowercase, collapse non-alphanumerics, full
    * 128-bit md5 (64 bits would hit birthday collisions around 5×10⁹ docs —
    * within reach of a 100 TB corpus). `is_canonical` marks the smallest
    * doc id per fingerprint group; the window is one shuffle of the rows
    * keyed by fingerprint.
    */
  def fingerprint(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    docs.withColumn("fp", fpExpr(textCol))
      .withColumn("is_canonical", col(idCol) === min(col(idCol)).over(w))
  }

  /** The normalized-text fingerprint EXPRESSION of [[fingerprint]] /
    * [[fingerprintCanonical]], factored so stored fingerprint indexes
    * ([[graft.streaming.CurateIngest]]) are keyed by the exact same
    * bytes as the in-query operators — a drifted normalization would
    * silently stop deduplicating, not fail.
    */
  def fpExpr(textCol: String): org.apache.spark.sql.Column =
    md5(trim(regexp_replace(lower(col(textCol)), "[^a-z0-9]+", " ")))

  /** One canonical row (min id) per normalized-text fingerprint — the
    * pipeline form of [[fingerprint]] for consumers that only need the
    * SURVIVORS: a single `min_by` hash-aggregate, partial-aggregated
    * map-side, so the exchange carries one candidate row per (fingerprint,
    * map partition) instead of sorting every duplicate row through the
    * window [[fingerprint]] uses. Same survivor set as
    * `fingerprint(...).filter(is_canonical)` (ids are unique, so `min_by`
    * is deterministic); all input columns pass through.
    */
  def fingerprintCanonical(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val cols = docs.columns
    docs.withColumn("__fp", fpExpr(textCol))
      .groupBy(col("__fp"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("__row"))
      .select(cols.map(c => col(s"__row.`$c`").as(c)): _*)
  }

  /** MinHash permutation constants: `mh_i = min((a_i·h + b_i) mod P)` over
    * per-shingle base hashes `h = h60(shingle) mod P`, P = 2³¹−1 (Mersenne).
    * One md5 per shingle instead of k; the k permutations are codegen'd
    * integer arithmetic. Operands stay < 2⁶² — no BIGINT overflow, and `%`
    * on non-negatives is identical in Spark and DuckDB.
    */
  val MinhashP: Long = 2147483647L
  def minhashCoeffs(k: Int): Seq[(Long, Long)] =
    (0 until k).map(i => (2L * i + 1, 7919L * (i + 1)))

  /** One row per word-3-gram shingle, built WITHOUT a window and WITHOUT
    * higher-order array functions: the trimmed token array is zipped with
    * its own 1- and 2-shifted slices (`arrays_zip`/`slice` — plain
    * codegen'd expressions), so shingle rows flow scan → explode →
    * consumer as a pure NARROW pipeline. The earlier window-`lead` form
    * shuffled and sorted every (doc, pos, token) row first — measured as
    * the dominant cost of the whole MinHash query; this form's only wide
    * stage is whatever aggregation the consumer adds. (A per-token HOF
    * lambda would also be ~10× interpreted overhead — still avoided.)
    *
    * Semantics identical to [[graft.functions.TextFns.shingles3]] over
    * [[graft.functions.TextFns.tokens]]: `wsNorm` collapses all whitespace
    * runs to single spaces and trims the edges, so the plain-space split
    * is empty-free for any input (tab/newline-edged included); docs of 1–2
    * tokens collapse to one whole-text shingle (`concat_ws` skips the null
    * tail fields), blank docs emit nothing.
    */
  def shingleRows(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol), explode(shingleArr(textCol)).as("z"))
      .select(col(idCol), concat_ws(" ", col("z.t0"), col("z.t1"), col("z.t2")).as("s"))

  /** The shared word-3-gram shingle ARRAY expression behind
    * [[shingleRows]] / [[shinglePosRows]] (struct-of-slices, zero
    * per-token lambdas — see [[shingleRows]] for why).
    */
  private def shingleArr(textCol: String): Column = {
    val t = wsNorm(col(textCol))
    val toks = split(t, " ")
    val n = size(toks)
    val shingleStruct = "array<struct<t0:string,t1:string,t2:string>>"
    val zipped = arrays_zip(
      slice(toks, lit(1), n - 2).as("t0"),
      slice(toks, lit(2), n - 2).as("t1"),
      slice(toks, lit(3), n - 2).as("t2"))
    val fallback = array(struct(
      array_join(toks, " ").as("t0"),
      lit(null).cast("string").as("t1"),
      lit(null).cast("string").as("t2")))
    when(t === "", expr(s"CAST(array() AS $shingleStruct)"))
      .when(n >= 3, zipped)
      .otherwise(fallback)
  }

  /** [[shingleRows]] with the shingle's 1-based TOKEN POSITION — the
    * positional form the span-level dedup family needs (shingle at `pos`
    * covers tokens `pos .. pos+2`). Same normalization/fallback contract
    * as [[shingleRows]]; still a narrow scan→posexplode pipeline.
    */
  def shinglePosRows(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol), posexplode(shingleArr(textCol)).as(Seq("p0", "z")))
      .select(col(idCol), (col("p0") + 1).cast("long").as("pos"),
        concat_ws(" ", col("z.t0"), col("z.t1"), col("z.t2")).as("s"))

  /** MinHash signatures via shingle rows + ONE hash-aggregate: all k
    * permuted minima are plain `min` aggregates, partial-aggregated map-side
    * (the shuffle carries k longs per doc, never shingles).
    */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val exploded = shingleRows(docs, textCol, idCol)
      .select(col(idCol), (h60(col("s")) % MinhashP).as("h"))
    val mins = minhashCoeffs(k).zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % MinhashP).as(s"mh$i")
    }
    exploded.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** Per-doc LSH band buckets as `(id, band, bucket)` ROWS — the STORED
    * form of the near-dup index. A production pipeline materializes this
    * at ingest (partitioned/bucketed by `(band, bucket)`), so later
    * batches dedup against the corpus via [[minhashPairsIncremental]]
    * without ever rescanning corpus text.
    */
  def bandBuckets(
      docs: DataFrame, textCol: String, idCol: String, k: Int, bands: Int): DataFrame = {
    // bands > k would make r = 0 (every doc hashes md5("") in every band —
    // the whole corpus one bucket); k % bands != 0 silently ignores the
    // trailing signature hashes. Both are config mistakes, not data states.
    require(bands > 0 && k >= bands && k % bands == 0,
      s"minhash k must be a positive multiple of bands, got k=$k bands=$bands")
    val r = k / bands
    val sig = minhashSignatures(docs, textCol, idCol, k)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",", (0 until r).map(j => col(s"mh${b * r + j}").cast("string")): _*))
          .as("bucket"))
    }
    sig
      .select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** One row per multi-member LSH bucket: `(band, bucket, ids)` with ids
    * sorted ascending, from [[bandBuckets]] rows. Shared by
    * [[minhashPairs]] (candidate generation), [[minhashPairsIncremental]],
    * and [[oversizedBuckets]] (skew diagnostics).
    */
  private def groupMembers(bb: DataFrame, idCol: String): DataFrame =
    bb.groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")) > 1)

  private def lshBucketMembers(
      docs: DataFrame, textCol: String, idCol: String, k: Int, bands: Int): DataFrame =
    groupMembers(bandBuckets(docs, textCol, idCol, k, bands), idCol)

  /** Skew diagnostic: the (band, bucket) groups larger than `maxBucket`,
    * i.e. the ones [[minhashPairs]] chain-paired instead of all-paired.
    * A large-scale run logs/side-outputs this before trusting near-dup
    * recall on a boilerplate-heavy corpus.
    */
  def oversizedBuckets(
      docs: DataFrame, textCol: String, idCol: String,
      k: Int, bands: Int, maxBucket: Int): DataFrame =
    lshBucketMembers(docs, textCol, idCol, k, bands)
      .filter(size(col("ids")) > maxBucket)
      .select(col("band"), col("bucket"), size(col("ids")).as("n_members"))

  /** MinHash+LSH near-dup pairs: band the signature, self-join on
    * (band, bucket) for candidates, then verify exact shingle-set Jaccard.
    *
    * Scale shape: signatures are one aggregation of (id, hash) pairs; the
    * candidate join shuffles only `(band, bucket, id)`; shingle arrays are
    * joined back by id for candidate pairs only — the document text never
    * rides a shuffle. Output: (id_a < id_b, jacc_pct ≥ `minJaccPct`).
    *
    * Skew guard: a degenerate (band, bucket) group — boilerplate-heavy or
    * dup-heavy corpus — would emit |bucket|² pairs, the classic LSH
    * quadratic blowup. Buckets larger than `maxBucket` fall back to CHAIN
    * pairing (each id paired with its successor in sorted order): O(n)
    * pairs that keep every member of the cluster connected, so a
    * connected-components pass ([[Curation.connectedComponents]]) still
    * recovers the full dup group. [[oversizedBuckets]] reports which
    * buckets overflowed.
    */
  def minhashPairs(
      docs: DataFrame, textCol: String, idCol: String,
      k: Int, bands: Int, minJaccPct: Int, maxBucket: Int = 64): DataFrame = {
    // pair generation per bucket via collect_list + ONE explode rather than
    // a self-join or a two-branch union: the signature subtree is evaluated
    // ONCE (self-joins and union branches each materialize it separately —
    // no exchange reuse), and only multi-member buckets survive to the pair
    // stage. The pair array is built with higher-order functions, which is
    // fine HERE: they run per bucket row (thousands), not per document or
    // per shingle — off the hot path, the interpreted cost is noise.
    val grouped = lshBucketMembers(docs, textCol, idCol, k, bands)
    // MATERIALIZED (localCheckpoint): candidate pairs are bounded by the
    // banding + skew cap — orders of magnitude smaller than the corpus —
    // and the verify consumes them TWICE (member broadcast + the corpus
    // semi filter below); without the checkpoint each consumer would
    // replay the whole signature/banding pipeline, and downstream
    // connected-components passes would replay it again per direction.
    val cand = candidatePairs(grouped, maxBucket).localCheckpoint(true)
    // Exact-Jaccard verification WITHOUT array ops: |A∩B| is counted over
    // (id, shingle) ROWS, |A∪B| = |A|+|B|−|A∩B|. Everything is
    // codegen'd joins/aggregations — the array-based verify (intersect/
    // union per pair) is interpreted and measured 30× slower on dup-heavy
    // corpora. Candidate pairs explode into their two members so the
    // shingle subtree joins ONCE (a per-side join would evaluate it twice —
    // self-referencing branches don't share exchanges); hasA·hasB per
    // (pair, shingle) marks the intersection, and the per-pair rollup
    // recovers |A| and |B| in the same aggregation. Shingles ride as
    // 60-bit hashes, not strings — an 8-byte key through the verify
    // shuffles instead of the shingle text (the oracle hashes its shingle
    // sets with the same md5 fold, so counts stay bit-identical;
    // within-pair hash collisions are ≪1e-9 at any real document size).
    //
    // Scale shape of the verify: the member side is BROADCAST — candidate
    // pairs are bounded by the banding (and the skew cap), orders of
    // magnitude smaller than the corpus — so the full shingle stream stays
    // a NARROW scan→explode pipeline: no corpus-wide distinct, no
    // corpus-wide join shuffle. Repeated (id, shingle) rows need no
    // pre-distinct; the per-(pair, shingle) max/min aggregation absorbs
    // duplicates, and only rows surviving the broadcast join (candidate
    // members only) reach that shuffle.
    // Push the member filter BELOW the shingle explode: only candidate-
    // member docs can survive the broadcast join, so the second corpus
    // pass semi-joins on doc id FIRST (same bounded broadcast set) and
    // explodes/hashes only the member docs — on a typical corpus that
    // skips ~90% of the verify pass's shingle+md5 work, with the identical
    // narrow scale shape.
    verifyJaccard(docs, cand, textCol, idCol, minJaccPct)
  }

  /** Flatten multi-member buckets into distinct candidate pairs with the
    * skew cap (oversized buckets chain-pair; see [[minhashPairs]]).
    */
  private def candidatePairs(grouped: DataFrame, maxBucket: Int): DataFrame = {
    val pairStructs = when(size(col("ids")) <= maxBucket,
      expr("flatten(transform(sequence(1, size(ids) - 1), i -> " +
        "transform(sequence(0, i - 1), j -> named_struct('a', ids[j], 'b', ids[i]))))"))
      .otherwise(expr(
        "transform(sequence(1, size(ids) - 1), i -> named_struct('a', ids[i - 1], 'b', ids[i]))"))
    grouped
      .select(explode(pairStructs).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct()
  }

  /** Exact-Jaccard verification of candidate pairs (see the scale-shape
    * notes in [[minhashPairs]]: member set broadcast, corpus side stays a
    * narrow semi-filtered scan→explode pipeline, 8-byte hashes shuffle).
    */
  private def verifyJaccard(docs: DataFrame, cand: DataFrame,
      textCol: String, idCol: String, minJaccPct: Int): DataFrame = {
    val memberIds = cand
      .select(explode(array(col("id_a"), col("id_b"))).as(idCol))
      .distinct()
    val srd = shingleRows(
        docs.join(broadcast(memberIds), Seq(idCol), "left_semi"), textCol, idCol)
      .select(col(idCol).as("__mid"), h60(col("s")).as("s"))
    val members = cand.select(col("id_a"), col("id_b"),
      explode(array(
        struct(col("id_a").as("__mid"), lit(1).as("isA")),
        struct(col("id_b").as("__mid"), lit(0).as("isA")))).as("m"))
      .select(col("id_a"), col("id_b"), col("m.__mid").as("__mid"), col("m.isA").as("isA"))
    srd.join(broadcast(members), Seq("__mid"))
      .groupBy(col("id_a"), col("id_b"), col("s"))
      .agg(max(col("isA")).as("hasA"), (lit(1) - min(col("isA"))).as("hasB"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("hasA") * col("hasB")).as("inter"),
        sum(col("hasA")).as("na"), sum(col("hasB")).as("nb"))
      .select(col("id_a"), col("id_b"),
        expr("(100 * inter) DIV (na + nb - inter)").as("jacc_pct"))
      .filter(col("jacc_pct") >= minJaccPct)
  }

  /** EXACT set-similarity JOIN via PREFIX FILTERING (the PPJoin/AllPairs
    * family, Bayardo et al. 2007 / Xiao et al. 2008): ALL pairs of docs
    * whose shingle-set Jaccard clears `minJaccPct` — exact, unlike
    * [[minhashPairs]] (whose banding can miss a true pair), without the
    * all-pairs join ([[Similarity.blockedNearDup]]'s Σ|block|²).
    *
    * The filter: order every doc's distinct shingles by a GLOBAL total
    * order (corpus document frequency ascending, hash tiebreak — rarest
    * first), and keep each doc's first `n - ⌈t·n/100⌉ + 1` shingles as its
    * PREFIX. Any pair with `jacc_pct ≥ t` must satisfy
    * `|∩| ≥ ⌈t·n/100⌉` on each side (from `100·i ≥ t·(n_a+n_b−i)` and
    * `i ≤ n_b`), and two sets whose intersection is that large MUST share
    * a prefix element — so the equi-join of prefixes on the shingle hash
    * finds every qualifying pair, and the exact verify
    * ([[verifyJaccard]], shared with the LSH path) discards the rest.
    *
    * Scale shape: one df aggregation (8-byte keys), one per-doc window
    * sort of shingle hashes, then the candidate join touches only PREFIX
    * rows — `(1 − t/100)·‖shingles‖` of the corpus, each bucket sized by
    * a token's df RANK not its raw frequency (the rarest-first order is
    * what keeps frequent-shingle buckets out of the join: a corpus-wide
    * boilerplate shingle ranks LAST inside every doc and never enters a
    * prefix unless the doc is nearly all boilerplate). The verify reads
    * text only for candidate members via the broadcast semi-filter.
    *
    * Exactness caveat: "exact" means exact over the 60-BIT-HASHED shingle
    * domain (the repo-wide h60 convention — the oracle hashes its shingle
    * sets with the identical md5 fold, so cross-engine checks agree by
    * construction). A within-pair h60 collision can inflate a Jaccard
    * across the threshold; at real document sizes (≤10⁶ distinct shingles
    * per doc) the per-pair probability is ≪1e-9. Consumers needing
    * exactness over raw shingle STRINGS swap `h60` for `md5` in
    * [[shingleRows]]'s consumers at 2× shuffle width.
    */
  def similarityJoin(docs: DataFrame, textCol: String, idCol: String,
                     minJaccPct: Int, maxSetSize: Int = 1 << 20): DataFrame = {
    require(minJaccPct > 0 && minJaccPct <= 100,
      s"minJaccPct must be in 1..100, got $minJaccPct")
    // ONE shingle subtree end to end: df is a WINDOW count over the
    // distinct (id, h) rows (a join against a separate df aggregate plans
    // the whole shingle pipeline twice — no exchange reuse; same fix as
    // tfidf), and candidates come from collect_list-per-h + pair explode
    // (a prefix self-join would again duplicate the two-window pipeline).
    // No skew cap here — exactness is the contract (the rarest-first
    // order is the skew guard: a corpus-wide shingle enters prefixes only
    // for docs that are nearly all boilerplate).
    val sh = shingleRows(docs, textCol, idCol)
      .select(col(idCol), h60(col("s")).as("h"))
      .distinct()
    val wH = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("df"), col("h"))
    val wN = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
    val prefix = sh
      .withColumn("df", count(lit(1)).over(wH))
      .withColumn("p", row_number().over(wDoc).cast("long"))
      .withColumn("n", count(lit(1)).over(wN))
      .filter(col("p") <= col("n") - expr(s"($minJaccPct * n + 99) DIV 100") + 1)
      .select(col(idCol), col("h"), col("p"), col("n"))
    // PPJoin's two verify-free prunes run BEFORE any text is touched —
    // on a self-similar corpus the prefix join alone is weak (measured
    // 430k candidates for 25 true pairs at t=50, sf0.1) and the verify
    // pays per candidate-member shingle:
    //  - LENGTH: jacc ≤ min(n_a,n_b)/max(n_a,n_b), so 100·min ≥ t·max;
    //  - POSITIONAL: if a shared prefix element sits at ranks
    //    (p_a, p_b), the overlap can't exceed 1 + min(n_a−p_a, n_b−p_b),
    //    which must reach ⌈t·(n_a+n_b)/(100+t)⌉ (the minimum overlap the
    //    integer-DIV predicate admits).
    // Both prunes are applied INSIDE pair generation (r18, §2.3): a pair
    // is emitted at hash h only if the bounds hold AT h, so pruned pairs
    // never reach the dedup group-by exchange at all — the r17 form
    // emitted every co-prefix pair (the ~430k above), min-aggregated
    // positions, and filtered after; the rows entering the exchange now
    // are only the prune survivors (~125k here — measured the same
    // final candidate set as the old post-agg filters, i.e. the prunes
    // are equivalent on this fixture, just earlier and over narrower
    // rows; GRAFT_CAND_STATS logs the count). Exactness: a true pair
    // passes the positional bound at its FIRST-match h (the textbook
    // PPJoin filter), so keeping any pair that passes at ≥1 shared hash
    // is a candidate SUPERSET of the true pairs; the exact verify below
    // unchanged.
    val prunePred = s"least(ms[j].n, ms[i].n) * 100 >= greatest(ms[j].n, ms[i].n) * $minJaccPct " +
      s"AND 1 + least(ms[j].n - ms[j].p, ms[i].n - ms[i].p) >= " +
      s"($minJaccPct * (ms[j].n + ms[i].n) + ${100 + minJaccPct - 1}) DIV ${100 + minJaccPct}"
    val pairStructs = expr("flatten(transform(sequence(1, size(ms) - 1), " +
      s"i -> transform(filter(sequence(0, i - 1), j -> $prunePred), " +
      "j -> named_struct('a', ms[j], 'b', ms[i]))))")
    val cand = prefix.groupBy(col("h"))
      .agg(sort_array(collect_list(struct(col(idCol).as("id"), col("p"), col("n")))).as("ms"))
      .filter(size(col("ms")) > 1)
      .select(explode(pairStructs).as("pr"))
      // na/nb ride into the verify: they ARE the members' exact distinct-
      // shingle counts, so the spill guard routes on a filter over this
      // (checkpointed) frame instead of any extra scan (positions are
      // spent — the prunes already ran per hash)
      .select(col("pr.a.id").as("id_a"), col("pr.b.id").as("id_b"),
        col("pr.a.n").as("na"), col("pr.b.n").as("nb"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(min("na").as("na"), min("nb").as("nb"))
      // MATERIALIZED (lazily — the verify's first consumer materializes
      // the blocks in its own job, r18 §2.6): the verify consumes
      // candidates twice; without the checkpoint each consumer replays
      // the whole prefix pipeline
      .localCheckpoint(false)
    verifyJaccardArrays(docs, logCandStats("similarityJoin", cand),
      textCol, idCol, minJaccPct, maxSetSize)
  }

  /** Array-set verify, NOT the exploded-row verify of [[verifyJaccard]]:
    * prefix candidates on a self-similar corpus run 1000× the true-pair
    * count (125k for 25 at t=50, sf0.1), and the exploded form ships
    * every member's shingles once PER PAIR through two aggregations
    * (~14M rows there). Joining the pairs to per-member sorted hash SETS
    * ships each member's array once per join and does the intersect as
    * narrow per-row work — measured 2× faster at that candidate:pair
    * ratio. (minhashPairs keeps the exploded verify: banding emits few,
    * dup-heavy candidates, where per-pair array ops measured 30× slower.)
    *
    * SPILL GUARD (`maxSetSize`): a pathological member — millions of
    * distinct shingles — would ride the candidate joins as one enormous
    * array row, copied once per candidate pair it appears in (a big doc in
    * 100 pairs = 100 copies through the exchange): the memory hazard is
    * the JOIN amplification, not the per-doc agg (which spills via the
    * sort-based object-agg fallback like any grouped state). Pairs with a
    * member over the cap are routed to the EXPLODED-row verify instead —
    * exactness preserved (both verifies compute the identical Jaccard
    * over h60 sets), memory stays O(rows). Routing is FREE: candidate
    * rows arrive carrying `na`/`nb` — the members' exact distinct-shingle
    * counts, already computed by the prefix pipeline — so the oversized
    * check is one narrow filter over the (checkpointed) candidate frame:
    * no extra scan, no extra subtree, and the common no-oversized-member
    * case runs the IDENTICAL plan it always did. (Earlier guard variants
    * that re-derived sizes — set materialization, token-count scan —
    * measured +0.5–1.5 s per query with zero oversized members.)
    */
  private def verifyJaccardArrays(docs: DataFrame, cand: DataFrame,
      textCol: String, idCol: String, minJaccPct: Int,
      maxSetSize: Int = 1 << 20): DataFrame = {
    def arrayVerify(c: DataFrame): DataFrame = {
      val mids = c.select(explode(array(col("id_a"), col("id_b"))).as(idCol)).distinct()
      val sets = shingleRows(
          docs.join(broadcast(mids), Seq(idCol), "left_semi"), textCol, idCol)
        .select(col(idCol), h60(col("s")).as("h"))
        .groupBy(col(idCol)).agg(array_sort(collect_set(col("h"))).as("hs"))
      c.join(sets.select(col(idCol).as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
        .join(sets.select(col(idCol).as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("hs_a"), col("hs_b"))).cast("long").as("i"),
          size(col("hs_a")).cast("long").as("na"), size(col("hs_b")).cast("long").as("nb"))
        .select(col("id_a"), col("id_b"),
          expr("(100 * i) DIV (na + nb - i)").as("jacc_pct"))
        .filter(col("jacc_pct") >= minJaccPct)
    }
    val isBig = col("na") > maxSetSize || col("nb") > maxSetSize
    val bigCand = cand.filter(isBig).select(col("id_a"), col("id_b"))
    if (bigCand.isEmpty) arrayVerify(cand.select(col("id_a"), col("id_b")))
    else
      arrayVerify(cand.filter(!isBig).select(col("id_a"), col("id_b")))
        .unionByName(verifyJaccard(docs, bigCand, textCol, idCol, minJaccPct))
  }

  /** EXACT set-CONTAINMENT join — the ASYMMETRIC cousin of
    * [[similarityJoin]]: ordered pairs `(a, b)`, `a ≠ b`, where
    * `(100·|Sa∩Sb|) DIV |Sa| ≥ minContPct` ("a's shingles are mostly
    * inside b"). This finds embedded/subsumed documents that symmetric
    * Jaccard structurally misses: a 200-shingle wire story pasted into a
    * 10,000-shingle article has jacc ≈ 2% but containment 100% — the
    * dedup case where the SHORT copy should yield to the superset doc.
    *
    * Prefix filter, containment form (Xiao et al. 2008's generalization
    * to overlap constraints that reference one side only): a qualifying
    * pair shares `o_a = ⌈t·n_a/100⌉` elements, and they cannot all avoid
    * a's rarest-first prefix of `n_a − o_a + 1` elements — the
    * complement holds only `o_a − 1` slots (pigeonhole). b contributes
    * NO prefix — the threshold never
    * references `n_b` — so the candidate join is prefix(a) ⋈ FULL(b) on
    * the shingle hash: the full side shuffles once (16-byte rows) and
    * the skew guard is the a-side (a corpus-frequent shingle ranks LAST
    * in every doc's rarest-first order and enters ~no prefixes, so
    * high-df hashes meet almost no a-rows at the join). Before any text
    * is read, two exact prunes (as in [[similarityJoin]]):
    *  - LENGTH: `|A∩B| ≤ n_b` ⇒ `n_b ≥ o_a`;
    *  - POSITIONAL: first shared element at a-rank `p_a` / b-rank `q_b`
    *    bounds the overlap by `1 + min(n_a − p_a, n_b − q_b) ≥ o_a`
    *    (component-wise mins across shared hashes only relax it).
    * Exactness is over the h60-hashed shingle domain, the same contract
    * (and caveat) as [[similarityJoin]].
    */
  def containmentJoin(docs: DataFrame, textCol: String, idCol: String,
                      minContPct: Int, maxSetSize: Int = 1 << 20): DataFrame = {
    require(minContPct > 0 && minContPct <= 100,
      s"minContPct must be in 1..100, got $minContPct")
    val sh = shingleRows(docs, textCol, idCol)
      .select(col(idCol), h60(col("s")).as("h"))
      .distinct()
    val wH = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("df"), col("h"))
    val wN = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
    // ranked ONCE, materialized ONCE: unlike similarityJoin (whose two
    // sides are both prefix rows of one frame), the two join sides here
    // differ (prefix vs full), so without the checkpoint each side would
    // replay the whole df+rank window pipeline
    val ranked = sh
      .withColumn("df", count(lit(1)).over(wH))
      .withColumn("p", row_number().over(wDoc).cast("long"))
      .withColumn("n", count(lit(1)).over(wN))
      .select(col(idCol), col("h"), col("p"), col("n"))
      .localCheckpoint(false) // lazy: the candidate join materializes it (r18 §2.6)
    val prefA = ranked
      .filter(col("p") <= col("n") - expr(s"($minContPct * n + 99) DIV 100") + 1)
      .select(col(idCol).as("id_a"), col("h"), col("p").as("pa"), col("n").as("na"))
    val fullB = ranked
      .select(col(idCol).as("id_b"), col("h"), col("p").as("qb"), col("n").as("nb"))
    // both prunes run PER HASH ROW, above the pair group-by (r18, §2.3):
    // the length bound references only the per-doc constants na/nb, and
    // the positional bound holds at a true pair's first-match h (the
    // PPJoin filter), so filtering each joined row and keeping pairs
    // that survive at ≥1 shared hash is still a candidate superset —
    // while pruned rows never reach the (id_a, id_b) exchange at all
    val cand = prefA.join(fullB, Seq("h"))
      .filter(col("id_a") =!= col("id_b"))
      .filter(col("nb") >= expr(s"($minContPct * na + 99) DIV 100"))
      .filter(lit(1) + least(col("na") - col("pa"), col("nb") - col("qb")) >=
        expr(s"($minContPct * na + 99) DIV 100"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(min("na").as("na"), min("nb").as("nb"))
      .localCheckpoint(false) // lazy: the verify's first job materializes
    verifyContainmentArrays(docs, logCandStats("containmentJoin", cand),
      textCol, idCol, minContPct, maxSetSize)
  }

  /** Containment twin of [[verifyJaccardArrays]] — identical array-set
    * mechanics and spill-guard routing; only the final score differs:
    * `(100·i) DIV n_a`, emitted as `cont_pct`.
    */
  private def verifyContainmentArrays(docs: DataFrame, cand: DataFrame,
      textCol: String, idCol: String, minContPct: Int,
      maxSetSize: Int): DataFrame = {
    def arrayVerify(c: DataFrame): DataFrame = {
      val mids = c.select(explode(array(col("id_a"), col("id_b"))).as(idCol)).distinct()
      val sets = shingleRows(
          docs.join(broadcast(mids), Seq(idCol), "left_semi"), textCol, idCol)
        .select(col(idCol), h60(col("s")).as("h"))
        .groupBy(col(idCol)).agg(array_sort(collect_set(col("h"))).as("hs"))
      c.join(sets.select(col(idCol).as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
        .join(sets.select(col(idCol).as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("hs_a"), col("hs_b"))).cast("long").as("i"),
          size(col("hs_a")).cast("long").as("na"))
        .select(col("id_a"), col("id_b"),
          expr("(100 * i) DIV na").as("cont_pct"))
        .filter(col("cont_pct") >= minContPct)
    }
    val isBig = col("na") > maxSetSize || col("nb") > maxSetSize
    val bigCand = cand.filter(isBig).select(col("id_a"), col("id_b"))
    if (bigCand.isEmpty) arrayVerify(cand.select(col("id_a"), col("id_b")))
    else
      arrayVerify(cand.filter(!isBig).select(col("id_a"), col("id_b")))
        .unionByName(verifyContainmentExploded(docs, bigCand, textCol, idCol, minContPct))
  }

  /** Containment twin of [[verifyJaccard]] (the exploded-row spill path). */
  private def verifyContainmentExploded(docs: DataFrame, cand: DataFrame,
      textCol: String, idCol: String, minContPct: Int): DataFrame = {
    val memberIds = cand
      .select(explode(array(col("id_a"), col("id_b"))).as(idCol))
      .distinct()
    val srd = shingleRows(
        docs.join(broadcast(memberIds), Seq(idCol), "left_semi"), textCol, idCol)
      .select(col(idCol).as("__mid"), h60(col("s")).as("s"))
    val members = cand.select(col("id_a"), col("id_b"),
      explode(array(
        struct(col("id_a").as("__mid"), lit(1).as("isA")),
        struct(col("id_b").as("__mid"), lit(0).as("isA")))).as("m"))
      .select(col("id_a"), col("id_b"), col("m.__mid").as("__mid"), col("m.isA").as("isA"))
    srd.join(broadcast(members), Seq("__mid"))
      .groupBy(col("id_a"), col("id_b"), col("s"))
      .agg(max(col("isA")).as("hasA"), (lit(1) - min(col("isA"))).as("hasB"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("hasA") * col("hasB")).as("inter"), sum(col("hasA")).as("na"))
      .select(col("id_a"), col("id_b"),
        expr("(100 * inter) DIV na").as("cont_pct"))
      .filter(col("cont_pct") >= minContPct)
  }

  /** The similarity-join index pair a production ingest stores beside the
    * corpus: the df DICTIONARY (h → corpus document frequency; 8-byte keys
    * + a count — the global total order every prefix is computed under).
    */
  def shingleDfTable(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    shingleRows(docs, textCol, idCol)
      .select(col(idCol), h60(col("s")).as("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))

  /** Prefix rows `(id, h, p, n)` of `docs` under a FIXED df order (the
    * stored dictionary) — the second stored half of the similarity index,
    * and what an incoming batch computes for itself at probe time. Hashes
    * absent from the dictionary order as df = 0 (rarest — correct: a
    * never-seen shingle is maximally selective). The prefix-filter
    * theorem needs only a CONSISTENT total order, not the current one, so
    * prefixes computed under a corpus-epoch order stay EXACT as dfs
    * drift; df-ascending is purely the performance heuristic.
    *
    * `batchLocal = true` (the PROBE path — `docs` is a batch, `dfTable`
    * the corpus-scale stored dictionary): the dictionary is first
    * broadcast-semi-filtered down to the batch's own hash set, so the
    * df lookup never shuffles corpus-scale data — without it the left
    * join sort-merges the full dictionary per probe (measured as the
    * dominant probe cost: the probe ran SLOWER than the from-scratch
    * join it exists to avoid). The filtered dictionary is bounded by
    * the batch's distinct-shingle count, the same size class as the
    * `touched` sets the probe already broadcasts, so it broadcasts too
    * and the lookup is shuffle-free. Leave `false` when `docs` IS the
    * corpus (index build / dictionary refresh) — there the "filtered"
    * dictionary would be corpus-sized and must not broadcast.
    */
  def prefixRows(docs: DataFrame, dfTable: DataFrame,
                 textCol: String, idCol: String, minJaccPct: Int,
                 batchLocal: Boolean = false): DataFrame = {
    val sh = shingleRows(docs, textCol, idCol)
      .select(col(idCol), h60(col("s")).as("h")).distinct()
    val dfSide =
      if (batchLocal) {
        val touchedH = sh.select(col("h")).distinct()
        broadcast(dfTable.join(broadcast(touchedH), Seq("h"), "left_semi"))
      } else dfTable
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("df"), col("h"))
    val wN = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
    sh.join(dfSide, Seq("h"), "left")
      .na.fill(0L, Seq("df"))
      .withColumn("p", row_number().over(wDoc).cast("long"))
      .withColumn("n", count(lit(1)).over(wN))
      .filter(col("p") <= col("n") - expr(s"($minJaccPct * n + 99) DIV 100") + 1)
      .select(col(idCol), col("h"), col("p"), col("n"))
  }

  /** Build BOTH halves of the similarity index — `(prefix rows, df
    * dictionary)` — from ONE materialized shingle pass: separate
    * [[prefixRows]] + [[shingleDfTable]] calls would each replay the full
    * corpus shingle+hash+distinct pipeline (measured ~1.5× the whole
    * incremental-join cost at sf0.1). A production ingest writes the two
    * frames as two sinks of the same scan; the checkpoint plays the store
    * here. Order consistency is by construction: the df the prefixes are
    * ranked under IS the returned dictionary.
    */
  def similarityIndex(docs: DataFrame, textCol: String, idCol: String,
                      minJaccPct: Int): (DataFrame, DataFrame) = {
    val sh = shingleRows(docs, textCol, idCol)
      .select(col(idCol), h60(col("s")).as("h")).distinct()
      .localCheckpoint(true)
    val dfT = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("df"), col("h"))
    val wN = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
    val prefix = sh.join(dfT, Seq("h"))
      .withColumn("p", row_number().over(wDoc).cast("long"))
      .withColumn("n", count(lit(1)).over(wN))
      .filter(col("p") <= col("n") - expr(s"($minJaccPct * n + 99) DIV 100") + 1)
      .select(col(idCol), col("h"), col("p"), col("n"))
    (prefix, dfT)
  }

  /** INCREMENTAL exact similarity join: every pair with shingle-Jaccard ≥
    * `minJaccPct` that TOUCHES the incoming batch, without recomputing the
    * corpus's prefixes — the [[similarityJoin]] analog of
    * [[minhashPairsIncremental]]. The corpus contributes only its STORED
    * index ([[prefixRows]] + [[shingleDfTable]], written once at ingest);
    * the batch computes its own prefixes UNDER THE STORED ORDER (see
    * [[prefixRows]] — exactness is order-independent), only corpus prefix
    * rows in batch-touched hashes are read back (broadcast semi-probe;
    * partition-prunable when the index is laid out by hash range), and
    * the PPJoin filters + exact verify run on that union. Corpus TEXT is
    * read only for verified-candidate members.
    *
    * Result contract: exactly [[similarityJoin]] over (corpus ∪ incoming)
    * restricted to pairs with at least one incoming side — both runs are
    * candidate-superset + exact-verify, so the (possibly different)
    * candidate sets converge to identical results (spec-pinned).
    *
    * `batchLocal` (default true — see [[prefixRows]]): keep it true when
    * `corpusDf` is a STORED dictionary (cheap scan, expensive shuffle);
    * pass false when the dictionary is built in the same query as
    * `corpusPrefix` — the broadcast path has no exchange to reuse, so it
    * recomputes the shared shingle-agg subtree and the "optimization"
    * costs more than the sort-merge it replaces (measured: the in-query
    * q_simjoin_incr regressed 4.2→5.3 s under forced batchLocal).
    */
  def similarityJoinIncremental(
      corpusPrefix: DataFrame, corpusDf: DataFrame,
      corpus: DataFrame, incoming: DataFrame,
      textCol: String, idCol: String, minJaccPct: Int,
      partitionMod: Int = 0, maxSetSize: Int = 1 << 20,
      batchLocal: Boolean = true): DataFrame = {
    // MATERIALIZED: consumed up to three times (touched-set distinct, the
    // partitionMod mods collect, and the probe union) — without the
    // checkpoint each consumer replays the batch's shingle+window pipeline
    val batchPrefix = prefixRows(incoming, corpusDf, textCol, idCol, minJaccPct,
        batchLocal = batchLocal)
      .withColumn("isB", lit(1))
      .localCheckpoint(true)
    val touched = batchPrefix.select(col("h")).distinct()
    // `partitionMod > 0`: the stored index is laid out partitioned by
    // `hmod = pmod(h, partitionMod)` (Sinks.writePartitioned), and the
    // probe prunes to the touched mod classes with a STATIC isin — the
    // touched class set is bounded by the modulus (≤ partitionMod driver-
    // side longs, never data-scale), so the partition filter is plan-time
    // deterministic rather than hoping DPP fires. Plan-pinned: the index
    // scan reads only the touched partitions.
    val corpusSide =
      if (partitionMod > 0) {
        val mods = batchPrefix
          .select(pmod(col("h"), lit(partitionMod.toLong)).as("hmod"))
          .distinct().collect().map(_.getLong(0))
        corpusPrefix.filter(col("hmod").isin(mods: _*))
          .select(col(idCol), col("h"), col("p"), col("n"))
      } else corpusPrefix
    val relevant = corpusSide
      .join(broadcast(touched), Seq("h"), "left_semi")
      .withColumn("isB", lit(0))
      .unionByName(batchPrefix)
    // Batch-touching pairs generated DIRECTLY — each batch member pairs
    // with every other member (batch-batch pairs once, via the id-order
    // guard), so a touched bucket with 1 batch and k corpus members costs
    // k pairs, not the (k+1)k/2 of an all-pairs explode filtered after
    // the fact — the difference between linear and quadratic on a skewed
    // boilerplate bucket. The LENGTH + POSITIONAL prunes run INSIDE the
    // generation lambda (r18, §2.3 — see [[similarityJoin]]'s prunePred
    // for the exactness argument: both bounds are symmetric in the pair,
    // and a true pair passes at its first-match hash), so pruned pairs
    // never reach the dedup group-by exchange.
    val prunePred = s"least(m.n, b.n) * 100 >= greatest(m.n, b.n) * $minJaccPct " +
      s"AND 1 + least(m.n - m.p, b.n - b.p) >= " +
      s"($minJaccPct * (m.n + b.n) + ${100 + minJaccPct - 1}) DIV ${100 + minJaccPct}"
    val pairStructs = expr(
      "flatten(transform(filter(ms, x -> x.isB = 1), b -> " +
        "transform(filter(ms, m -> (m.id < b.id OR (m.isB = 0 AND m.id > b.id)) " +
        s"AND $prunePred), m -> " +
        "named_struct('a', CASE WHEN m.id < b.id THEN m ELSE b END, " +
        "'b', CASE WHEN m.id < b.id THEN b ELSE m END))))")
    val cand = relevant.groupBy(col("h"))
      .agg(collect_list(
        struct(col(idCol).as("id"), col("p"), col("n"), col("isB"))).as("ms"))
      .filter(size(col("ms")) > 1)
      .select(explode(pairStructs).as("pr"))
      // na/nb ride along for the verify's free-filter spill routing
      .select(col("pr.a.id").as("id_a"), col("pr.b.id").as("id_b"),
        col("pr.a.n").as("na"), col("pr.b.n").as("nb"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(min("na").as("na"), min("nb").as("nb"))
      .localCheckpoint(true)
    verifyJaccardArrays(corpus.select(col(idCol), col(textCol))
        .unionByName(incoming.select(col(idCol), col(textCol))),
      logCandStats("similarityJoinIncremental", cand),
      textCol, idCol, minJaccPct, maxSetSize)
  }

  /** INCREMENTAL near-dedup: dedup a new batch against an already-ingested
    * corpus WITHOUT rescanning the corpus. The corpus contributes only its
    * stored `(id, band, bucket)` index rows ([[bandBuckets]], written once
    * at ingest — [[graft.streaming.DocIndexIngest]] maintains it); the
    * incoming batch computes its own buckets, and only buckets the batch
    * actually touches are read back — with the index laid out by
    * `bmod = pmod(h60(bucket), partitionMod)` the probe partition-prunes
    * via a static isin (pass `partitionMod`), and the `touched` set
    * (bounded by the batch size × bands) broadcasts.
    * Corpus TEXT is read only for verified-candidate members, through the
    * same broadcast semi-filter as the batch path.
    *
    * Result contract: exactly [[minhashPairs]] over (corpus ∪ incoming)
    * restricted to pairs with at least one incoming side — bucket
    * membership for every touched bucket is identical to the full run, so
    * candidate generation (including the skew-cap chain pairing) and the
    * Jaccard verify agree pair-for-pair (pinned in DedupSpec).
    */
  def minhashPairsIncremental(
      corpusBuckets: DataFrame, corpus: DataFrame, incoming: DataFrame,
      textCol: String, idCol: String,
      k: Int, bands: Int, minJaccPct: Int, maxBucket: Int = 64,
      partitionMod: Int = 0): DataFrame = {
    // checkpointed: consumed twice (touched-set + member union) — without
    // it both consumers replay the batch's shingle/signature pipeline
    val newB = bandBuckets(incoming, textCol, idCol, k, bands).localCheckpoint(true)
    val touched = newB.select(col("band"), col("bucket")).distinct()
    // `partitionMod > 0`: the stored index is laid out partitioned by
    // `bmod = pmod(h60(bucket), partitionMod)` (DocIndexIngest), and the
    // probe prunes to the touched mod classes with a STATIC isin — same
    // plan-time deterministic prune as similarityJoinIncremental (the
    // touched class set is bounded by the modulus, never data-scale).
    val corpusSide =
      if (partitionMod > 0) {
        val bmods = newB
          .select(pmod(h60(col("bucket")), lit(partitionMod.toLong)).as("bmod"))
          .distinct().collect().map(_.getLong(0))
        corpusBuckets.filter(col("bmod").isin(bmods: _*))
          .select(col(idCol), col("band"), col("bucket"))
      } else corpusBuckets
    val oldB = corpusSide.join(broadcast(touched), Seq("band", "bucket"), "left_semi")
    val grouped = groupMembers(oldB.unionByName(newB), idCol)
    // keep only pairs with an incoming side: old-old pairs were already
    // found when their docs were ingested. Non-equi (OR) semi-join plans
    // as a broadcast nested loop over the bounded candidate set — fine.
    val newIds = incoming.select(col(idCol).as("__nid"))
    val cand = candidatePairs(grouped, maxBucket)
      .join(broadcast(newIds),
        col("id_a") === col("__nid") || col("id_b") === col("__nid"), "left_semi")
      .localCheckpoint(true)
    val texts = corpus.select(col(idCol), col(textCol))
      .unionByName(incoming.select(col(idCol), col(textCol)))
    verifyJaccard(texts, cand, textCol, idCol, minJaccPct)
  }

  /** SimHash signatures, HOF-free: tokens explode to (id, h60) rows, the 32
    * per-bit ±1 vote sums are plain `sum` aggregates (partial-agg'd
    * map-side), and the signature reassembles as Σ 2ʲ·[voteⱼ>0] in one
    * codegen'd projection.
    */
  def simhashSignatures(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val hs = TextAnalysis.tokenRows(docs, textCol, idCol)
      .select(col(idCol), graft.functions.TextFns.h60(col("tok")).as("h"))
    val votes = (0 until 32).map(j =>
      sum(expr(s"CASE WHEN (h >> $j) % 2 = 1 THEN 1 ELSE -1 END")).as(s"v$j"))
    hs.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until 32).map(j => when(col(s"v$j") > 0, 1L << j).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash per doc plus Hamming distance to the next doc id — a
    * deterministic O(n) near-dup probe (full pairing would use the same
    * signature with an LSH-style prefix bucket).
    */
  def simhashWithNeighborDistance(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val sigs = simhashSignatures(docs, textCol, idCol)
    val next = sigs.select((col(idCol) - 1).as(idCol), col("simhash").as("next_simhash"))
    sigs.join(next, Seq(idCol), "left")
      .select(col(idCol), col("simhash"),
        expr("cast(bit_count(simhash ^ next_simhash) as int)").as("hamming_next"))
  }

  /** Character-n-gram Jaccard between explicit pairs (here: consecutive doc
    * ids — O(n) deterministic pairing that exercises the n-gram path).
    */
  def ngramJaccardNeighbors(docs: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    val grams = docs.select(col(idCol), charNgrams(lower(col(textCol)), n).as("grams"))
    val next = grams.select((col(idCol) - 1).as(idCol), col("grams").as("grams_b"))
    grams.join(next, Seq(idCol), "inner")
      .select(col(idCol).as("doc_a"), (col(idCol) + 1).as("doc_b"),
        jaccardPct(col("grams"), col("grams_b")).as("jacc_pct"))
  }

  /** Intra-corpus DUPLICATED-n-GRAM fraction per document — the
    * substring-granularity dup signal of the exact-substring dedup family
    * (RefinedWeb §3.2 / Lee et al. 2022 approximated at 3-token-shingle
    * granularity): for each doc, the share of its DISTINCT word-3-gram
    * shingles that occur in at least one OTHER document. High `dup_pct`
    * means the doc is largely assembled from text that exists elsewhere in
    * the corpus (mirrors, boilerplate, near-copies) even when no single
    * whole-doc match exists — complementary to [[minhashPairs]] (pairwise)
    * and [[fingerprint]] (whole-doc).
    *
    * Scale shape (all stages hash-partitioned, partial-aggregated):
    *  1. shingle rows stay the narrow scan→explode pipeline of
    *     [[shingleRows]]; per-doc distinct is `groupBy(id, h)` — ONE
    *     shuffle of 8-byte hash keys, map-side combined;
    *  2. the doc-frequency table is `groupBy(h).count` over those distinct
    *     rows — partial-agg'd, one row per distinct shingle (bounded by
    *     total corpus tokens, itself parquet-compressible);
    *  3. the re-join of distinct (id, h) against df(h) reuses the df
    *     side's hash(h) layout from stage 2 (only the left side
    *     exchanges), and a stopword-trigram hot key splits under AQE skew
    *     join — no single task owns a viral shingle;
    *  4. the per-doc rollup is a final count/conditional-sum aggregate.
    * The doc TEXT never shuffles — only (id, hash) pairs.
    */
  def duplicateNgramFraction(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val distinctSh = shingleRows(docs, textCol, idCol)
      .groupBy(col(idCol), h60(col("s")).as("h")).agg(lit(1))
      .select(col(idCol), col("h"))
    val df = distinctSh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    distinctSh.join(df, Seq("h"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_dup"))
      .select(col(idCol), col("n_shingles"), col("n_dup"),
        expr("(100 * n_dup) DIV n_shingles").as("dup_pct"))
  }

  /** Maximal DUPLICATED-SHINGLE SPANS per document — where
    * [[duplicateNgramFraction]] answers "how much of this doc exists
    * elsewhere", this answers "WHERE": maximal runs of consecutive
    * shingle positions whose word-3-gram occurs in ≥1 OTHER document
    * (the span-extraction step of the exact-substring dedup family, Lee
    * et al. 2022 at 3-token granularity). A span `(start, end)` covers
    * tokens `start .. end+2`; runs shorter than `minRun` shingles are
    * noise (a single shared trigram) and dropped.
    *
    * Scale shape: positions ride the same narrow scan→posexplode
    * pipeline as [[shingleRows]]; cross-doc df is the
    * [[duplicateNgramFraction]] aggregation (8-byte hash keys, map-side
    * combined); the run grouping is ONE window shuffle keyed by doc id
    * over `(id, pos)` rows — text never shuffles, and the window state
    * per doc is its duplicated positions only.
    */
  def duplicatedSpans(docs: DataFrame, textCol: String, idCol: String,
                      minRun: Int = 3): DataFrame = {
    val ps = shinglePosRows(docs, textCol, idCol)
      .select(col(idCol), col("pos"), h60(col("s")).as("h"))
    val df = ps.select(col(idCol), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
    val dup = ps.join(df.filter(col("df") > 1).select(col("h")), Seq("h"), "left_semi")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    dup.withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col(idCol), col("grp"))
      .agg(min("pos").as("span_start"), max("pos").as("span_end"),
        count(lit(1)).as("n_shingles"))
      .filter(col("n_shingles") >= minRun)
      .select(col(idCol), col("span_start"), col("span_end"), col("n_shingles"))
  }

  /** Span-level dedup REWRITE: remove each duplicated span from every
    * document EXCEPT the one canonical owner (min doc id over the docs
    * containing the span's shingles), keeping exactly one copy of the
    * duplicated text in the corpus — the apply step over
    * [[duplicatedSpans]], and the whole point of the exact-substring
    * family: near-dup doc pairs get caught by MinHash/PPJoin, but a
    * boilerplate paragraph pasted into thousands of otherwise-distinct
    * docs only ever disappears span-wise.
    *
    * Semantics: a position is removable iff its shingle occurs in ≥2
    * docs AND this doc is not the shingle's owner; maximal removable
    * runs of ≥ `minRun` shingles are cut (tokens `start .. end+2`), the
    * survivors re-join with single spaces into `clean_text` (token-
    * normalized, like every text derivative here). Owner-side text and
    * nothing-duplicated docs pass through token-identical.
    *
    * Scale shape: one df+owner aggregation on hash keys, one window by
    * doc id, then the rewrite is a PER-ROW array filter against that
    * doc's own (broadcast-free, row-local) span list — the corpus text
    * is scanned once and never shuffled.
    */
  def removeDuplicatedSpans(docs: DataFrame, textCol: String, idCol: String,
                            minRun: Int = 3): DataFrame = {
    val ps = shinglePosRows(docs, textCol, idCol)
      .select(col(idCol), col("pos"), h60(col("s")).as("h"))
    val own = ps.select(col(idCol), col("h")).distinct()
      .groupBy(col("h"))
      .agg(count(lit(1)).as("df"), min(col(idCol)).as("owner"))
    val removable = ps.join(own, Seq("h"))
      .filter(col("df") > 1 && col("owner") =!= col(idCol))
      .select(col(idCol), col("pos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    val spans = removable.withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col(idCol), col("grp"))
      .agg(min("pos").as("s"), (max("pos") + 2).as("e"), count(lit(1)).as("run"))
      .filter(col("run") >= minRun)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("s"), col("e"))).as("spans"))
    val t = wsNorm(col(textCol))
    val toks = when(t === "", expr("CAST(array() AS array<string>)"))
      .otherwise(split(t, " "))
    docs.join(spans, Seq(idCol), "left")
      .withColumn("__sp", coalesce(col("spans"),
        expr("CAST(array() AS array<struct<s:bigint,e:bigint>>)")))
      .select(col(idCol), toks.as("__toks"), col("__sp"))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        expr("filter(__toks, (t, i) -> NOT exists(__sp, sp -> i + 1 >= sp.s AND i + 1 <= sp.e))")
          .as("__kept"))
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - size(col("__kept"))).cast("long").as("n_removed"),
        array_join(col("__kept"), " ").as("clean_text"))
  }
}
