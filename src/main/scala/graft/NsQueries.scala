package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables.Fixture
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Declared [NS] queries (SURVEY §2.10): dedup, similarity search, text
  * analysis over `documents`/`embeddings` — the training-data-pipeline
  * surface. Oracle-side SQL mirrors each Spark pipeline expression-for-
  * expression (same md5-based hashes, same fold order, same integer-math
  * ratios) so results hash-match bit-exactly; see
  * [[graft.functions.TextFns]] for the portability rules.
  *
  * The two approximate-NN variants (`q_ann_lsh`, `q_ann_ivf`) declare no
  * oracle — approximation is the point (driver records rows-only); their
  * semantics are pinned by ScalaTest recall checks against the exact
  * `q_cosine_topk`.
  */
object NsQueries {

  /** The DECLARED ANN budgets — the single source the `q_ann_*` specs,
    * `Bench`'s per-round recall sweep, and `tools.RecallProbe`'s
    * declared-config reports all read, so the benched operator and the
    * recorded `recall_at_10` can never desync (the r12 drift class: the
    * artifact reported one budget's recall while the timed query ran
    * another). Retune HERE and every consumer moves together.
    */
  object AnnBudget {
    /** sign-LSH hyperplanes (2^planes buckets). */
    val planes = 4
    /** `q_ann_lsh` probe budget: T cost-ordered buckets of 2^planes. */
    val lshT = 4
    /** `q_ann_lsh_mp` budget-up tier. */
    val lshMpT = 7
    /** IVF coarse cells / probed cells (`q_ann_ivf` and the stored
      * `EmbIndexIngest` index the ivfpq_probe sweep reads). */
    val nlist = 16
    val nprobe = 5
    /** The recall-sweep query-id protocol — ONE list read by both the
      * per-round Bench sweep (`recall_at_10`) and the interactive
      * `graft.tools.RecallProbe`, so the recorded artifact and the tool
      * can never measure different query sets (the r12 artifact-vs-sweep
      * mismatch class). Ids absent from a fixture are filtered out by
      * the consumer before use. */
    val sweepQueryIds: Seq[Long] = Seq(0L, 17L, 256L, 999L, 4242L)
  }

  /** DuckDB fragment: lowercased whitespace tokens, empties dropped —
    * twin of [[graft.functions.TextFns.tokens]]. Shared with
    * [[PipelineQueries]].
    */
  private[graft] val toksSql =
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '')"

  private val subtokPattern = "[a-z]+|[0-9]|[^a-z0-9\\s]"

  /** DuckDB fragment: 60-bit md5 hash of an expression — twin of `h60`. */
  private[graft] def h60Sql(e: String) = s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  /** DuckDB fragment: sequential-fold dot product of two list columns —
    * twin of `TextFns.dot` (same element order, same 0.0+p1 seed ⇒
    * bit-identical doubles).
    *
    * On the r10 "`list_reduce` is nondeterministic" note (see
    * `q_bpe_encode`): that flakiness was observed on the BPE merge-fold
    * shape, NOT this one — this double-product fold re-measured STABLE
    * (20 identical results at 8 threads on the sf0.01 embeddings table,
    * r14), it is the only DuckDB construct whose fold order matches
    * Spark's `graft_dot` exactly (any sum-based rewrite regroups doubles
    * and drifts by ulps), and every consumer oracle has passed the
    * 5-run declaration protocol plus the per-round hash gate since r7.
    * If it ever flips, the symptom is a floor(sim*100) boundary or a
    * near-tie top-k swap — re-measure here first.
    */
  private def dotSql(a: String, b: String) =
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> " +
      s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"

  private def cosineSql(a: String, b: String) =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  /** The BM25 scoring CTE chain (`d`/`g`/`tf`/`w`/`sc` — integer Okapi
    * with the k1/b constants 22000/10/3/9000) for the fixture query
    * "dup vector stream": ONE copy, because q_bm25 and q_hybrid's
    * lexical leg must score identically and the constants are exactly
    * the kind of tuning a single-site edit would silently desync.
    */
  private lazy val Bm25ScoreCtes: String =
    s"""d AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |g AS (SELECT n_docs, total_toks, (1000 * total_toks) // n_docs AS avgdl_x1000 FROM
       |  (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(coalesce(sum(len(toks)), 0) AS BIGINT) AS total_toks FROM d)),
       |tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf FROM
       |  (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term FROM d) u
       |  WHERE term IN ('dup', 'vector', 'stream') GROUP BY 1, 2, 3),
       |w AS (SELECT *, CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df FROM tf),
       |sc AS (SELECT doc_id,
       |  ((1000 * (2 * (n_docs - df) + 1)) // (2 * df + 1)) *
       |  ((22000 * tf * avgdl_x1000) // (10 * tf * avgdl_x1000 + 3 * avgdl_x1000 + 9000 * dl)) AS term_score
       |  FROM w, g)""".stripMargin

  /** The shared shingle CTEs `t`/`sh` over `src` — ONE definition of
    * the 3-token-shingle construction (whole-text fallback under 3
    * tokens, empty list on empty docs) for every shingle-based oracle;
    * editing one retyped copy of this chain silently desyncs its
    * siblings, which is why it is a fragment (the minhashCtesFrom
    * pattern).
    */
  private def shingleCtes(src: String): String =
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM $src),
       |sh AS (SELECT doc_id, CASE WHEN len(toks) >= 3
       |  THEN list_transform(generate_series(1, len(toks) - 2), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |  WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
       |  ELSE [] END AS shingles FROM t)""".stripMargin

  /** `sets` over [[shingleCtes]]'s `sh`: per-doc distinct shingle-hash
    * sets, shingle-less docs dropped (they cannot pair).
    */
  private lazy val setsCte: String =
    s"""sets AS (SELECT doc_id, list_distinct(list_transform(shingles, s -> ${h60Sql("s")})) AS sh
       |  FROM sh WHERE len(shingles) > 0)""".stripMargin

  /** THE integer quality score (length/uniqueness/stopword mix) — one
    * definition for every oracle that scores documents.
    */
  private val QualityScoreSql: String =
    "least(n_tokens, 100) * 4 + (300 * n_uniq) // greatest(n_tokens, 1)" +
      " + 300 - (300 * n_stop) // greatest(n_tokens, 1)"

  /** Shared DuckDB CTE chain computing the MinHash+LSH verified pairs
    * (`j` = pairs with exact jacc_pct) — used by both `q_minhash_lsh` and
    * the recursive-CTE connected-components oracle of `q_dedup_cc`.
    * `src` parameterizes the document source so composed oracles
    * (`q_curate`) run the pair pipeline over a FILTERED CTE instead of
    * the raw table — one chain, every consumer.
    */
  private def minhashCtesFrom(src: String): String = {
    val P = Dedup.MinhashP
    val mins = Dedup.minhashCoeffs(16).zipWithIndex.map { case ((a, b), i) =>
      s"min((h * $a + $b) % $P) AS mh$i"
    }.mkString(", ")
    val bandSelects = (0 until 4).map { bnd =>
      val cols = (0 until 4).map(j => s"mh${bnd * 4 + j}").mkString(" || ',' || ")
      s"SELECT doc_id, $bnd AS band, md5($cols) AS bucket FROM m"
    }.mkString(" UNION ALL ")
    s"""${shingleCtes(src)},
       |e AS (SELECT doc_id, ${h60Sql("unnest(shingles)")} % $P AS h FROM sh),
       |m AS (SELECT doc_id, $mins FROM e GROUP BY doc_id),
       |bk AS ($bandSelects),
       |bkn AS (SELECT doc_id, band, bucket,
       |  count(*) OVER (PARTITION BY band, bucket) AS n FROM bk),
       |cand_all AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bkn a JOIN bkn b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
       |  WHERE a.n <= 64),
       |cand_chain AS (SELECT doc_id AS id_a,
       |  lead(doc_id) OVER (PARTITION BY band, bucket ORDER BY doc_id) AS id_b
       |  FROM bkn WHERE n > 64),
       |cand AS (SELECT DISTINCT id_a, id_b FROM (
       |  SELECT id_a, id_b FROM cand_all
       |  UNION ALL SELECT id_a, id_b FROM cand_chain WHERE id_b IS NOT NULL) u),
       |sets AS (SELECT doc_id,
       |  list_distinct(list_transform(shingles, s -> ${h60Sql("s")})) AS sh FROM sh),
       |j AS (SELECT id_a, id_b,
       |  CAST(100 * len(list_intersect(sa.sh, sb.sh)) AS BIGINT)
       |    // CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS BIGINT) AS jacc_pct
       |  FROM cand JOIN sets sa ON sa.doc_id = id_a JOIN sets sb ON sb.doc_id = id_b)""".stripMargin
  }

  /** ONE oracle for BOTH semantic-decontam variants (the literal fold
    * and the broadcast join are spec-pinned bit-identical — retyping the
    * string per variant is exactly the drift this val removes).
    */
  private lazy val SemanticDecontamSql: String =
    s"""WITH ev AS (SELECT embedding AS e FROM embeddings WHERE vec_id % 19 = 3),
       |s AS (SELECT c.vec_id, max(${cosineSql("c.embedding", "ev.e")}) AS ms
       |  FROM embeddings c, ev GROUP BY c.vec_id)
       |SELECT vec_id, CAST(floor(ms * 100) AS BIGINT) AS max_sim_x100,
       |  CAST(CASE WHEN floor(ms * 100) >= 35 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
       |FROM s ORDER BY vec_id""".stripMargin

  private lazy val minhashCtes: String = minhashCtesFrom("documents")

  /** The full-pipeline curation oracle: stages 1–2 from the shared
    * lang-id/quality formulas, exact dedup by normalized text (grouping
    * by the normalization itself — md5 equality across engines is then
    * irrelevant), the MinHash chain over the exact-kept CTE, the
    * recursive-CTE component closure, and the final anti-join.
    * `restrict` appends a survivor filter (the incremental form's
    * batch restriction). CTE names `cnd`/`ek` avoid the minhash chain's
    * `cand`.
    */
  /** The curation pipeline as a reusable CTE chain (through `ek` =
    * exact-dedup survivors and `losers` = near-dup drop ids): the final
    * survivor set is `ek` anti-joined on `losers`. Shared by
    * [[curateSql]] and the composed export oracle
    * ([[PipelineQueries]]' `q_export`). Needs `WITH RECURSIVE`.
    */
  private[graft] lazy val curateCtes: String = {
    val markers = TextAnalysis.langMarkers
    val scoreCols = markers.map { case (l, m) =>
      s"CAST(len(list_filter(toks, t -> t IN (${m.map(w => s"'$w'").mkString(",")}))) AS BIGINT) AS s_$l"
    }.mkString(", ")
    val best = s"greatest(${markers.map(m => s"s_${m._1}").mkString(",")})"
    val cases = markers.map { case (l, _) =>
      s"WHEN s_$l = $best AND $best > 0 THEN '$l'"
    }.mkString(" ")
    val cfg = graft.operators.Curation.Config()
    val langsIn = cfg.langs.toSeq.sorted.map(l => s"'$l'").mkString(",")
    s"""lt AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
       |ls AS (SELECT doc_id, text, toks, $scoreCols FROM lt),
       |lp AS (SELECT doc_id, text, toks,
       |  CASE $cases ELSE 'und' END AS pred_lang FROM ls),
       |qc AS (SELECT doc_id, text, pred_lang,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
       |  CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to','in'))) AS BIGINT) AS n_stop
       |  FROM lp),
       |cnd AS (SELECT doc_id, text, pred_lang,
       |  ${QualityScoreSql} AS score
       |  FROM qc
       |  WHERE pred_lang IN ($langsIn)),
       |cf AS (SELECT * FROM cnd WHERE score >= ${cfg.minQualityScore}),
       |ek AS (SELECT doc_id, text, pred_lang, score FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
       |    ORDER BY doc_id) AS rn FROM cf) WHERE rn = 1),
       |${minhashCtesFrom("ek")},
       |p AS (SELECT id_a, id_b FROM j WHERE jacc_pct >= ${cfg.minJaccPct}),
       |edg AS (SELECT id_a AS u, id_b AS v FROM p UNION SELECT id_b, id_a FROM p),
       |r(id, comp) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM edg)
       |  UNION
       |  SELECT edg.u, r.comp FROM edg JOIN r ON r.id = edg.v),
       |cc AS (SELECT id, min(comp) AS comp FROM r GROUP BY id),
       |losers AS (SELECT id FROM cc WHERE comp != id)""".stripMargin
  }

  private def curateSql(restrict: String): String =
    s"""WITH RECURSIVE
       |$curateCtes
       |SELECT ek.doc_id, ek.pred_lang, ek.score
       |FROM ek LEFT JOIN losers ON ek.doc_id = losers.id
       |WHERE losers.id IS NULL$restrict
       |ORDER BY doc_id""".stripMargin

  val specs: Seq[QuerySpec] = Seq(

    // ── N1: exact dedup ────────────────────────────────────────────────
    QuerySpec("q_dedup_exact",
      (s, d) => Dedup.exact(Fixture(s, d).documents, "text", "doc_id")
        .orderBy("doc_id"),
      Some("SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM documents " +
        "GROUP BY text ORDER BY doc_id")),

    // N1b: normalized-text fingerprint (rolling-hash-style doc identity).
    QuerySpec("q_fingerprint",
      (s, d) => Dedup.fingerprint(Fixture(s, d).documents, "text", "doc_id")
        .select("doc_id", "fp", "is_canonical").orderBy("doc_id"),
      Some("SELECT doc_id, fp, doc_id = min(doc_id) OVER (PARTITION BY fp) AS is_canonical " +
        "FROM (SELECT doc_id, md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp " +
        "FROM documents) ORDER BY doc_id")),

    // N1b2: winnowing fingerprints (MOSS rolling-window scheme) — per-doc
    // count + min/max of the distinct window-minimum k-gram hashes; the
    // underlying operator emits the (doc, fp) rows a fingerprint index
    // would store.
    QuerySpec("q_winnow",
      (s, d) => TextAnalysis.winnowFingerprints(Fixture(s, d).documents, "text", "doc_id",
          k = 8, w = 16)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_fp"), min("fp").as("fp_min"), max("fp").as("fp_max"))
        .orderBy("doc_id"),
      Some(
        s"""WITH nrm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
           |  FROM documents),
           |g AS (SELECT doc_id, t, greatest(length(t) - 7, 1) AS ng,
           |  unnest(generate_series(1, greatest(length(t) - 7, 1))) AS pos
           |  FROM nrm WHERE t != ''),
           |h AS (SELECT doc_id, ng, pos,
           |  ${h60Sql("CASE WHEN length(t) >= 8 THEN substr(t, pos, 8) ELSE t END")} AS h FROM g),
           |wm AS (SELECT doc_id, ng, pos, min(h) OVER (PARTITION BY doc_id ORDER BY pos
           |  ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp FROM h),
           |sel AS (SELECT DISTINCT doc_id, fp FROM wm WHERE pos <= greatest(ng - 15, 1))
           |SELECT doc_id, count(*) AS n_fp, min(fp) AS fp_min, max(fp) AS fp_max
           |FROM sel GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ── N1c: MinHash+LSH near-dup pairs (16 hashes, 4 bands × 4) ───────
    QuerySpec("q_minhash_lsh",
      (s, d) => Dedup.minhashPairs(Fixture(s, d).documents, "text", "doc_id",
          k = 16, bands = 4, minJaccPct = 50, maxBucket = 64)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH $minhashCtes
           |SELECT id_a, id_b, jacc_pct FROM j WHERE jacc_pct >= 50 ORDER BY id_a, id_b""".stripMargin)),

    // N12a: integer-exact PageRank over the near-dup graph (NEW r11) —
    // graph-authority scoring with all-integer power iteration (3 rounds,
    // damping 85/100): both engines shed the SAME truncated mass per hop
    // and integer sums are order-free, so ranks hash-match exactly. The
    // oracle chains one CTE pair per round over the shared minhashCtes
    // edge set — fixed iteration count keeps the CTE depth static.
    QuerySpec("q_pagerank",
      (s, d) => graft.operators.Curation.pageRank(
          Dedup.minhashPairs(Fixture(s, d).documents, "text", "doc_id",
            k = 16, bands = 4, minJaccPct = 50, maxBucket = 64)
            .select("id_a", "id_b"),
          "id_a", "id_b", iters = 3)
        .orderBy("id"),
      Some {
        val rounds = (1 to 3).map { i =>
          s"""c$i AS (SELECT s.dst AS id, CAST(sum(r.rank // d.deg) AS BIGINT) AS cs
             |  FROM sym s JOIN r${i - 1} r ON s.src = r.id
             |  JOIN deg d ON s.src = d.src GROUP BY s.dst),
             |r$i AS (SELECT n.id, 150000 + (85 * coalesce(c.cs, 0)) // 100 AS rank
             |  FROM (SELECT src AS id FROM deg) n LEFT JOIN c$i c USING (id))""".stripMargin
        }.mkString(",\n")
        s"""WITH $minhashCtes,
           |p AS (SELECT id_a, id_b FROM j WHERE jacc_pct >= 50),
           |sym AS (SELECT id_a AS src, id_b AS dst FROM p
           |  UNION SELECT id_b, id_a FROM p),
           |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY src),
           |r0 AS (SELECT src AS id, CAST(1000000 AS BIGINT) AS rank FROM deg),
           |$rounds
           |SELECT id, rank FROM r3 ORDER BY id""".stripMargin
      }),

    // N1c2: INCREMENTAL near-dedup — a fifth of the corpus arrives as a
    // "new batch" and is deduped against the rest via the stored
    // (id, band, bucket) index, never rescanning corpus text. The result
    // contract (exactly the full run's pairs restricted to batch-touching
    // ones) makes the oracle the full-run CTE plus that restriction.
    QuerySpec("q_minhash_incr",
      (s, d) => {
        val docs = Fixture(s, d).documents
        val corpus = docs.filter(col("doc_id") % 5 =!= 0)
        val incoming = docs.filter(col("doc_id") % 5 === 0)
        Dedup.minhashPairsIncremental(
            Dedup.bandBuckets(corpus, "text", "doc_id", k = 16, bands = 4),
            corpus, incoming, "text", "doc_id",
            k = 16, bands = 4, minJaccPct = 50, maxBucket = 64)
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH $minhashCtes
           |SELECT id_a, id_b, jacc_pct FROM j WHERE jacc_pct >= 50
           |AND (id_a % 5 = 0 OR id_b % 5 = 0) ORDER BY id_a, id_b""".stripMargin)),

    // N1c3: EXACT similarity join via prefix filtering — every pair with
    // shingle-Jaccard >= 50, no all-pairs join (PPJoin/AllPairs family).
    // The oracle IS the brute-force all-pairs definition; the operator
    // must recover exactly that set through the prefix filter.
    QuerySpec("q_simjoin",
      (s, d) => Dedup.similarityJoin(Fixture(s, d).documents, "text", "doc_id",
          minJaccPct = 50)
        .orderBy("id_a", "id_b"),
      Some(
        s"""WITH ${shingleCtes("documents")},
           |$setsCte
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  CAST(100 * len(list_intersect(a.sh, b.sh)) AS BIGINT)
           |    // CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS jacc_pct
           |FROM sets a JOIN sets b ON a.doc_id < b.doc_id
           |WHERE 100 * len(list_intersect(a.sh, b.sh)) >= 50 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
           |ORDER BY id_a, id_b""".stripMargin)),

    // N1c4: INCREMENTAL exact similarity join — batch vs the STORED
    // prefix index (corpus prefixes + df dictionary written at ingest);
    // batch prefixes computed under the corpus-epoch order, which stays
    // exact (the prefix theorem needs only a consistent total order).
    // Oracle = the same brute-force definition restricted to
    // batch-touching pairs.
    QuerySpec("q_simjoin_incr",
      (s, d) => {
        val docs = Fixture(s, d).documents
        val corpus = docs.filter(col("doc_id") % 5 =!= 0)
        val incoming = docs.filter(col("doc_id") % 5 === 0)
        val (prefix, cdf) = Dedup.similarityIndex(corpus, "text", "doc_id", 50)
        // batchLocal = false: cdf is built in THIS query, so the
        // sort-merge df lookup shares its exchange with the prefix
        // build; the broadcast probe path would recompute it (see
        // similarityJoinIncremental scaladoc)
        Dedup.similarityJoinIncremental(prefix, cdf,
            corpus, incoming, "text", "doc_id", minJaccPct = 50,
            batchLocal = false)
          .orderBy("id_a", "id_b")
      },
      Some(
        s"""WITH ${shingleCtes("documents")},
           |$setsCte
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  CAST(100 * len(list_intersect(a.sh, b.sh)) AS BIGINT)
           |    // CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS jacc_pct
           |FROM sets a JOIN sets b ON a.doc_id < b.doc_id
           |WHERE 100 * len(list_intersect(a.sh, b.sh)) >= 50 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
           |AND (a.doc_id % 5 = 0 OR b.doc_id % 5 = 0)
           |ORDER BY id_a, id_b""".stripMargin)),

    // N1c5: exact set-CONTAINMENT join — ordered pairs where ≥60% of
    // a's shingles live inside b (the embedded/subsumed-doc case
    // symmetric Jaccard misses). Oracle = brute-force all ordered pairs.
    QuerySpec("q_containment",
      (s, d) => Dedup.containmentJoin(Fixture(s, d).documents, "text", "doc_id",
          minContPct = 60)
        .orderBy("id_a", "id_b"),
      Some(
        s"""WITH ${shingleCtes("documents")},
           |$setsCte
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  CAST(100 * len(list_intersect(a.sh, b.sh)) AS BIGINT)
           |    // CAST(len(a.sh) AS BIGINT) AS cont_pct
           |FROM sets a JOIN sets b ON a.doc_id != b.doc_id
           |WHERE 100 * len(list_intersect(a.sh, b.sh)) >= 60 * len(a.sh)
           |ORDER BY id_a, id_b""".stripMargin)),

    // N1c6: containment DEDUP policy — drop docs ≥60%-contained in a
    // dominant (larger, or equal-size smaller-id) doc; the maximal
    // element of every containment cluster survives by construction.
    QuerySpec("q_drop_contained",
      (s, d) => graft.operators.Curation.dropContained(
        Fixture(s, d).documents, "text", "doc_id", minContPct = 60),
      Some(
        s"""WITH ${shingleCtes("documents")},
           |$setsCte,
           |p AS (SELECT a.doc_id AS id_a, len(a.sh) AS na, b.doc_id AS id_b, len(b.sh) AS nb
           |  FROM sets a JOIN sets b ON a.doc_id != b.doc_id
           |  WHERE 100 * len(list_intersect(a.sh, b.sh)) >= 60 * len(a.sh)),
           |dr AS (SELECT DISTINCT id_a FROM p WHERE nb > na OR (nb = na AND id_b < id_a))
           |SELECT d.doc_id, (dr.id_a IS NULL) AS is_kept
           |FROM documents d LEFT JOIN dr ON d.doc_id = dr.id_a
           |ORDER BY doc_id""".stripMargin)),

    // N1f: near-dup CONNECTED COMPONENTS — the pointer-jumping min-label
    // propagation ([[graft.operators.Curation.connectedComponents]]) over
    // the verified MinHash pairs, oracle-checked against a DuckDB
    // RECURSIVE CTE reachability closure (two independent algorithms, one
    // exact answer).
    QuerySpec("q_dedup_cc",
      (s, d) => graft.operators.Curation.connectedComponents(
          Dedup.minhashPairs(Fixture(s, d).documents, "text", "doc_id",
            k = 16, bands = 4, minJaccPct = 50, maxBucket = 64),
          "id_a", "id_b")
        .orderBy("id"),
      Some(s"""WITH RECURSIVE $minhashCtes,
           |p AS (SELECT id_a, id_b FROM j WHERE jacc_pct >= 50),
           |edg AS (SELECT id_a AS u, id_b AS v FROM p UNION SELECT id_b, id_a FROM p),
           |r(id, comp) AS (
           |  SELECT u, u FROM (SELECT DISTINCT u FROM edg)
           |  UNION
           |  SELECT edg.u, r.comp FROM edg JOIN r ON r.id = edg.v)
           |SELECT id, min(comp) AS comp FROM r GROUP BY id ORDER BY id""".stripMargin)),

    // N1c6: QUALITY-CANONICAL near-dup dedup — same components as
    // q_dedup_cc, but the survivor per component is the highest-QUALITY
    // member (score desc, id asc), the policy production curation wants.
    // Spark elects with one max(struct) hash aggregate; the oracle
    // re-elects with a row_number window over the recursive-CTE closure —
    // two algorithms, one exact answer.
    QuerySpec("q_dedup_best",
      (s, d) => graft.operators.Curation.dedupKeepBest(
          Fixture(s, d).documents, "text", "doc_id")
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE $minhashCtes,
           |p AS (SELECT id_a, id_b FROM j WHERE jacc_pct >= 50),
           |edg AS (SELECT id_a AS u, id_b AS v FROM p UNION SELECT id_b, id_a FROM p),
           |r(id, comp) AS (
           |  SELECT u, u FROM (SELECT DISTINCT u FROM edg)
           |  UNION
           |  SELECT edg.u, r.comp FROM edg JOIN r ON r.id = edg.v),
           |cc AS (SELECT id, min(comp) AS comp FROM r GROUP BY id),
           |q AS (SELECT doc_id,
           |  CAST(len(toks) AS BIGINT) AS n_tokens,
           |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
           |  CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to','in'))) AS BIGINT) AS n_stop
           |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)),
           |scored AS (SELECT doc_id,
           |  ${QualityScoreSql} AS score FROM q),
           |lab AS (SELECT s.doc_id, COALESCE(cc.comp, s.doc_id) AS comp, s.score
           |  FROM scored s LEFT JOIN cc ON cc.id = s.doc_id),
           |w AS (SELECT comp, doc_id AS win_id FROM (
           |  SELECT comp, doc_id, row_number() OVER (
           |    PARTITION BY comp ORDER BY score DESC, doc_id ASC) AS rn FROM lab)
           |  WHERE rn = 1)
           |SELECT lab.doc_id, lab.comp, lab.score, lab.doc_id = w.win_id AS is_kept
           |FROM lab JOIN w USING (comp) ORDER BY lab.doc_id""".stripMargin)),

    // N1c7: the END-TO-END curation pipeline as a declared query — lang
    // filter → quality filter → exact dedup → near dedup (LSH + CC),
    // previously bench-only (`pipeline_curate`). The oracle recomputes
    // every stage independently: exact dedup groups by the normalized
    // TEXT (not the md5, so engine hash parity is not assumed), the
    // near-dup closure is the recursive CTE. Output: survivors with
    // their attached lang/score.
    QuerySpec("q_curate",
      (s, d) => graft.operators.Curation.curate(
          Fixture(s, d).documents, "text", "doc_id")
        .select(col("doc_id"), col("pred_lang"), col("score"))
        .orderBy("doc_id"),
      Some(curateSql(""))),

    // N1c8: INCREMENTAL curation — the last fifth of the corpus (by id;
    // the stored-index contract is id-monotone, so the batch split is a
    // range, not a modulus) curated against the stores a full ingest of
    // the first four fifths would hold. Result contract: exactly
    // `q_curate` restricted to the batch's ids — the oracle IS the
    // q_curate oracle plus that WHERE clause. The on-disk twin
    // ([[graft.streaming.CurateIngest.curateProbe]]) is spec-pinned
    // equal to this in-memory form and benched as `curate_probe`.
    QuerySpec("q_curate_incr",
      (s, d) => {
        val docs = Fixture(s, d).documents
        val t = docs.agg(max(col("doc_id"))).head().getLong(0) * 4L / 5L
        graft.streaming.CurateIngest.curateProbeWithCorpus(
            docs.filter(col("doc_id") <= t), docs.filter(col("doc_id") > t),
            "text", "doc_id")
          .select(col("doc_id"), col("pred_lang"), col("score"))
          .orderBy("doc_id")
      },
      Some(curateSql(
        " AND ek.doc_id > (SELECT max(doc_id) * 4 // 5 FROM documents)"))),

    // N1d: SimHash signatures + neighbor Hamming distance.
    QuerySpec("q_simhash",
      (s, d) => Dedup.simhashWithNeighborDistance(Fixture(s, d).documents, "text", "doc_id")
        .orderBy("doc_id"),
      Some(
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |h AS (SELECT doc_id, list_transform(toks, x -> ${h60Sql("x")}) AS hs FROM t
           |      WHERE len(toks) > 0),
           |s AS (SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 31), j ->
           |    CASE WHEN list_reduce(list_transform(hs, hv -> CASE WHEN (hv >> j) % 2 = 1 THEN 1 ELSE -1 END),
           |                          (a, b) -> a + b) > 0
           |    THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS simhash FROM h)
           |SELECT s.doc_id, s.simhash, CAST(bit_count(xor(s.simhash, n.simhash)) AS INT) AS hamming_next
           |FROM s LEFT JOIN s n ON n.doc_id = s.doc_id + 1 ORDER BY s.doc_id""".stripMargin)),

    // N1e: char-3-gram Jaccard between consecutive docs.
    QuerySpec("q_ngram_jaccard",
      (s, d) => Dedup.ngramJaccardNeighbors(Fixture(s, d).documents, "text", "doc_id", 3)
        .orderBy("doc_a"),
      Some(
        """WITH g AS (SELECT doc_id, CASE WHEN length(lower(text)) >= 3
          |  THEN list_distinct(list_transform(generate_series(1, length(lower(text)) - 2), i -> substr(lower(text), i, 3)))
          |  ELSE [lower(text)] END AS grams FROM documents)
          |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |  CAST(100 * len(list_intersect(a.grams, b.grams)) AS BIGINT)
          |    // CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS BIGINT) AS jacc_pct
          |FROM g a JOIN g b ON b.doc_id = a.doc_id + 1 ORDER BY doc_a""".stripMargin)),

    // N1g: eval-set decontamination — corpus docs sharing ≥1 word-shingle
    // with the (deterministic doc_id%50) eval split; GPT-3-appendix-C-style
    // n-gram overlap, broadcast eval hash set, integer contamination pct.
    QuerySpec("q_decontam",
      (s, d) => {
        val docs = Fixture(s, d).documents
        graft.operators.Curation.decontaminate(
            docs.filter(col("doc_id") % 50 =!= 0),
            docs.filter(col("doc_id") % 50 === 0), "text", "doc_id")
          .orderBy("doc_id")
      },
      Some(
        s"""WITH ${shingleCtes("documents")},
           |ex AS (SELECT DISTINCT doc_id, ${h60Sql("unnest(shingles)")} AS h FROM sh),
           |ev AS (SELECT DISTINCT h FROM ex WHERE doc_id % 50 = 0),
           |agg AS (SELECT doc_id, count(*) AS n_shingles,
           |  CAST(sum(CASE WHEN h IN (SELECT h FROM ev) THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
           |  FROM ex WHERE doc_id % 50 != 0 GROUP BY doc_id)
           |SELECT doc_id, n_shingles, n_contaminated,
           |  (100 * n_contaminated) // n_shingles AS contam_pct
           |FROM agg WHERE n_contaminated > 0 ORDER BY doc_id""".stripMargin)),

    // N1j: bloom-filter decontamination — the scale path of q_decontam
    // when the eval side outgrows a broadcast hash set: Spark's internal
    // codegen'd bloom build/probe (registered as graft_bloom_agg /
    // graft_might_contain), probe fused into the corpus scan. Approximate
    // (false positives only) => no oracle; the superset-of-exact guarantee
    // and FP bound are spec-pinned in CurationSpec.
    QuerySpec("q_decontam_bloom",
      (s, d) => {
        val docs = Fixture(s, d).documents
        graft.operators.Curation.decontaminateBloom(
            docs.filter(col("doc_id") % 50 =!= 0),
            docs.filter(col("doc_id") % 50 === 0), "text", "doc_id")
          .orderBy("doc_id")
      },
      None),

    // N1g2: NEAR-DUP eval-set decontamination — corpus docs whose
    // shingle-set Jaccard against SOME eval doc (deterministic doc_id%10
    // split) reaches 50: exact PPJoin + verify with the eval set as the
    // probe batch, eval–eval pairs dropped, max jacc per corpus doc.
    // Oracle = brute-force corpus×eval Jaccard over the same h60 shingle
    // sets.
    QuerySpec("q_decontam_neardup",
      (s, d) => {
        val docs = Fixture(s, d).documents
        graft.operators.Curation.decontaminateNearDup(
            docs.filter(col("doc_id") % 10 =!= 0),
            docs.filter(col("doc_id") % 10 === 0), "text", "doc_id",
            minJaccPct = 50)
          .orderBy("doc_id")
      },
      Some(
        s"""WITH ${shingleCtes("documents")},
           |$setsCte,
           |co AS (SELECT * FROM sets WHERE doc_id % 10 != 0),
           |ev AS (SELECT * FROM sets WHERE doc_id % 10 = 0)
           |SELECT co.doc_id AS doc_id,
           |  MAX(CAST(100 * len(list_intersect(co.sh, ev.sh)) AS BIGINT)
           |    // CAST(len(co.sh) + len(ev.sh) - len(list_intersect(co.sh, ev.sh)) AS BIGINT)) AS max_jacc_pct
           |FROM co JOIN ev
           |  ON 100 * len(list_intersect(co.sh, ev.sh)) >= 50 * (len(co.sh) + len(ev.sh) - len(list_intersect(co.sh, ev.sh)))
           |GROUP BY co.doc_id ORDER BY doc_id""".stripMargin)),

    // N1g3: SEMANTIC eval-set decontamination — the embedding complement
    // of q_decontam/q_decontam_neardup (translated/paraphrased eval
    // copies share no shingles but share a direction): per corpus vector,
    // exact max cosine against the whole eval set (deterministic
    // vec_id%19 split), flag at floor(sim*100) >= 35. Eval rides as a
    // plan-time literal matrix — NO join, NO shuffle in the scoring plan
    // (plan-pinned). Oracle = brute-force corpus×eval max over the same
    // per-pair cosine expression, flag from the same floored integer.
    QuerySpec("q_decontam_semantic",
      (s, d) => {
        val emb = Fixture(s, d).embeddings
        graft.operators.Curation.decontaminateSemantic(
            emb, emb.filter(col("vec_id") % 19 === 3), "vec_id", "embedding",
            minSimX100 = 35)
          .orderBy("vec_id")
      },
      Some(SemanticDecontamSql)),

    // N1g4: the broadcast-join variant of q_decontam_semantic — the
    // scale path past the literal boundary (maxEval): same contract,
    // bit-identical output (spec-pinned), eval broadcast as a table and
    // ONE partial-aggregated max per corpus id. Declared with the SAME
    // oracle so the literal/broadcast boundary rule carries a
    // hash-checked correctness datapoint and a per-round bench number,
    // not just a spec assertion.
    QuerySpec("q_decontam_semantic_join",
      (s, d) => {
        val emb = Fixture(s, d).embeddings
        graft.operators.Curation.decontaminateSemanticJoin(
            emb, emb.filter(col("vec_id") % 19 === 3), "vec_id", "embedding",
            minSimX100 = 35)
          .orderBy("vec_id")
      },
      Some(SemanticDecontamSql)),

    // N1h: Gopher-style hard quality-rule cascade (Rae et al. 2021) —
    // per-rule integer flags + keep over the documents table; thresholds
    // chosen so each rule fires on part of the fixture (word count 20–80
    // inside the corpus 10–99 range, top-token share 20% splits the
    // repetitive tail). Oracle mirrors every signal with the same
    // integer math; the top-token count is the distinct×count fold in
    // both engines.
    QuerySpec("q_gopher_rules",
      (s, d) => graft.operators.Curation.gopherFilter(
          Fixture(s, d).documents, "text", "doc_id")
        .orderBy("doc_id"),
      Some(
        GopherSql)),

    // N4e: cluster-stratified embedding sampling — nearest-cosine seed
    // assignment (seeds = vec_id % 97 = 5, ascending-id literal matrix,
    // ties to the lowest seed id via strict-> fold) then a deterministic
    // per-cluster hash-rank quota of 5. Cosines are the bit-identical
    // sequential fold on both engines, so the argmax (and therefore the
    // sample) hash-matches exactly.
    QuerySpec("q_cluster_sample",
      (s, d) => {
        val emb = Fixture(s, d).embeddings
        graft.operators.Sampling.clusterSample(
          emb, emb.filter(col("vec_id") % 97 === 5), "vec_id", "embedding",
          quota = 5)
      },
      Some(
        s"""WITH sd AS (SELECT vec_id AS sid, embedding AS se FROM embeddings
           |  WHERE vec_id % 97 = 5 AND ${dotSql("embedding", "embedding")} > 0),
           |c AS (SELECT vec_id, embedding AS e FROM embeddings
           |  WHERE ${dotSql("embedding", "embedding")} > 0),
           |p AS (SELECT c.vec_id, sd.sid, ${cosineSql("c.e", "sd.se")} AS s FROM c, sd),
           |rr AS (SELECT vec_id, sid,
           |  row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, sid ASC) AS rn FROM p),
           |a AS (SELECT vec_id, sid AS cluster_id FROM rr WHERE rn = 1),
           |k AS (SELECT cluster_id, vec_id, CAST(row_number() OVER (PARTITION BY cluster_id
           |  ORDER BY ${h60Sql("CAST(vec_id AS VARCHAR)")} ASC, vec_id ASC) AS BIGINT) AS r FROM a)
           |SELECT cluster_id, vec_id, r FROM k WHERE r <= 5
           |ORDER BY cluster_id, vec_id""".stripMargin)),

    // N1i: DSIR-style importance scoring (Xie et al. 2023) — target =
    // lang='en' (~45% of the fixture, so smoothed per-bucket ratios
    // spread on both sides of 1), 256 hashed-unigram buckets, weights as
    // integer-scaled Laplace likelihood ratios (scale 1000, no float
    // log — see Curation.dsirScore scaladoc). Oracle recomputes the
    // bucket table and re-scores via a join; the Spark plan is joinless
    // (weights ride as a 256-long literal into the corpus scan).
    QuerySpec("q_dsir",
      (s, d) => graft.operators.Curation.dsirScore(
          Fixture(s, d).documents, "text", "doc_id", col("lang") === "en")
        .orderBy("doc_id"),
      Some(
        DsirSql)),

    // N1l: quality ensemble — Gopher rules ∧ LM fluency ∧ DSIR
    // target-likeness, thresholds at the fixture medians so each score
    // gate actually splits the corpus. The oracle COMPOSES the three
    // standalone oracle bodies (GopherSql/LmSql/DsirSql — one source of
    // truth) as subqueries and re-applies the same keep rule.
    QuerySpec("q_quality_ensemble",
      (s, d) => graft.operators.Curation.qualityEnsemble(
          Fixture(s, d).documents, "text", "doc_id", col("lang") === "en",
          minLmX100k = 3386L, minDsir = -538L)
        .orderBy("doc_id"),
      Some(
        s"""WITH go AS (SELECT * FROM ($GopherSql)),
           |lmq AS (SELECT * FROM ($LmSql)),
           |dsq AS (SELECT * FROM ($DsirSql))
           |SELECT go.doc_id, go.n_fail, go.keep AS rules_keep,
           |  lmq.lm_score_x100k, dsq.dsir_score,
           |  CAST(CASE WHEN go.keep = 1 AND lmq.lm_score_x100k >= 3386
           |    AND dsq.dsir_score >= -538 THEN 1 ELSE 0 END AS BIGINT) AS keep
           |FROM go JOIN lmq USING (doc_id) JOIN dsq USING (doc_id)
           |ORDER BY go.doc_id""".stripMargin)),

    // N1k: hashed bag-of-words tagger (fastText-role, Joulin et al.
    // 2017) — 5-class lang tagging over the documents table. The fixture
    // label is text-independent (see hashedTagger scaladoc), so the
    // declared contract is MODEL equivalence: the oracle retrains the
    // identical count model and re-scores, hash-exact; discriminative
    // accuracy is spec-pinned on a planted-vocabulary corpus.
    QuerySpec("q_tagger",
      (s, d) => graft.operators.Curation.hashedTagger(
          Fixture(s, d).documents, "text", "doc_id", "lang")
        .orderBy("doc_id"),
      Some(
        s"""WITH d AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
           |t AS (SELECT doc_id, lang, ${h60Sql("unnest(toks)")} % 256 AS b FROM d),
           |cb AS (SELECT lang AS cls, b, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1, 2),
           |ab AS (SELECT b, CAST(count(*) AS BIGINT) AS an FROM t GROUP BY 1),
           |tc AS (SELECT cls, CAST(sum(n) + 256 AS BIGINT) AS tot FROM cb GROUP BY 1),
           |ta AS (SELECT CAST(count(*) + 256 AS BIGINT) AS tota FROM t),
           |grid AS (SELECT tc.cls, g.b, tc.tot FROM tc
           |  CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS b) g),
           |w AS (SELECT grid.cls, grid.b,
           |  (1000 * (coalesce(cb.n, 0) + 1) * ta.tota) // ((coalesce(ab.an, 0) + 1) * grid.tot) AS w
           |  FROM grid LEFT JOIN cb ON grid.cls = cb.cls AND grid.b = cb.b
           |  LEFT JOIN ab ON grid.b = ab.b CROSS JOIN ta),
           |sc AS (SELECT t.doc_id, w.cls, CAST(sum(w.w) AS BIGINT) AS s
           |  FROM t JOIN w ON t.b = w.b GROUP BY 1, 2),
           |allsc AS (SELECT d.doc_id, c.cls, coalesce(sc.s, 0) AS s
           |  FROM d CROSS JOIN (SELECT cls FROM tc) c
           |  LEFT JOIN sc ON sc.doc_id = d.doc_id AND sc.cls = c.cls),
           |r AS (SELECT doc_id, cls, s,
           |  row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, cls ASC) AS rn FROM allsc)
           |SELECT r1.doc_id, r1.cls AS pred_label, r1.s AS score_top,
           |  r1.s - coalesce(r2.s, 0) AS margin
           |FROM r r1 LEFT JOIN r r2 ON r1.doc_id = r2.doc_id AND r2.rn = 2
           |WHERE r1.rn = 1 ORDER BY r1.doc_id""".stripMargin)),

    // N3j: corpus-drift report — hashed-token rate deltas (per million,
    // integer) between the src0 slice and the rest of the corpus, top-20
    // buckets each with its most-common example token. The two declared
    // slices partition the NON-NULL sources, so the oracle's example-token
    // scan restricts to `source IS NOT NULL` to equal the operator's A∪B
    // concatenation (a NULL source is in NEITHER slice on both engines —
    // an unrestricted whole-table scan would let it vote for examples).
    QuerySpec("q_corpus_drift",
      (s, d) => {
        val docs = Fixture(s, d).documents
        graft.operators.TextAnalysis.corpusDrift(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"), "text")
      },
      Some(
        s"""WITH ta AS (SELECT ${h60Sql(s"unnest($toksSql)")} % 256 AS bkt
           |  FROM documents WHERE source != 'src0'),
           |tb AS (SELECT ${h60Sql(s"unnest($toksSql)")} % 256 AS bkt
           |  FROM documents WHERE source = 'src0'),
           |a AS (SELECT bkt, CAST(count(*) AS BIGINT) AS ca FROM ta GROUP BY 1),
           |b AS (SELECT bkt, CAST(count(*) AS BIGINT) AS cb FROM tb GROUP BY 1),
           |tota AS (SELECT CAST(sum(ca) AS BIGINT) AS t FROM a),
           |totb AS (SELECT CAST(sum(cb) AS BIGINT) AS t FROM b),
           |u AS (SELECT tok, ${h60Sql("tok")} % 256 AS bkt FROM
           |  (SELECT unnest($toksSql) AS tok FROM documents
           |   WHERE source IS NOT NULL)),
           |exc AS (SELECT bkt, tok, CAST(count(*) AS BIGINT) AS n FROM u GROUP BY 1, 2),
           |exr AS (SELECT bkt, tok AS example_token,
           |  row_number() OVER (PARTITION BY bkt ORDER BY n DESC, tok ASC) AS rn FROM exc),
           |ex AS (SELECT bkt, example_token FROM exr WHERE rn = 1),
           |j AS (SELECT coalesce(a.bkt, b.bkt) AS bkt,
           |  (coalesce(ca, 0) * 1000000) // greatest(tota.t, 1) AS rate_a_pm,
           |  (coalesce(cb, 0) * 1000000) // greatest(totb.t, 1) AS rate_b_pm
           |  FROM a FULL JOIN b ON a.bkt = b.bkt CROSS JOIN tota CROSS JOIN totb)
           |SELECT j.bkt, ex.example_token, j.rate_a_pm, j.rate_b_pm,
           |  abs(j.rate_a_pm - j.rate_b_pm) AS drift_pm
           |FROM j LEFT JOIN ex ON j.bkt = ex.bkt
           |ORDER BY drift_pm DESC, j.bkt LIMIT 20""".stripMargin)),

    // N3i: collocation extraction — top-15 adjacent bigrams by integer
    // lift (PMI ranking without the float log; minCount=5 floors the
    // hapax-pair variance). T broadcast as a 1-row scalar; joins are
    // marginal⋈marginal over distinct pairs.
    QuerySpec("q_collocations",
      (s, d) => graft.operators.TextAnalysis.collocations(
        Fixture(s, d).documents, "text", 15),
      Some(
        s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |bg AS (SELECT toks[i] AS w1, toks[i + 1] AS w2 FROM
           |  (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
           |   FROM d WHERE len(toks) >= 2)),
           |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY 1, 2),
           |cl AS (SELECT w1, CAST(count(*) AS BIGINT) AS cl FROM bg GROUP BY 1),
           |cr AS (SELECT w2, CAST(count(*) AS BIGINT) AS cr FROM bg GROUP BY 1),
           |t AS (SELECT CAST(count(*) AS BIGINT) AS t FROM bg)
           |SELECT c2.w1, c2.w2, c2.c2,
           |  CAST((CAST(c2.c2 AS HUGEINT) * t.t * 1000) // (CAST(cl.cl AS HUGEINT) * cr.cr) AS BIGINT) AS lift_x1000
           |FROM c2 JOIN cl USING (w1) JOIN cr USING (w2) CROSS JOIN t
           |WHERE c2.c2 >= 5
           |ORDER BY lift_x1000 DESC, c2.w1, c2.w2 LIMIT 15""".stripMargin)),

    // N3g: BPE pair statistics (Sennrich et al. 2016) — the count half of
    // a BPE training iteration: top-20 adjacent intra-word char pairs.
    // The multi-iteration training loop (count → merge-everywhere fold)
    // is bpeTrain, spec-pinned against a hand-computed merge sequence.
    QuerySpec("q_bpe_pairs",
      (s, d) => graft.operators.TextAnalysis.bpePairStats(
        Fixture(s, d).documents, "text", 20),
      Some(
        s"""WITH t AS (SELECT unnest($toksSql) AS w FROM documents),
           |p AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
           |  i -> substr(w, i, 2))) AS pair FROM t WHERE len(w) >= 2)
           |SELECT pair, CAST(count(*) AS BIGINT) AS n_occ FROM p GROUP BY pair
           |ORDER BY n_occ DESC, pair LIMIT 20""".stripMargin)),

    // N3g2: BPE ENCODE under a fixed merge list — the apply half of the
    // tokenizer, promoted from spec-pinned to oracle-checked: the oracle
    // expresses each greedy left-first merge round WITHOUT any fold
    // primitive (DuckDB list_reduce is nondeterministic — the funnel
    // find), via the run-parity identity: one round's merges are exactly
    // the EVEN 0-based offsets within each maximal run of consecutive
    // match positions on the round's input (a merge at i only consumes
    // i/i+1 and the merged symbol p1p2 can never equal p1, so matches
    // are neither created nor destroyed outside their own run). Each
    // round = 3 window layers + a re-grouped list; merges are FIXED
    // literals (training is bpeTrain, spec-pinned + sampled) so the SQL
    // is static. Verified 5×-deterministic before declaring.
    QuerySpec("q_bpe_encode",
      (s, d) => graft.operators.TextAnalysis.bpeEncode(
          Fixture(s, d).documents, "text", "doc_id", BpeFixedMerges)
        .select(col("doc_id"),
          array_join(col("bpe_tokens"), " ").as("bpe_text"),
          col("n_bpe_tokens"))
        .orderBy("doc_id"),
      Some(BpeEncodeSql)),

    // N3h: bigram-LM fluency score (the CCNet/KenLM role, Wenzek et al.
    // 2020) — add-one-smoothed integer bigram probabilities, self-trained
    // on the corpus; see TextAnalysis.lmScore for the no-float-log
    // rationale. Oracle joins the same two count tables; self-training
    // guarantees every scored bigram exists in them, so the oracle's
    // inner join ≡ the operator's left-join+coalesce.
    QuerySpec("q_lm_score",
      (s, d) => graft.operators.TextAnalysis.lmScore(
          Fixture(s, d).documents, "text", "doc_id")
        .orderBy("doc_id"),
      Some(
        LmSql)),

    // N3f: BM25 top-k lexical search — integer-scaled Okapi scoring
    // (rational idf argument, no float log; see TextSearch scaladoc),
    // query "dup vector stream" (one rare + two common fixture terms so
    // idf variation is exercised), total order (score desc, doc_id).
    QuerySpec("q_bm25",
      (s, d) => graft.operators.TextSearch.bm25TopK(
        Fixture(s, d).documents, "text", "doc_id", "dup vector stream", 10),
      Some(
        s"""WITH $Bm25ScoreCtes
           |SELECT doc_id, CAST(sum(term_score) AS BIGINT) AS score_x1m, CAST(count(*) AS BIGINT) AS n_terms
           |FROM sc GROUP BY doc_id ORDER BY score_x1m DESC, doc_id LIMIT 10""".stripMargin)),

    // N3g: hybrid retrieval — reciprocal rank fusion of the BM25 lexical
    // top-20 and the exact-cosine vector top-20 over the shared doc/vec id
    // space (one embedding per document in the fixture). Both rank lists
    // are cross-engine exact (integer BM25; bit-identical cosine doubles),
    // so the integer RRF sum is too. The anchor doc (id 0) is excluded
    // from BOTH legs (symmetric more-like-this semantics).
    QuerySpec("q_hybrid",
      (s, d) => {
        val f = Fixture(s, d)
        graft.operators.TextSearch.hybridRrf(
          f.documents, "text", "doc_id", f.embeddings, "vec_id", "embedding",
          query = "dup vector stream", queryVecId = 0L, kPerList = 20, k = 10)
      },
      Some(
        s"""WITH $Bm25ScoreCtes,
           |lex AS (SELECT doc_id, sum(term_score) AS s FROM sc WHERE doc_id != 0
           |  GROUP BY doc_id ORDER BY s DESC, doc_id LIMIT 20),
           |lexr AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS rank FROM lex),
           |q AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0),
           |sv AS (SELECT vec_id, ${cosineSql("embedding", "q_vec")} AS sim
           |  FROM embeddings, q WHERE vec_id != 0 ORDER BY sim DESC, vec_id LIMIT 20),
           |vecr AS (SELECT vec_id AS doc_id, row_number() OVER (ORDER BY sim DESC, vec_id) AS rank FROM sv),
           |u AS (SELECT doc_id, rank FROM lexr UNION ALL SELECT doc_id, rank FROM vecr)
           |SELECT doc_id, CAST(sum(1000000 // (60 + rank)) AS BIGINT) AS rrf_x1m,
           |  CAST(count(*) AS BIGINT) AS n_lists
           |FROM u GROUP BY doc_id ORDER BY rrf_x1m DESC, doc_id LIMIT 10""".stripMargin)),

    // N3h: exact phrase search — per-doc occurrence counts of a literal
    // token sequence ("slow hash batch": 3 fixture terms, present with
    // within-doc repeats so counts > 1 are exercised). Overlapping
    // occurrences count; both engines scan the same filtered token
    // positions.
    QuerySpec("q_phrase",
      (s, d) => graft.operators.TextSearch.phraseCount(
        Fixture(s, d).documents, "text", "doc_id", "slow hash batch"),
      Some(
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |c AS (SELECT doc_id, CAST(len(list_filter(generate_series(1, len(toks) - 2),
           |  i -> toks[i] = 'slow' AND toks[i+1] = 'hash' AND toks[i+2] = 'batch')) AS BIGINT) AS n_matches
           |  FROM t)
           |SELECT doc_id, n_matches FROM c WHERE n_matches > 0 ORDER BY doc_id""".stripMargin)),

    // N3i: corpus-wide top-k frequent 3-grams (the boilerplate report);
    // Spark groups by the 60-bit shingle hash with a min-string carry,
    // the oracle groups by the string — identical modulo h60 collisions.
    QuerySpec("q_top_ngrams",
      (s, d) => graft.operators.TextAnalysis.topNgrams(
        Fixture(s, d).documents, "text", "doc_id", k = 20),
      Some(
        s"""WITH ${shingleCtes("documents")},
           |sx AS (SELECT doc_id, unnest(shingles) AS s FROM sh)
           |SELECT s AS ngram, CAST(count(*) AS BIGINT) AS n_occ,
           |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
           |FROM sx GROUP BY s ORDER BY n_occ DESC, ngram LIMIT 20""".stripMargin)),

    // N1i: intra-corpus duplicated-n-gram fraction (exact-substring-dedup
    // family at shingle granularity): share of each doc's distinct 3-token
    // shingles that occur in >= 1 other document.
    QuerySpec("q_dup_ngrams",
      (s, d) => Dedup.duplicateNgramFraction(Fixture(s, d).documents, "text", "doc_id")
        .orderBy("doc_id"),
      Some(
        s"""WITH ${shingleCtes("documents")},
           |ex AS (SELECT DISTINCT doc_id, ${h60Sql("unnest(shingles)")} AS h FROM sh),
           |df AS (SELECT h, CAST(count(*) AS BIGINT) AS df FROM ex GROUP BY h),
           |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
           |  CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
           |  FROM ex JOIN df USING (h) GROUP BY doc_id)
           |SELECT doc_id, n_shingles, n_dup,
           |  (100 * n_dup) // n_shingles AS dup_pct
           |FROM agg ORDER BY doc_id""".stripMargin)),

    // N1k: duplicated-span EXTRACTION (exact-substring family, Lee et al.
    // 2022 at 3-token-shingle granularity) — maximal runs (>= 3 shingles)
    // of consecutive positions whose shingle occurs in >= 1 other doc:
    // q_dup_ngrams says how much of a doc exists elsewhere, this says WHERE.
    QuerySpec("q_dup_spans",
      (s, d) => Dedup.duplicatedSpans(Fixture(s, d).documents, "text", "doc_id")
        .orderBy("doc_id", "span_start"),
      Some(
        s"""WITH ${shingleCtes("documents")},
           |px AS (SELECT doc_id, unnest(generate_series(1, len(shingles))) AS pos,
           |  ${h60Sql("unnest(shingles)")} AS h FROM sh),
           |df AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM px) GROUP BY h HAVING count(*) > 1),
           |dup AS (SELECT doc_id, pos FROM px JOIN df USING (h)),
           |isl AS (SELECT doc_id, pos, pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM dup),
           |g AS (SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           |  CAST(max(pos) AS BIGINT) AS span_end,
           |  CAST(count(*) AS BIGINT) AS n_shingles FROM isl GROUP BY doc_id, grp)
           |SELECT doc_id, span_start, span_end, n_shingles FROM g
           |WHERE n_shingles >= 3 ORDER BY doc_id, span_start""".stripMargin)),

    // N1l: span-level dedup REWRITE — remove each duplicated span from
    // every doc except its canonical owner (min doc id over the docs
    // sharing the shingle): whole-doc dedup can't touch a boilerplate
    // paragraph pasted into thousands of otherwise-distinct docs; this
    // keeps exactly one copy corpus-wide.
    QuerySpec("q_dup_span_removal",
      (s, d) => Dedup.removeDuplicatedSpans(Fixture(s, d).documents, "text", "doc_id")
        .orderBy("doc_id"),
      Some(
        s"""WITH ${shingleCtes("documents")},
           |px AS (SELECT doc_id, unnest(generate_series(1, len(shingles))) AS pos,
           |  ${h60Sql("unnest(shingles)")} AS h FROM sh),
           |own AS (SELECT h, count(*) AS df, min(doc_id) AS owner
           |  FROM (SELECT DISTINCT doc_id, h FROM px) GROUP BY h),
           |rm AS (SELECT px.doc_id, pos FROM px JOIN own USING (h)
           |  WHERE df > 1 AND owner != px.doc_id),
           |isl AS (SELECT doc_id, pos, pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM rm),
           |sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 2 AS e
           |  FROM isl GROUP BY doc_id, grp HAVING count(*) >= 3),
           |tk AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS i, unnest(toks) AS tok FROM t),
           |kept AS (SELECT doc_id, i, tok FROM tk WHERE NOT EXISTS
           |  (SELECT 1 FROM sp WHERE sp.doc_id = tk.doc_id AND tk.i >= sp.s AND tk.i <= sp.e)),
           |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
           |  string_agg(tok, ' ' ORDER BY i) AS clean_text FROM kept GROUP BY doc_id),
           |n AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t)
           |SELECT n.doc_id, n_tokens,
           |  n_tokens - COALESCE(n_kept, 0) AS n_removed,
           |  COALESCE(clean_text, '') AS clean_text
           |FROM n LEFT JOIN agg USING (doc_id) ORDER BY n.doc_id""".stripMargin)),

    // N1h: Gopher-style within-doc repetition signals (dup-line fraction,
    // top-2-gram mass) — integer-exact, whitespace-robust line filter.
    QuerySpec("q_repetition",
      (s, d) => TextAnalysis.repetitionSignals(Fixture(s, d).documents, "text", "doc_id")
        .orderBy("doc_id"),
      Some(
        s"""WITH l AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\n'),
           |    x -> regexp_replace(x, '\\s+', '', 'g') != '')) AS line FROM documents),
           |lc AS (SELECT doc_id, line, count(*) AS c FROM l GROUP BY doc_id, line),
           |la AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
           |  CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS n_dup_lines FROM lc GROUP BY doc_id),
           |t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |g AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
           |  THEN list_transform(generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1])
           |  ELSE [] END) AS gr FROM t),
           |gc AS (SELECT doc_id, gr, count(*) AS c FROM g GROUP BY doc_id, gr),
           |ga AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_2grams,
           |  CAST(max(c) AS BIGINT) AS top_2gram FROM gc GROUP BY doc_id)
           |SELECT d.doc_id, COALESCE(n_lines, 0) AS n_lines,
           |  (100 * COALESCE(n_dup_lines, 0)) // greatest(COALESCE(n_lines, 0), 1) AS dup_line_pct,
           |  COALESCE(n_2grams, 0) AS n_2grams,
           |  (100 * COALESCE(top_2gram, 0)) // greatest(COALESCE(n_2grams, 0), 1) AS top_2gram_pct
           |FROM documents d LEFT JOIN la USING (doc_id) LEFT JOIN ga USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin)),

    // ── N2: exact cosine top-k (brute-force baseline) ──────────────────
    QuerySpec("q_cosine_topk",
      (s, d) => Similarity.cosineTopK(Fixture(s, d).embeddings, "vec_id", "embedding",
        queryId = 0L, k = 10),
      Some(
        s"""WITH q AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0),
           |s AS (SELECT vec_id, ${cosineSql("embedding", "q_vec")} AS sim
           |  FROM embeddings, q WHERE vec_id != 0)
           |SELECT vec_id, CAST(floor(sim * 100) AS BIGINT) AS sim_x100 FROM s
           |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin)),

    // N2b: blocked all-pairs near-dup (label = blocking key).
    QuerySpec("q_embed_neardup",
      (s, d) => Similarity.blockedNearDup(Fixture(s, d).embeddings, "label", "vec_id", "embedding",
          minCosine = 0.25)
        .orderBy("label", "id_a", "id_b"),
      Some(
        s"""WITH p AS (SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
           |  ${cosineSql("a.embedding", "b.embedding")} AS sim
           |  FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id)
           |SELECT label, id_a, id_b, CAST(floor(sim * 100) AS BIGINT) AS sim_x100
           |FROM p WHERE sim >= 0.25 ORDER BY label, id_a, id_b""".stripMargin)),

    // N2b': SEMANTIC near-dedup (SemDeDup) — k-means cells replace the
    // label as the blocking key. No oracle by design (sampled k-means is
    // not SQL-expressible); soundness + planted-dup recall are spec-pinned
    // in SimilaritySpec, and planted-pair recall is recorded per round in
    // the bench artifact's recall map.
    QuerySpec("q_semantic_dedup",
      (s, d) => Similarity.semanticNearDup(Fixture(s, d).embeddings, "vec_id", "embedding",
          nlist = 16, minCosine = 0.25)
        .orderBy("cell", "id_a", "id_b"),
      None),

    // N2b'': INCREMENTAL semantic dedup — the last fifth of the
    // embeddings (by id, the ingest paths' monotone discipline) forms
    // its near-dup pairs against the cell geometry a store bootstrapped
    // from the first four fifths would hold, in O(batch·touched-cells):
    // the composed-store capstone on the VECTOR side. No oracle (k-means
    // geometry is not SQL-expressible); the disk probe is spec-pinned
    // equal to this in-memory twin over a real EmbIndexIngest store, and
    // both equal semanticNearDupWithCents restricted to the batch.
    QuerySpec("q_semantic_dedup_incr",
      (s, d) => {
        val emb = Fixture(s, d).embeddings
        val t = emb.agg(max(col("vec_id"))).head().getLong(0) * 4L / 5L
        graft.streaming.EmbIndexIngest.semanticDedupProbeWithCorpus(
            emb.filter(col("vec_id") <= t), emb.filter(col("vec_id") > t),
            "vec_id", "embedding", minCosine = 0.25)
          .orderBy("id_a", "id_b")
      },
      None),

    // N2c/d: approximate NN — no oracle by design (approx path; recall is
    // spec-tested against q_cosine_topk). The declared LSH query carries a
    // MINIMAL multi-probe budget (T=4 of 16 buckets — a quarter of the
    // table scanned): the single-bucket probe ([[Similarity.annLsh]])
    // measured recall@10 = 0.1 on this fixture two rounds running — a
    // degenerate baseline nobody should run as the answer path — while 4
    // cost-ordered probes recover most of the true top-10 at a bounded
    // scan fraction. The single-probe tier stays spec-tested as the
    // recall floor, not declared.
    //
    // recall 0.6 at 1/4 scan is the DELIBERATE budget floor, not a tuning
    // miss — pinned by an r10 RecallProbe sweep over planes x T at a
    // FIXED measured scan fraction (`mp=` mode; bucket sizes measured,
    // not assumed uniform): planes=4/T=4 scan=0.25 -> mean 0.55;
    // 6/16 scan=0.26 -> 0.50; 8/64 scan=0.25 -> 0.55; 12/1024
    // scan=0.27 -> 0.58. On this near-random corpus sign-LSH recall
    // tracks the scanned fraction regardless of plane count (no margin
    // structure for the probe order to exploit — same conclusion as the
    // IVF single-assignment analysis in SURVEY §6 r9). Recall above the
    // floor at equal scan needs a different index family, which is
    // exactly what the declared IVF (0.9 at 0.31 scanned) provides; the
    // T=7 tier below is the same-family budget-up tier (0.8).
    QuerySpec("q_ann_lsh",
      (s, d) => Similarity.annLshMultiProbe(Fixture(s, d).embeddings, "vec_id", "embedding",
        queryId = 0L, k = 10, planes = AnnBudget.planes,
        probeBuckets = AnnBudget.lshT),
      None),
    QuerySpec("q_ann_ivf",
      (s, d) => Similarity.annIvf(Fixture(s, d).embeddings, "vec_id", "embedding",
        queryId = 0L, k = 10, nlist = AnnBudget.nlist, nprobe = AnnBudget.nprobe),
      None),
    QuerySpec("q_ann_lsh_mp",
      (s, d) => Similarity.annLshMultiProbe(Fixture(s, d).embeddings, "vec_id", "embedding",
        queryId = 0L, k = 10, planes = AnnBudget.planes,
        probeBuckets = AnnBudget.lshMpT),
      None),
    // N2e: product quantization — 64x-compressed codes scanned via a
    // literal ADC table, exact rerank of the top candidates.
    QuerySpec("q_ann_pq",
      (s, d) => Similarity.annPq(Fixture(s, d).embeddings, "vec_id", "embedding",
        queryId = 0L, k = 10),
      None),

    // ── N3: text analysis ──────────────────────────────────────────────
    QuerySpec("q_text_stats",
      (s, d) => TextAnalysis.textStats(Fixture(s, d).documents, "text", "doc_id")
        .orderBy("doc_id"),
      Some(
        s"""WITH t AS (SELECT doc_id, length(text) AS n_chars, $toksSql AS toks,
           |  regexp_extract_all(lower(text), '$subtokPattern') AS subs FROM documents)
           |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
           |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
           |  CAST(len(subs) AS BIGINT) AS n_subtokens, CAST(n_chars AS BIGINT) AS n_chars,
           |  CAST(100 * COALESCE(list_sum(list_transform(toks, x -> CAST(length(x) AS BIGINT))), 0) AS BIGINT)
           |    // greatest(CAST(len(toks) AS BIGINT), 1) AS avg_tok_len_x100
           |FROM t ORDER BY doc_id""".stripMargin)),

    QuerySpec("q_token_explode",
      (s, d) => TextAnalysis.tokenFrequencies(Fixture(s, d).documents, "text")
        .orderBy(desc("cnt"), col("token")).limit(50),
      Some(s"SELECT token, count(*) AS cnt FROM " +
        s"(SELECT unnest($toksSql) AS token FROM documents) " +
        "GROUP BY token ORDER BY cnt DESC, token LIMIT 50")),

    QuerySpec("q_token_count",
      (s, d) => TextAnalysis.tokenCountsByKey(Fixture(s, d).documents, "text", "lang")
        .orderBy("lang"),
      Some(
        s"""SELECT lang, count(*) AS n_docs,
           |  CAST(sum(len($toksSql)) AS BIGINT) AS n_tokens,
           |  CAST(sum(len(regexp_extract_all(lower(text), '$subtokPattern'))) AS BIGINT) AS n_subtokens
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    QuerySpec("q_lang_id",
      (s, d) => TextAnalysis.languageId(Fixture(s, d).documents, "text", "doc_id")
        .select("doc_id", "s_en", "s_es", "s_de", "s_fr", "pred_lang")
        .orderBy("doc_id"),
      Some {
        val markers = TextAnalysis.langMarkers
        val scoreCols = markers.map { case (l, m) =>
          s"CAST(len(list_filter(toks, t -> t IN (${m.map(w => s"'$w'").mkString(",")}))) AS BIGINT) AS s_$l"
        }.mkString(", ")
        val best = s"greatest(${markers.map(m => s"s_${m._1}").mkString(",")})"
        val cases = markers.map { case (l, _) =>
          s"WHEN s_$l = $best AND $best > 0 THEN '$l'"
        }.mkString(" ")
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |s AS (SELECT doc_id, $scoreCols FROM t)
           |SELECT doc_id, s_en, s_es, s_de, s_fr,
           |  CASE $cases ELSE 'und' END AS pred_lang
           |FROM s ORDER BY doc_id""".stripMargin
      }),

    QuerySpec("q_quality_score",
      (s, d) => TextAnalysis.qualityScore(Fixture(s, d).documents, "text", "doc_id")
        .select("doc_id", "n_tokens", "n_uniq", "n_stop", "score")
        .orderBy("doc_id"),
      Some(
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |c AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
           |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
           |  CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to','in'))) AS BIGINT) AS n_stop
           |  FROM t)
           |SELECT doc_id, n_tokens, n_uniq, n_stop,
           |  ${QualityScoreSql} AS score
           |FROM c ORDER BY doc_id""".stripMargin))
  )

  /** Shared oracle bodies — each used by its own QuerySpec AND composed
    * as CTE subqueries by the quality-ensemble oracle (one source of
    * truth; drift between the standalone and composed forms is
    * impossible by construction).
    */
  private lazy val GopherSql: String = s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |c AS (SELECT doc_id,
           |  CAST(len(toks) AS BIGINT) AS n_tokens,
           |  CAST(coalesce(list_sum(list_transform(toks, t -> len(t))), 0) AS BIGINT) AS sum_len,
           |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
           |  CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to','in'))) AS BIGINT) AS n_stop,
           |  CAST(coalesce(list_max(list_transform(list_distinct(toks[1:2048]),
           |    t -> len(list_filter(toks[1:2048], x -> x = t)))), 0) AS BIGINT) AS top_tok,
           |  CAST(len(toks[1:2048]) AS BIGINT) AS head_len
           |  FROM t),
           |m AS (SELECT doc_id, n_tokens,
           |  (10 * sum_len) // greatest(n_tokens, 1) AS mwl_x10,
           |  (100 * n_uniq) // greatest(n_tokens, 1) AS uniq_pct,
           |  n_stop,
           |  (100 * top_tok) // greatest(head_len, 1) AS top_tok_pct
           |  FROM c),
           |f AS (SELECT *,
           |  CAST(CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 1 ELSE 0 END AS BIGINT) AS r1,
           |  CAST(CASE WHEN mwl_x10 BETWEEN 30 AND 100 THEN 1 ELSE 0 END AS BIGINT) AS r2,
           |  CAST(CASE WHEN uniq_pct >= 30 THEN 1 ELSE 0 END AS BIGINT) AS r3,
           |  CAST(CASE WHEN n_stop >= 1 THEN 1 ELSE 0 END AS BIGINT) AS r4,
           |  CAST(CASE WHEN top_tok_pct <= 20 THEN 1 ELSE 0 END AS BIGINT) AS r5
           |  FROM m)
           |SELECT doc_id, n_tokens, mwl_x10, uniq_pct, n_stop, top_tok_pct,
           |  r1, r2, r3, r4, r5,
           |  5 - r1 - r2 - r3 - r4 - r5 AS n_fail,
           |  CAST(CASE WHEN r1+r2+r3+r4+r5 = 5 THEN 1 ELSE 0 END AS BIGINT) AS keep
           |FROM f ORDER BY doc_id""".stripMargin

  private lazy val DsirSql: String = s"""WITH t AS (SELECT doc_id, (lang = 'en') AS tgt,
           |  ${h60Sql(s"unnest($toksSql)")} % 256 AS bkt FROM documents),
           |b AS (SELECT bkt, CAST(count(*) AS BIGINT) AS rc,
           |  CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS tc FROM t GROUP BY 1),
           |tot AS (SELECT CAST(sum(rc) + 256 AS BIGINT) AS rawtot,
           |  CAST(sum(tc) + 256 AS BIGINT) AS tgttot FROM b),
           |w AS (SELECT bkt, (1000 * (tc + 1) * rawtot) // ((rc + 1) * tgttot) AS w FROM b, tot),
           |s AS (SELECT t.doc_id, CAST(sum(w.w - 1000) AS BIGINT) AS dsir_score
           |  FROM t JOIN w USING (bkt) GROUP BY t.doc_id)
           |SELECT d.doc_id, coalesce(s.dsir_score, 0) AS dsir_score
           |FROM documents d LEFT JOIN s USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin

  /** Fixed merge list for `q_bpe_encode`: high-frequency fixture pairs
    * plus one multi-char composition ((e,r) then (er,s)) so the
    * accumulator-shape path is exercised, not just char-pair merges.
    */
  private[graft] lazy val BpeFixedMerges: Seq[(String, String)] =
    Seq(("e", "r"), ("er", "s"), ("i", "n"), ("t", "h"))

  /** One greedy-merge ROUND of the q_bpe_encode oracle (see the
    * QuerySpec comment for the run-parity argument): `prev` → `next`,
    * both shaped (doc_id, wi, syms).
    */
  private def bpeRoundSql(prev: String, next: String,
                          p1: String, p2: String): String =
    s"""${next}_u AS (SELECT doc_id, wi, i, syms[i] AS s,
       |  (i < len(syms) AND syms[i] = '$p1' AND syms[i+1] = '$p2') AS m
       |  FROM (SELECT doc_id, wi, syms, unnest(generate_series(1, len(syms))) AS i FROM $prev)),
       |${next}_r AS (SELECT *, CASE WHEN m THEN i - row_number()
       |  OVER (PARTITION BY doc_id, wi, m ORDER BY i) END AS grp FROM ${next}_u),
       |${next}_o AS (SELECT *, CASE WHEN m THEN (row_number()
       |  OVER (PARTITION BY doc_id, wi, grp ORDER BY i) - 1) % 2 = 0 ELSE FALSE END AS sel FROM ${next}_r),
       |${next}_c AS (SELECT *, coalesce(lag(sel)
       |  OVER (PARTITION BY doc_id, wi ORDER BY i), FALSE) AS consumed FROM ${next}_o),
       |$next AS (SELECT doc_id, wi,
       |  list(CASE WHEN sel THEN '$p1$p2' ELSE s END ORDER BY i) FILTER (WHERE NOT consumed) AS syms
       |  FROM ${next}_c GROUP BY doc_id, wi)""".stripMargin

  private lazy val BpeEncodeSql: String = {
    val m = BpeFixedMerges.size
    val base =
      s"""w0 AS (SELECT doc_id, wi, list_transform(generate_series(1, len(w)), i -> substr(w, i, 1)) AS syms
         |  FROM (SELECT doc_id, unnest(toks) AS w, unnest(generate_series(1, len(toks))) AS wi
         |        FROM (SELECT doc_id, $toksSql AS toks FROM documents)))""".stripMargin
    val rounds = BpeFixedMerges.zipWithIndex.map { case ((p1, p2), j) =>
      bpeRoundSql(s"w$j", s"w${j + 1}", p1, p2)
    }
    (Seq("WITH " + base) ++ rounds).mkString(",\n") +
      s""",
         |enc AS (SELECT doc_id, flatten(list(syms ORDER BY wi)) AS toks2 FROM w$m GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(array_to_string(e.toks2, ' '), '') AS bpe_text,
         |  CAST(coalesce(len(e.toks2), 0) AS BIGINT) AS n_bpe_tokens
         |FROM documents d LEFT JOIN enc e USING (doc_id) ORDER BY d.doc_id""".stripMargin
  }

  private lazy val LmSql: String = s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |u AS (SELECT doc_id, unnest(toks) AS w FROM d),
           |c1 AS (SELECT w AS w1, CAST(count(*) AS BIGINT) AS c1 FROM u GROUP BY 1),
           |vv AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM u),
           |bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM
           |  (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
           |   FROM d WHERE len(toks) >= 2)),
           |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY 1, 2),
           |sc AS (SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           |  CAST(sum((100000 * (c2.c2 + 1)) // (c1.c1 + vv.v)) AS BIGINT) AS sp
           |  FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vv GROUP BY 1)
           |SELECT d.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams,
           |  coalesce(sc.sp // sc.n_bigrams, 0) AS lm_score_x100k
           |FROM d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id""".stripMargin
}
