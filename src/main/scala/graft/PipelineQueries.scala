package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables.Fixture
import graft.operators.{Sampling, TextAnalysis}

/** Declared dataset-construction queries ([NS] wave 2): deterministic
  * sampling, sequence packing, PII scrubbing, TF-IDF — the steps between a
  * curated corpus and a training run. Oracle SQL mirrors each pipeline
  * expression-for-expression (md5 membership hashes, integer-math scores,
  * exact window frames); portability rules in [[graft.functions.TextFns]].
  */
object PipelineQueries {

  import NsQueries.{toksSql, h60Sql, curateCtes}

  private val nToksSql = s"CAST(len($toksSql) AS BIGINT)"

  val specs: Seq[QuerySpec] = Seq(

    // ── deterministic hash sample: 1/5 of docs by id hash ──────────────
    QuerySpec("q_sample_hash",
      (s, d) => Sampling.sampleByHash(Fixture(s, d).documents, "doc_id", mod = 5, keep = 1)
        .select("doc_id", "lang").orderBy("doc_id"),
      Some("SELECT doc_id, lang FROM documents " +
        s"WHERE ${h60Sql("CAST(doc_id AS VARCHAR)")} % 5 < 1 ORDER BY doc_id")),

    // ── stratified hash sample: 50% of en, 10% of everything else ──────
    QuerySpec("q_sample_strat",
      (s, d) => Sampling.sampleStratified(Fixture(s, d).documents, "lang", "doc_id",
          Map("en" -> 50), defaultPct = 10)
        .select("doc_id", "lang").orderBy("doc_id"),
      Some("SELECT doc_id, lang FROM documents " +
        s"WHERE ${h60Sql("CAST(doc_id AS VARCHAR)")} % 100 < " +
        "CASE WHEN lang = 'en' THEN 50 ELSE 10 END ORDER BY doc_id")),

    // ── importance resampling (priority sampling, DLT 2007): top-200 by
    // (w·2^20) DIV u with u the deterministic md5-uniform; weight =
    // n_chars (composes with any non-negative score, e.g. shifted DSIR) ──
    QuerySpec("q_importance_sample",
      (s, d) => Sampling.importanceSample(Fixture(s, d).documents
          .select("doc_id", "n_chars"), "n_chars", "doc_id", n = 200)
        .select("doc_id", "n_chars", "priority"),
      Some(
        s"""SELECT doc_id, n_chars,
           |  CAST((CAST(n_chars AS HUGEINT) * 1048576) // ((${h60Sql("CAST(doc_id AS VARCHAR)")} % 1048576) + 1) AS BIGINT) AS priority
           |FROM documents WHERE n_chars > 0
           |ORDER BY priority DESC, doc_id LIMIT 200""".stripMargin)),

    // ── deterministic labeled train/val/test split (80/10/10): an
    // exhaustive hash PARTITION (not a membership filter) — remainder
    // falls to the last split ──
    QuerySpec("q_split",
      (s, d) => Sampling.assignSplit(Fixture(s, d).documents, "doc_id",
          Seq(("train", 80), ("val", 10), ("test", 10)))
        .select("doc_id", "split").orderBy("doc_id"),
      Some(
        s"""SELECT doc_id,
           |  CASE WHEN ${h60Sql("CAST(doc_id AS VARCHAR)")} % 100 < 80 THEN 'train'
           |       WHEN ${h60Sql("CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM documents ORDER BY doc_id""".stripMargin)),

    // ── greedy sequence packing into 512-token bins, sharded by lang ───
    QuerySpec("q_pack_seq",
      (s, d) => Sampling.packSequences(Fixture(s, d).documents, "text", "doc_id",
          "lang", tokenBudget = 512)
        .orderBy("doc_id"),
      Some(
        s"""WITH t AS (SELECT doc_id, lang, $nToksSql AS n_tokens FROM documents),
           |c AS (SELECT doc_id, lang, n_tokens,
           |  CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
           |  FROM t)
           |SELECT doc_id, lang, n_tokens, cum_tokens,
           |  (cum_tokens - n_tokens) // 512 AS bin
           |FROM c ORDER BY doc_id""".stripMargin)),

    // ── PII scrub with per-doc hit counts ──────────────────────────────
    QuerySpec("q_pii_scrub",
      (s, d) => TextAnalysis.scrubPii(Fixture(s, d).documents, "text", "doc_id")
        .orderBy("doc_id"),
      Some {
        // steps(i) mirrors the Spark side: text after patterns 0..i-1;
        // each count runs against its own step, not the original text
        val steps = TextAnalysis.piiPatterns.scanLeft("text") {
          case (acc, (pat, tag)) => s"regexp_replace($acc, '$pat', '$tag', 'g')"
        }
        val counts = TextAnalysis.piiPatterns.zip(steps).map { case ((pat, tag), prior) =>
          s"CAST(len(regexp_extract_all($prior, '$pat')) AS BIGINT) AS " +
            "n_" + tag.stripPrefix("<").stripSuffix(">").toLowerCase
        }.mkString(", ")
        s"SELECT doc_id, ${steps.last} AS scrubbed, $counts FROM documents ORDER BY doc_id"
      }),

    // ── top-3 distinctive terms per doc by integer tf/df ───────────────
    QuerySpec("q_tfidf",
      (s, d) => TextAnalysis.tfIdfTopTerms(Fixture(s, d).documents, "text", "doc_id", k = 3)
        .orderBy("doc_id", "rnk"),
      Some(
        s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
           |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY doc_id, tok),
           |df AS (SELECT tok, count(*) AS df FROM
           |  (SELECT DISTINCT doc_id, tok FROM t) GROUP BY tok),
           |j AS (SELECT doc_id, tok, tf, df, (tf * 1000000) // df AS score_x1m,
           |  row_number() OVER (PARTITION BY doc_id
           |    ORDER BY (tf * 1000000) // df DESC, tok) AS rnk
           |  FROM tf JOIN df USING (tok))
           |SELECT doc_id, tok AS term, tf, df, score_x1m, rnk
           |FROM j WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin)),

    // ── deterministic shuffle-and-shard: md5 order, 8 shards ───────────
    QuerySpec("q_shard",
      (s, d) => Sampling.shuffleShard(Fixture(s, d).documents, "doc_id", nShards = 8)
        .orderBy("doc_id"),
      Some(
        s"""WITH h AS (SELECT doc_id, ${h60Sql("CAST(doc_id AS VARCHAR)")} AS h FROM documents),
           |s AS (SELECT doc_id, h, CAST(h % 8 AS INT) AS shard FROM h)
           |SELECT doc_id, shard,
           |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) - 1 AS pos
           |FROM s ORDER BY doc_id""".stripMargin)),

    // ── mixture sampling: per-source token shares of a global budget ───
    QuerySpec("q_mixture",
      (s, d) => Sampling.mixtureByTokenBudget(Fixture(s, d).documents,
          "text", "doc_id", "source",
          Map("src1" -> 500, "src2" -> 300), totalBudget = 20000L, defaultPermille = 10)
        .orderBy("doc_id"),
      Some(
        s"""WITH t AS (SELECT doc_id, source,
           |  ${h60Sql("CAST(doc_id AS VARCHAR)")} AS h, $nToksSql AS n_tokens,
           |  CAST(CASE WHEN source = 'src2' THEN 300 WHEN source = 'src1' THEN 500
           |    ELSE 10 END AS BIGINT) * 20 AS budget
           |  FROM documents),
           |c AS (SELECT doc_id, source, n_tokens, budget,
           |  CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
           |  FROM t)
           |SELECT doc_id, source, n_tokens, cum_tokens
           |FROM c WHERE cum_tokens - n_tokens < budget ORDER BY doc_id""".stripMargin)),

    // ── quality-weighted sampling: keep rate ∝ quality score ───────────
    QuerySpec("q_sample_quality",
      (s, d) => Sampling.sampleByQuality(Fixture(s, d).documents, "text", "doc_id",
          maxPct = 40)
        .orderBy("doc_id"),
      Some(
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |c AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
           |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
           |  CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to','in'))) AS BIGINT) AS n_stop
           |  FROM t),
           |sc AS (SELECT doc_id,
           |  least(n_tokens, 100) * 4 + (300 * n_uniq) // greatest(n_tokens, 1)
           |    + 300 - (300 * n_stop) // greatest(n_tokens, 1) AS score FROM c)
           |SELECT doc_id, score, (score * 40) // 1000 AS keep_pct FROM sc
           |WHERE ${h60Sql("CAST(doc_id AS VARCHAR)")} % 100 < (score * 40) // 1000
           |ORDER BY doc_id""".stripMargin)),

    // ── per-source quota cap: ≤20 docs per source, md5-order pick ──────
    QuerySpec("q_source_cap",
      (s, d) => Sampling.sourceCap(Fixture(s, d).documents, "source", "doc_id", cap = 20)
        .orderBy("doc_id"),
      Some(
        s"""SELECT doc_id, source, rk FROM (
           |  SELECT doc_id, source, CAST(row_number() OVER (PARTITION BY source
           |    ORDER BY ${h60Sql("CAST(doc_id AS VARCHAR)")}, doc_id) AS BIGINT) AS rk
           |  FROM documents) t WHERE rk <= 20 ORDER BY doc_id""".stripMargin)),

    // ── fixed-size token chunking with stride (32-token chunks, 24 step) ─
    QuerySpec("q_chunk",
      (s, d) => Sampling.chunkDocs(Fixture(s, d).documents, "text", "doc_id",
          chunkTokens = 32, stride = 24)
        .orderBy("doc_id", "chunk_id"),
      Some(
        s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |idx AS (SELECT doc_id, toks,
           |  unnest(generate_series(1, CAST((greatest(len(toks) - 32, 0) + 23) // 24 AS INT) + 1)) AS k
           |  FROM tok WHERE len(toks) > 0)
           |SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
           |  CAST(least(32, len(toks) - (k-1)*24) AS BIGINT) AS n_tok,
           |  array_to_string(toks[((k-1)*24+1):(least((k-1)*24+32, len(toks)))], ' ') AS chunk_text
           |FROM idx ORDER BY doc_id, chunk_id""".stripMargin)),

    // ── N8o: the training-export capstone's PRE-WRITE frame as a
    // declared query — curate → decontam (eval = doc_id%50 split) →
    // mixture (src1/src2 shares of a 20k-token budget) → 32/24 chunking
    // → (shard, pos) assignment, END-TO-END oracle-checked: the DuckDB
    // side composes the SAME CTE chains that individually back
    // q_curate, q_decontam, q_mixture, q_chunk and q_shard, so the
    // capstone's correctness no longer rests on spec-only equivalence
    // to its stages. Every stage is hash-deterministic, so this frame
    // IS what TrainingExport.export lays on disk, minus file layout. ──
    QuerySpec("q_export",
      (s, d) => {
        val docs = Fixture(s, d).documents
        graft.operators.TrainingExport.exportRows(
          graft.operators.Curation.curate(docs, "text", "doc_id"),
          "text", "doc_id", nShards = 8,
          evalSet = Some(docs.filter(col("doc_id") % 50 === 0)),
          mixture = Some(graft.operators.TrainingExport.Mixture("source",
            Map("src1" -> 500, "src2" -> 300), totalBudget = 20000L,
            defaultPermille = 10)),
          chunk = Some(graft.operators.TrainingExport.Chunk(32, 24)))
          .orderBy("sample_id")
      },
      Some {
        val shingleCase = "CASE WHEN len(toks) >= 3 THEN " +
          "list_transform(generate_series(1, len(toks) - 2), " +
          "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) " +
          "WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')] " +
          "ELSE [] END AS shingles"
        s"""WITH RECURSIVE
           |$curateCtes,
           |cur AS (SELECT ek.doc_id, ek.text FROM ek
           |  LEFT JOIN losers ON ek.doc_id = losers.id WHERE losers.id IS NULL),
           |xt AS (SELECT doc_id, $toksSql AS toks FROM cur),
           |xsh AS (SELECT doc_id, $shingleCase FROM xt),
           |xex AS (SELECT DISTINCT doc_id, ${h60Sql("unnest(shingles)")} AS h FROM xsh),
           |evt AS (SELECT doc_id, $toksSql AS toks FROM documents WHERE doc_id % 50 = 0),
           |evsh AS (SELECT doc_id, $shingleCase FROM evt),
           |evh AS (SELECT DISTINCT ${h60Sql("unnest(shingles)")} AS h FROM evsh),
           |contam AS (SELECT DISTINCT doc_id FROM xex WHERE h IN (SELECT h FROM evh)),
           |clean AS (SELECT cur.doc_id FROM cur
           |  LEFT JOIN contam ON cur.doc_id = contam.doc_id WHERE contam.doc_id IS NULL),
           |mt AS (SELECT cl.doc_id, d.source,
           |  ${h60Sql("CAST(cl.doc_id AS VARCHAR)")} AS h,
           |  CAST(len(xt.toks) AS BIGINT) AS n_tokens,
           |  CAST(CASE WHEN d.source = 'src2' THEN 300 WHEN d.source = 'src1' THEN 500
           |    ELSE 10 END AS BIGINT) * 20 AS budget
           |  FROM clean cl JOIN documents d ON cl.doc_id = d.doc_id
           |  JOIN xt ON xt.doc_id = cl.doc_id),
           |mc AS (SELECT doc_id, n_tokens, budget,
           |  CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
           |  FROM mt),
           |samp AS (SELECT doc_id FROM mc WHERE cum - n_tokens < budget),
           |chin AS (SELECT s.doc_id, xt.toks FROM samp s JOIN xt ON xt.doc_id = s.doc_id),
           |chidx AS (SELECT doc_id, toks,
           |  unnest(generate_series(1, CAST((greatest(len(toks) - 32, 0) + 23) // 24 AS INT) + 1)) AS k
           |  FROM chin WHERE len(toks) > 0),
           |rws AS (SELECT CAST(doc_id AS VARCHAR) || '#' || CAST(k AS VARCHAR) AS sample_id,
           |  doc_id, CAST(k AS BIGINT) AS chunk_id,
           |  CAST(least(32, len(toks) - (k-1)*24) AS BIGINT) AS n_tok,
           |  array_to_string(toks[((k-1)*24+1):(least((k-1)*24+32, len(toks)))], ' ') AS text
           |  FROM chidx),
           |shd AS (SELECT sample_id, doc_id, chunk_id, n_tok, text,
           |  ${h60Sql("sample_id")} AS h FROM rws)
           |SELECT sample_id, doc_id, chunk_id, n_tok, text,
           |  CAST(h % 8 AS INT) AS shard,
           |  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, sample_id) AS BIGINT) - 1 AS pos
           |FROM shd ORDER BY sample_id""".stripMargin
      }),

    // ── CCNet-style line (segment) dedup: first occurrence wins ────────
    QuerySpec("q_line_dedup",
      (s, d) => graft.operators.Curation.lineDedup(
          Fixture(s, d).documents, "text", "doc_id", segTokens = 8)
        .orderBy("doc_id"),
      Some(
        s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |idx AS (SELECT doc_id, toks,
           |  unnest(generate_series(1, CAST(ceil(len(toks) / 8.0) AS INT))) AS seg_i FROM tok),
           |segs AS (SELECT doc_id, seg_i - 1 AS pos,
           |  array_to_string(toks[((seg_i-1)*8+1):(least(seg_i*8, len(toks)))], ' ') AS seg FROM idx),
           |ranked AS (SELECT doc_id, pos, seg,
           |  row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn FROM segs),
           |agg AS (SELECT doc_id,
           |  string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY pos) AS clean_text,
           |  CAST(count(*) AS BIGINT) AS n_lines,
           |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
           |  FROM ranked GROUP BY doc_id)
           |SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
           |  CAST(coalesce(a.n_lines, 0) AS BIGINT) AS n_lines,
           |  CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed
           |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
           |ORDER BY d.doc_id""".stripMargin)),

    // ── curation filter-funnel survivorship (single-scan stage counts) ─
    QuerySpec("q_funnel",
      (s, d) => graft.operators.Curation.filterFunnel(
        Fixture(s, d).documents, "text", "doc_id",
        langs = Set("en"), minQualityScore = 640L, minTokens = 30L),
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
           |s AS (SELECT doc_id, toks, $scoreCols FROM t),
           |f AS (SELECT doc_id,
           |  CASE $cases ELSE 'und' END AS pred_lang,
           |  CAST(len(toks) AS BIGINT) AS n_tokens,
           |  least(CAST(len(toks) AS BIGINT), 100) * 4
           |    + (300 * CAST(len(list_distinct(toks)) AS BIGINT)) // greatest(CAST(len(toks) AS BIGINT), 1)
           |    + 300 - (300 * CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to','in'))) AS BIGINT)) // greatest(CAST(len(toks) AS BIGINT), 1) AS score
           |  FROM s),
           |g AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
           |  CAST(COALESCE(sum(CASE WHEN pred_lang IN ('en') THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_lang,
           |  CAST(COALESCE(sum(CASE WHEN pred_lang IN ('en') AND score >= 640 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_quality,
           |  CAST(COALESCE(sum(CASE WHEN pred_lang IN ('en') AND score >= 640 AND n_tokens >= 30 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_final
           |  FROM f)
           |SELECT n_total, n_lang, n_quality, n_final,
           |  (100 * n_final) // greatest(n_total, 1) AS kept_pct FROM g""".stripMargin
      })
  )
}
