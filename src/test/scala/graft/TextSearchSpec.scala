package graft

import org.apache.spark.sql.functions.{col, lit, pmod}
import graft.operators.TextSearch

class TextSearchSpec extends SparkTestBase {
  import spark.implicits._

  // the integer-BM25 contract, replayed in plain Scala: one term's
  // contribution given (tf, dl, df) and corpus globals (N docs, T tokens)
  private def termScore(tf: Long, dl: Long, df: Long, n: Long, t: Long): Long = {
    val avgdl = (1000L * t) / n
    val idf = (1000L * (2L * (n - df) + 1L)) / (2L * df + 1L)
    val tfn = (22000L * tf * avgdl) / (10L * tf * avgdl + 3L * avgdl + 9000L * dl)
    idf * tfn
  }

  private val docs = Seq(
    (1L, "spark shuffle spark join"),         // dl 4: spark tf=2
    (2L, "spark scan"),                       // dl 2: spark tf=1, short doc
    (3L, "shuffle shuffle shuffle spark x"),  // dl 5: shuffle tf=3
    (4L, "unrelated words only here"),        // matches nothing
    (5L, ""))                                 // empty: dl 0, no postings
    .toDF("doc_id", "text")

  test("bm25: hand-computed integer scores, rare term outranks common, ties break by id") {
    // corpus globals: N = 5 docs (empty one counts), T = 4+2+5+4+0 = 15
    val (n, t) = (5L, 15L)
    // df: spark in {1,2,3} = 3; shuffle in {1,3} = 2
    val out = TextSearch.bm25TopK(docs, "text", "doc_id", "spark shuffle", 10)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("score_x1m"), r.getAs[Long]("n_terms")))
    val expected = Map(
      1L -> (termScore(2, 4, 3, n, t) + termScore(1, 4, 2, n, t), 2L),
      2L -> (termScore(1, 2, 3, n, t), 1L),
      3L -> (termScore(3, 5, 2, n, t) + termScore(1, 5, 3, n, t), 2L))
    assert(out.map(r => r._1 -> ((r._2, r._3))).toMap === expected)
    // doc 3 (3× the rarer 'shuffle') must outrank everything
    assert(out.head._1 === 3L)
    // total order: score desc, then id asc
    assert(out.map(_._1).toSeq ===
      expected.toSeq.sortBy { case (id, (s, _)) => (-s, id) }.map(_._1))
  }

  test("bm25: repeated query terms count once; no-match query returns empty") {
    val once = TextSearch.bm25TopK(docs, "text", "doc_id", "spark", 10).collect()
    val twice = TextSearch.bm25TopK(docs, "text", "doc_id", "spark SPARK spark", 10).collect()
    assert(once.map(_.toSeq).toSeq === twice.map(_.toSeq).toSeq)
    assert(TextSearch.bm25TopK(docs, "text", "doc_id", "zzz qqq", 10).count() === 0L)
  }

  test("hybrid rrf: hand-computed fusion, overlap sums, single-list docs rank by one contribution") {
    // vectors chosen so cosine vs query (vec 0 = (1,0)) orders 1 > 2 > 3;
    // doc 4 has no embedding row beyond being absent from top-k by angle
    val emb = Seq(
      (0L, Array(1.0, 0.0)),   // query
      (1L, Array(0.9, 0.1)),   // ~cos .994
      (2L, Array(0.7, 0.7)),   // cos .707
      (3L, Array(0.0, 1.0)),   // cos 0
      (4L, Array(-1.0, 0.0)))  // cos -1
      .toDF("vec_id", "embedding")
    // lexical: docs 3 and 4 match 'spark'; 3 has tf 2 in dl 2 (higher), 4
    // tf 1 dl 2. Doc 0 is the ANCHOR: it would top the lexical list (tf 3)
    // and the vector list (cos 1), but symmetric exclusion bars it from
    // both — it must not come back at a half-strength fused score.
    val hdocs = Seq(
      (0L, "spark spark spark"),
      (1L, "nothing relevant"), (2L, "words here"),
      (3L, "spark spark"), (4L, "spark scan"), (5L, "filler text"))
      .toDF("doc_id", "text")

    val out = TextSearch.hybridRrf(hdocs, "text", "doc_id", emb, "vec_id", "embedding",
      query = "spark", queryVecId = 0L, kPerList = 3, k = 10)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("rrf_x1m"), r.getAs[Long]("n_lists")))

    // lexical ranks: 3 → 1, 4 → 2 (only matches; kPerList=3 keeps both)
    // vector ranks: 1 → 1, 2 → 2, 3 → 3
    def c(rank: Long) = 1000000L / (60L + rank)
    val expected = Map(
      3L -> (c(1) + c(3), 2L), // both lists
      1L -> (c(1), 1L), 4L -> (c(2), 1L), 2L -> (c(2), 1L))
    assert(out.map(r => r._1 -> ((r._2, r._3))).toMap === expected)
    assert(!out.map(_._1).contains(0L),
      "the anchor doc must be excluded from both legs, not returned")
    // fused order: 3 (two contributions) first; 1 and 4 tie on c-value? no:
    // c(1)=16393 > c(2)=16129, so 1 (vec rank 1) precedes 4 and 2 (rank-2s,
    // equal contribution) which tie-break by id: 4 then... id asc → 2 then 4
    assert(out.map(_._1).toSeq === Seq(3L, 1L, 2L, 4L))
  }

  test("phrase: overlapping occurrences, duplicate-term phrases, case/whitespace robustness") {
    val pdocs = Seq(
      (1L, "a a a b"),        // "a a" overlaps: 2; "a a a": 1
      (2L, "x A  a y a a z"), // case + double space; "a a": 2 (non-adjacent a's don't chain)
      (3L, "a b a b a"),      // "a b a": 2 (overlapping, duplicate term)
      (4L, "b b b"), (5L, ""))
      .toDF("doc_id", "text")
    def counts(phrase: String) =
      TextSearch.phraseCount(pdocs, "text", "doc_id", phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts("a a") === Map(1L -> 2L, 2L -> 2L))
    assert(counts("a a a") === Map(1L -> 1L))
    assert(counts("a b a") === Map(3L -> 2L))
    assert(counts("A B") === Map(1L -> 1L, 3L -> 2L), "query must normalize case")
    assert(counts("q z") === Map.empty)

    // the positional probe agrees on every one of those phrases
    val postings = TextSearch.positionalPostings(pdocs, "text", "doc_id")
      .withColumn("tmod", pmod(col("term_h"), lit(16L)))
    for (p <- Seq("a a", "a a a", "a b a", "a b", "b b")) {
      val viaIdx = TextSearch.phraseProbe(postings, "doc_id", p, partitionMod = 16L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaIdx === counts(p), s"probe disagrees with in-query for '$p'")
    }
  }

  test("phrase probe over the stored index prunes to the phrase terms' partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-posidx").toString
    val fixture = graft.sources.Tables.Fixture(spark, sfDir).documents
    TextSearch.positionalPostings(fixture, "text", "doc_id")
      .withColumn("tmod", pmod(col("term_h"), lit(64L)))
      .write.partitionBy("tmod").parquet(s"$dir/postings")
    val stored = spark.read.parquet(s"$dir/postings")

    val phrase = "big order scan" // present in the sf0.001 fixture
    val viaStore = TextSearch.phraseProbe(stored, "doc_id", phrase, partitionMod = 64L)
      .collect().map(_.toSeq).toSeq
    val inQuery = TextSearch.phraseCount(fixture, "text", "doc_id", phrase)
      .collect().map(_.toSeq).toSeq
    assert(viaStore === inQuery, "stored probe must reproduce the in-query counts")
    assert(viaStore.nonEmpty, "fixture must contain the phrase")

    val mods = TextSearch.phraseTokens(phrase)
      .map(graft.functions.TextFns.h60Local(_) % 64L).distinct
    val probe = stored.filter(col("tmod").isin(mods.map(Long.box): _*))
    probe.collect()
    val scan = probe.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty, "tmod must prune as a partition filter")
    val partsRead = scan.metrics.get("numPartitions").map(_.value).getOrElse(-1L)
    assert(partsRead === mods.length.toLong,
      s"probe must read exactly ${mods.length} partitions, read $partsRead")
  }

  test("bm25: stored-index probe over tmod partitions equals the in-query path and prunes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25idx").toString
    val fixture = graft.sources.Tables.Fixture(spark, sfDir).documents
    val (postings, stats) = TextSearch.bm25Index(fixture, "text", "doc_id")
    graft.sources.Sinks.writePartitioned(
      postings.withColumn("tmod", pmod(col("term_h"), lit(64L))), "tmod", dir + "/postings")
    stats.write.parquet(dir + "/stats")
    val stored = spark.read.parquet(dir + "/postings")
    val storedStats = spark.read.parquet(dir + "/stats")

    val query = "dup vector stream"
    val viaStore = TextSearch.bm25Probe(stored, storedStats, "doc_id", query, 10,
      partitionMod = 64L).collect().map(_.toSeq).toSeq
    val inQuery = TextSearch.bm25TopK(fixture, "text", "doc_id", query, 10)
      .collect().map(_.toSeq).toSeq
    assert(viaStore === inQuery, "stored probe must reproduce the in-query result")

    // the probe scan reads only the query terms' hash classes
    val mods = TextSearch.queryTerms(query).map(graft.functions.TextFns.h60Local(_) % 64L).distinct
    val nParts = stored.select("tmod").distinct().count()
    assert(mods.length.toLong < nParts,
      s"a ${mods.length}-term query must touch a strict subset of $nParts classes")
    val probe = stored.filter(col("tmod").isin(mods.map(Long.box): _*))
    probe.collect()
    val scan = probe.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty,
      s"tmod must prune as a partition filter, not a row filter:\n$scan")
    val partsRead = scan.metrics.get("numPartitions").map(_.value).getOrElse(-1L)
    assert(partsRead === mods.length.toLong,
      s"probe must read exactly ${mods.length} of $nParts partitions, read $partsRead")
  }
}
