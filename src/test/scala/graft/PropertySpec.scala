package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.{Dedup, Joins, Sampling, TextAnalysis}

/** Property-style checks (SURVEY §5c) on ScalaCheck-generated inputs:
  * hash/Jaccard invariants and salted-join ≡ plain-join equivalence.
  * Generators are driven by explicit seeds so failures reproduce exactly.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val word = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val text = Gen.choose(1, 15).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  test("h60 stays in [0, 2^60) and is stable per input") {
    val ws = samples(word, 40).distinct
    val df = ws.toDF("s")
    val out = df.select(TextFns.h60(col("s")).as("h")).as[Long].collect()
    assert(out.forall(h => h >= 0L && h < (1L << 60)))
    assert(out.toSeq === df.select(TextFns.h60(col("s")).as("h")).as[Long].collect().toSeq)
    assert(out.distinct.length === ws.length, "distinct inputs should not collide at this scale")
  }

  test("jaccardPct ∈ [0,100]; 100 on equal sets; symmetric") {
    val pairs = samples(Gen.zip(text, text), 25) ++ samples(text, 5).map(t => (t, t))
    val df = pairs.toDF("a", "b").select(
      col("a"), col("b"),
      TextFns.jaccardPct(array_distinct(split(col("a"), " ")),
        array_distinct(split(col("b"), " "))).as("ab"),
      TextFns.jaccardPct(array_distinct(split(col("b"), " ")),
        array_distinct(split(col("a"), " "))).as("ba"))
    df.collect().foreach { r =>
      val (a, b, ab, ba) = (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
      assert(ab >= 0L && ab <= 100L, s"out of range for ($a, $b)")
      assert(ab === ba, s"asymmetric for ($a, $b)")
      if (a == b) assert(ab === 100L)
    }
  }

  /** Docs edged/laced with non-space whitespace — the cases where Spark's
    * space-only `trim` used to produce a phantom leading token.
    */
  private val nastyTexts = Seq(
    "", " ", "\t", "\n", "\r\n", "\t\t \n",
    "\tleading tab", "trailing newline\n", "\rleading cr",
    "\n\nboth\tends\t\t", "a\tb\nc", " \t mixed \r\n ws \t ", "one", "\ttwo tokens\n")

  test("every token-count site agrees with tokens() on whitespace-edged docs") {
    // reference semantics: TextFns.tokens — the form whose DuckDB twin
    // (list_filter(regexp_split_to_array(...), != '')) the oracle gate pins
    val ws = Gen.oneOf("\t", "\n", "\r", " ", "")
    val decorated = samples(Gen.zip(ws, text, ws), 40).map { case (a, t, b) => a + t + b }
    val docs = (nastyTexts ++ decorated).zipWithIndex
      .map { case (t, i) => (i.toLong, t, "x") }.toDF("doc_id", "text", "lang")
    val want = docs.select(col("doc_id"),
      size(TextFns.tokens(col("text"))).cast("long").as("want"),
      size(array_distinct(TextFns.tokens(col("text")))).cast("long").as("want_uniq"))

    def assertMatches(got: org.apache.spark.sql.DataFrame, what: String): Unit =
      assert(got.join(want, Seq("doc_id")).filter(col("got") =!= col("want")).count() === 0L,
        s"$what must count exactly tokens().size on whitespace-edged docs")

    assertMatches(docs.select(col("doc_id"),
      TextFns.tokenCount(col("text")).as("got")), "TextFns.tokenCount")
    assertMatches(Sampling.packSequences(docs, "text", "doc_id", "lang", 512)
      .select(col("doc_id"), col("n_tokens").as("got")), "packSequences.n_tokens")
    val stats = TextAnalysis.textStats(docs, "text", "doc_id")
    assertMatches(stats.select(col("doc_id"), col("n_tokens").as("got")), "textStats.n_tokens")
    assert(stats.select(col("doc_id"), col("n_uniq"))
      .join(want, Seq("doc_id")).filter(col("n_uniq") =!= col("want_uniq")).count() === 0L,
      "textStats.n_uniq must match distinct tokens() on whitespace-edged docs")
    val totalWant = want.agg(sum("want")).collect().head.getLong(0)
    assert(TextAnalysis.tokenCountsByKey(docs, "text", "lang")
      .collect().head.getAs[Long]("n_tokens") === totalWant,
      "tokenCountsByKey must sum exactly tokens().size")
  }

  test("windowless shingleRows ≡ HOF shingles3 reference on random texts") {
    // the zip-of-shifted-slices rewrite must emit exactly the shingle
    // multiset of the declarative reference, including whitespace edge
    // cases the generator alone wouldn't hit
    val texts = samples(text, 60) ++ nastyTexts ++
      Seq("", " ", "a", "a b", "a b ", "  a   b  c ", "a b c d")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rows = Dedup.shingleRows(docs, "text", "doc_id")
      .groupBy("doc_id").agg(sort_array(collect_list(col("s"))).as("got"))
    val ref = docs.select(col("doc_id"),
      sort_array(TextFns.shingles3(TextFns.tokens(col("text")))).as("want"))
    val diff = rows.join(ref, Seq("doc_id"), "full")
      .filter(coalesce(col("got"), array()) =!= coalesce(col("want"), array()))
      .count()
    assert(diff === 0L, "shingle construction must match the reference exactly")
  }

  test("minhash signature: identical texts agree, values bounded by P") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon"), (2L, "alpha beta gamma delta epsilon"),
      (3L, "totally different words right here")).toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs, "text", "doc_id", 8).collect()
      .map(r => r.getLong(0) -> (1 until 9).map(r.getLong(_)).toSeq).toMap
    assert(sig(1L) === sig(2L))
    assert(sig(1L) !== sig(3L))
    assert(sig.values.flatten.forall(v => v >= 0 && v < Dedup.MinhashP))
  }

  test("salted join ≡ plain join on random key distributions") {
    samples(Gen.listOfN(50, Gen.choose(0, 5)), 3).foreach { keys =>
      val big = keys.zipWithIndex.map { case (k, i) => (s"k$k", i.toLong) }.toDF("k", "v")
      val small = (0 to 5).map(k => (s"k$k", k * 10)).toDF("k", "w")
      val plain = big.join(small, Seq("k")).select("k", "v", "w").collect().toSet
      val salted = Joins.saltedJoin(big, small, "k", 4).select("k", "v", "w").collect().toSet
      assert(salted === plain)
    }
  }

  test("dup-ngram fraction: edge docs (blank, 1-token, whitespace-edged) never crash or divide by zero") {
    val edge = Seq((0L, ""), (1L, "solo"), (2L, "  \t tab  edged \n"), (3L, "a b"),
      (4L, "x y z"), (5L, "x y z")).toDF("doc_id", "text")
    val out = Dedup.duplicateNgramFraction(edge, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("n_shingles"), r.getAs[Long]("dup_pct"))).toMap
    assert(!out.contains(0L), "blank doc emits no shingles, so no row")
    assert(out(1L)._1 === 1L, "1-token doc gets its whole-text shingle")
    assert(out(4L)._2 === 100L && out(5L)._2 === 100L, "identical 3-token docs fully dup")
    assert(out.values.forall { case (n, pct) => n > 0 && pct >= 0 && pct <= 100 })
  }

  test("shuffle-shard is total and dense for any nShards >= 1, including nShards > rows") {
    val five = spark.range(5).toDF("doc_id")
    Seq(1, 3, 64).foreach { n =>
      val out = Sampling.shuffleShard(five, "doc_id", n).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      assert(out.length === 5)
      assert(out.map(_._2).forall(s => s >= 0 && s < n))
      out.groupBy(_._2).values.foreach(rows =>
        assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq))
    }
  }

  test("chunking covers every token exactly, for random docs and (size, stride) combos") {
    val docs = samples(text, 30).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val normToks = samples(text, 30).map(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
    for ((cs, st) <- Seq((8, 8), (8, 5), (4, 1))) {
      val chunks = Sampling.chunkDocs(docs, "text", "doc_id", cs, st)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .groupBy(_._1)
      normToks.zipWithIndex.foreach { case (toks, i) =>
        val cks = chunks.getOrElse(i.toLong, Array.empty).sortBy(_._2)
        // every chunk's text is the exact token slice at its stride offset
        cks.foreach { case (_, k, nTok, txt) =>
          val start = ((k - 1) * st).toInt
          assert(txt === toks.slice(start, start + cs).mkString(" "), s"doc $i chunk $k")
          assert(nTok === math.min(cs, toks.length - start).toLong)
        }
        // coverage: chunk starts advance by stride until the tail is inside
        // the final chunk — so the union of [start, start+cs) is 0..n
        val covered = cks.flatMap { case (_, k, nTok, _) =>
          val s0 = ((k - 1) * st).toInt; s0 until (s0 + nTok.toInt)
        }.toSet
        assert(covered === toks.indices.toSet, s"doc $i must be fully covered")
      }
    }
  }

  test("line dedup on a single-doc corpus keeps the normalized text verbatim (modulo within-doc repeats)") {
    // docs built from DISTINCT segments: nothing to dedup, text must
    // round-trip through explode→window→rebuild exactly
    val uniqueDocs = samples(Gen.listOfN(12, word).map(_.distinct), 20).zipWithIndex
      .map { case (ws, i) => (i.toLong + 1000L * (i + 1), ws.mkString(" ")) }
    val df = uniqueDocs.toDF("doc_id", "text")
    val out = graft.operators.Curation.lineDedup(df, "text", "doc_id", segTokens = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    uniqueDocs.foreach { case (id, t) =>
      val (clean, removed) = out(id)
      val norm = t.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString(" ")
      // a 3-token segment colliding ACROSS docs removes it from the later
      // doc — legitimate dedup, not a round-trip failure; only assert the
      // verbatim round-trip when nothing was removed anywhere for this doc
      if (removed == 0L) assert(clean === norm, s"doc $id must round-trip")
    }
    assert(out.values.count(_._2 == 0L) >= uniqueDocs.size - 2,
      "random distinct-word docs should almost never share a segment")
  }

  test("filter funnel on an empty corpus yields a zero row, not a crash") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val r = graft.operators.Curation.filterFunnel(empty, "text", "doc_id").collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_total") === 0L && r.head.getAs[Long]("n_final") === 0L)
  }

  test("bpeEncode round-trips random words under random trained merges") {
    // train on one random corpus, encode ANOTHER — encoding must always
    // reconstruct each word by concatenation, merges applicable or not
    val trainTxt = samples(text, 6).mkString(" ")
    val train = Seq((0L, trainTxt)).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(train, "text", 5)
    assert(merges.nonEmpty)
    val scoreDocs = samples(text, 12).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val out = TextAnalysis.bpeEncode(scoreDocs.toDF("doc_id", "text"),
        "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    scoreDocs.foreach { case (id, t) =>
      val norm = t.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString
      assert(out(id).mkString === norm, s"doc $id must round-trip under merges $merges")
    }
  }

  test("funnel monotonicity: adding events never decreases any step count") {
    val steps = Seq("view", "click", "purchase")
    val base = samples(Gen.zip(Gen.choose(1L, 6L), Gen.choose(0L, 1000L),
      Gen.oneOf(steps ++ Seq("error"))), 40)
      .zipWithIndex.map { case ((u, t, e), i) => (u, new java.sql.Timestamp(t * 1000), i.toLong, e) }
    val extra = samples(Gen.zip(Gen.choose(1L, 6L), Gen.choose(0L, 1000L),
      Gen.oneOf(steps)), 10)
      .zipWithIndex.map { case ((u, t, e), i) => (u, new java.sql.Timestamp(t * 1000), 1000L + i, e) }
    def counts(rows: Seq[(Long, java.sql.Timestamp, Long, String)]): Seq[Long] =
      graft.operators.EventAnalytics.funnel(
          rows.toDF("user_id", "ts", "event_id", "event_type"),
          "user_id", "ts", "event_type", steps)
        .collect().map(_.getLong(2)).toSeq
    val before = counts(base)
    val after = counts(base ++ extra)
    assert(before.zip(after).forall { case (b, a) => a >= b },
      s"monotonicity violated: $before -> $after")
  }

  test("dsirScore is additive over concatenation (fixed model)") {
    import org.apache.spark.sql.functions.col
    // model trained on a FIXED corpus; scoring additivity follows from
    // the per-token fold — score(a ++ b) = score(a) + score(b)
    val a = samples(text, 1).head
    val b = samples(text, 2).last
    val corpus = Seq((0L, a, "en"), (1L, b, "de"), (2L, s"$a $b", "en"))
      .toDF("doc_id", "text", "lang")
    val out = graft.operators.Curation.dsirScore(corpus, "text", "doc_id",
        col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(2L) === out(0L) + out(1L),
      s"additivity: ${out(2L)} != ${out(0L)} + ${out(1L)}")
  }

  test("pivotCount survives pivot VALUES containing backticks and quotes") {
    // pivot values are caller DATA that become column names — hostile
    // characters must be escaped into the column reference, not parsed
    val hostile = Seq("/v1/a`b", "it's", "plain")
    val df = Seq(("k1", "/v1/a`b"), ("k1", "it's"), ("k2", "plain"),
        ("k2", "/v1/a`b"), ("k2", "/v1/a`b"))
      .toDF("app", "endpoint")
    val out = graft.operators.Aggregates.pivotCount(df, "app", "endpoint", hostile)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("k1") === ((1L, 1L, 0L)))
    assert(out("k2") === ((2L, 0L, 1L)))
  }

  test("profile survives column names containing quotes and backticks") {
    val df = Seq((1, "x"), (2, null), (3, "z"))
      .toDF("it's_col", "weird`name")
    val out = graft.operators.Aggregates.profile(df, Seq("it's_col", "weird`name"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("it's_col") === ((3L, 0L, 3L)))       // n_rows, n_nulls, n_distinct
    assert(out("weird`name") === ((3L, 1L, 2L)))
  }

  test("percentiles/cms/rangeJoin survive quote/space column names (parser-hygiene pins)") {
    // the operators that used to render caller names into SQL text — a
    // name with a quote or space must resolve as a plain reference (the
    // old expr() forms threw PARSE_SYNTAX_ERROR on these). Raw backticks
    // and dots stay subject to col()'s own attribute-name rules, the
    // ecosystem-wide convention this library doesn't re-litigate.
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0))
      .toDF("the key", "va'lu e")
    val p = graft.operators.Aggregates.percentiles(df, "the key", "va'lu e")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(p === Map("a" -> 2.0, "b" -> 10.0))
    // CMS takes integral/string inputs — sketch the (space-named) key col
    val blobs = graft.operators.Aggregates.cmsSketches(df, "the key", "the key")
    assert(blobs.collect().length === 2)
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val pts = Seq((1L, "u", ts("2025-01-26 10:30:00")))
      .toDF("event_id", "k", "t s")
    val ivs = Seq(("u", ts("2025-01-26 10:00:00"), ts("2025-01-26 11:00:00")))
      .toDF("k", "sta rt", "en'd")
    val hits = graft.operators.Joins.rangeJoin(
      pts, ivs, "k", "t s", "sta rt", "en'd", bucketSeconds = 900L).count()
    assert(hits === 1L)
  }
}
