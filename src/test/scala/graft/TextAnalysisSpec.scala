package graft

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "The cat sat on the mat and the dog ran to the park"),
    (1L, "el perro es grande y la casa es de madera que bonita"),
    (2L, "der Hund ist nicht klein und die Katze ist das Problem"),
    (3L, "le chat est sur les toits et une souris est petite"),
    (4L, "zzz qqq xxx")) // no markers anywhere
    .toDF("doc_id", "text")

  test("language ID picks the marker-dominant language, 'und' when none") {
    val pred = TextAnalysis.languageId(docs, "text", "doc_id")
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(pred(0L) === "en")
    assert(pred(1L) === "es")
    assert(pred(2L) === "de")
    assert(pred(3L) === "fr")
    assert(pred(4L) === "und")
  }

  test("textStats: exact counts on a hand doc") {
    val one = Seq((7L, "aa bb  aa cc!")).toDF("doc_id", "text")
    val r = TextAnalysis.textStats(one, "text", "doc_id").collect().head
    assert(r.getAs[Long]("n_tokens") === 4L) // aa bb aa cc!
    assert(r.getAs[Long]("n_uniq") === 3L)
    assert(r.getAs[Long]("n_chars") === 13L)
    // subtokens: aa, bb, aa, cc, ! = 5
    assert(r.getAs[Long]("n_subtokens") === 5L)
    // token lengths 2+2+2+3=9 → 900 DIV 4 = 225
    assert(r.getAs[Long]("avg_tok_len_x100") === 225L)
  }

  test("repetition signals: dup-line and top-2-gram fractions, exact") {
    val d = Seq(
      // 4 substantive lines, "nav menu" twice (whitespace-only line dropped)
      (0L, "nav menu\nreal content here\nnav menu\n   \t\nclosing line"),
      // degenerate 2-gram text: "spam spam" dominates — 2-grams of 5 tokens
      // = 4, all "spam spam" → top 100%
      (1L, "spam spam spam spam spam"),
      // no repetition at all
      (2L, "every word in this sentence differs"),
      // single token → zero 2-grams, one line
      (3L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(d, "text", "doc_id")
      .orderBy("doc_id").collect()
    val r0 = out(0)
    assert(r0.getAs[Long]("n_lines") === 4L, "whitespace-only line must not count")
    assert(r0.getAs[Long]("dup_line_pct") === 50L) // 2 of 4 lines are the dup'd one
    val r1 = out(1)
    assert(r1.getAs[Long]("n_2grams") === 4L)
    assert(r1.getAs[Long]("top_2gram_pct") === 100L)
    assert(r1.getAs[Long]("dup_line_pct") === 0L)
    val r2 = out(2)
    assert(r2.getAs[Long]("dup_line_pct") === 0L)
    assert(r2.getAs[Long]("top_2gram_pct") === 20L) // 5 distinct 2-grams, max 1
    val r3 = out(3)
    assert(r3.getAs[Long]("n_2grams") === 0L)
    assert(r3.getAs[Long]("top_2gram_pct") === 0L)
    assert(r3.getAs[Long]("n_lines") === 1L)
  }

  test("quality score: diverse long text beats stopword-stuffed short text") {
    val d = Seq(
      (0L, "the the the the the the the the"),
      (1L, "distributed query engines partition data across executors for parallel scans"))
      .toDF("doc_id", "text")
    val s = TextAnalysis.qualityScore(d, "text", "doc_id")
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    assert(s(1L) > s(0L))
    assert(s.values.forall(v => v >= 0 && v <= 1000))
  }

  test("token frequencies count exactly") {
    val d = Seq((0L, "a b a"), (1L, "a c")).toDF("doc_id", "text")
    val f = TextAnalysis.tokenFrequencies(d, "text")
      .as[(String, Long)].collect().toMap
    assert(f === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("winnow fingerprints match a brute-force window-min reference") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val (k, w) = (8, 16)
    // reference: hash every k-gram with the SAME h60 (via a DataFrame so no
    // md5 reimplementation drifts), then window-min + distinct on the driver
    val n = text.length - (k - 1)
    val hashes = (1 to n).map(i => text.substring(i - 1, i - 1 + k))
      .toDF("g")
      .select(graft.functions.TextFns.h60($"g"))
      .collect().map(_.getLong(0))
    val expected = (1 to math.max(1, n - (w - 1)))
      .map(s => hashes.slice(s - 1, s - 1 + w).min).distinct.sorted
    val got = TextAnalysis.winnowFingerprints(
        Seq((0L, text)).toDF("doc_id", "text"), "text", "doc_id", k, w)
      .select("fp").as[Long].collect().sorted
    assert(got.toSeq === expected)
  }

  test("winnow guarantee: docs sharing a ≥ w+k-1 char substring share a fingerprint") {
    val shared = "common stretch of text both docs carry verbatim" // 47 ≥ 23 chars
    val d = Seq(
      (0L, s"first document prefix $shared and its own tail"),
      (1L, s"unrelated opening words here $shared different ending"),
      (2L, "nothing in common with anything else at all"),
      (3L, "ab"), // shorter than k → one whole-text gram, one fingerprint
      (4L, "   \t ")) // blank → no fingerprints
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(d, "text", "doc_id", 8, 16)
      .as[(Long, Long)].collect().groupBy(_._1).map { case (id, a) => id -> a.map(_._2).toSet }
    assert(fps(0L).intersect(fps(1L)).nonEmpty, "shared window must yield a shared fingerprint")
    assert(fps(3L).size === 1)
    assert(!fps.contains(4L), "blank docs emit nothing")
    // fingerprint count never exceeds the window-start count
    assert(fps(2L).size <= 44 - 7 - 15)
  }

  test("tokenCountsByKey aggregates per key; empty text counts zero tokens") {
    val d = Seq((0L, "a b c", "en"), (1L, "x y", "en"), (2L, "  ", "fr"))
      .toDF("doc_id", "text", "lang")
    val m = TextAnalysis.tokenCountsByKey(d, "text", "lang")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("en") === ((2L, 5L)))
    assert(m("fr") === ((1L, 0L)))
  }

  test("topNgrams: occurrence + doc counts exact, ordered, short docs shingle whole") {
    val d = Seq(
      (0L, "the same line the same line"), // "the same line" ×2, "same line the" ×1, ...
      (1L, "the same line again"),
      (2L, "one two"),                     // < 3 tokens: whole-doc shingle
      (3L, "one two"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.topNgrams(d, "text", "doc_id", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.head === (("the same line", 3L, 2L)))
    assert(rows.contains(("one two", 2L, 2L)))
    // total order: n_occ desc then ngram asc
    assert(rows.sortBy(r => (-r._2, r._1)).toSeq === rows.toSeq)
  }

  test("bpePairStats: intra-word adjacent pairs only, 1-char words excluded") {
    val d = Seq((0L, "ab ab cd x"), (1L, "abc")).toDF("doc_id", "text")
    // "ab"×2 → (ab,2); "cd" → (cd,1); "x" → none; "abc" → ab, bc
    val rows = TextAnalysis.bpePairStats(d, "text", 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq === Seq(("ab", 3L), ("bc", 1L), ("cd", 1L)))
  }

  test("bpeTrain: merge sequence matches hand-computed BPE on a tiny corpus") {
    val d = Seq((0L, "aaab aaab ab")).toDF("doc_id", "text")
    // it1: (a,a)×4 wins → "aa"; greedy left-first: aaab → [aa, a, b]
    // it2: (a,b)×3 wins ((aa,a)×2) → "ab"
    // it3: (aa,ab)×2 wins → "aaab"
    val merges = TextAnalysis.bpeTrain(d, "text", 3)
    assert(merges === Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("bpeTrainSampled: a half-corpus hash sample learns the full corpus's merges (set; clear-margin order)") {
    // pair frequencies are RANKS a sample preserves up to near-tie
    // permutations: the fixture's rank-1 pair wins by 60%+ (order must
    // survive any sample), ranks 2-5 sit within 6% of each other
    // (sampling noise may permute them — asserting their ORDER would pin
    // noise, not the operator), so the contract is top-merge + SET
    val docs = graft.sources.Tables.Fixture(spark, sfDir).documents
    val full = TextAnalysis.bpeTrain(docs, "text", iterations = 4)
    val sampled = TextAnalysis.bpeTrainSampled(docs, "text", "doc_id",
      iterations = 4, mod = 2, keep = 1)
    assert(sampled.head === full.head,
      s"clear-margin top merge must survive sampling: $sampled vs $full")
    assert(sampled.toSet === full.toSet,
      s"half-sample merge set $sampled diverged from full-corpus $full")
  }

  test("bpeEncode: trained merges round-trip and match hand-computed encodings") {
    import org.apache.spark.sql.functions.col
    val train = Seq((0L, "aaab aaab ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(train, "text", 3)
    val enc = TextAnalysis.bpeEncode(
        Seq((1L, "aaab ab ba"), (2L, "")).toDF("doc_id", "text"),
        "text", "doc_id", merges)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1), r.getLong(2)))
    // merges: (a,a), (a,b), (aa,ab) → "aaab"→[aaab]; "ab"→[ab];
    // "ba" has no applicable merge → [b, a]
    assert(enc(0)._2 === Seq("aaab", "ab", "b", "a"))
    assert(enc(0)._3 === 4L)
    // round-trip: concatenated symbols reproduce each word
    assert(enc(0)._2.mkString === "aaababba")
    assert(enc(1)._2 === Seq.empty && enc(1)._3 === 0L)
  }

  test("mergePair: greedy left-first merge handles overlapping runs") {
    import org.apache.spark.sql.functions.{col, typedlit}
    val out = Seq(1).toDF("i")
      .select(TextAnalysis.mergePair(typedlit(Seq("a", "a", "a", "b")), "a", "a").as("m"))
      .head().getSeq[String](0)
    assert(out === Seq("aa", "a", "b"))
  }

  test("collocations: hand-computed lift; minCount floors hapax pairs") {
    // "x y" ×6, "x z" ×2 (+ filler unique pair each time so marginals differ)
    val docs = (0 until 6).map(i => (i.toLong, "x y")) ++
      Seq((6L, "x z"), (7L, "x z"))
    val d = docs.toDF("doc_id", "text")
    // bigrams: (x,y)×6, (x,z)×2 → T=8; cl(x)=8; cr(y)=6, cr(z)=2
    // lift(x,y) = 6*8*1000 // (8*6) = 1000; (x,z): c2=2 < minCount=5 → dropped
    val rows = TextAnalysis.collocations(d, "text", 10, minCount = 5L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq(("x", "y", 6L, 1000L)))
  }

  test("corpusDrift: planted shift surfaces in the top bucket with its example token") {
    // side A: "common" filler only; side B: same filler + a flood of
    // "newterm" → newterm's bucket must top the drift report
    val a = (0 until 10).map(i => (i.toLong, "common filler words here")).toDF("doc_id", "text")
    val b = ((0 until 10).map(i => (100L + i, "common filler words here")) ++
      (0 until 30).map(i => (200L + i, "newterm newterm"))).toDF("doc_id", "text")
    val top = TextAnalysis.corpusDrift(a, b, "text", buckets = 64, k = 3)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(top.head._1 === "newterm", s"top drift bucket must be newterm's: ${top.toSeq}")
    assert(top.head._2 === 0L, "newterm absent on side A")
    assert(top.head._3 > 0L, "newterm present on side B")
  }

  test("lmScore: hand-computed add-one bigram probabilities; short docs score 0") {
    val d = Seq((1L, "x y x y"), (2L, "x")).toDF("doc_id", "text")
    // c1: x=3, y=2; V=2; c2: (x,y)=2, (y,x)=1
    // p(x,y) = 100000*3 DIV 5 = 60000; p(y,x) = 100000*2 DIV 4 = 50000
    // doc1: (60000+60000+50000) DIV 3 = 56666; doc2: <2 tokens → 0
    val rows = TextAnalysis.lmScore(d, "text", "doc_id")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq((1L, 3L, 56666L), (2L, 0L, 0L)))
  }
}
