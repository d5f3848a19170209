package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dedup semantics on planted duplicates (the fixtures' organic near-dups
  * are exercised by the oracle harness; these pin the operator contracts).
  */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away " * 3

  private lazy val docs = Seq(
    (0L, base),
    (1L, base), // exact copy of 0
    (2L, base.replace("lazy", "sleepy")), // near-dup of 0
    (3L, "completely different text about spark query engines and shuffles"),
    (4L, "THE  quick brown fox! jumps over the lazy dog and runs far away " +
      base.stripPrefix("the quick brown fox jumps over the lazy dog and runs far away ")) // normalization dup of 0
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id and counts copies") {
    val out = Dedup.exact(docs, "text", "doc_id").orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet
      .contains((0L, 2L))) // doc 0+1 collapse, canonical = 0
    assert(out.length === 4)
  }

  test("fingerprint normalizes case/punctuation/whitespace") {
    val fp = Dedup.fingerprint(docs, "text", "doc_id")
      .select("doc_id", "fp").as[(Long, String)].collect().toMap
    assert(fp(0L) === fp(1L))
    assert(fp(0L) === fp(4L), "case/punct/double-space variant must share the fingerprint")
    assert(fp(0L) !== fp(3L))
  }

  test("fingerprintCanonical returns exactly the window form's survivors, columns intact") {
    val viaWindow = Dedup.fingerprint(docs, "text", "doc_id")
      .filter(col("is_canonical")).drop("fp", "is_canonical")
      .orderBy("doc_id").collect()
    val viaMinBy = Dedup.fingerprintCanonical(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(viaMinBy.toSeq === viaWindow.toSeq)
    assert(Dedup.fingerprintCanonical(docs, "text", "doc_id").columns.toSeq
      === docs.columns.toSeq)
  }

  test("minhash LSH finds planted near-dups, not unrelated docs") {
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id", k = 16, bands = 4, minJaccPct = 50)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), "exact copies must collide")
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)),
      "one-word-changed doc should survive banding at jacc>=50")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not pair")
  }

  test("duplicated-ngram fraction: copies at 100%, unique docs at 0%") {
    val out = Dedup.duplicateNgramFraction(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_dup"), r.getAs[Long]("dup_pct"))).toMap
    assert(out(0L)._3 === 100L, s"exact copy pair must be fully duplicated: ${out(0L)}")
    assert(out(1L)._3 === 100L)
    assert(out(3L)._2 === 0L && out(3L)._3 === 0L, "unrelated doc shares nothing")
    assert(out(2L)._3 > 50L && out(2L)._3 < 100L,
      s"one-word-changed doc is mostly duplicated spans: ${out(2L)}")
    // distinct shingles only: n_dup never exceeds n_shingles
    assert(out.values.forall(v => v._2 <= v._1))
  }

  test("simhash: identical docs at distance 0, near-dups close, unrelated far") {
    val sig = Dedup.simhashWithNeighborDistance(docs, "text", "doc_id")
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sig(0L), sig(1L)) === 0)
    assert(hamming(sig(0L), sig(2L)) <= 8)
    assert(hamming(sig(0L), sig(3L)) > 8)
  }

  test("ngram jaccard: consecutive-pair scores reflect similarity") {
    val j = Dedup.ngramJaccardNeighbors(docs, "text", "doc_id", 3)
      .select("doc_a", "jacc_pct").as[(Long, Long)].collect().toMap
    assert(j(0L) === 100L) // 0 vs 1: identical
    assert(j(1L) >= 80L) // 1 vs 2: one word changed
    assert(j(2L) < 50L) // 2 vs 3: unrelated
  }

  test("minhash handles short docs with trailing whitespace (split keeps trailing empties)") {
    val shorties = Seq(
      (0L, "foo bar "), // 2 tokens + trailing space — must get the fallback shingle
      (1L, "foo bar"),
      (2L, "baz qux quux corge")).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(shorties, "text", "doc_id", 16, 4, 50)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L)), s"trailing-space doc must still pair with its twin: $pairs")
  }

  test("degenerate bucket: 500 identical docs chain-pair, no quadratic blowup") {
    val many = (0L until 500L).map(i => (i, base)).toDF("doc_id", "text")
    val got = Dedup.minhashPairs(many, "text", "doc_id", 16, 4, 50, maxBucket = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(got.length === 499,
      s"oversized bucket must emit n-1 chain pairs, not n(n-1)/2: got ${got.length}")
    assert(got.flatMap(p => Seq(p._1, p._2)).toSet === (0L until 500L).toSet,
      "every member of the oversized bucket must stay connected")
    val over = Dedup.oversizedBuckets(many, "text", "doc_id", 16, 4, 64).collect()
    assert(over.length === 4 && over.forall(_.getAs[Int]("n_members") === 500),
      s"all 4 band buckets must report overflow: ${over.mkString(",")}")
  }

  test("bucket cap does not change results when no bucket overflows") {
    val capped = Dedup.minhashPairs(docs, "text", "doc_id", 16, 4, 50, maxBucket = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val uncapped = Dedup.minhashPairs(docs, "text", "doc_id", 16, 4, 50, maxBucket = Int.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped === uncapped)
  }

  test("similarity join == brute-force all-pairs Jaccard, at several thresholds") {
    // 60 docs with planted exact copies, near-dups, and unrelated noise;
    // brute force is the definition, the prefix filter must recover it
    val corpus = (0 until 60).map { i =>
      val text =
        if (i % 7 == 0) base // family of exact copies
        else if (i % 7 == 1) base.replace("lazy", s"word$i") // near-dups of the family
        else s"unrelated document $i " + (1 to 20).map(j => s"tok${(i * 31 + j) % 97}").mkString(" ")
      (i.toLong, text)
    }.toDF("doc_id", "text")
    def brute(t: Int): Set[(Long, Long, Long)] = {
      val sets = corpus.select(col("doc_id"), col("text")).collect().map { r =>
        val toks = r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)
        val sh =
          if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
          else if (toks.nonEmpty) Set(toks.mkString(" "))
          else Set.empty[String]
        r.getLong(0) -> sh
      }.filter(_._2.nonEmpty)
      (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        i = sa.intersect(sb).size
        u = sa.size + sb.size - i
        if u > 0 && 100L * i / u >= t
      } yield (a, b, 100L * i / u)).toSet
    }
    for (t <- Seq(30, 50, 80)) {
      val got = Dedup.similarityJoin(corpus, "text", "doc_id", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === brute(t), s"threshold $t: prefix filter must equal brute force")
    }
    // blank/short docs don't break it
    val edge = Seq((0L, "a b"), (1L, "a b"), (2L, "   "), (3L, "x")).toDF("doc_id", "text")
    val pairs = Dedup.similarityJoin(edge, "text", "doc_id", 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((0L, 1L)), "identical 2-token docs pair; blank joins nothing")
  }

  test("containment join == brute-force ordered pairs; finds the embedded doc Jaccard misses") {
    // long host doc + a short doc that is a verbatim excerpt of it:
    // containment(a→host) = 100 while jacc ≈ |a|/|host| is tiny
    val host = (1 to 60).map(j => s"body${j % 83} tok$j").mkString(" ")
    val excerpt = host.split(" ").slice(10, 22).mkString(" ")
    val corpus = ((0 until 20).map { i =>
      (i.toLong, s"unrelated text $i " + (1 to 15).map(j => s"w${(i * 37 + j) % 71}").mkString(" "))
    } ++ Seq((100L, host), (101L, excerpt))).toDF("doc_id", "text")

    def brute(t: Int): Set[(Long, Long, Long)] = {
      val sets = corpus.collect().map { r =>
        val toks = r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)
        val sh =
          if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
          else if (toks.nonEmpty) Set(toks.mkString(" "))
          else Set.empty[String]
        r.getLong(0) -> sh
      }.filter(_._2.nonEmpty)
      (for {
        (a, sa) <- sets; (b, sb) <- sets if a != b
        i = sa.intersect(sb).size
        if 100L * i >= t.toLong * sa.size
      } yield (a, b, 100L * i / sa.size)).toSet
    }
    for (t <- Seq(40, 60, 100)) {
      val got = Dedup.containmentJoin(corpus, "text", "doc_id", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === brute(t), s"threshold $t: containment prefix filter must equal brute force")
    }
    // the planted direction: excerpt ⊂ host at 100%, never the reverse
    val at100 = Dedup.containmentJoin(corpus, "text", "doc_id", 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at100.contains((101L, 100L)), "embedded excerpt must be found")
    assert(!at100.contains((100L, 101L)), "containment is asymmetric")
    // and Jaccard at any useful threshold does NOT pair them
    val jacc = Dedup.similarityJoin(corpus, "text", "doc_id", 30)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jacc.contains((100L, 101L)) && !jacc.contains((101L, 100L)),
      "the embedded case must be invisible to symmetric Jaccard")
  }

  test("incremental similarity join == full join restricted to batch-touching pairs") {
    val corpus = (0 until 40).map { i =>
      val text =
        if (i % 6 == 0) base
        else s"corpus doc $i " + (1 to 18).map(j => s"tok${(i * 37 + j) % 89}").mkString(" ")
      (i.toLong, text)
    }.toDF("doc_id", "text")
    // the batch near-dups some corpus docs and brings novel shingles too
    val incoming = Seq(
      (100L, base),                           // exact dup of the corpus family
      (101L, base.replace("lazy", "bizarre")), // near-dup
      (102L, "entirely novel content never indexed before with fresh words"),
      (103L, "entirely novel content never indexed before with fresh words")) // dup within batch
      .toDF("doc_id", "text")
    val cdf = Dedup.shingleDfTable(corpus, "text", "doc_id")
    val incr = Dedup.similarityJoinIncremental(
        Dedup.prefixRows(corpus, cdf, "text", "doc_id", 50), cdf,
        corpus, incoming, "text", "doc_id", 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Dedup.similarityJoin(corpus.unionByName(incoming), "text", "doc_id", 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter { case (a, b, _) => a >= 100L || b >= 100L }.toSet
    assert(incr === full, "incremental must equal the full run's batch-touching pairs")
    assert(incr.exists { case (a, b, _) => a >= 100L && b >= 100L },
      "batch-internal dups must be found too")
    assert(incr.exists { case (a, b, _) => a < 100L && b >= 100L },
      "batch-vs-corpus dups must be found")
  }

  test("incremental dedup == full run restricted to batch-touching pairs") {
    val all = graft.sources.Tables.Fixture(spark, sfDir).documents
    val corpus = all.filter($"doc_id" % 5 =!= 0)
    val incoming = all.filter($"doc_id" % 5 === 0)
    val full = Dedup.minhashPairs(all, "text", "doc_id", 16, 4, 50)
      .select("id_a", "id_b", "jacc_pct").as[(Long, Long, Long)].collect().toSet
    val expect = full.filter { case (a, b, _) => a % 5 == 0 || b % 5 == 0 }
    val incr = Dedup.minhashPairsIncremental(
        Dedup.bandBuckets(corpus, "text", "doc_id", 16, 4), corpus, incoming,
        "text", "doc_id", 16, 4, 50)
      .select("id_a", "id_b", "jacc_pct").as[(Long, Long, Long)].collect().toSet
    assert(incr === expect,
      s"missing=${expect.diff(incr).take(5)} extra=${incr.diff(expect).take(5)}")
    assert(expect.nonEmpty, "fixture must exercise the incremental path")
  }

  test("minhash plan: signature is a single hash-aggregate, no HOF on the agg path") {
    val sig = Dedup.minhashSignatures(docs, "text", "doc_id", 16)
    val plan = sig.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"expected hash aggregation:\n$plan")
  }

  test("simjoin spill guard: exploded-path routing preserves exactness at any cap") {
    // every routing split must give the identical answer — the guard is a
    // memory-shape switch, never a semantics switch. cap=1 routes every
    // pair through the exploded verify; cap in the middle routes a strict
    // subset; default routes none.
    val corpus = graft.sources.Tables.Fixture(spark, sfDir).documents
      .filter($"doc_id" < 200)
    def run(cap: Int) = Dedup.similarityJoin(corpus, "text", "doc_id", 50, cap)
      .select("id_a", "id_b", "jacc_pct").as[(Long, Long, Long)].collect().toSet
    val byDefault = run(1 << 20)
    assert(byDefault.nonEmpty, "fixture subset must have near-dup pairs")
    assert(run(1) === byDefault, "all-routed must equal unrouted")
    // a mid-range cap splits members across the two paths (fixture doc
    // shingle counts straddle 60)
    assert(run(60) === byDefault, "mixed routing must equal unrouted")
  }

  test("simjoin spill guard: a million-shingle doc completes without the array join") {
    // two 1.2M-token docs sharing ~92% of their shingles: each member's
    // distinct-shingle set (~1.2M > the 10^6 cap) must NEVER ride the
    // candidate join as an array row — the pair routes through the
    // exploded verify and the exact Jaccard still comes out.
    val big = spark.range(2).selectExpr(
      "id AS doc_id",
      // doc 0: tokens 1..1200000; doc 1: tokens 100001..1300000
      "array_join(transform(sequence(1 + 100000 * CAST(id AS INT), " +
        "1200000 + 100000 * CAST(id AS INT)), i -> concat('w', i)), ' ') AS text")
    val pairs = Dedup.similarityJoin(big, "text", "doc_id", 50, maxSetSize = 1000000)
      .select("id_a", "id_b", "jacc_pct").as[(Long, Long, Long)].collect()
    // shared 3-shingles: w100001..w1199998 window -> 1099998 of 1199998
    // per doc; jacc = 1099998 / (2*1199998 - 1099998) = ~84%
    assert(pairs.toSeq === Seq((0L, 1L, 84L)),
      s"expected the planted big pair at 84%, got ${pairs.toSeq}")
  }

  // an 11-token boilerplate block pasted into two otherwise-distinct docs:
  // 9 consecutive duplicated 3-shingles in each
  private lazy val spanDocs = Seq(
    (0L, "alpha beta gamma " + "shared boiler plate text block repeated across documents verbatim here now " + "delta epsilon zeta"),
    (1L, "one two three four " + "shared boiler plate text block repeated across documents verbatim here now " + "five six seven"),
    (2L, "totally unrelated content with no overlap at all whatsoever in any way")
  ).toDF("doc_id", "text")

  test("duplicated spans: the pasted block surfaces as one maximal run per doc") {
    val spans = Dedup.duplicatedSpans(spanDocs, "text", "doc_id")
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc 0: 17 tokens, block = tokens 4..14 -> dup shingles at pos 4..12
    // doc 1: 18 tokens, block = tokens 5..15 -> dup shingles at pos 5..13
    assert(spans === Set((0L, 4L, 12L, 9L), (1L, 5L, 13L, 9L)),
      s"expected exactly the two pasted-block spans, got $spans")
  }

  test("span removal: owner keeps the block, later doc loses exactly it") {
    val out = Dedup.removeDuplicatedSpans(spanDocs, "text", "doc_id")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // doc 0 owns every shared shingle (min id) -> untouched
    assert(out(0L)._3 === 0L)
    assert(out(0L)._4 === spanDocs.filter($"doc_id" === 0L)
      .select(lower($"text")).as[String].head())
    // doc 1: span pos 5..13 covers tokens 5..15 -> 11 tokens removed
    assert(out(1L)._2 === 18L && out(1L)._3 === 11L)
    assert(out(1L)._4 === "one two three four five six seven")
    // doc 2: nothing duplicated, token-identical passthrough
    assert(out(2L)._3 === 0L && out(2L)._4.startsWith("totally unrelated"))
  }

  test("span removal: whole-doc duplicate loses everything, token accounting exact") {
    // doc 1 is doc 0 verbatim: every shingle duplicated, one maximal span
    // covering the whole doc -> non-owner's clean_text is empty, and
    // n_tokens = n_removed + |clean tokens| holds row by row
    val d = Seq(
      (0L, "the exact same body of text repeated verbatim as a whole document"),
      (1L, "the exact same body of text repeated verbatim as a whole document"),
      (2L, "")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(d, "text", "doc_id")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(0L)._3 === 0L && out(0L)._4.startsWith("the exact same"))
    assert(out(1L)._3 === out(1L)._2 && out(1L)._4 === "",
      s"whole-doc dup must lose all tokens, got ${out(1L)}")
    assert(out(2L)._2 === 0L && out(2L)._3 === 0L && out(2L)._4 === "")
    out.values.foreach { case (id, n, rem, clean) =>
      val kept = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(n === rem + kept, s"token accounting broken for doc $id")
    }
  }

  test("span removal: three-way share keeps exactly one corpus-wide copy") {
    // heads/tails pairwise token-disjoint, so no boundary shingle
    // straddling head|block is shared across docs — the duplicated set
    // is exactly the block's 9 internal shingles
    val block = "common boiler plate paragraph shared by three documents at once yes"
    val d = Seq(
      (10L, s"one two $block alpha beta"),
      (7L, s"three four $block gamma delta"),
      (9L, s"five six $block epsilon zeta")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(d, "text", "doc_id")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // min doc id (7) owns the block; 9 and 10 lose exactly its tokens
    assert(out(7L)._3 === 0L && out(7L)._4.contains("boiler plate"))
    assert(out(9L)._3 === 11L && !out(9L)._4.contains("boiler"))
    assert(out(10L)._3 === 11L && !out(10L)._4.contains("boiler"))
  }

  test("span removal: sub-minRun shared runs survive everywhere") {
    // only a single shared 3-gram (1 shingle < minRun=3): no removal
    val d = Seq(
      (0L, "aa bb cc unique tail of the first document body"),
      (1L, "different head entirely aa bb cc and then some more")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(d, "text", "doc_id")
      .as[(Long, Long, Long, String)].collect()
    // both docs must come BACK untouched — a regression to empty output
    // would satisfy the forall below vacuously
    assert(out.length === 2, s"every doc returns from span removal, got $out")
    assert(out.forall(_._3 == 0L), s"no span clears minRun, got $out")
    assert(Dedup.duplicatedSpans(d, "text", "doc_id").count() === 0)
  }
}
