package graft

import graft.operators.{Curation, Similarity}
import graft.sources.Tables.Fixture

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("qualityEnsemble: keep requires ALL three signals; drops stay attributable") {
    import org.apache.spark.sql.functions.col
    // 24 tokens — inside the gopher 20–80 token band, diverse, stopworded
    val fluent = "the pipeline shuffles partitions and the optimizer prunes " +
      "columns for every scan stage while executors exchange blocks and the " +
      "driver collects small results quickly"
    val docs = Seq(
      (1L, fluent, "en"),                            // passes rules; en-target
      (2L, fluent + " extra", "de"),                 // same text shape, off-target lang
      (3L, "the the the the a a a of of to and in", "en")) // stopword soup → rules fail
      .toDF("doc_id", "text", "lang")
    // thresholds at the extremes isolate the signal under test
    val out = Curation.qualityEnsemble(docs, "text", "doc_id",
        col("lang") === "en", minLmX100k = Long.MinValue, minDsir = Long.MinValue)
      .orderBy("doc_id").collect()
    // only the rules gate active: doc 3 must fail on rules alone, and its
    // n_fail says which cascade layer fired
    assert(out.map(r => r.getLong(0) -> r.getLong(5)).toMap === Map(1L -> 1L, 2L -> 1L, 3L -> 0L))
    assert(out(2).getLong(1) > 0L, "doc 3's drop must be attributed via n_fail")
    // dsir gate at 0: the en doc scores >= the de doc under the en target
    val scores = out.map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(scores(1L) >= scores(2L),
      s"en doc must not score below the off-target doc: $scores")
  }

  test("hashedTagger: planted-vocabulary corpus classifies >90%; margin 0 only on ties") {
    import org.apache.spark.sql.functions.col
    // three classes with disjoint distinctive vocabularies + shared filler
    val mk = (cls: String, i: Int, words: Seq[String]) =>
      (s"$cls-$i", s"the of and ${words(i % words.size)} ${words((i + 1) % words.size)}", cls)
    val aw = Seq("alpha", "apex", "anchor", "atlas")
    val bw = Seq("bravo", "basalt", "beacon", "boreal")
    val cw = Seq("cobalt", "cirrus", "canyon", "cedar")
    val docs = ((0 until 20).map(i => mk("a", i, aw)) ++
      (0 until 20).map(i => mk("b", i, bw)) ++
      (0 until 20).map(i => mk("c", i, cw)))
      .toDF("doc_id", "text", "cls")
    val out = Curation.hashedTagger(docs, "text", "doc_id", "cls")
    val joined = out.join(docs, "doc_id")
      .select(col("pred_label") === col("cls"), col("margin"))
      .collect()
    val acc = joined.count(_.getBoolean(0))
    assert(acc >= 54, s"planted-vocab accuracy $acc/60 must exceed 90%")
    // distinctive tokens must produce real margins, not coin flips
    assert(joined.map(_.getLong(1)).count(_ > 0) >= 54)
  }

  test("hashedTagger: separate train corpus tags an unlabeled scoring corpus") {
    import org.apache.spark.sql.functions.col
    val train = Seq(
      ("t1", "alpha apex alpha anchor", "a"), ("t2", "alpha atlas apex", "a"),
      ("t3", "bravo basalt bravo beacon", "b"), ("t4", "bravo boreal basalt", "b"))
      .toDF("id", "text", "cls")
    val score = Seq(("s1", "alpha anchor thing"), ("s2", "basalt beacon thing"))
      .toDF("doc_id", "text")
    // scoring corpus has NO label column — the model comes from `train`
    val out = Curation.hashedTagger(score, "text", "doc_id", "cls",
        train = Some(train))
      .orderBy("doc_id")
      .select(col("pred_label")).collect().map(_.getString(0))
    assert(out.toSeq === Seq("a", "b"))
  }

  test("curation pipeline: language filter, quality filter, exact + near dedup compose") {
    val good = ("the data pipeline shuffles partitions across executors " +
      "and the optimizer prunes columns for every scan stage") // en, diverse, long-ish
    val docs = Seq(
      (0L, good),
      (1L, good), // exact dup of 0 → dropped
      (2L, good.replace("optimizer", "planner")), // near dup of 0 → dropped
      (3L, "el perro grande de la casa es que muy bonito y la madera"), // not en → dropped
      (4L, "the the the the a a a of of to"), // stopword soup → low quality
      (5L, "the distributed engine broadcasts small dimension tables while " +
        "joining large fact tables on shuffled keys")) // en, good, unique → kept
      .toDF("doc_id", "text")
    val kept = Curation.curate(docs, "text", "doc_id",
        Curation.Config(minQualityScore = 500L, minJaccPct = 60))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(0L, 5L), s"kept=$kept")
  }

  test("line dedup: first occurrence wins corpus-wide AND within a doc; blanks survive") {
    // segTokens=2 → "lines" are 2-token segments
    val docs = Seq(
      (1L, "aa bb cc dd"),          // lines: "aa bb", "cc dd" — both first
      (2L, "aa bb ee ff"),          // "aa bb" repeats doc 1 → removed
      (3L, "ee ff ee ff gg"),       // "ee ff" repeats doc 2; its OWN repeat also removed; "gg" kept
      (4L, "   "),                  // blank → empty output, still present
      (5L, "cc dd"))                // repeats doc 1 → all removed, empty text
      .toDF("doc_id", "text")
    val out = Curation.lineDedup(docs, "text", "doc_id", segTokens = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) === ((1L, "aa bb cc dd", 2L, 0L)))
    assert(out(1) === ((2L, "ee ff", 2L, 1L)))
    assert(out(2) === ((3L, "gg", 3L, 2L)), "within-doc repeat of 'ee ff' must also drop")
    assert(out(3) === ((4L, "", 0L, 0L)), "blank doc must survive with empty text")
    assert(out(4) === ((5L, "", 1L, 1L)), "fully-boilerplate doc keeps nothing")
    // deterministic under physical layout
    val relaid = Curation.lineDedup(docs.repartition(5), "text", "doc_id", segTokens = 2)
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(relaid.toSeq === out.map(_._2).toSeq)
  }

  test("full pipeline composes: source cap -> line dedup -> curate, end to end") {
    val good = "the distributed engine broadcasts small dimension tables while " +
      "joining large fact tables on shuffled keys and pruning columns early"
    val docs = (0 until 30).map { i =>
      val text =
        if (i == 0 || i == 1) good // exact dups across the cap boundary
        else good.replace("columns", s"cols$i") // near-dups, all same source family
      (i.toLong, text, s"src${i % 3}")
    }.toDF("doc_id", "text", "source")
    val capped = docs.join(
      graft.operators.Sampling.sourceCap(docs, "source", "doc_id", cap = 5)
        .select("doc_id"), Seq("doc_id"), "left_semi")
    assert(capped.count() === 15, "3 sources capped at 5 each")
    val cleaned = graft.operators.Curation.lineDedup(capped, "text", "doc_id")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("clean_text").as("text"))
    val curated = Curation.curate(cleaned, "text", "doc_id",
      Curation.Config(minQualityScore = 400L, minJaccPct = 60))
    // line dedup strips every later doc's text down to its unique remainder
    // (the shared 20-token body survives only in the first doc), so the
    // near-dup family collapses and at least the canonical doc survives
    val ids = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.nonEmpty && ids.size < 15, s"pipeline must dedup aggressively, kept $ids")
  }

  test("decontamination flags docs sharing shingles with the eval set, exactly") {
    val eval = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      // contains eval shingles "alpha beta gamma" + "beta gamma delta" → 2 hits
      (0L, "prefix words alpha beta gamma delta suffix"),
      (1L, "completely unrelated text about spark execution plans"),
      // 1-token doc: whole-text shingle, no overlap
      (2L, "alpha"))
      .toDF("doc_id", "text")
    val out = Curation.decontaminate(corpus, eval, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out.length === 1, "only doc 0 overlaps")
    val r = out.head
    assert(r.getAs[Long]("doc_id") === 0L)
    // doc 0 shingles: 5 distinct 3-grams of 7 tokens
    assert(r.getAs[Long]("n_shingles") === 5L)
    assert(r.getAs[Long]("n_contaminated") === 2L)
    assert(r.getAs[Long]("contam_pct") === 40L)
  }

  test("near-dup decontamination: corpus-eval Jaccard hits only, oriented to the corpus doc") {
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      // eval-eval near-dup of 100 — must NOT surface as contamination
      (110L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // near-dup of eval 100 (one token differs) → flagged
      (0L, "the quick brown fox jumps over the lazy cat tonight"),
      (1L, "completely unrelated text about catalyst optimizer rules"),
      // exact copy of eval 110 → flagged at 100
      (2L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val out = Curation.decontaminateNearDup(corpus, eval, "text", "doc_id",
        minJaccPct = 50)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(0L, 2L),
      s"flagged=${out.toSeq}")
    assert(out(1).getAs[Long]("max_jacc_pct") === 100L)
    // agreement with the ground-truth definition: similarityJoin over
    // corpus ∪ eval, restricted to straddling pairs, max per corpus doc
    val all = corpus.unionByName(eval)
    val evalIds = Set(100L, 110L)
    val truth = graft.operators.Dedup
      .similarityJoin(all, "text", "doc_id", minJaccPct = 50)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("jacc_pct")))
      .filter { case (a, b, _) => evalIds.contains(a) != evalIds.contains(b) }
      .groupBy { case (a, b, _) => if (evalIds.contains(a)) b else a }
      .view.mapValues(_.map(_._3).max).toMap
    assert(out.map(r => r.getLong(0) -> r.getAs[Long]("max_jacc_pct")).toMap
      === truth)
  }

  test("near-dup decontamination via a persisted prefix index equals the in-query form") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    // the production eval-refresh path: corpus prefix index written once
    // (the DocIndexIngest layout — partitioned by h mod 64), each eval
    // refresh probes it partition-pruned. Must return exactly the
    // in-query operator's rows — both routes are candidate-superset
    // PPJoin + exact verify, so the flagged set and max_jacc_pct agree.
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (110L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy cat tonight"),
      (1L, "completely unrelated text about catalyst optimizer rules"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "another unrelated doc mentioning shuffle partitions and joins"))
      .toDF("doc_id", "text")
    val (prefix, dfT) = graft.operators.Dedup
      .similarityIndex(corpus, "text", "doc_id", 50)
    val dir = java.nio.file.Files.createTempDirectory("graft-deconidx").toString
    prefix.withColumn("hmod", pmod(col("h"), lit(64L)))
      .write.mode("overwrite").partitionBy("hmod").parquet(s"$dir/prefix")
    dfT.write.mode("overwrite").parquet(s"$dir/df")
    val viaStore = Curation.decontaminateNearDupIndexed(
        spark.read.parquet(s"$dir/prefix"), spark.read.parquet(s"$dir/df"),
        corpus, eval, "text", "doc_id", minJaccPct = 50, partitionMod = 64)
      .collect().map(_.toSeq).toSet
    val inQuery = Curation.decontaminateNearDup(corpus, eval, "text", "doc_id",
        minJaccPct = 50)
      .collect().map(_.toSeq).toSet
    assert(viaStore === inQuery, "stored-index probe must not change results")
    assert(viaStore.nonEmpty, "fixture must actually flag contamination")
  }

  test("semantic decontamination: direction match flags, orthogonal doesn't, plan has no join/shuffle") {
    // a scaled copy shares its eval source's DIRECTION exactly (the
    // translated/paraphrased contamination mode n-gram paths miss)
    val eval = Seq((100L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (0L, Array(2.5f, 0.0f, 0.0f, 0.0f)),   // scaled eval copy → sim 1.0
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),   // orthogonal → sim 0
      (2L, Array(1.0f, 1.0f, 0.0f, 0.0f)))   // 45° → sim ~0.707
      .toDF("vec_id", "embedding")
    val out = Curation.decontaminateSemantic(corpus, eval, "vec_id", "embedding",
        minSimX100 = 75)
      .orderBy("vec_id").collect()
    assert(out.map(r => (r.getLong(0), r.getAs[Long]("max_sim_x100"),
      r.getAs[Long]("contaminated"))).toSeq ===
      Seq((0L, 100L, 1L), (1L, 0L, 0L), (2L, 70L, 0L)))
    // the scale claim, checked: eval rides as a literal — the scoring
    // plan must contain NO join and NO exchange (pure narrow projection)
    val plan = Curation.decontaminateSemantic(corpus, eval, "vec_id", "embedding", 75)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"semantic decontam must be a joinless, shuffle-free narrow pass:\n$plan")
  }

  test("semantic decontamination: broadcast-join variant is bit-identical to the literal path") {
    val emb = Fixture(spark, sfDir).embeddings
    val eval = emb.filter($"vec_id" % 19 === 3)
    val lit = Curation.decontaminateSemantic(emb, eval, "vec_id", "embedding", 35)
      .orderBy("vec_id").collect().toSeq
    val join = Curation.decontaminateSemanticJoin(emb, eval, "vec_id", "embedding", 35)
      .orderBy("vec_id").collect().toSeq
    assert(join === lit, "the two eval-set carriers must agree to the bit")
    // scale shape of the join path: eval broadcast (nested-loop, corpus
    // side narrow), max partial-aggregated map-side before the exchange
    val df = Curation.decontaminateSemanticJoin(emb, eval, "vec_id", "embedding", 35)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"eval side must broadcast:\n$plan")
    assert(plan.contains("partial_max"),
      s"per-id max must partial-aggregate before the exchange:\n$plan")
  }

  test("semantic decontamination: empty eval set flags nothing; oversized eval set refuses") {
    val corpus = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val empty = corpus.filter($"vec_id" < 0)
    assert(Curation.decontaminateSemantic(corpus, empty, "vec_id", "embedding", 35).count() === 0)
    val e = intercept[IllegalArgumentException] {
      Curation.decontaminateSemantic(corpus, corpus, "vec_id", "embedding", 35, maxEval = 0)
    }
    assert(e.getMessage.contains("maxEval"))
  }

  test("connected components: chains collapse to min id, separate components stay apart") {
    val pairs = Seq((10L, 20L), (20L, 30L), (40L, 50L)).toDF("id_a", "id_b")
    val expected = Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 40L, 50L -> 40L)
    // driver union-find path (default for a tiny edge list) and the
    // distributed pointer-jumping path (forced via driverLimit = 0) must
    // produce the identical labeling
    val local = Curation.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val dist = Curation.connectedComponents(pairs, "id_a", "id_b", driverLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(local === expected)
    assert(dist === expected)
  }

  test("connected components: long chain converges in O(log n) pointer-jumping rounds") {
    // a 64-node path graph has diameter 63; plain propagation would need 63
    // rounds — pointer jumping must finish well inside maxIter = 25
    // (driverLimit = 0 forces the distributed path this test exists for)
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Curation.connectedComponents(chain, "id_a", "id_b", maxIter = 25,
        driverLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(comp.size === 64 && comp.values.forall(_ === 0L))
  }

  test("transitive curation keeps exactly one doc per near-dup chain") {
    val a = "the data pipeline shuffles partitions across executors while the " +
      "optimizer prunes unused columns and the planner broadcasts small tables " +
      "for every scan stage in the distributed query engine runtime"
    val b = a.replace("shuffles", "moves") // near-dup of a
    val c = b.replace("prunes", "drops") // near-dup of b, farther from a
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val kept = Curation.curate(docs, "text", "doc_id",
        Curation.Config(minQualityScore = 0L, minJaccPct = 60))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L), s"one canonical doc per component, kept=$kept")
  }

  test("dedupKeepBest: the quality winner survives even when it is not the min id") {
    // 10 and 11 are near-dups; 11 carries extra distinct tokens, so its
    // quality score is strictly higher — the min-id policy would keep 10,
    // the keep-best policy must keep 11. 12 is an unrelated singleton.
    val base = "the distributed engine broadcasts small dimension tables " +
      "while joining large fact tables on shuffled partition keys today"
    // one appended token: 15 of 16 shingles shared (jacc 93%) so the LSH
    // bands catch the pair, and the extra distinct token nudges 11's
    // score above 10's
    val docs = Seq(
      (10L, base),
      (11L, base + " epilogue"),
      (12L, "completely unrelated text about codegen stages and whole stage fusion"))
      .toDF("doc_id", "text")
    val out = Curation.dedupKeepBest(docs, "text", "doc_id", minJaccPct = 50)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(10L)._2 === 10L && out(11L)._2 === 10L,
      s"10 and 11 must share component 10, got $out")
    assert(!out(10L)._4 && out(11L)._4,
      s"higher-quality 11 must win over min-id 10: $out")
    assert(out(12L)._4 && out(12L)._2 === 12L, "singleton keeps itself")
    assert(out(11L)._3 > out(10L)._3, "precondition: 11 scores higher")
  }

  test("multi-probe LSH recall >= single-bucket LSH recall") {
    val emb = Fixture(spark, sfDir).embeddings
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    val single = Similarity.annLsh(emb, "vec_id", "embedding", 0L, 10, planes = 4)
      .select("vec_id").as[Long].collect().toSet
    val multi = Similarity.annLshMultiProbe(emb, "vec_id", "embedding", 0L, 10, planes = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(multi.intersect(exact).size >= single.intersect(exact).size,
      s"multi-probe must not lose recall: multi=${multi.intersect(exact).size} single=${single.intersect(exact).size}")
    assert(multi.intersect(exact).size >= 4, s"multi-probe recall: ${multi.intersect(exact).size}/10")
  }

  test("bloom decontam: never misses exact contamination; FP overhead bounded") {
    val docs = Fixture(spark, sfDir).documents
    val corpus = docs.filter("doc_id % 50 != 0")
    val eval = docs.filter("doc_id % 50 = 0")
    val exact = Curation.decontaminate(corpus, eval, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    val bloom = Curation.decontaminateBloom(corpus, eval, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(exact.subsetOf(bloom),
      s"bloom admits false positives only; missed ${exact.diff(bloom)}")
    val corpusN = corpus.count()
    assert(bloom.size - exact.size <= corpusN / 20,
      s"FP overhead too high: bloom=${bloom.size} exact=${exact.size} of $corpusN docs")
  }

  test("bloom decontam: empty eval set yields an empty result, not an analysis error") {
    val docs = Fixture(spark, sfDir).documents
    val out = Curation.decontaminateBloom(
      docs, docs.filter("doc_id < 0"), "text", "doc_id")
    assert(out.columns.toSeq ===
      Seq("doc_id", "n_shingles", "n_contaminated", "contam_pct"))
    assert(out.count() === 0L)
  }

  test("bloom roundtrip: every inserted hash probes true") {
    import org.apache.spark.sql.functions.{call_function, expr, lit, xxhash64}
    val vals = spark.range(5000).select(xxhash64($"id").as("h"))
    val filter = vals.agg(expr("graft_bloom_agg(h, 5000L, 65536L)").as("b"))
      .head().getAs[Array[Byte]]("b")
    val misses = vals
      .filter(!call_function("graft_might_contain", lit(filter), $"h"))
      .count()
    assert(misses === 0L, "a bloom filter has no false negatives")
  }

  test("filter funnel: cumulative stage counts, single row, exact on a crafted corpus") {
    val docs = Seq(
      (0L, "the data pipeline shuffles partitions across executors and the " +
        "optimizer prunes columns for every scan stage while joins broadcast " +
        "small tables and aggregate large facts on many distinct keys then"), // en, diverse, 30 toks
      (1L, "el perro grande de la casa es que muy bonito y la madera"), // not en
      (2L, "the the the the a a a of of to"), // en but stopword soup → low quality
      (3L, "the quick unique fox")) // en, quality 541, too short
      .toDF("doc_id", "text")
    val out = Curation.filterFunnel(docs, "text", "doc_id",
      langs = Set("en"), minQualityScore = 520L, minTokens = 30L).collect()
    assert(out.length === 1)
    val r = out.head
    val (total, lang, qual, fin) = (r.getAs[Long]("n_total"), r.getAs[Long]("n_lang"),
      r.getAs[Long]("n_quality"), r.getAs[Long]("n_final"))
    assert(total === 4L && lang === 3L && qual === 2L && fin === 1L,
      s"funnel=$total/$lang/$qual/$fin")
    assert(r.getAs[Long]("kept_pct") === 25L)
    assert(total >= lang && lang >= qual && qual >= fin, "stages must be cumulative")
  }

  test("dropContained: excerpt yields to article, identical docs keep min id, chains keep the maximum") {
    val host = (1 to 60).map(j => s"body${j % 83} tok$j").mkString(" ")
    val mid = host.split(" ").slice(5, 35).mkString(" ")   // 30 toks ⊂ host
    val excerpt = mid.split(" ").slice(2, 14).mkString(" ") // 12 toks ⊂ mid ⊂ host
    val corpus = Seq(
      (1L, host), (2L, mid), (3L, excerpt),
      (10L, "twin copy of a document here now ok"),
      (11L, "twin copy of a document here now ok"), // identical to 10
      (20L, "completely unrelated stream of words " + (1 to 12).map("u" + _).mkString(" ")),
      (21L, "")) // no shingles: trivially kept
      .toDF("doc_id", "text")
    val kept = graft.operators.Curation
      .dropContained(corpus, "text", "doc_id", minContPct = 80)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(kept === Map(
      1L -> true,   // the maximal container always survives
      2L -> false,  // ⊂ host
      3L -> false,  // ⊂ mid (and host)
      10L -> true,  // identical pair: min id wins
      11L -> false,
      20L -> true, 21L -> true))
  }

  test("pageRank: hand-computed integer power iteration on a star graph") {
    // star: hub 1 — leaves 2, 3, 4 (undirected). deg(1)=3, deg(leaf)=1.
    // r0 = 1e6 each.
    // round 1: hub gets 3 leaf contributions of 1e6/1 → 150000 + 85%·3e6
    //   = 2700000; each leaf gets 1e6 DIV 3 = 333333 → 150000 +
    //   (85·333333) DIV 100 = 150000 + 283333 = 433333.
    // round 2: hub ← 3·(433333 DIV 1) → 150000 + (85·1299999) DIV 100
    //   = 150000 + 1104999 = 1254999; leaf ← 2700000 DIV 3 = 900000 →
    //   150000 + (85·900000) DIV 100 = 915000.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val out = Curation.pageRank(edges, "a", "b", iters = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 1254999L), (2L, 915000L), (3L, 915000L), (4L, 915000L)))
    // duplicate/reversed input edges collapse (symmetrize + distinct)
    val noisy = edges.union(Seq((2L, 1L), (1L, 2L)).toDF("a", "b"))
    val out2 = Curation.pageRank(noisy, "a", "b", iters = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out2.toSeq === out.toSeq)
  }

  test("gopherFilter: each rule fires independently, signals integer-exact, empty doc defined") {
    // d0: 30 tokens ("the" + word02..word30, each 6 chars) — passes all
    val d0 = ("the" +: (2 to 30).map(i => f"word$i%03d")).mkString(" ")
    // d1: 4 short tokens — r1 (count), r2 (mwl 22), r5 (top 25%) fail
    val d1 = "aa bb the cc"
    // d2: 25× "the" — r3 (uniq 4%) and r5 (top 100%) fail
    val d2 = Seq.fill(25)("the").mkString(" ")
    // d3: 25 distinct 15-char words — r2 (mwl 150) and r4 (no stopword) fail
    val d3 = (1 to 25).map(i => "x" * 12 + f"$i%03d").mkString(" ")
    val docs = Seq((0L, d0), (1L, d1), (2L, d2), (3L, d3), (4L, "")).toDF("doc_id", "text")
    val out = Curation.gopherFilter(docs, "text", "doc_id").orderBy("doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("mwl_x10"), r.getAs[Long]("uniq_pct"),
         r.getAs[Long]("n_stop"), r.getAs[Long]("top_tok_pct"),
         Seq("r1", "r2", "r3", "r4", "r5").map(r.getAs[Long]), r.getAs[Long]("n_fail"),
         r.getAs[Long]("keep"))).toMap
    // d0: sum_len = 3 + 29*7 = 206 → mwl 68; all distinct; one stopword
    assert(out(0L) === ((30L, 68L, 100L, 1L, 3L, Seq(1L, 1L, 1L, 1L, 1L), 0L, 1L)))
    assert(out(1L) === ((4L, 22L, 100L, 1L, 25L, Seq(0L, 0L, 1L, 1L, 0L), 3L, 0L)))
    assert(out(2L) === ((25L, 30L, 4L, 25L, 100L, Seq(1L, 1L, 0L, 1L, 0L), 2L, 0L)))
    assert(out(3L) === ((25L, 150L, 100L, 0L, 4L, Seq(1L, 0L, 1L, 0L, 1L), 2L, 0L)))
    // empty doc: all guards hit greatest(n,1); only r5 (0 <= 20) passes
    assert(out(4L) === ((0L, 0L, 0L, 0L, 0L, Seq(0L, 0L, 0L, 0L, 1L), 4L, 0L)))
  }

  test("gopherFilter: topTokenCap bounds the r5 fold — a 50k-token doc stays cheap and the cap window is honored") {
    // 50k tokens, ~half unique (uncapped distinct×count ≈ 1.25·10⁹ ops in
    // ONE row — the straggler case the cap exists for): 25k distinct words
    // each twice, interleaved. Runtime bound is the real assertion — the
    // uncapped fold takes minutes; the capped one must finish in seconds.
    val big = (0 until 50000).map(i => f"w${i % 25000}%05d").mkString(" ")
    val docs = Seq((0L, big)).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val row = Curation.gopherFilter(docs, "text", "doc_id").collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60.0, s"capped gopherFilter took $secs s on a 50k-token doc")
    assert(row.getAs[Long]("n_tokens") === 50000L)
    // linear signals still cover the FULL doc: 25k distinct of 50k → 50%
    assert(row.getAs[Long]("uniq_pct") === 50L)
    // r5 window = first 2048 tokens = w00000..w02047 each once → top_tok 1
    // of head_len 2048 → share 0%
    assert(row.getAs[Long]("top_tok_pct") === 0L)

    // cap semantics: a doc whose stuffing happens PAST the cap is not
    // flagged by r5 (head window only) — documented head-sample contract
    val tail = ((0 until 2048).map(i => f"u$i%04d") ++ Seq.fill(512)("spam")).mkString(" ")
    val r2 = Curation.gopherFilter(Seq((1L, tail)).toDF("doc_id", "text"),
      "text", "doc_id").collect().head
    assert(r2.getAs[Long]("top_tok_pct") === 0L)
    // and with a smaller cap covering the stuffed region, r5 sees it
    val r3 = Curation.gopherFilter(Seq((2L, Seq.fill(100)("spam").mkString(" ")))
        .toDF("doc_id", "text"), "text", "doc_id", topTokenCap = 64).collect().head
    assert(r3.getAs[Long]("top_tok_pct") === 100L)
  }
}
