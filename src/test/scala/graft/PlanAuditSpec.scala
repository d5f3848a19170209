package graft

import org.apache.spark.sql.DataFrame
import graft.sources.Tables.Fixture

/** Physical-plan discipline: these assertions pin the plan shapes that make
  * the declared queries scale — if a refactor regresses pushdown, pruning,
  * broadcast choice, or partial aggregation, this suite fails even though
  * results stay correct.
  */
class PlanAuditSpec extends SparkTestBase {

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("q_scan_project: column pruning reaches the parquet scan") {
    val leaves = SparkEntry.queries("q_scan_project")(spark, sfDir)
      .queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    // only the 4 selected columns may be read; `ts` arrives as whatever
    // physical type the fixture generator wrote (int64 nanos read as bigint
    // under nanosAsLong, or native timestamp_ntz micros)
    val rawTs = spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    val tsRead =
      if (rawTs == org.apache.spark.sql.types.LongType) "bigint" else "timestamp_ntz"
    assert(leaves.contains(s"ReadSchema: struct<event_id:bigint,ts:$tsRead,user_id:bigint,event_type:string>"),
      s"scan must prune to the projection:\n$leaves")
  }

  test("q_filter_conj: all three predicates pushed to the scan") {
    // (plan toString truncates the PushedFilters list — assert via the
    // DataFilters rendering, which carries the same pushed predicates)
    val p = plan("q_filter_conj")
    assert(p.contains("EqualTo(event_type,purchase"),
      s"event_type predicate must reach the scan:\n$p")
    assert("user_id#\\d+L = 7".r.findFirstIn(p).isDefined,
      s"user_id predicate must reach the scan:\n$p")
  }

  test("q_topk plans as TakeOrderedAndProject (no global sort materialized)") {
    assert(plan("q_topk").contains("TakeOrderedAndProject"))
  }

  test("q_star_join broadcasts every dimension (fact table never shuffles for dims)") {
    val p = plan("q_star_join")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 3, s"customer/nation/region must broadcast, found $broadcasts:\n$p")
  }

  test("q_enrich_join: payload dimension broadcast, top-K side not shuffled") {
    val p = plan("q_enrich_join")
    assert(p.contains("BroadcastHashJoin"), s"dimension must broadcast:\n$p")
    // the top-K side stays TakeOrderedAndProject with NO exchange: a
    // regression that re-shuffles/globally re-sorts it would still contain
    // the broadcast join, so pin the shuffle-free half explicitly
    assert(p.contains("TakeOrderedAndProject"),
      s"top-K must stay TakeOrderedAndProject:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"the broadcast plan must not hash-shuffle either side:\n$p")
  }

  test("q_agg_sum: partial (map-side) aggregation before the exchange") {
    val p = plan("q_agg_sum")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"expect partial+final HashAggregate pair:\n$p")
    assert(p.contains("partial_sum"),
      s"the SUM itself must partial-aggregate map-side:\n$p")
  }

  test("q_group_count: whole-stage codegen covers the agg pipeline") {
    // AQE finalizes stages lazily — execute THIS df (count() would plan a
    // separate query), then inspect the finalized plan
    val df = SparkEntry.queries("q_group_count")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // codegen'd operators render with the `*(n)` star prefix
    assert(p.contains("isFinalPlan=true") && p.contains("*("), p)
  }

  test("q_minhash_lsh: signature aggregation is partial-aggregated and HOF-free") {
    val p = plan("q_minhash_lsh")
    assert(p.contains("partial_min"), s"k minima must combine map-side:\n$p")
    assert(!p.toLowerCase.contains("lambdafunction"),
      s"hot aggregation path must not contain interpreted lambda expressions:\n$p")
  }

  test("q_cosine_topk: query vector broadcast; top-k via TakeOrderedAndProject") {
    val p = plan("q_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q_embed_neardup: blocked self-join shuffles on the block key only") {
    val p = plan("q_embed_neardup")
    // an equi-join on label must be planned (broadcast/sort-merge/shuffled
    // hash) — losing the blocking condition degrades to CartesianProduct OR
    // BroadcastNestedLoopJoin (the usual N² fallback), both forbidden
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"),
      s"the block key must plan an equi-join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"blocking must avoid an N² join:\n$p")
  }

  test("q_asof_join: union+window composition — no theta join, no nested loop") {
    val p = plan("q_asof_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"as-of must not plan a theta join:\n$p")
    // the inequality is realized by an ordered window over the key, one sort
    assert(p.contains("Window"), s"as-of needs the ordered window:\n$p")
  }

  test("q_range_join: bucket-prejoin plans a hash join, not a nested loop") {
    val p = plan("q_range_join")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"),
      s"range join must hash-join on the bucket key:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must not degrade to a nested loop:\n$p")
  }

  test("q_minhash_lsh: capped candidate generation keeps ONE signature subtree") {
    val df = SparkEntry.queries("q_minhash_lsh")(spark, sfDir)
    val scans = "FileScan".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
    // one scan feeds signatures+banding, one feeds the Jaccard verify —
    // a third means the all-pairs/chain branches stopped sharing the
    // bucket-members aggregate
    assert(scans <= 2, s"documents must be scanned at most twice, found $scans")
  }

  test("q_minhash_lsh: Jaccard verify broadcasts candidate members; shingles never shuffle") {
    val df = SparkEntry.queries("q_minhash_lsh")(spark, sfDir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // candidate pairs are bounded by banding + the skew cap → the member
    // side broadcasts and the corpus-wide shingle stream stays narrow (no
    // pre-distinct, no sort-merge join over all (id, shingle) rows)
    assert(fin.contains("BroadcastHashJoin"),
      s"verify must broadcast the candidate-member side:\n$fin")
    assert(!fin.contains("SortMergeJoin"),
      s"no corpus-wide shuffle join may appear in the verify:\n$fin")
  }

  test("q_tfidf: ONE corpus scan and ONE token explode feed tf AND df") {
    // df is a window count over the tf aggregate — an earlier tf⋈df join
    // form planned the whole explode subtree twice (Catalyst prunes the
    // two consumers differently, so the exchange is never reused)
    val df = SparkEntry.queries("q_tfidf")(spark, sfDir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("Generate".r.findAllIn(fin).length === 1,
      s"corpus must explode exactly once:\n$fin")
    assert("FileScan".r.findAllIn(fin).length === 1,
      s"corpus must scan exactly once:\n$fin")
  }

  test("q_simjoin: ONE shingle pipeline feeds df, prefixes, AND candidates; no sort-merge join") {
    // df is a window count and candidates come from per-hash member lists,
    // so the corpus scans once for the prefix side (+ once for the
    // bounded member-only verify re-read); a df-join / prefix-self-join
    // form planned the shingle subtree 3+ times. Joins stay broadcast
    // (member set is bounded by candidates) — a SortMergeJoin would mean
    // the corpus-side stream shuffled on a string or text column.
    // the candidate pipeline sits behind a localCheckpoint (consumed twice
    // by the verify), so the FINAL plan must read the checkpointed pair
    // RDD + exactly ONE member-only corpus re-scan — a regression to the
    // df-join / prefix-self-join form shows up as extra parquet scans here
    val df = SparkEntry.queries("q_simjoin")(spark, sfDir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("documents\\.parquet".r.findAllIn(fin).length === 1,
      s"verify must re-scan the corpus exactly once (members only):\n$fin")
    assert(fin.contains("ExistingRDD") || fin.contains("Scan rdd"),
      s"candidates must come from the materialized checkpoint:\n$fin")
    assert(!fin.contains("SortMergeJoin"), s"all joins must broadcast:\n$fin")
  }

  test("q_gapfill: grid is bounded types×minutes, events never in a cartesian") {
    val df = SparkEntry.queries("q_gapfill")(spark, sfDir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!fin.contains("CartesianProduct"),
      s"no cartesian product may appear anywhere:\n$fin")
    // the only nested-loop join is the tiny distinct-types × minute-sequence
    // grid cross (both sides aggregates, one broadcast); events join the
    // grid by hash
    assert("BroadcastNestedLoopJoin".r.findAllIn(fin).length <= 1, fin)
    assert(fin.contains("explode(sequence("),
      s"minute grid must come from a generated sequence, not an events self-join:\n$fin")
    assert(fin.contains("BroadcastHashJoin") || fin.contains("SortMergeJoin"),
      s"per-minute aggregates must hash-join the grid:\n$fin")
  }

  test("q_decontam: corpus side is ONE shuffle — broadcast membership, single per-doc agg") {
    val df = SparkEntry.queries("q_decontam")(spark, sfDir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the eval hash set broadcasts; the corpus-wide distinct is folded into
    // the per-doc collect_set aggregation (map-side partials dedup), so the
    // only exchanges are the per-doc agg + the declared ORDER BY
    assert(fin.contains("BroadcastHashJoin"),
      s"eval membership must broadcast:\n$fin")
    assert(!fin.contains("SortMergeJoin"),
      s"the corpus must never shuffle against the eval set:\n$fin")
    // exactly one corpus-side shuffle: the per-doc aggregation. The old
    // shape pre-deduped with an Exchange on (doc_id, h); its absence is the
    // win being pinned. (The remaining exchanges are the KB-scale eval-side
    // distinct and the declared ORDER BY.)
    val docAggExchanges = "Exchange hashpartitioning\\(doc_id#\\d+L, \\d".r
      .findAllIn(fin).length
    assert(docAggExchanges == 1,
      s"corpus must shuffle exactly once, keyed by doc alone, found $docAggExchanges:\n$fin")
    assert(!"Exchange hashpartitioning\\(doc_id#\\d+L, h#".r.findFirstIn(fin).isDefined,
      s"no (doc, shingle-hash) pre-dedup exchange may remain:\n$fin")
    assert(fin.contains("partial_collect_set") || fin.contains("ObjectHashAggregate"),
      s"distinct sets must partial-merge map-side:\n$fin")
  }

  test("q_dedup_cc: iterative lineage is truncated — final plan reads one materialized relation") {
    // driver union-find path → LocalTableScan; distributed pointer-jumping
    // path → checkpointed ExistingRDD; either way the per-round joins must
    // never survive into the final plan (growing lineage)
    val df = SparkEntry.queries("q_dedup_cc")(spark, sfDir)
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(fin.contains("ExistingRDD") || fin.contains("LocalTableScan"),
      s"labels must come from a materialized component result:\n$fin")
    assert(!fin.contains("Join"),
      s"no per-round join may survive into the final plan (growing lineage):\n$fin")
  }

  test("ANN probe over a bucket-partitioned layout prunes the scan to the probed partition") {
    import org.apache.spark.sql.functions.col
    // the scale claim in Similarity's scaladoc, made checkable: lay the
    // LSH-bucketed table out partitioned by bucket, probe one bucket, and
    // the scan must read exactly that partition — not filter post-scan
    val dir = java.nio.file.Files.createTempDirectory("graft-annlayout").toString
    val bucketed = graft.operators.Similarity
      .lshBuckets(Fixture(spark, sfDir).embeddings, "embedding", planes = 3)
    graft.sources.Sinks.writePartitioned(bucketed, "bucket", dir)
    val table = spark.read.parquet(dir)
    val nParts = table.select("bucket").distinct().count()
    assert(nParts >= 4, s"fixture must spread across buckets, got $nParts")
    // partition-directory values read back integer-inferred
    val someBucket = table.select("bucket").head.get(0)
    val probe = table.filter(col("bucket") === someBucket)
    probe.collect()
    val scan = probe.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty,
      s"bucket predicate must be a partition filter, not a row filter:\n$scan")
    val partsRead = scan.metrics.get("numPartitions").map(_.value).getOrElse(-1L)
    assert(partsRead === 1L,
      s"probe must read exactly 1 of $nParts partitions, read $partsRead")
  }

  test("incremental dedup over a bmod-partitioned LSH index prunes to touched classes") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    // the minhashPairsIncremental partitionMod claim, symmetric with the
    // prefix-index pin below: store the band-bucket index partitioned by
    // h60(bucket) mod 64, probe with a ONE-DOC batch, and the index scan
    // must read only the batch's touched mod classes
    val docs = Fixture(spark, sfDir).documents
    val corpus = docs.filter(col("doc_id") =!= 0L)
    val incoming = docs.filter(col("doc_id") === 0L)
    val dir = java.nio.file.Files.createTempDirectory("graft-lshidx").toString
    graft.sources.Sinks.writePartitioned(
      graft.operators.Dedup.bandBuckets(corpus, "text", "doc_id", 16, 4)
        .withColumn("bmod",
          pmod(graft.functions.TextFns.h60(col("bucket")), lit(64L))),
      "bmod", dir)
    val stored = spark.read.parquet(dir)
    val nParts = stored.select("bmod").distinct().count()
    val mods = graft.operators.Dedup.bandBuckets(incoming, "text", "doc_id", 16, 4)
      .select(pmod(graft.functions.TextFns.h60(col("bucket")), lit(64L)).as("bmod"))
      .distinct().collect().map(_.getLong(0))
    assert(mods.length.toLong < nParts,
      s"a one-doc batch (4 bands) must touch a strict subset: ${mods.length} of $nParts")
    val probe = stored.filter(col("bmod").isin(mods.map(Long.box): _*))
    probe.collect()
    val scan = probe.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty,
      s"bmod must prune as a partition filter, not a row filter:\n$scan")
    val partsRead = scan.metrics.get("numPartitions").map(_.value).getOrElse(-1L)
    assert(partsRead === mods.length.toLong,
      s"probe must read exactly the ${mods.length} touched of $nParts partitions, read $partsRead")
    // and the stored+pruned path returns exactly the unpartitioned result
    val viaStore = graft.operators.Dedup.minhashPairsIncremental(
      stored, corpus, incoming, "text", "doc_id", 16, 4, 50, 64, partitionMod = 64)
      .collect().map(_.toSeq).toSet
    val plain = graft.operators.Dedup.minhashPairsIncremental(
      graft.operators.Dedup.bandBuckets(corpus, "text", "doc_id", 16, 4),
      corpus, incoming, "text", "doc_id", 16, 4, 50, 64)
      .collect().map(_.toSeq).toSet
    assert(viaStore === plain, "pruned stored-index probe must not change results")
  }

  test("incremental simjoin over a partitioned prefix index prunes to touched hash classes") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    // the "hash-range prunable" claim in similarityJoinIncremental's
    // scaladoc, made checkable: store the prefix index partitioned by
    // h mod 64, probe with a ONE-DOC batch (touches a strict subset of
    // the 64 classes), and the index scan must read only those partitions
    val docs = Fixture(spark, sfDir).documents
    val corpus = docs.filter(col("doc_id") =!= 0L)
    val incoming = docs.filter(col("doc_id") === 0L)
    val (prefix, cdf) = graft.operators.Dedup.similarityIndex(corpus, "text", "doc_id", 50)
    val dir = java.nio.file.Files.createTempDirectory("graft-simidx").toString
    graft.sources.Sinks.writePartitioned(
      prefix.withColumn("hmod", pmod(col("h"), lit(64L))), "hmod", dir)
    val stored = spark.read.parquet(dir)
    val nParts = stored.select("hmod").distinct().count()
    // the candidate pipeline executes inside the operator's eager
    // checkpoint, so the index scan never reaches the FINAL plan — audit
    // the probe sub-plan exactly as the operator builds it (static isin
    // of the touched mod classes), then pin result equivalence through
    // the operator itself
    val mods = graft.operators.Dedup.prefixRows(incoming, cdf, "text", "doc_id", 50)
      .select(pmod(col("h"), lit(64L)).as("hmod")).distinct()
      .collect().map(_.getLong(0))
    assert(mods.length.toLong < nParts,
      s"a one-doc batch must touch a strict subset of classes: ${mods.length} of $nParts")
    val probe = stored.filter(col("hmod").isin(mods.map(Long.box): _*))
    probe.collect()
    val scan = probe.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty,
      s"hmod must prune as a partition filter, not a row filter:\n$scan")
    val partsRead = scan.metrics.get("numPartitions").map(_.value).getOrElse(-1L)
    assert(partsRead === mods.length.toLong,
      s"probe must read exactly the ${mods.length} touched of $nParts partitions, read $partsRead")
    // and the stored+pruned path returns exactly the unpartitioned result
    val viaStore = graft.operators.Dedup.similarityJoinIncremental(
      stored, cdf, corpus, incoming, "text", "doc_id", 50, partitionMod = 64)
      .collect().map(_.toSeq).toSet
    val plain = graft.operators.Dedup.similarityJoinIncremental(
      prefix, cdf, corpus, incoming, "text", "doc_id", 50)
      .collect().map(_.toSeq).toSet
    assert(viaStore === plain, "pruned stored-index probe must not change results")
  }

  test("probe-side prefix ranking never shuffles the stored dictionary (batchLocal broadcast)") {
    import org.apache.spark.sql.functions.col
    // the probe-path fix made checkable: ranking a BATCH under the stored
    // corpus dictionary must semi-filter + broadcast the dictionary, not
    // sort-merge it — without the batchLocal path the full corpus-scale
    // df table shuffled per probe (measured: the probe ran SLOWER than
    // the from-scratch join it exists to avoid)
    val docs = Fixture(spark, sfDir).documents
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val incoming = docs.filter(col("doc_id") % 5 === 0)
    val cdf = graft.operators.Dedup.shingleDfTable(corpus, "text", "doc_id")
    val bp = graft.operators.Dedup.prefixRows(
      incoming, cdf, "text", "doc_id", 50, batchLocal = true)
    bp.collect()
    val fin = bp.queryExecution.executedPlan.toString
    assert(!fin.contains("SortMergeJoin"),
      s"dictionary lookup must broadcast, never sort-merge:\n$fin")
    assert("BroadcastHashJoin".r.findAllIn(fin).length >= 2,
      s"expected broadcast semi-filter + broadcast lookup:\n$fin")
    // and batchLocal is a pure physical rewrite: identical rows out
    val plain = graft.operators.Dedup.prefixRows(
      incoming, cdf, "text", "doc_id", 50).collect().map(_.toSeq).toSet
    assert(bp.collect().map(_.toSeq).toSet === plain,
      "batchLocal must not change prefix rows")
  }

  test("z-ordered layout file-skips: pushed point filter reads a fraction of the rows") {
    import org.apache.spark.sql.functions.col
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head.metrics("numOutputRows").value
    }
    val events = Fixture(spark, sfDir).events.select("event_id", "user_id", "event_type")
    val base = java.nio.file.Files.createTempDirectory("graft-zorder")
    // baseline: round-robin layout — every file spans the full user range,
    // so row-group stats can never exclude a user_id predicate
    events.repartition(64).write.mode("overwrite").parquet(base.resolve("flat").toString)
    graft.sources.Sinks.writeZOrdered(events, "user_id", "event_id",
      base.resolve("z").toString, files = 64)

    val someUser = events.select("user_id").head.getLong(0)
    val pred = col("user_id") === someUser
    val flatRows = scanRows(spark.read.parquet(base.resolve("flat").toString).filter(pred))
    val zRows = scanRows(spark.read.parquet(base.resolve("z").toString).filter(pred))
    // same answer, far fewer rows surfaced by the skipping scan (the flat
    // layout already skips SOME pages by chance via parquet column
    // indexes — z-order must beat it decisively and read a small
    // fraction of the table)
    val total = events.count()
    assert(spark.read.parquet(base.resolve("z").toString).filter(pred).count() ===
      events.filter(pred).count())
    assert(zRows > 0 && zRows * 2 < flatRows && zRows * 4 < total,
      s"z-order must let parquet stats skip most row groups: z=$zRows flat=$flatRows total=$total")
  }

  test("q_sql_q21: EXISTS + correlated NOT EXISTS both decorrelate to hash joins") {
    // the suite's hardest decorrelation: same-fact EXISTS (<> correlation)
    // and NOT EXISTS (<> + outer-column non-equi) must plan as LeftSemi /
    // LeftAnti HASH joins with the residuals as join conditions — a
    // nested-loop fallback would re-scan lineitem per row
    val p = plan("q_sql_q21")
    assert(p.contains("LeftSemi"), s"EXISTS must become a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must become an anti join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"no nested-loop fallback:\n$p")
  }

  test("q_sql_q2: correlated MIN-over-join decorrelates to one aggregate + join-back") {
    val p = plan("q_sql_q2")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"no nested-loop fallback:\n$p")
    assert("partial_min\\(s_acctbal".r.findFirstIn(p).isDefined,
      s"inner min must run as ONE partial-agg'd aggregate, not per outer row:\n$p")
  }

  test("q_dedup_best: winner election is a hash aggregate, never a window over members") {
    // the scale claim in dedupKeepBest's scaladoc: a component with a
    // million copies must contribute one partial row per map partition
    // to each election shuffle — a row_number window (the oracle's
    // algorithm) would sort every member, and a max(struct) election's
    // struct buffer silently downgrades HashAggregate to SortAggregate
    // (how this pin caught the first implementation). The CC loop runs
    // inside checkpoints, so audit the FINAL plan only
    val df = SparkEntry.queries("q_dedup_best")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      s"election must not window-sort component members:\n$p")
    assert(!p.contains("SortAggregate"),
      s"election aggregates must stay hash-based:\n$p")
    assert(p.contains("HashAggregate") && p.contains("partial_max"),
      s"expected the partial-aggregated max-score election:\n$p")
  }

  test("q_sql_exists: correlated EXISTS decorrelates to a semi join, no nested loop") {
    val fin = plan("q_sql_exists").split("== Initial Plan ==").head
    assert(fin.contains("LeftSemi"), s"EXISTS must plan as a left-semi join:\n$fin")
    assert(!fin.contains("CartesianProduct") && !fin.contains("BroadcastNestedLoopJoin"),
      s"decorrelation must avoid a nested-loop re-execution:\n$fin")
  }

  test("q_sql_scalar_subq: correlated scalar subquery runs ONE per-key aggregate, not per-row") {
    val fin = plan("q_sql_scalar_subq").split("== Initial Plan ==").head
    // the per-part max(l_quantity) must appear as a single partial+final
    // aggregate pair joined back on the correlation key
    assert(fin.contains("partial_max") || fin.contains("max("),
      s"per-key aggregate must be materialized once:\n$fin")
    assert(!fin.contains("CartesianProduct") && !fin.contains("BroadcastNestedLoopJoin"),
      s"scalar subquery must not re-execute per outer row:\n$fin")
    // lineitem appears exactly twice: outer scan + the decorrelated agg scan
    val scans = "Scan parquet".r.findAllIn(fin).length
    assert(scans <= 3, s"expected lineitem x2 + part, found $scans scans:\n$fin")
  }

  test("q_sql_in_subq: IN + HAVING subquery plans as semi join over one aggregate") {
    val fin = plan("q_sql_in_subq").split("== Initial Plan ==").head
    assert(fin.contains("LeftSemi"), s"IN must plan as a left-semi join:\n$fin")
    assert("partial_sum".r.findFirstIn(fin).isDefined,
      s"HAVING sum must partial-aggregate map-side:\n$fin")
  }

  test("events ts normalization is a single exact conversion (no double round-trip)") {
    val df = Fixture(spark, sfDir).events.select("ts")
    val analyzed = df.queryExecution.analyzed.toString
    val rawTs = spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    if (rawTs == org.apache.spark.sql.types.LongType)
      // int64 nanos fixture: ns→µs must be integer division into micros
      assert(analyzed.contains("timestamp_micros"), s"ns→µs must be integer division:\n$analyzed")
    else
      // timestamp_ntz fixture: a single zone-reinterpret cast, nothing else
      assert(analyzed.contains("cast(ts") && !analyzed.toLowerCase.contains("double"),
        s"ntz→timestamp must be one cast:\n$analyzed")
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType,
      "engine type for events.ts must be session-zoned TimestampType")
  }

  test("q_dup_ngrams: ONE shingle pipeline feeds both the dedup and the df side") {
    val df = SparkEntry.queries("q_dup_ngrams")(spark, sfDir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // one corpus scan, one explode; the distinct-(doc,h) exchange is REUSED
    // by the doc-frequency aggregation instead of replaying scan+explode
    assert("Generate explode".r.findAllIn(fin).length == 1,
      s"exactly one shingle explode expected:\n$fin")
    assert(fin.contains("ReusedExchange"),
      s"df side must reuse the distinct-(doc,h) exchange, not rescan:\n$fin")
    assert(fin.contains("partial_count"),
      s"doc-frequency count must partial-aggregate map-side:\n$fin")
  }

  test("q_shard: one hash exchange on the shard key, per-shard (not global) sort") {
    val df = SparkEntry.queries("q_shard")(spark, sfDir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("Exchange hashpartitioning\\(shard#".r.findAllIn(fin).length == 1,
      s"exactly one exchange keyed by shard expected:\n$fin")
    // the window sort is partition-local (global=false); the only global
    // sort is the declared ORDER BY doc_id
    assert("Sort \\[shard#\\d+ ASC NULLS FIRST, h#\\d+L ASC NULLS FIRST.*\\], false".r
      .findFirstIn(fin).isDefined,
      s"within-shard ordering must be a local sort:\n$fin")
  }

  test("q_funnel: all stage counts from ONE corpus scan, partial-aggregated") {
    val df = SparkEntry.queries("q_funnel")(spark, sfDir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("FileScan parquet".r.findAllIn(fin).length == 1,
      s"the funnel must cost one corpus scan regardless of stage count:\n$fin")
    assert("partial_sum".r.findAllIn(fin).length >= 3,
      s"stage sums must partial-aggregate before the single-partition exchange:\n$fin")
    assert(fin.contains("Exchange SinglePartition"),
      s"only the one-row final combine may exchange:\n$fin")
  }

  test("q_decontam_bloom: membership probe fused into the scan — NO join in the plan") {
    val df = SparkEntry.queries("q_decontam_bloom")(spark, sfDir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!fin.contains("Join"),
      s"bloom probe must replace the membership join entirely:\n$fin")
    assert(fin.contains("might_contain"),
      s"the probe must be the codegen'd bloom expression:\n$fin")
    // same single per-doc aggregation shuffle as exact decontam
    assert("Exchange hashpartitioning\\(doc_id#\\d+L".r.findAllIn(fin).length == 1,
      s"corpus must shuffle exactly once (per-doc agg):\n$fin")
  }

  test("q_event_funnel: type filter pushed to scan; two exchanges (user agg + 1-row combine)") {
    val df = SparkEntry.queries("q_event_funnel")(spark, sfDir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the isin prune must reach the parquet scan so only funnel-relevant
    // event types are ever decoded
    assert(fin.contains("In(event_type"),
      s"step-type isin must push to the scan:\n$fin")
    // exactly: hash exchange on user for the fold agg, single-partition
    // exchange for the one-row rollup (+ nothing else)
    assert("Exchange hashpartitioning\\(user_id#\\d+L".r.findAllIn(fin).length == 1,
      s"per-user fold must shuffle exactly once on user_id:\n$fin")
    assert(!fin.contains("Window"),
      s"the funnel must not sort the event stream through a window:\n$fin")
  }

  test("q_session_funnel: window's user exchange is REUSED by the session groupBy") {
    val df = SparkEntry.queries("q_session_funnel")(spark, sfDir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // HashPartitioning(user_id) satisfies the (user, session) clustering,
    // so sessionization + fold must share ONE user-keyed exchange; the
    // only other keyed exchange is the distinct-user Expand over
    // per-SESSION rows (orders of magnitude below events)
    assert("Exchange hashpartitioning\\(user_id#\\d+L, \\d+\\)".r.findAllIn(fin).length == 1,
      s"events must shuffle exactly once on user_id:\n$fin")
  }

  test("q_collocations: window marginals keep the bigram Generate count at 2 (main + scalar T)") {
    val df = SparkEntry.queries("q_collocations")(spark, sfDir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the join-of-reaggregated-subtrees form planned FOUR bigram explodes
    // (one per pruned consumer); window marginals collapse that to the
    // main stream + the scalar-total consumer
    assert("Generate explode".r.findAllIn(fin).length <= 2,
      s"marginals must not re-plan the bigram subtree per consumer:\n$fin")
    // no marginal joins — only the broadcast scalar-T nested loop
    assert(!fin.contains("SortMergeJoin") && !fin.contains("ShuffledHashJoin"),
      s"cl/cr must be windows, not joins:\n$fin")
  }

  test("q_dsir: scoring pass is joinless — weights ride as a literal into the scan") {
    val df = graft.operators.Curation.dsirScore(
      Fixture(spark, sfDir).documents, "text", "doc_id",
      org.apache.spark.sql.functions.col("lang") === "en")
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the counts pass runs eagerly inside dsirScore (driver collect);
    // the RETURNED scoring plan must be a narrow no-join, no-shuffle scan
    assert(!fin.contains("Join"), s"scoring must not join the weight table:\n$fin")
    // the loader's round-robin small-file spread is fine; what must NOT
    // appear is a KEYED shuffle (hash/range) — the fold has no key
    assert(!fin.contains("hashpartitioning") && !fin.contains("rangepartitioning"),
      s"scoring must be a narrow per-row fold, no keyed shuffle:\n$fin")
    assert("FileScan parquet".r.findAllIn(fin).length == 1,
      s"one corpus scan:\n$fin")
  }

  test("q_quantile_sketch: partial WindowGroupLimit before the exchange — the wire carries <= k rows per partition per group") {
    val df = SparkEntry.queries("q_quantile_sketch")(spark, sfDir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("WindowGroupLimit .*row_number\\(\\), 64, Partial".r.findFirstIn(fin).isDefined,
      s"rank <= k must prune map-side (Partial WindowGroupLimit):\n$fin")
    // the sample percentile also partial-aggregates
    assert(fin.contains("partial_percentile"),
      s"sample percentile must partial-aggregate:\n$fin")
  }

  test("q_funnel_time: percentiles partial-aggregated by step — no window, broadcast stats join") {
    val df = SparkEntry.queries("q_funnel_time")(spark, sfDir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // a rank-based exact percentile would sort each step's users in ONE
    // task via a Window — the partial-merged percentile agg is the 100 TB
    // shape (map-side buffers, k-keyed exchange)
    assert(fin.contains("partial_percentile"),
      s"percentile must partial-aggregate map-side:\n$fin")
    assert(!fin.contains("Window"),
      s"no window over per-user latencies:\n$fin")
    // the k-row latency stats broadcast onto the k-row step rollup
    assert(fin.contains("BroadcastHashJoin"),
      s"step stats must broadcast-join the rollup:\n$fin")
  }

  test("curate probe's fingerprint anti-join prunes the fp store to touched fmod classes") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    import graft.streaming.CurateIngest
    // ingest a corpus slice so the fp store spans many fmod partitions,
    // then mirror the probe's fp-read sub-plan for a ONE-DOC batch — it
    // must read only that doc's fmod class as a PARTITION filter (the
    // 100 TB claim: the exact-dedup check is a pruned index lookup, not
    // an fp-store scan)
    val docs = Fixture(spark, sfDir).documents
    val maxId = docs.agg(org.apache.spark.sql.functions.max(col("doc_id")))
      .head().getLong(0)
    val root = java.nio.file.Files.createTempDirectory("graft-curate-pin").toString
    graft.streaming.CurateIngest.processBatch(spark,
      docs.filter(col("doc_id") < maxId), root, "text", "doc_id", 0L)
    val batch = docs.filter(col("doc_id") === maxId)
    val mods = graft.operators.Dedup
      .fingerprintCanonical(
        graft.operators.Curation.curateCandidates(batch, "text", "doc_id",
          graft.operators.Curation.Config()), "text", "doc_id")
      .select(pmod(graft.functions.TextFns.h60(
        graft.operators.Dedup.fpExpr("text")), lit(64L)).as("fmod"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val stored = spark.read.parquet(CurateIngest.fpDir(root))
    val nParts = stored.select("fmod").distinct().count()
    assert(mods.length.toLong < nParts,
      s"a one-doc batch must touch a strict subset: ${mods.length} of $nParts")
    val probe = stored.filter(col("fmod").isin(mods.map(Long.box): _*))
    probe.collect()
    val scan = probe.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty,
      s"fmod must prune as a partition filter, not a row filter:\n$scan")
    val partsRead = scan.metrics.get("numPartitions").map(_.value).getOrElse(-1L)
    assert(partsRead === mods.length.toLong,
      s"probe must read exactly the ${mods.length} touched of $nParts fp partitions, read $partsRead")
  }

  test("semanticDedupProbe prunes the vector store to the batch's touched cells") {
    import org.apache.spark.sql.functions.col
    // the incremental-SemDeDup scale claim made checkable: a SMALL batch
    // touches a strict subset of the store's cell partitions, and the
    // probe's store scan must read only those — a partition filter, not
    // a post-scan row filter
    val cfg = graft.streaming.EmbIndexIngest.Config(nlist = 8)
    val root = java.nio.file.Files.createTempDirectory("graft-sdprune").toString
    val emb = Fixture(spark, sfDir).embeddings.select("vec_id", "embedding")
    graft.streaming.EmbIndexIngest.processBatch(
      spark, emb, root, "vec_id", "embedding", 0L, cfg)
    val maxId = emb.agg(org.apache.spark.sql.functions.max(col("vec_id")))
      .head().getLong(0)
    val batch = emb.filter(col("vec_id") < 2L)
      .select((col("vec_id") + maxId + 1L).as("vec_id"), col("embedding"))
    // the batch's touched cells, derived the same way the probe derives them
    val cents = graft.streaming.EmbIndexIngest.readCentroids(spark, root)
    val touched = graft.operators.Similarity.assignCellsMulti(
        graft.operators.Similarity.withUnit(batch, "embedding"),
        "__u", cents, cfg.multiEps)
      .select("cell").distinct().collect().map(_.getInt(0)).toSet
    val stored = graft.streaming.EmbIndexIngest.readVectors(spark, root)
    val nCells = stored.select("cell").distinct().count()
    assert(touched.size.toLong < nCells,
      s"a 2-vector batch must touch a strict subset: ${touched.size} of $nCells cells")
    // mirror the probe's store-read sub-plan (the full probe plan hides
    // its scans under AdaptiveSparkPlanExec — same mirroring the fp-store
    // pin above uses); result-equivalence of the composed probe is pinned
    // in EmbIndexIngestSpec
    val mirror = stored
      .filter(col("cell").isInCollection(touched.toSeq))
    mirror.collect()
    val scan = mirror.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "cell")),
      s"cell must prune as a partition filter, not a row filter:\n$scan")
    val partsRead = scan.metrics.get("numPartitions").map(_.value).getOrElse(-1L)
    // the store is (batch_id, cell)-partitioned with one ingested batch,
    // so directories read = touched cells (multi-assignment may leave a
    // touched cell empty on the stored side — allow ≤)
    assert(partsRead <= touched.size.toLong && partsRead >= 1L,
      s"store scan must read at most the ${touched.size} touched cell partitions, read $partsRead")
  }

  test("q_export: the five-stage composition never plans a nested loop or cartesian") {
    // curate → decontam (broadcast membership) → mixture (semi-join back)
    // → chunk → shard: every join in the capstone must stay hash/broadcast
    // — one accidental theta join here is O(corpus²) at 100 TB
    val p = plan("q_export")
    assert(!p.contains("CartesianProduct"), s"cartesian in the export plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join in the export plan:\n$p")
  }

  test("searchCurated: filter pushes to the product scan, top-K plans as TakeOrderedAndProject") {
    // a tiny stand-in for the loop's curated outDir (same shape: survivor
    // rows + pred_lang/score, batch_id-partitioned). Epochs are id RANGES
    // — the real product's id-monotonicity contract (the ingest gate
    // enforces it; the bounded walk's early stop is built on it)
    val dir = java.nio.file.Files.createTempDirectory("graft-plan-served")
    dir.toFile.deleteOnExit()
    import org.apache.spark.sql.functions._
    val maxId = Fixture(spark, sfDir).documents
      .agg(max(col("doc_id"))).head().getLong(0)
    Fixture(spark, sfDir).documents
      .select(col("doc_id"), col("text"), lit("en").as("pred_lang"),
        lit(500L).as("score"),
        least(lit(2L), floor(col("doc_id") * 3L / (maxId + 1L)))
          .as("src_batch"))
      .withColumn("batch_id", col("src_batch"))
      .write.partitionBy("batch_id").mode("overwrite").parquet(dir.toString)
    val served = graft.streaming.PipelineIngest.searchCurated(
      spark, dir.toString, Map("pred_lang" -> "en"), "doc_id", limit = 10)
    served.collect()
    val p = served.queryExecution.executedPlan.toString
    // the walked result re-serves the walk's collected ≤limit rows: its
    // own plan must be parquet-free (LocalTableScan — re-executing the
    // served frame costs zero IO; Catalyst elides the limit over a
    // known-≤limit local relation, so no TakeOrderedAndProject here)
    assert(p.contains("LocalTableScan") && !p.contains("FileScan"),
      s"the walked serving frame must re-serve local rows, not re-scan:\n$p")
    // the IO now happens in the walk's PER-SEGMENT scan (the result frame
    // re-serves collected local rows): pin pushdown + plan shape where
    // the parquet is actually read — one TakeOrderedAndProject per walked
    // partition with the dynamic filter pushed into its scan
    val segList = graft.streaming.ProductStore.walkSegments(spark, dir.toString)
    val segTop = graft.operators.Search.search(
      graft.streaming.ProductStore.readSegment(
        spark, segList.head._1, segList.head._2),
      Map("pred_lang" -> "en"), "doc_id", "batch_id", 10)
    segTop.collect()
    val sp = segTop.queryExecution.executedPlan.toString
    assert(sp.contains("TakeOrderedAndProject"),
      s"the per-segment top-K must plan scan-local (no global sort):\n$sp")
    assert(sp.contains("EqualTo(pred_lang,en"),
      s"the dynamic filter must reach the per-segment parquet scan:\n$sp")

    // the IO pin at scale: an unselective top-K walks ONE partition —
    // the newest — instead of every epoch the loop ever committed
    val (walked, segs) = graft.streaming.ProductStore.searchProductWalked(
      spark, dir.toString, Map("pred_lang" -> "en"), "doc_id",
      limit = 10, maxWalk = 16)
    assert(segs === Some(Seq(2L)),
      s"unselective top-10 must stop after the newest partition, read $segs")
    // and the bounded walk's answer is the full scan's answer
    val wantIds = graft.operators.Search.search(
      graft.streaming.ProductStore.readProduct(spark, dir.toString),
      Map("pred_lang" -> "en"), "doc_id", "batch_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(walked.select("doc_id").collect().map(_.getLong(0)).toSeq === wantIds)
  }
}
