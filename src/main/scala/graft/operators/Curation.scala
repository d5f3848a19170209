package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition the [NS] operators exist
  * for: the standard pre-training data pipeline
  * (language filter → quality filter → exact dedup → near dedup), as one
  * declarative DataFrame program.
  *
  * Scale shape per stage (nothing here breaks at 100 TB):
  *  1. language + quality scoring — ONE narrow pass appending columns to
  *     the corpus scan (no join, no shuffle);
  *  2. exact dedup — canonical = min id per 128-bit normalized-text
  *     fingerprint, one shuffle of the surviving rows keyed by fingerprint
  *     (at cluster scale, a corpus laid out partitioned-by-fingerprint
  *     makes this shuffle-free);
  *  3. near dedup — MinHash+LSH candidate generation + row-join Jaccard
  *     verify ([[Dedup.minhashPairs]]); only (band, bucket, id) tuples and
  *     candidate shingle rows shuffle;
  *  4. a connected-components pass ([[connectedComponents]]) over the
  *     VERIFIED pairs labels every doc with the minimum id reachable in
  *     its near-dup component, and the final anti-join keeps exactly that
  *     canonical doc per component — a chain {A~B, B~C} with no verified
  *     (A,C) pair keeps only A (pairwise mode, `transitive = false`, would
  *     keep A and C).
  */
object Curation {

  final case class Config(
      langs: Set[String] = Set("en"),
      minQualityScore: Long = 500L,
      minJaccPct: Int = 80,
      minhashK: Int = 16,
      minhashBands: Int = 4,
      maxBucket: Int = 64,
      transitive: Boolean = true)

  /** Connected components over an undirected pair list via min-label
    * propagation with POINTER JUMPING: each round first takes the min
    * label across direct neighbors, then rewires every label to its
    * label's label (`comp := comp(comp)`), doubling the propagation
    * distance per round — O(log diameter) rounds instead of O(diameter),
    * the difference between 10 and 10⁶ shuffles on a 100 TB corpus whose
    * chain-paired dup clusters ([[Dedup.minhashPairs]] skew guard) can be
    * millions of docs long.
    *
    * ADAPTIVE small-graph path: the verified-pair graph is usually orders
    * of magnitude smaller than the corpus (pairs survive banding + the
    * Jaccard verify), and each distributed round costs several fixed-size
    * jobs. When the materialized edge list is at most `driverLimit` rows
    * (a few MB), it is collected and solved with union-find on the driver
    * — exact same output, zero per-round jobs; the distributed rounds are
    * the ≥ driverLimit path, which is the only one a 100 TB corpus takes.
    *
    * Each distributed round is two hash-partitioned joins keyed by id;
    * `localCheckpoint` truncates the per-iteration lineage (swap for
    * reliable `checkpoint` on a cluster with an HDFS checkpoint dir).
    * Output: `(id, comp)` with `comp` = min id of the component.
    */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String, maxIter: Int = 25,
      driverLimit: Long = 200000L): DataFrame = {
    val compType = pairs.schema(aCol).dataType
    val edges0 = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct()
      .localCheckpoint(true)
    // the count is a narrow pass over already-materialized blocks; the
    // driver union-find path (every small-graph call) collects as-is —
    // it must not pay the distributed layout (r17 change, kept: an A/B
    // with the v-keyed exchange + cache on this path read q_dedup_cc
    // 1.47 → 2.80 s)
    val nEdges = edges0.count()
    if (nEdges <= driverLimit)
      return unionFindLocal(edges0, compType)
    // DISTRIBUTED path only: lay the edges out by the per-round join key
    // ONCE, scale-adaptively like [[iterLayout]] (r18): mid-size graphs
    // (label table still broadcastable in the rounds' joins) keep the
    // r17 checkpoint — the cheapest scan; past `cacheMinRows` the same
    // layout is held in a CACHED plan with VISIBLE hash(v) partitioning
    // + per-partition ordering, because a checkpoint scan surfaces as
    // UnknownPartitioning and Catalyst then re-exchanges AND re-sorts
    // the edge list in EVERY round's sort-merge edges⋈labels join (the
    // r17 verdict's open mechanism question — see the pagerank_round
    // plan pair under plans/r18/). Explicitly unpersisted on exit
    // (round labels are checkpoints that never reference the edge
    // frame), which also closes the ADVICE leak class: nothing cached
    // outlives the call.
    val cached = nEdges > 2000000L
    val edges =
      if (!cached) edges0.repartition(col("v")).localCheckpoint(true)
      else edges0.repartition(col("v")).sortWithinPartitions("v")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
        var labels = edges.select(col("u").as("id")).distinct()
          .select(col("id"), col("id").as("comp"))
          .localCheckpoint(true)
        var changed = 1L
        var iter = 0
        while (changed > 0 && iter < maxIter) {
          val nbrMin = edges.join(labels.withColumnRenamed("id", "v"), Seq("v"))
            .select(col("u").as("id"), col("comp"), lit(null).cast(compType).as("prev"))
          // carry each id's previous label through the round (`max` sees
          // the one non-null labels-side value), so the convergence check
          // below needs no join back against the old labels
          val stepped = labels.select(col("id"), col("comp"), col("comp").as("prev"))
            .union(nbrMin)
            .groupBy("id").agg(min("comp").as("comp"), max("prev").as("prev"))
            .localCheckpoint(true)
          val jumped = stepped
            .join(stepped.select(col("id").as("pid"), col("comp").as("pcomp")),
              col("comp") === col("pid"), "left")
            .select(col("id"), coalesce(col("pcomp"), col("comp")).as("comp"), col("prev"))
            .localCheckpoint(true)
          // narrow filter-count over the round's already-materialized
          // blocks — no join, no shuffle, one cheap job
          changed = jumped.filter(col("comp") =!= col("prev")).count()
          labels = jumped.select("id", "comp")
          iter += 1
        }
        labels
    } finally if (cached) edges.unpersist(false)
  }

  /** Integer-exact PAGERANK over an undirected edge list — the graph
    * AUTHORITY signal corpus curation derives from link/similarity
    * structure (Page et al. 1999; quality classifiers for pretraining
    * data use link-graph centrality as a feature, and over the NEAR-DUP
    * graph the rank surfaces hub documents whose content radiates
    * through the corpus). Fixed `iters` power-iteration rounds with
    * damping `dampPct`/100, all math integer:
    *   r₀(v)   = scale,
    *   rᵢ₊₁(v) = scale·(100−dampPct) DIV 100
    *             + (dampPct · Σ_{u~v} (rᵢ(u) DIV deg(u))) DIV 100.
    * Integer DIV sheds a little mass per hop (deterministically — both
    * engines shed the SAME mass), and integer sums are order-free, so
    * the result is bit-portable to the DuckDB oracle with no float
    * tolerance. Fixed iteration count, not convergence: a data-dependent
    * stopping rule would make the oracle's CTE depth data-dependent;
    * 3–5 rounds separate hubs from leaves, which is what a ranking
    * consumer needs.
    *
    * Scale shape: symmetrize+distinct once (one exchange), degree = one
    * partial-agg'd count, then per round ONE join keyed by src (AQE
    * co-keyed with the degree join) + ONE partial-agg'd sum keyed by
    * dst — nothing is ever all-pairs, per-round wire = edge count.
    * Ranks are `localCheckpoint`ed per round ([[connectedComponents]]'
    * lineage rule: without it round N replays rounds 1..N−1, and the
    * edge subtree — often an expensive near-dup pipeline — replays
    * per round).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, scale: Long = 1000000L,
               dampPct: Long = 85L): DataFrame = {
    // validate BEFORE the eager symmetrize/degree checkpoints below —
    // pageRankSym re-checks, but by then the (often expensive) edge
    // pipeline has already run
    require(iters >= 1 && iters <= 8, s"iters=$iters out of [1, 8]")
    require(dampPct >= 0 && dampPct <= 100, s"dampPct=$dampPct out of [0, 100]")
    // lay the edge list out by the per-round join key ONCE: the distinct
    // leaves hash(src, dst) partitioning, under which EVERY round's
    // sym⋈ranks join on src re-shuffles the whole edge list — iters full
    // edge exchanges for one rank query ([[iterLayout]]: checkpoint for
    // graphs whose rank table broadcasts anyway, CACHED visible layout
    // past that).
    val (sym, cached) = iterLayout(edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct(), "src")
    try {
      val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
        .localCheckpoint(true) // layout-reusing aggregate
      pageRankSym(sym, deg, iters, scale, dampPct)
    } finally if (cached) sym.unpersist(false)
  }

  /** Materialize an edge list for ITERATED joins on `key`, scale-
    * adaptively (r18; the r17 verdict's open mechanism question):
    *
    *  - SMALL graphs (≤ `cacheMinRows`): `repartition(key)` +
    *    `localCheckpoint` — the r17 layout. A checkpoint scan surfaces
    *    as UnknownPartitioning, but at this size the per-round join
    *    BROADCASTS the node-sized rank/label side, so the edge side is
    *    never exchanged anyway and the checkpoint is the cheapest scan
    *    (an A/B holding the cached layout unconditionally read
    *    pagerank_probe 0.83 → 1.84 s — all cache-build cost, no saved
    *    exchange at sf0.1).
    *  - BIG graphs: the same layout held in a CACHED plan with visible
    *    hash(key) partitioning AND per-partition ordering
    *    (`sortWithinPartitions`) — there the rank side outgrows the
    *    broadcast threshold, the rounds go sort-merge, and without the
    *    visible layout Catalyst re-exchanges AND re-sorts the edge list
    *    every round (plans/r18/pagerank_round_ckpt_nobroadcast.txt vs
    *    pagerank_round_nobroadcast.txt: Exchange+Sort over ExistingRDD
    *    per round vs a bare InMemoryTableScan). One build-time
    *    exchange+sort buys `iters` round exchanges+sorts — the Pregel
    *    shape at 100 TB (§2.4).
    *
    * `cacheMinRows` ≈ the edge count whose node table (≈ edges/degree,
    * 16 B a row) starts exceeding the 10 MB default broadcast threshold.
    * Returns (frame, cached); callers unpersist iff `cached` once their
    * rounds have materialized (round outputs are checkpoints that never
    * reference the edge frame).
    */
  private[graft] def iterLayout(edges: DataFrame, key: String,
                                cacheMinRows: Long = 2000000L)
      : (DataFrame, Boolean) = {
    val ckpt = edges.repartition(col(key)).localCheckpoint(true)
    if (ckpt.count() <= cacheMinRows) (ckpt, false)
    else (ckpt.repartition(col(key)).sortWithinPartitions(key)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK), true)
  }

  /** The iteration half of [[pageRank]], over a PRE-symmetrized,
    * dedup-free edge list `(src, dst)` and its degree table `(src, deg)`
    * — the entry point for probes over a MAINTAINED graph store
    * ([[graft.streaming.GraphIngest]]): the symmetrize+distinct exchange
    * and the degree aggregation are ingest-time costs there, so a rank
    * query pays only the `iters` join+sum rounds. Callers must pass a
    * materialized `sym` (checkpoint or a parquet read) — it is consumed
    * every round.
    */
  def pageRankSym(sym: DataFrame, deg: DataFrame,
                  iters: Int = 3, scale: Long = 1000000L,
                  dampPct: Long = 85L): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters=$iters out of [1, 8]")
    require(dampPct >= 0 && dampPct <= 100, s"dampPct=$dampPct out of [0, 100]")
    val nodes = deg.select(col("src").as("id"))
    val base = scale * (100L - dampPct) / 100L
    var ranks = nodes.select(col("id"), lit(scale).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = sym
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("id"), expr("rank DIV deg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(s"($dampPct * coalesce(s, 0)) DIV 100")).as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }

  /** Driver-side exact union-find over a collected edge list: path-halving
    * find, union keeps the MINIMUM element as root, so every node's final
    * root IS the min id of its component — identical output to the
    * distributed rounds. Ids compare via their natural ordering (Long,
    * String, …), matching the `min("comp")` the distributed path uses.
    */
  private def unionFindLocal(
      edges: DataFrame,
      compType: org.apache.spark.sql.types.DataType): DataFrame = {
    val spark = edges.sparkSession
    def lt(a: Any, b: Any): Boolean =
      a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    edges.select("u", "v").collect().foreach { row =>
      val (u, v) = (row.get(0), row.get(1))
      parent.getOrElseUpdate(u, u)
      parent.getOrElseUpdate(v, v)
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { if (lt(ru, rv)) parent(rv) = ru else parent(ru) = rv }
    }
    val rows = parent.keysIterator
      .map(id => org.apache.spark.sql.Row(id, find(id))).toSeq
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", compType),
      org.apache.spark.sql.types.StructField("comp", compType)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  /** Eval-set DECONTAMINATION — the pre-training hygiene step the curation
    * pipeline needs before a benchmark means anything: flag every corpus
    * document sharing at least one word-shingle with the evaluation set
    * (the n-gram-overlap check of GPT-3 appendix C / The Pile; shingle
    * construction is the shared [[Dedup.shingleRows]] 3-token pipeline).
    *
    * Scale shape: the corpus side is the narrow scan→shingle→hash pipeline
    * with ONE shuffle total — raw shingle hashes flow through the broadcast
    * membership join, then a single per-doc aggregation builds the distinct
    * shingle sets with map-side partial merges (`collect_set` partials
    * dedup before the exchange, so the wire carries one set per doc per
    * map partition, not one row per shingle; per-group state is bounded by
    * document length, KBs). The eval side — benchmarks are KB–MB, never
    * corpus-scale — collapses to a distinct hash set that BROADCASTS, so
    * the corpus never shuffles against it. Shingles compare as 60-bit md5
    * hashes (8-byte equality, text never leaves its partition).
    *
    * Output: one row per CONTAMINATED doc — `(id, n_shingles,
    * n_contaminated, contam_pct)` over distinct shingles, integer-exact.
    */
  def decontaminate(
      corpus: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String): DataFrame = {
    import graft.functions.TextFns.h60
    val corpusSh = Dedup.shingleRows(corpus, textCol, idCol)
      .select(col(idCol), h60(col("s")).as("h"))
    val evalSh = Dedup.shingleRows(evalSet, textCol, idCol)
      .select(h60(col("s")).as("h"))
      .distinct()
      .withColumn("hit", lit(1L))
    // no corpus-wide distinct: duplicate (id, h) rows ride the narrow
    // broadcast join and dedup inside the single per-doc aggregation —
    // collect_set drops nulls, so the `when` marks exactly the hit set.
    // (A count-DISTINCT form — Expand + two codegen'd HashAggregates —
    // measured EQUAL at sf0.1: the scan+shingle+md5 pipeline dominates,
    // not the aggregate. collect_set keeps the ONE-exchange plan this
    // operator's scale story and plan pin are built on; its partial
    // states spill through the sort-based object-agg fallback.)
    corpusSh.join(broadcast(evalSh), Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(
        size(collect_set(col("h"))).cast("long").as("n_shingles"),
        size(collect_set(when(col("hit") === 1L, col("h")))).cast("long")
          .as("n_contaminated"))
      .filter(col("n_contaminated") > 0)
      .select(col(idCol), col("n_shingles"), col("n_contaminated"),
        expr("(100 * n_contaminated) DIV n_shingles").as("contam_pct"))
  }

  /** BLOOM-FILTER decontamination — [[decontaminate]]'s scale path when the
    * eval side outgrows a broadcast hash set (a full benchmark battery at
    * billions of shingles): the membership structure becomes a bloom
    * BITSET of driver-chosen size, built distributed by Spark's own
    * codegen'd `BloomFilterAggregate` (exposed as `graft_bloom_agg` via
    * [[graft.GraftExtensions]]) and probed per corpus shingle by
    * `BloomFilterMightContain` (`graft_might_contain`) against the
    * collected filter as a LITERAL — the probe is codegen'd bit math
    * inside the corpus scan, no join at all.
    *
    * Semantics: a bloom filter admits false POSITIVES only, so the flagged
    * set is a superset of the exact operator's (never misses real
    * contamination — the conservative direction for decontam) and
    * `n_contaminated` over-counts by at most fpp per distinct shingle.
    * `numBits` bounds the memory (and the literal) regardless of eval
    * cardinality; `estItems` tunes the hash count.
    *
    * Scale shape: eval side is one partial-agg'd aggregate to a binary
    * blob (`numBits/8` bytes on the driver — MBs for billions of members);
    * corpus side is the same narrow shingle pipeline as [[decontaminate]]
    * with the probe fused into the scan, then ONE per-doc aggregation.
    */
  def decontaminateBloom(
      corpus: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String,
      estItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame = {
    // BloomFilterAggregate enforces the runtime-filter conf caps
    // (spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits,
    // defaults 4M items / 64M bits). A "billions of eval shingles" run
    // must raise them or the aggregate throws — do it here, scoped to
    // the session, only when the request exceeds the current cap.
    val conf = corpus.sparkSession.conf
    val itemsCap = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsCap = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    if (conf.get(itemsCap, "4000000").toLong < estItems) conf.set(itemsCap, estItems)
    if (conf.get(bitsCap, "67108864").toLong < numBits) conf.set(bitsCap, numBits)
    val evalBloom = Dedup.shingleRows(evalSet, textCol, idCol)
      .select(xxhash64(col("s")).as("h"))
      .agg(expr(s"graft_bloom_agg(h, ${estItems}L, ${numBits}L)").as("bloom"))
      .head().getAs[Array[Byte]]("bloom")
    // Zero eval rows → the aggregate returns NULL → a NullType literal
    // would fail BloomFilterMightContain's type check at ANALYSIS time
    // with a baffling error. No eval set means nothing can be
    // contaminated: return the (empty) result with the real schema.
    if (evalBloom == null)
      return corpus.select(col(idCol), lit(0L).as("n_shingles"),
        lit(0L).as("n_contaminated"), lit(0L).as("contam_pct")).limit(0)
    val corpusSh = Dedup.shingleRows(corpus, textCol, idCol)
      .select(col(idCol), xxhash64(col("s")).as("h"))
    corpusSh
      .withColumn("hit", when(
        call_function("graft_might_contain", lit(evalBloom), col("h")), lit(1L)))
      .groupBy(col(idCol))
      .agg(
        size(collect_set(col("h"))).cast("long").as("n_shingles"),
        size(collect_set(when(col("hit") === 1L, col("h")))).cast("long")
          .as("n_contaminated"))
      .filter(col("n_contaminated") > 0)
      .select(col(idCol), col("n_shingles"), col("n_contaminated"),
        expr("(100 * n_contaminated) DIV n_shingles").as("contam_pct"))
  }

  /** NEAR-DUPLICATE eval-set decontamination — the fuzzy complement of
    * [[decontaminate]]: n-gram overlap only catches documents sharing
    * eval shingles VERBATIM, but a lightly-edited eval document (the
    * contamination mode that actually moves benchmarks — reformatted,
    * re-punctuated, partially quoted) shares high shingle-JACCARD with
    * its source while individual-shingle overlap stays diluted. Flags
    * every corpus document whose shingle-set Jaccard against SOME eval
    * document reaches `minJaccPct` — exact (candidate-superset PPJoin +
    * exact verify, [[Dedup.similarityJoinIncremental]] with the eval set
    * as the probe side), not MinHash-approximate: a decontamination
    * decision is a deletion decision, and a false negative here is a
    * leaked benchmark.
    *
    * Scale shape: the eval set (KB–MB) plays the incoming BATCH against
    * the corpus prefix index, so the expensive side is the one-time
    * index build — a production run feeds the index already persisted by
    * [[graft.streaming.DocIndexIngest]] instead of the in-query build
    * used here, and pays only the pruned probe per eval refresh. Only
    * corpus–eval pairs survive (eval–eval near-dups are not
    * contamination); output is one row per flagged corpus doc with its
    * worst-case `max_jacc_pct`, anti-joinable against the corpus.
    */
  def decontaminateNearDup(
      corpus: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, minJaccPct: Int): DataFrame = {
    val (prefix, dfT) = Dedup.similarityIndex(corpus, textCol, idCol, minJaccPct)
    // batchLocal = false: the dictionary is built in THIS query, so the
    // sort-merge df lookup reuses the index build's exchange (the
    // broadcast probe path would recompute the shingle agg — see
    // similarityJoinIncremental's scaladoc)
    val pairs = Dedup.similarityJoinIncremental(prefix, dfT, corpus, evalSet,
      textCol, idCol, minJaccPct, batchLocal = false)
    orientPairsToCorpus(pairs, evalSet, idCol)
  }

  /** [[decontaminateNearDup]] against a PERSISTED prefix index — the form a
    * production eval refresh actually runs: the corpus's `(id, h, p, n)`
    * prefix rows and df dictionary were written ONCE at ingest
    * ([[graft.streaming.DocIndexIngest]] maintains exactly this pair), so
    * the per-refresh cost is only the eval set's own prefixes plus a
    * partition-pruned read-back of corpus prefix rows in eval-touched
    * hashes — the in-query form's dominant cost (two corpus-wide window
    * sorts inside [[Dedup.similarityIndex]], ~¾ of its runtime measured at
    * sf0.1) is paid zero times per refresh instead of once per query.
    *
    * Result contract: bit-identical to [[decontaminateNearDup]] over the
    * same `(corpus, evalSet)` — both routes are candidate-superset PPJoin +
    * exact verify through [[Dedup.similarityJoinIncremental]], whose output
    * is order-independent of the prefix dictionary epoch (spec-pinned).
    * `partitionMod` matches the stored layout's `hmod` column (0 = unsorted
    * store, no prune); `batchLocal` defaults TRUE here (the dictionary is a
    * cheap stored scan — see [[Dedup.similarityJoinIncremental]]'s scaladoc
    * for why the in-query form wants false).
    */
  def decontaminateNearDupIndexed(
      corpusPrefix: DataFrame, corpusDf: DataFrame,
      corpus: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, minJaccPct: Int,
      partitionMod: Int = 0, batchLocal: Boolean = true): DataFrame = {
    val pairs = Dedup.similarityJoinIncremental(corpusPrefix, corpusDf,
      corpus, evalSet, textCol, idCol, minJaccPct,
      partitionMod = partitionMod, batchLocal = batchLocal)
    orientPairsToCorpus(pairs, evalSet, idCol)
  }

  /** Shared tail of the near-dup decontam routes: keep only corpus–eval
    * pairs (eval–eval near-dups are not contamination; corpus–corpus can't
    * occur by the incremental contract) and orient each to its corpus doc
    * with the worst-case `max_jacc_pct`. */
  private def orientPairsToCorpus(
      pairs: DataFrame, evalSet: DataFrame, idCol: String): DataFrame = {
    val evalIds = evalSet.select(col(idCol).as("__eid"))
    pairs
      .join(broadcast(evalIds), col("id_a") === col("__eid"), "left")
      .withColumn("a_eval", col("__eid").isNotNull).drop("__eid")
      .join(broadcast(evalIds), col("id_b") === col("__eid"), "left")
      .withColumn("b_eval", col("__eid").isNotNull).drop("__eid")
      .filter(col("a_eval") =!= col("b_eval"))
      .select(when(col("a_eval"), col("id_b")).otherwise(col("id_a")).as(idCol),
        col("jacc_pct"))
      .groupBy(col(idCol))
      .agg(max(col("jacc_pct")).as("max_jacc_pct"))
  }

  /** SEMANTIC eval-set decontamination — the embedding complement of the
    * n-gram paths: a TRANSLATED or fully-paraphrased eval document shares
    * neither verbatim shingles ([[decontaminate]]) nor shingle-Jaccard
    * ([[decontaminateNearDup]]) with its source, but its embedding does.
    * Flags every corpus vector whose cosine against SOME eval vector
    * reaches `minSimX100` — EXACT over the full eval set (a
    * decontamination decision is a deletion decision), unlike
    * [[graft.operators.Similarity.semanticNearDup]] whose k-means cells
    * trade recall for the symmetric all-pairs case.
    *
    * Scale shape: the eval set is KB–MB (it is a benchmark, not a
    * corpus) — it rides as TWO plan-time literals (raw float vectors +
    * driver-computed norms, same `typedlit` discipline as the centroid /
    * ADC matrices), so the corpus side is ONE narrow projection folding
    * max-cosine over the eval entries per row: no join, no shuffle, no
    * aggregation exchange anywhere in the plan (plan-pinned). At 100 TB
    * the corpus scan is the whole cost and parallelizes trivially;
    * `maxEval` guards the literal size (an eval set past it belongs in
    * the broadcast-join variant instead). Cross-engine parity: per-pair
    * cosine mirrors the oracle's `dot / (sqrt(dot aa) · sqrt(dot bb))`
    * pairing exactly (corpus-norm column × driver-double eval norm), and
    * the flag derives from the FLOORED integer on both engines so no
    * boundary ulp can flip it. Zero-norm eval vectors are dropped (no
    * direction ⇒ cosine undefined); zero-norm corpus vectors yield NaN
    * cosine and are flagged not-contaminated via the NaN-safe floor.
    */
  def decontaminateSemantic(
      corpus: DataFrame, evalSet: DataFrame,
      idCol: String, vecCol: String,
      minSimX100: Int, maxEval: Int = 10000): DataFrame = {
    def dotF(a: Array[Float], b: Array[Float]): Double = {
      // ascending left fold in DOUBLE — the graft_dot / oracle dotSql order
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val evRows = evalSet.select(col(vecCol))
      .collect().map(_.getSeq[Float](0).toArray)
      .filter(e => dotF(e, e) > 0)
    require(evRows.length <= maxEval,
      s"eval set has ${evRows.length} vectors > maxEval=$maxEval — use a broadcast-join variant")
    if (evRows.isEmpty)
      return corpus.select(col(idCol), lit(-200L).as("max_sim_x100"),
        lit(0L).as("contaminated")).limit(0)
    import graft.functions.TextFns.{dot, l2norm}
    val mat = typedlit(evRows.map(_.toSeq).toSeq)
    val norms = typedlit(evRows.map(e => math.sqrt(dotF(e, e))).toSeq)
    corpus
      .withColumn("__nv", l2norm(col(vecCol)))
      .withColumn("__ms",
        aggregate(
          transform(sequence(lit(0), lit(evRows.length - 1)), i =>
            dot(col(vecCol), element_at(mat, i + 1))
              / (col("__nv") * element_at(norms, i + 1))),
          lit(-2.0d), (acc, s) => when(s > acc, s).otherwise(acc)))
      .select(col(idCol),
        floor(col("__ms") * 100).cast("long").as("max_sim_x100"),
        when(floor(col("__ms") * 100).cast("long") >= minSimX100, lit(1L))
          .otherwise(lit(0L)).as("contaminated"))
  }

  /** [[decontaminateSemantic]] past the literal-size boundary (`maxEval`):
    * same contract and bit-identical output, eval broadcast as a TABLE —
    * corpus × broadcast-eval nested-loop scoring, then ONE
    * partial-aggregated max per corpus id. The corpus vectors never
    * shuffle (the broadcast join is narrow over the corpus side); the
    * only exchange moves `(id, partial-max)` rows — one per corpus id
    * per partition after map-side combine. Per-pair arithmetic mirrors
    * the literal path exactly (`graft_dot` fold ≡ the driver fold;
    * same `dot / (norm_corpus · norm_eval)` pairing), so the two paths
    * agree to the bit — spec-pinned.
    */
  def decontaminateSemanticJoin(
      corpus: DataFrame, evalSet: DataFrame,
      idCol: String, vecCol: String, minSimX100: Int): DataFrame = {
    import graft.functions.TextFns.{dot, l2norm}
    val ev = broadcast(
      evalSet.select(col(vecCol).as("__ev"))
        .filter(expr(s"graft_dot(__ev, __ev) > 0")))
    corpus
      .withColumn("__nv", l2norm(col(vecCol)))
      .crossJoin(ev)
      .withColumn("__s",
        dot(col(vecCol), col("__ev")) / (col("__nv") * l2norm(col("__ev"))))
      .groupBy(col(idCol))
      .agg(max(col("__s")).as("__ms"))
      .select(col(idCol),
        floor(col("__ms") * 100).cast("long").as("max_sim_x100"),
        when(floor(col("__ms") * 100).cast("long") >= minSimX100, lit(1L))
          .otherwise(lit(0L)).as("contaminated"))
  }

  /** LINE-level (paragraph) dedup across the corpus — the CCNet cleaning
    * step that document-level dedup cannot do: boilerplate lines
    * (headers, footers, navigation, license blurbs) repeat across
    * millions of otherwise-distinct pages, and removing them needs
    * first-occurrence-wins dedup of individual lines corpus-wide. Every
    * line keeps exactly its FIRST occurrence in `(doc_id, position)`
    * order; later occurrences — in other docs or the same doc — are
    * dropped, and each doc is reassembled from its surviving lines in
    * original order (plus counts, so the removal is auditable).
    *
    * "Lines" are a parameter of the corpus, not the operator: a crawl
    * splits on newline; this fixture's docs are single-line, so the
    * declared query segments into fixed `segTokens`-token units — the
    * dedup/reassembly machinery is identical either way.
    *
    * Scale shape: one narrow segment-explode of the corpus scan, ONE
    * shuffle keyed by the FULL 128-bit md5 of the line (the line TEXT
    * rides only as the window's payload; a production run at 100 TB drops
    * the text and re-reads surviving `(doc, pos)` pairs), a window
    * `row_number` per hash, then one per-doc aggregation to rebuild the
    * text. No join against a line dictionary — the window IS the
    * dictionary. The key is md5, NOT the repo's usual h60: at the
    * billions-of-segments scale this targets, the birthday bound makes a
    * 60-bit collision LIKELY, and a collision here silently DELETES a
    * distinct line (unlike MinHash, where it only perturbs a similarity
    * estimate) — data loss is the one failure mode a dedup key may not
    * have. 128 bits pushes the bound past 2⁶⁴ segments.
    */
  def lineDedup(docs: DataFrame, textCol: String, idCol: String,
                segTokens: Int = 8): DataFrame = {
    import graft.functions.TextFns.wsNorm
    require(segTokens > 0)
    val norm = wsNorm(col(textCol))
    val toks = split(norm, " ")
    // Spark's sequence(1, 0) DESCENDS ([1,0]); blank docs must take the
    // empty branch. ceil(n / segTokens) is exact for n ≤ 2^52.
    val nSeg = ceil(size(toks) / lit(segTokens.toDouble)).cast("int")
    val segs = docs
      .select(col(idCol),
        when(norm === "", array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), nSeg), i =>
            array_join(slice(toks, (i - 1) * segTokens + 1, lit(segTokens)), " ")))
          .as("segs"))
      .select(col(idCol), posexplode(col("segs")).as(Seq("pos", "seg")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("seg"))).orderBy(col(idCol), col("pos"))
    val ranked = segs.withColumn("rn", row_number().over(w))
    val rebuilt = ranked.groupBy(col(idCol)).agg(
      array_join(transform(
        array_sort(collect_list(when(col("rn") === 1, struct(col("pos"), col("seg"))))),
        x => x.getField("seg")), " ").as("clean_text"),
      count(lit(1)).as("n_lines"),
      sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_removed"))
    // blank docs produce no segment rows — restore them with empty output
    docs.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
  }

  /** Stages 1–2 of [[curate]] — language + quality scoring and the keep
    * filter, ONE narrow pass appending `pred_lang`/`score` to the input
    * (no join, no shuffle). Factored out so the incremental ingest path
    * ([[graft.streaming.CurateIngest]]) filters each batch with the
    * exact same expressions as the in-query pipeline — probe ≡ in-query
    * starts here.
    */
  def curateCandidates(docs: DataFrame, textCol: String, idCol: String,
                       cfg: Config = Config()): DataFrame = {
    val keepCols = docs.columns.map(col).toSeq :+ col("pred_lang") :+ col("score")
    TextAnalysis.qualityScore(TextAnalysis.languageId(docs, textCol, idCol), textCol, idCol)
      .filter(col("pred_lang").isInCollection(cfg.langs) &&
        col("score") >= cfg.minQualityScore)
      .select(keepCols: _*)
  }

  /** Returns the curated corpus: one row per surviving doc with its
    * language prediction and quality score attached.
    */
  def curate(docs: DataFrame, textCol: String, idCol: String,
             cfg: Config = Config()): DataFrame = {
    // 1.+2. one narrow pass: languageId and qualityScore both append their
    // columns to the input, so scoring+filtering is a single scan, no join
    val candidates = curateCandidates(docs, textCol, idCol, cfg)

    // 3. exact dedup on the normalized fingerprint (canonical = min id) —
    // the min_by aggregate form: ONE partial-aggregated shuffle instead of
    // the window sort of every duplicate row. MATERIALIZED: three
    // downstream consumers read it (the LSH signature pass, the Jaccard
    // verify pass, the final anti-join), and the candidate/edge
    // checkpoints below split the pipeline into separate jobs, so without
    // it each job would replay the scan→score→dedup prefix. A production
    // run persists the exact-deduped corpus before the near-dup stage for
    // the same reason (and for restartability); swap for a store write +
    // re-read at cluster scale.
    val exactKept = Dedup.fingerprintCanonical(candidates, textCol, idCol)
      .localCheckpoint(true)

    // 4. near dedup: keep one canonical doc (the min id) per connected
    // component of verified pairs; pairwise mode drops pair losers only
    val pairs = Dedup.minhashPairs(exactKept, textCol, idCol,
      cfg.minhashK, cfg.minhashBands, cfg.minJaccPct, cfg.maxBucket)
    val nearDupLosers =
      if (cfg.transitive)
        connectedComponents(pairs, "id_a", "id_b")
          .filter(col("comp") =!= col("id"))
          .select(col("id").as(idCol))
      else pairs.select(col("id_b").as(idCol)).distinct()
    exactKept.join(nearDupLosers, Seq(idCol), "left_anti")
  }

  /** QUALITY-CANONICAL near-dup dedup: label every doc with its near-dup
    * component and elect the HIGHEST-QUALITY member per component (score
    * desc, id asc tiebreak) instead of [[curate]]'s min-id canonical —
    * the survivor policy production curation actually wants: among
    * near-duplicate copies, keep the best one (longest, cleanest), not
    * the one that happened to get the smallest id. Emits every input doc
    * with its `comp` label (singletons label themselves), `score`, and
    * `is_kept` — the audit view; filtering to survivors is one
    * `.filter($"is_kept")` away.
    *
    * Scale shape: quality scoring is the same narrow scan-side pass as
    * [[curate]]; pairs + connected components identical to [[curate]];
    * the election is TWO pure-primitive HASH aggregates over one
    * comp-keyed exchange (max score per comp, then min id among the
    * tied best — NOT `max(struct(score, -id))`, whose struct buffer
    * silently downgrades to a per-partition SortAggregate, and not a
    * `row_number` window, which sorts every member: a component with a
    * million copies contributes one partial row per map partition,
    * plan-pinned no-Window/no-SortAggregate). Ids are unique, so the
    * (score desc, id asc) election is total — the oracle recomputes it
    * with a window over the recursive-CTE closure: two algorithms, one
    * answer.
    */
  def dedupKeepBest(docs: DataFrame, textCol: String, idCol: String,
                    minhashK: Int = 16, bands: Int = 4,
                    minJaccPct: Int = 50, maxBucket: Int = 64): DataFrame = {
    val pairs = Dedup.minhashPairs(
      docs, textCol, idCol, minhashK, bands, minJaccPct, maxBucket)
    dedupKeepBestWithComponents(docs,
      connectedComponents(pairs, "id_a", "id_b"), textCol, idCol)
  }

  /** The ELECTION half of [[dedupKeepBest]], over pre-computed component
    * labels `(id, comp)` — the entry point for probes over a MAINTAINED
    * near-dup graph ([[graft.streaming.GraphIngest.dedupBestProbe]]):
    * the pair pipeline + component derivation are ingest-time costs
    * there, so a canonical-election query pays one quality scan and the
    * comp-keyed election aggregates. Same expressions either way, so
    * probe ≡ in-query is structural.
    */
  def dedupKeepBestWithComponents(docs: DataFrame, comps: DataFrame,
                                  textCol: String, idCol: String): DataFrame = {
    val scored = TextAnalysis.qualityScore(docs, textCol, idCol)
      .select(col(idCol), col("score"))
    val labeled = scored
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("comp", coalesce(col("comp"), col(idCol)))
    val best = labeled.groupBy(col("comp")).agg(max(col("score")).as("__best"))
    val winners = labeled.join(best, Seq("comp"))
      .filter(col("score") === col("__best"))
      .groupBy(col("comp")).agg(min(col(idCol)).as("__win"))
    labeled.join(winners, Seq("comp"))
      .select(col(idCol), col("comp"), col("score"),
        (col(idCol) === col("__win")).as("is_kept"))
  }

  /** CONTAINMENT dedup — the curation policy over
    * [[Dedup.containmentJoin]]: drop every doc whose shingles are
    * ≥ `minContPct` contained in a DOMINANT other doc, where dominance
    * is the total order (distinct-shingle count desc, id asc). A doc
    * yields only to a STRICTLY larger container (or an equal-sized one
    * with a smaller id), so the maximal element of any containment
    * cluster always survives — no rule-induced empty clusters — and
    * identical docs (mutual 100% containment, equal sizes) keep exactly
    * the min id. The excerpt-in-article case resolves the way a corpus
    * wants: the article stays, the excerpt goes. Greedy caveat, stated:
    * at t < 100 a dropped doc's container may itself be dropped by a
    * third doc that does not t-contain the first (threshold containment
    * is not transitive); the survivors still dominate every dropped doc
    * DIRECTLY through some containment pair.
    *
    * Cost on top of the join: one narrow distinct-shingle count per doc
    * and a broadcast-sized join of the (small) pair set against it.
    * Output `(id, is_kept)` for EVERY doc (shingle-less docs trivially
    * kept), ordered by id.
    */
  def dropContained(docs: DataFrame, textCol: String, idCol: String,
                    minContPct: Int, maxSetSize: Int = 1 << 20): DataFrame = {
    import graft.functions.TextFns.h60
    val pairs = Dedup.containmentJoin(docs, textCol, idCol, minContPct, maxSetSize)
    val sizes = Dedup.shingleRows(docs, textCol, idCol)
      .select(col(idCol), h60(col("s")).as("h")).distinct()
      .groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val dropped = pairs
      .join(sizes.select(col(idCol).as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("n").as("nb")), Seq("id_b"))
      .filter(col("nb") > col("na") ||
        (col("nb") === col("na") && col("id_b") < col("id_a")))
      .select(col("id_a").as(idCol)).distinct()
      .withColumn("__drop", lit(true))
    docs.select(col(idCol))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("__drop").isNull.as("is_kept"))
      .orderBy(col(idCol))
  }

  /** FILTER-FUNNEL accounting — the survivorship report every curation run
    * ships with its output (what fraction died at each gate, so a corpus
    * drop is attributable to a stage, not discovered post-training): doc
    * counts surviving each CUMULATIVE stage of the [[curate]] front-end
    * (all docs → language keep → quality keep → length keep), plus the
    * end-to-end integer keep-rate.
    *
    * ONE narrow pass then a single global aggregate: [[TextAnalysis.languageId]]
    * and [[TextAnalysis.qualityScore]] append their columns scan-side, the
    * stage survivals are nested conditional sums (each stage implies all
    * prior), and the final exchange carries ONE partial row per map
    * partition — the whole funnel costs a corpus scan regardless of stage
    * count. Running the stages as separate filter+count jobs would scan
    * the corpus once per stage.
    */
  def filterFunnel(docs: DataFrame, textCol: String, idCol: String,
                   langs: Set[String] = Set("en"),
                   minQualityScore: Long = 500L,
                   minTokens: Long = 30L): DataFrame = {
    val scored =
      TextAnalysis.qualityScore(TextAnalysis.languageId(docs, textCol, idCol), textCol, idCol)
    val langOk = col("pred_lang").isInCollection(langs)
    val qualOk = langOk && col("score") >= minQualityScore
    val lenOk = qualOk && col("n_tokens") >= minTokens
    // coalesce: sum over an EMPTY corpus is NULL, and the report must be a
    // zero row, not nulls; greatest guards the pct division the same way
    scored.agg(
      count(lit(1)).as("n_total"),
      coalesce(sum(when(langOk, 1L).otherwise(0L)), lit(0L)).as("n_lang"),
      coalesce(sum(when(qualOk, 1L).otherwise(0L)), lit(0L)).as("n_quality"),
      coalesce(sum(when(lenOk, 1L).otherwise(0L)), lit(0L)).as("n_final"))
      .select(col("n_total"), col("n_lang"), col("n_quality"), col("n_final"),
        expr("(100 * n_final) DIV greatest(n_total, 1)").as("kept_pct"))
  }

  /** GOPHER-STYLE quality-rule cascade (Rae et al. 2021, table A1) — the
    * hard per-document keep/drop rules corpus curation applies BEFORE any
    * model-based scoring, with per-rule flags so a drop is attributable to
    * a rule (the same auditability contract as [[filterFunnel]]):
    *   r1 token count within [minTokens, maxTokens];
    *   r2 mean word length ×10 within [mwlLoX10, mwlHiX10] — gibberish /
    *      concatenated-junk detector;
    *   r3 unique-token fraction ≥ minUniqPct — within-doc repetition;
    *   r4 ≥ minStop stopword hits — "real prose" signal (Gopher's
    *      2-of-stop-set rule);
    *   r5 most-frequent-token share ≤ maxTopTokPct — single-token
    *      keyword-stuffing (complements the 2-gram share in
    *      [[TextAnalysis.repetitionSignals]]), measured over the doc's
    *      FIRST `topTokenCap` tokens (see below).
    * All signals are integer-exact (`DIV`, counts), so every flag is
    * bit-portable to the DuckDB oracle.
    *
    * Scale shape: ONE narrow pass — every signal is an array expression
    * over the doc's own tokens (no explode, no join, no shuffle), so the
    * cascade embeds in the corpus scan like [[TextAnalysis.qualityScore]].
    * The token array and its distinct form are each materialized ONCE per
    * row in their own projections (a single-select formulation re-inlines
    * the regex split into every signal — 5 splits per doc, measured in
    * the plan); every signal except r5 is linear in doc length. The
    * top-token share is a distinct×count fold — O(u·n) in its window, so
    * it runs over `slice(toks, 1, topTokenCap)` (default 2048): an
    * UNCAPPED fold on a book-length doc (10⁵ tokens, ~half unique) costs
    * ~10⁹ comparisons in ONE row — a straggler-task generator at corpus
    * scale — while the capped form is ≤ cap² ≈ 4·10⁶ worst-case
    * regardless of doc length. Gopher's own pipeline scores truncated
    * documents; a keyword-stuffing signal on the head is the same
    * detector. `top_tok_pct`'s denominator is the capped window length,
    * so the SHARE stays meaningful. The HOF lambdas evaluate interpreted
    * (Spark has no codegen for lambda functions), which is fine: the
    * work is per-row and embarrassingly parallel at any corpus size.
    * Output keeps every doc with its flags (`keep` = all rules pass) —
    * the caller filters, the report stays.
    */
  def gopherFilter(docs: DataFrame, textCol: String, idCol: String,
                   minTokens: Long = 20L, maxTokens: Long = 80L,
                   mwlLoX10: Long = 30L, mwlHiX10: Long = 100L,
                   minUniqPct: Long = 30L, minStop: Long = 1L,
                   maxTopTokPct: Long = 20L,
                   stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in"),
                   topTokenCap: Int = 2048): DataFrame = {
    import graft.functions.TextFns.{tokens, markerScore}
    require(topTokenCap > 0, s"topTokenCap=$topTokenCap must be positive")
    val flag = (c: org.apache.spark.sql.Column) =>
      when(c, lit(1L)).otherwise(lit(0L))
    // toks/dtoks as real attributes: CollapseProject keeps multi-use
    // non-cheap expressions out-of-line, so the text splits exactly once
    val toks = col("__toks")
    val head = col("__head")
    val base = docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      // r5's window: first topTokenCap tokens (bounds the O(u·n) fold)
      .withColumn("__head", slice(toks, 1, topTokenCap))
      .withColumn("__dtoks", array_distinct(head))
      .select(
        col(idCol),
        size(toks).cast("long").as("n_tokens"),
        // sum of token lengths: int fold, order-insensitive, exact
        aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long")).as("sum_len"),
        size(array_distinct(toks)).cast("long").as("n_uniq"),
        markerScore(toks, stopwords).as("n_stop"),
        // most-frequent-token count within the capped head: fold over its
        // DISTINCT tokens of the occurrence count of each — ≤ cap² per
        // row, no shuffle
        aggregate(col("__dtoks"), lit(0L), (acc, t) =>
          greatest(acc, size(filter(head, x => x === t)).cast("long"))).as("top_tok"),
        size(head).cast("long").as("__head_len"))
    base
      .withColumn("mwl_x10", expr("(10 * sum_len) DIV greatest(n_tokens, 1)"))
      .withColumn("uniq_pct", expr("(100 * n_uniq) DIV greatest(n_tokens, 1)"))
      .withColumn("top_tok_pct", expr("(100 * top_tok) DIV greatest(__head_len, 1)"))
      .withColumn("r1", flag(col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens))
      .withColumn("r2", flag(col("mwl_x10") >= mwlLoX10 && col("mwl_x10") <= mwlHiX10))
      .withColumn("r3", flag(col("uniq_pct") >= minUniqPct))
      .withColumn("r4", flag(col("n_stop") >= minStop))
      .withColumn("r5", flag(col("top_tok_pct") <= maxTopTokPct))
      .withColumn("n_fail",
        lit(5L) - col("r1") - col("r2") - col("r3") - col("r4") - col("r5"))
      .withColumn("keep", flag(col("n_fail") === 0L))
      .select(idCol, "n_tokens", "mwl_x10", "uniq_pct", "n_stop", "top_tok_pct",
        "r1", "r2", "r3", "r4", "r5", "n_fail", "keep")
  }

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * how much more likely its hashed-unigram bag is under the TARGET
    * distribution (rows matching `targetPred`, e.g. a trusted domain)
    * than under the RAW corpus distribution. DSIR's core trick — hash
    * features into a FIXED number of buckets so both distributions are
    * bounded vectors regardless of corpus size — is what makes this a
    * no-join plan at 100 TB.
    *
    * Two passes, both linear:
    *  1. bucket counts: one explode→groupBy(bucket) with two conditional
    *     sums (raw count, target count) — at most `buckets` result rows,
    *     collected to the driver (KB-scale, like the centroid/codebook
    *     literals elsewhere in this package);
    *  2. scoring: per-bucket weights ride into the corpus scan as ONE
    *     literal array; each document's score is a codegen'd `aggregate`
    *     fold over its tokens — no shuffle, no join, corpus never moves.
    *
    * Integer-exact cross-engine scoring (the package's no-float-log
    * rule, cf. BM25's rational idf): per-bucket weight is the
    * Laplace-smoothed likelihood ratio scaled to `scale` and floored,
    *   w_b = (scale·(tc_b+1)·(rawTot+B)) DIV ((rc_b+1)·(tgtTot+B)),
    * and a document's score is Σ_tokens (w_b − scale) — zero-centered so
    * ratio≈1 buckets contribute nothing; positive = target-like. This is
    * a monotone proxy for DSIR's Σ log-ratio (log is omitted because the
    * two engines' float `ln` disagree in ulps and would break the hash
    * oracle — the RANKING a resampler consumes is what must be stable).
    * Weight math happens driver-side in BigInt, so the formula cannot
    * overflow at any corpus size; tc≤rc bounds each weight by
    * scale·rawTot/tgtTot.
    */
  def dsirScore(docs: DataFrame, textCol: String, idCol: String,
                targetPred: org.apache.spark.sql.Column,
                buckets: Int = 256, scale: Long = 1000L): DataFrame = {
    require(buckets > 0 && buckets <= 65536, s"buckets=$buckets out of (0, 65536]")
    val weights = dsirWeights(dsirBucketCounts(docs, textCol, targetPred, buckets)
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2))),
      buckets, scale)
    dsirScoreWeighted(docs, textCol, idCol, weights, scale)
  }

  /** The TRAINING half of [[dsirScore]]: per-bucket `(b, rc, tc)` counts
    * — raw-corpus and target-slice token occurrences per hashed-unigram
    * bucket. ≤ `buckets` rows at any corpus size, and ADDITIVE: counts
    * from disjoint corpus slices sum to the whole-corpus counts, which is
    * what makes the model maintainable per ingest micro-batch
    * ([[graft.streaming.TextModelIngest]]) instead of retrained per query.
    */
  def dsirBucketCounts(docs: DataFrame, textCol: String,
                       targetPred: org.apache.spark.sql.Column,
                       buckets: Int): DataFrame = {
    import graft.functions.TextFns.{tokens, h60}
    require(buckets > 0 && buckets <= 65536, s"buckets=$buckets out of (0, 65536]")
    docs
      .select(targetPred.as("__t"), explode(tokens(col(textCol))).as("__tok"))
      .select(col("__t"), pmod(h60(col("__tok")), lit(buckets.toLong)).as("b"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("rc"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("tc"))
  }

  /** Driver-side weight derivation from collected `(b, rc, tc)` triples —
    * BigInt math, so the likelihood-ratio formula cannot overflow at any
    * corpus size (see [[dsirScore]] for the formula).
    */
  def dsirWeights(counts: Array[(Int, Long, Long)],
                  buckets: Int, scale: Long): Seq[Long] = {
    val rcArr = new Array[Long](buckets)
    val tcArr = new Array[Long](buckets)
    counts.foreach { case (b, rc, tc) => rcArr(b) = rc; tcArr(b) = tc }
    val rawTot = BigInt(rcArr.sum) + buckets
    val tgtTot = BigInt(tcArr.sum) + buckets
    (0 until buckets).map { b =>
      ((BigInt(scale) * (BigInt(tcArr(b)) + 1) * rawTot) /
        ((BigInt(rcArr(b)) + 1) * tgtTot)).toLong
    }
  }

  /** The SCORING half of [[dsirScore]]: fold each doc's tokens against a
    * literal weight vector — joinless, shuffle-free, the corpus never
    * moves. Callers hold `weights` either from an in-query train
    * ([[dsirScore]]) or from a persisted count store
    * ([[graft.streaming.TextModelIngest.dsirProbe]]); same expression
    * either way, so probe ≡ in-query is structural.
    */
  def dsirScoreWeighted(docs: DataFrame, textCol: String, idCol: String,
                        weights: Seq[Long], scale: Long = 1000L): DataFrame = {
    import graft.functions.TextFns.{tokens, h60}
    val buckets = weights.size
    val wLit = typedlit(weights)
    docs.select(col(idCol),
      aggregate(tokens(col(textCol)), lit(0L), (acc, t) =>
        acc + element_at(wLit, (pmod(h60(t), lit(buckets.toLong)) + 1L).cast("int"))
          - scale).as("dsir_score"))
  }

  /** Quality ENSEMBLE — the cascade production filters actually run: the
    * Gopher hard rules ([[gopherFilter]], rule-based), the bigram-LM
    * fluency score ([[graft.operators.TextAnalysis.lmScore]],
    * corpus-statistical), and the DSIR target-likeness score
    * ([[dsirScore]], distribution-matching) joined per doc; keep ⇔ rules
    * pass ∧ both scores clear their floors. Each signal catches what the
    * others miss (rules: structural garbage; LM: disfluent token soup;
    * DSIR: off-target domain), and emitting all components per doc keeps
    * every DROP attributable to the signal that fired — same
    * accountability contract as gopherFilter's per-rule flags.
    *
    * Plan: three linear signal passes (two joinless literal scans + the
    * LM's vocabulary-table joins) merged by three id-keyed equi-joins
    * (AQE coalesces the co-keyed exchanges) — nothing here is heavier
    * than its standalone declared form.
    */
  def qualityEnsemble(docs: DataFrame, textCol: String, idCol: String,
                      targetPred: org.apache.spark.sql.Column,
                      minLmX100k: Long, minDsir: Long): DataFrame =
    qualityEnsembleScored(docs, textCol, idCol,
      graft.operators.TextAnalysis.lmScore(docs, textCol, idCol),
      dsirScore(docs, textCol, idCol, targetPred), minLmX100k, minDsir)

  /** [[qualityEnsemble]]'s composition against caller-supplied LM and
    * DSIR score frames (shaped like [[graft.operators.TextAnalysis
    * .lmScore]] / [[dsirScore]] output) — the entry point a persisted
    * model store probes through ([[graft.streaming.TextModelIngest
    * .qualityEnsembleProbe]]): only the Gopher rules (stateless per-row
    * signals) are computed here, the trained signals arrive pre-scored.
    */
  def qualityEnsembleScored(docs: DataFrame, textCol: String, idCol: String,
                            lmScores: DataFrame, dsirScores: DataFrame,
                            minLmX100k: Long, minDsir: Long): DataFrame = {
    val rules = gopherFilter(docs, textCol, idCol)
      .select(col(idCol), col("n_fail"), col("keep").as("rules_keep"))
    rules.join(lmScores.select(col(idCol), col("lm_score_x100k")), idCol)
      .join(dsirScores, idCol)
      .select(col(idCol), col("n_fail"), col("rules_keep"),
        col("lm_score_x100k"), col("dsir_score"),
        when(col("rules_keep") === 1L && col("lm_score_x100k") >= minLmX100k
          && col("dsir_score") >= minDsir, 1L).otherwise(0L).as("keep"))
  }

  /** Multi-class hashed bag-of-words tagger — the model-based
    * language/domain/quality TAGGING role that fastText-style linear
    * classifiers play in pre-training pipelines (Joulin et al. 2017's
    * hashing trick; trained here by counting, not SGD, so the model is
    * deterministic and oracle-recomputable). Per class c and hash bucket
    * b the weight is the class-vs-pooled-corpus likelihood RATIO
    * (per-class [[dsirScore]]), Laplace-smoothed and integer-scaled:
    *   w(c,b) = (scale·(cnt(c,b)+1)·(totAll+B)) DIV ((cntAll(b)+1)·(tot(c)+B))
    * — shared high-frequency tokens score ≈scale for EVERY class and
    * cancel in the ranking; class-distinctive tokens dominate it (raw
    * additive likelihoods measured majority-class-degenerate). Scores are
    * additive over tokens (an NB log-product is banned by the
    * no-float-log rule). Prediction = argmax score, ties to the
    * lexicographically smallest class; margin = top1 − top2 (0 on tie)
    * is the confidence a downstream filter thresholds on.
    *
    * On the driver fixture the `lang` label is INDEPENDENT of the token
    * stream (uniform synthetic vocabulary — same no-structure property
    * the r9 IVF recall analysis recorded), so fixture accuracy is pinned
    * at the majority class by the DATA; the tagger's discriminative
    * power is spec-pinned on a planted-vocabulary corpus instead, and
    * the declared query's contract is model-equivalence (the oracle
    * recomputes the identical model, hash-exact).
    *
    * Scale shape: training is ONE explode→groupBy(class, bucket) pass
    * (C×B result rows, KB-scale, collected like the DSIR/centroid
    * literals — C is required ≤ 64); scoring is joinless — the C×B
    * weight matrix rides as a literal into the corpus scan and each doc
    * folds its tokens once per class (O(C·len) per row, no shuffle).
    * Weight math is driver-side BigInt — no overflow at any corpus size.
    */
  def hashedTagger(docs: DataFrame, textCol: String, idCol: String,
                   labelCol: String, buckets: Int = 256,
                   scale: Long = 1000L,
                   train: Option[DataFrame] = None): DataFrame = {
    require(buckets > 0 && buckets <= 65536, s"buckets=$buckets out of (0, 65536]")
    val counts = taggerCounts(train.getOrElse(docs), textCol, labelCol, buckets)
      .collect().map(r => (r.getString(0), r.getLong(1).toInt, r.getLong(2)))
    val (classes, weights) = taggerModel(counts, buckets, scale)
    taggerScoreWeighted(docs, textCol, idCol, classes, weights)
  }

  /** The TRAINING half of [[hashedTagger]]: per-(class, bucket) token
    * counts `(cls, b, n)` — C×B rows at any corpus size, ADDITIVE across
    * corpus slices (the per-micro-batch maintainability property; see
    * [[dsirBucketCounts]]). Null labels carry no class information and
    * would otherwise surface as an opaque NPE in the driver-side model
    * fold — dropped here (scoring never reads the label, so scored docs
    * keep their rows).
    */
  def taggerCounts(train: DataFrame, textCol: String, labelCol: String,
                   buckets: Int): DataFrame = {
    import graft.functions.TextFns.{tokens, h60}
    require(buckets > 0 && buckets <= 65536, s"buckets=$buckets out of (0, 65536]")
    train.filter(col(labelCol).isNotNull)
      .select(col(labelCol).as("cls"), explode(tokens(col(textCol))).as("__tok"))
      .select(col("cls"), pmod(h60(col("__tok")), lit(buckets.toLong)).as("b"))
      .groupBy(col("cls"), col("b"))
      .agg(count(lit(1)).as("n"))
  }

  /** Driver-side model derivation from collected `(cls, b, n)` triples:
    * sorted class list + C×B likelihood-ratio weight matrix (BigInt math
    * — no overflow at any corpus size; formula in [[hashedTagger]]).
    */
  def taggerModel(counts: Array[(String, Int, Long)], buckets: Int,
                  scale: Long): (Seq[String], Seq[Seq[Long]]) = {
    val classes = counts.map(_._1).distinct.sorted.toSeq
    require(classes.nonEmpty, "tagger training set has no labeled tokens")
    require(classes.size <= 64, s"${classes.size} classes > 64 — literal matrix bound")
    val pooled = new Array[Long](buckets)
    counts.foreach { case (_, b, n) => pooled(b) += n }
    val totAll = BigInt(pooled.sum) + buckets
    val byClass = counts.groupBy(_._1)
    val weights: Seq[Seq[Long]] = classes.map { c =>
      val cnt = new Array[Long](buckets)
      byClass(c).foreach { case (_, b, n) => cnt(b) = n }
      val tot = BigInt(cnt.sum) + buckets
      (0 until buckets).map(b =>
        ((BigInt(scale) * (BigInt(cnt(b)) + 1) * totAll) /
          ((BigInt(pooled(b)) + 1) * tot)).toLong).toSeq
    }
    (classes, weights)
  }

  /** The SCORING half of [[hashedTagger]]: joinless literal-matrix fold,
    * argmax with lexicographically-smallest tie-break, margin = top1 −
    * top2. Same expression whether the model came from an in-query train
    * or a persisted count store ([[graft.streaming.TextModelIngest
    * .taggerProbe]]) — probe ≡ in-query is structural.
    */
  def taggerScoreWeighted(docs: DataFrame, textCol: String, idCol: String,
                          classes: Seq[String],
                          weights: Seq[Seq[Long]]): DataFrame = {
    import graft.functions.TextFns.{tokens, h60}
    // bucket count derived from the matrix itself — a caller-supplied
    // count that disagreed with the matrix width would silently null
    // every score via out-of-range element_at (ANSI off)
    require(weights.nonEmpty && weights.forall(_.size == weights.head.size),
      "weight matrix must be rectangular and non-empty")
    val buckets = weights.head.size
    val wLit = typedlit(weights)
    val clsLit = typedlit(classes)
    val scores = transform(sequence(lit(1), lit(classes.size)), c =>
      aggregate(tokens(col(textCol)), lit(0L), (acc, t) =>
        acc + element_at(element_at(wLit, c),
          (pmod(h60(t), lit(buckets.toLong)) + 1L).cast("int"))))
    val sorted = sort_array(col("__scores"), asc = false)
    docs
      .withColumn("__scores", scores)
      .select(col(idCol),
        // array_position returns the FIRST index holding the max — the
        // lowest class index, i.e. the lexicographically smallest class
        element_at(clsLit,
          array_position(col("__scores"), element_at(sorted, 1)).cast("int"))
          .as("pred_label"),
        element_at(sorted, 1).as("score_top"),
        (element_at(sorted, 1) -
          coalesce(element_at(sorted, 2), lit(0L))).as("margin"))
  }
}
