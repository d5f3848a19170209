package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables.Fixture
import graft.streaming.EmbIndexIngest
import graft.streaming.EmbIndexIngest.Config

/** The persisted-IVF ingest story, end to end: the cell-assigned table
  * [[Similarity.annIvfProbe]] reads is actually STORED here by the
  * ingest path, assignments stay equivalent to a from-scratch assignment
  * at every batch boundary, and the probe over the store answers exactly
  * what the in-query [[Similarity.annIvf]] answers under the same
  * centroids.
  */
class EmbIndexIngestSpec extends SparkTestBase {

  private val cfg = Config(nlist = 8)

  private def tmp(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p.toString
  }

  private def emb: DataFrame = Fixture(spark, sfDir).embeddings

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def qVec(id: Long): Array[Float] =
    emb.filter(col("vec_id") === id)
      .select(col("embedding")).head().getSeq[Float](0).toArray

  /** The canonical from-scratch assignment the store must reproduce:
    * spherical multi-assignment under the given centroid matrix (same
    * path [[EmbIndexIngest.processBatch]] applies per batch).
    */
  private def scratchAssign(df: DataFrame, cents: Array[Array[Double]]): DataFrame =
    Similarity.assignCellsMulti(
      Similarity.withUnit(df, "embedding"), "__u", cents, cfg.multiEps).drop("__u")

  test("assigned store after N batches is hash-equal to a from-scratch assignment") {
    val root = tmp("graft-embidx")
    val batches = (0 until 3).map(i => emb.filter(col("vec_id") % 3 === i))
    batches.zipWithIndex.foreach { case (b, i) =>
      EmbIndexIngest.processBatch(spark, b, root, "vec_id", "embedding", i.toLong, cfg)
    }
    // centroids froze at epoch 0 (trained on batch 0); every batch
    // assigned under them must union to assignCells(all) under the same
    // stored matrix
    val cents = EmbIndexIngest.readCentroids(spark, root)
    val stored = rows(EmbIndexIngest.readVectors(spark, root)
      .select("vec_id", "cell"))
    val scratch = rows(scratchAssign(emb, cents).select("vec_id", "cell"))
    assert(stored === scratch,
      "stored assignments diverged from a from-scratch assignment under the epoch matrix")
  }

  test("replayed batch overwrites its own partitions (exactly-once)") {
    val root = tmp("graft-embidx")
    val b = emb.filter(col("vec_id") % 3 === 0)
    EmbIndexIngest.processBatch(spark, b, root, "vec_id", "embedding", 0L, cfg)
    val first = rows(EmbIndexIngest.readVectors(spark, root).select("vec_id", "cell", "batch_id"))
    EmbIndexIngest.processBatch(spark, b, root, "vec_id", "embedding", 0L, cfg)
    val replayed = rows(EmbIndexIngest.readVectors(spark, root).select("vec_id", "cell", "batch_id"))
    assert(replayed === first, "a replayed epoch must rewrite, not append")
  }

  test("probe over the single-batch store equals the in-query annIvf") {
    val root = tmp("graft-embidx")
    // whole corpus as one batch -> epoch-0 centroids are trained on
    // exactly what annIvf trains on, so results must be identical
    EmbIndexIngest.processBatch(spark, emb, root, "vec_id", "embedding", 0L, cfg)
    val cents = EmbIndexIngest.readCentroids(spark, root)
    val viaStore = EmbIndexIngest.readVectors(spark, root)
    val probe = Similarity.annIvfProbe(
        viaStore, cents, qVec(0L), "vec_id", "embedding",
        excludeId = 0L, k = 10, nprobe = 3)
      .collect().map(_.toSeq)
    val inQuery = Similarity.annIvf(emb, "vec_id", "embedding",
        queryId = 0L, k = 10, nlist = cfg.nlist, nprobe = 3)
      .collect().map(_.toSeq)
    assert(probe.toSeq === inQuery.toSeq,
      "stored-index probe must answer exactly the in-query annIvf")
  }

  test("streaming ingest maintains the IVF store; probe finds a planted dup across batches") {
    // three files -> three AvailableNow micro-batches: an exact copy of
    // vec 0 lands in the LAST batch and must surface as vec 0's top
    // neighbor through a probe of the streamed store (same-cell by
    // construction: identical vector, identical centroid argmin)
    val root = tmp("graft-embstream")
    val inDir = tmp("graft-embstream-in")
    val cp = tmp("graft-embstream-cp")
    val base = emb.localCheckpoint(true)
    val schema = base.schema
    def landFile(df: DataFrame, name: String, mtime: Long): Unit = {
      val stage = tmp(s"graft-embstage-$name")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      val dst = java.nio.file.Paths.get(inDir, s"$name.parquet")
      Files.move(part, dst)
      dst.toFile.setLastModified(mtime)
    }
    val planted = base.filter(col("vec_id") === 0L)
      .withColumn("vec_id", lit(9000L))
    val t0 = System.currentTimeMillis() - 60000
    landFile(base.filter(col("vec_id") % 3 === 0), "f0", t0)
    landFile(base.filter(col("vec_id") % 3 === 1), "f1", t0 + 10000)
    landFile(base.filter(col("vec_id") % 3 === 2).unionByName(planted),
      "f2", t0 + 20000)

    val q = graft.streaming.EmbIndexIngest.run(
      spark, inDir, root, schema, "vec_id", "embedding", cp, cfg,
      maxFilesPerTrigger = 1)
    q.awaitTermination()

    val stored = EmbIndexIngest.readVectors(spark, root)
    // multi-assignment replicates boundary vectors, so compare DISTINCT
    // ids (every vector present exactly once logically) and the exact
    // (id, cell) set against the from-scratch assignment
    assert(stored.select("vec_id").distinct().count() === base.count() + 1)
    // every batch assigned under the epoch-0 matrix (trained on f0 alone)
    val cents = EmbIndexIngest.readCentroids(spark, root)
    val all = base.unionByName(planted)
    assert(rows(stored.select("vec_id", "cell")) ===
      rows(scratchAssign(all, cents).select("vec_id", "cell")),
      "streamed assignments diverged from a from-scratch assignment")
    val top = Similarity.annIvfProbe(
        stored, cents, qVec(0L), "vec_id", "embedding",
        excludeId = 0L, k = 1, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // sim_x100 >= 99, not == 100: sqrt(a)*sqrt(a) can land a hair under a
    // in floating point, flooring an identical-vector cosine to 99
    assert(top.length === 1 && top(0)._1 === 9000L && top(0)._2 >= 99L,
      s"planted exact copy must be the top-1 same-cell neighbor, got ${top.toSeq}")
  }

  test("IVF-PQ composed probe: codes-only first pass, cell-pruned, recall holds, compaction-safe") {
    val root = tmp("graft-embidx-pq")
    val batches = (0 until 3).map(i => emb.filter(col("vec_id") % 3 === i))
    batches.zipWithIndex.foreach { case (b, i) =>
      EmbIndexIngest.processBatch(spark, b, root, "vec_id", "embedding", i.toLong, cfg)
    }
    val cents = EmbIndexIngest.readCentroids(spark, root)
    val books = EmbIndexIngest.readBooks(spark, root)
    // tiny sf fixture: the md5 sample can undershoot ksub — codebooks
    // then train smaller (documented, loud); only the subspace count and
    // per-subspace consistency are structural
    assert(books.length === cfg.m && books.nonEmpty
      && books.forall(_.length == books.head.length))

    // the codes table IS the compression claim: no vector column exists
    // to read — the first pass cannot touch raw embeddings even by bug
    val codes = EmbIndexIngest.readCodes(spark, root)
    assert(codes.columns.sorted.toSeq === Seq("batch_id", "cell", "code", "vec_id"))

    // cell filter partition-prunes the codes scan (same (batch_id, cell)
    // layout as the vector store)
    val pruned = codes.filter(col("cell").isin(0, 1))
    assert("PartitionFilters: \\[[^\\]]*cell".r
      .findFirstIn(pruned.queryExecution.executedPlan.toString).isDefined,
      "cell must prune the codes scan as a partition filter")

    // composed probe vs the exact cosine top-10
    def probe() = Similarity.annIvfPqProbe(
      EmbIndexIngest.readCodes(spark, root),
      EmbIndexIngest.readVectors(spark, root),
      cents, books, qVec(0L), "vec_id", "embedding",
      excludeId = 0L, k = 10, nprobe = 6, rerank = 200)
    val got = probe().collect().map(_.getLong(0)).toSet
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    assert(got.size === 10)
    assert(got.intersect(exact).size >= 6,
      s"IVF-PQ recall too low: ${got.intersect(exact).size}/10")

    // rerank scan: cell partition prune + pushed candidate-id filter
    val rerankPlan = probe().queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(rerankPlan).isDefined,
      s"rerank scan must partition-prune on cell:\n$rerankPlan")
    assert(rerankPlan.contains("PushedFilters: [In(vec_id"),
      s"candidate ids must push into the rerank scan:\n$rerankPlan")

    // compaction folds per-batch files without changing the probe
    val before = probe().collect().map(_.toSeq).toSeq
    EmbIndexIngest.compactStore(spark, root, upToBatch = 2L)
    val after = probe().collect().map(_.toSeq).toSeq
    assert(after === before, "compaction changed the IVF-PQ probe result")
  }

  test("pre-PQ store (epoch without books/) migrates: next batch trains the missing codebooks") {
    val root = tmp("graft-embidx-migrate")
    EmbIndexIngest.processBatch(spark, emb.filter(col("vec_id") % 2 === 0),
      root, "vec_id", "embedding", 0L, cfg)
    // simulate a store created before the codes half existed
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(EmbIndexIngest.booksDir(root, 0L)))
    rm(new java.io.File(EmbIndexIngest.codesDir(root, 0L)))
    // ingest must not crash on the missing dir — it trains books from
    // this batch and proceeds
    EmbIndexIngest.processBatch(spark, emb.filter(col("vec_id") % 2 === 1),
      root, "vec_id", "embedding", 1L, cfg)
    val books = EmbIndexIngest.readBooks(spark, root)
    assert(books.length === cfg.m)
    // codes exist for the post-migration batch
    assert(EmbIndexIngest.readCodes(spark, root)
      .filter(col("batch_id") === 1L).count() > 0)
    // the silently-incomplete window is DETECTABLE: pre-migration vectors
    // have no codes, and codesLag counts exactly them...
    val preMigration = EmbIndexIngest.readVectors(spark, root)
      .filter(col("batch_id") === 0L).count()
    assert(preMigration > 0)
    assert(EmbIndexIngest.codesLag(spark, root) === preMigration)
    // ...until refreshCentroids backfills codes for the whole store
    EmbIndexIngest.refreshCentroids(spark, root, "vec_id", "embedding", 1L, cfg)
    assert(EmbIndexIngest.codesLag(spark, root) === 0L)
  }

  test("probe prunes to nprobe cell partitions and survives a centroid refresh") {
    val root = tmp("graft-embidx")
    val batches = (0 until 3).map(i => emb.filter(col("vec_id") % 3 === i))
    batches.zipWithIndex.foreach { case (b, i) =>
      EmbIndexIngest.processBatch(spark, b, root, "vec_id", "embedding", i.toLong, cfg)
    }
    val cents = EmbIndexIngest.readCentroids(spark, root)
    val stored = EmbIndexIngest.readVectors(spark, root)
    val probeDf = Similarity.annIvfProbe(
      stored, cents, qVec(0L), "vec_id", "embedding",
      excludeId = 0L, k = 10, nprobe = 3)
    probeDf.collect()
    // the cell filter must reach the scan as a PARTITION filter (the
    // store is laid out by (batch_id, cell)) — the nprobe/nlist read.
    // String-match the executed plan: the dedup stage makes the plan
    // adaptive, so the scan node sits under query-stage wrappers a plain
    // collect() does not descend into.
    val planStr = probeDf.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(planStr).isDefined,
      s"cell must prune as a partition filter:\n$planStr")

    // refresh: retrained + reassigned under a fresh epoch; the store is
    // now exactly a from-scratch build over the full corpus, so the probe
    // matches in-query annIvf (which also trains on the full corpus)
    EmbIndexIngest.refreshCentroids(spark, root, "vec_id", "embedding", 1L, cfg)
    assert(EmbIndexIngest.currentEpoch(spark, root) === Some(1L))
    val cents2 = EmbIndexIngest.readCentroids(spark, root)
    val probe2 = Similarity.annIvfProbe(
        EmbIndexIngest.readVectors(spark, root), cents2, qVec(0L), "vec_id", "embedding",
        excludeId = 0L, k = 10, nprobe = 3)
      .collect().map(_.toSeq)
    val inQuery = Similarity.annIvf(emb, "vec_id", "embedding",
        queryId = 0L, k = 10, nlist = cfg.nlist, nprobe = 3)
      .collect().map(_.toSeq)
    assert(probe2.toSeq === inQuery.toSeq,
      "post-refresh probe must answer exactly the in-query annIvf over the full corpus")
  }

  test("semanticDedupProbe ≡ semanticNearDupWithCents restricted to the batch; planted dups found") {
    val root = tmp("graft-embsd")
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val t = maxId * 4L / 5L
    val corpus = emb.filter(col("vec_id") <= t).select("vec_id", "embedding")
    // the batch: the last fifth PLUS three exact copies of corpus vectors
    // under fresh monotone ids — guaranteed-findable planted duplicates
    // (an exact copy has the same unit vector, hence the same cell set)
    val planted = corpus.orderBy("vec_id").limit(3)
      .select((col("vec_id") + maxId + 1000L).as("vec_id"), col("embedding"))
    val batch = emb.filter(col("vec_id") > t).select("vec_id", "embedding")
      .unionByName(planted)
    EmbIndexIngest.processBatch(spark, corpus, root, "vec_id", "embedding", 0L, cfg)

    val probe = EmbIndexIngest.semanticDedupProbe(spark, root, batch,
      "vec_id", "embedding", minCosine = 0.25) // eps resolves from the store's meta
    val probeRows = rows(probe)

    // contract: the given-geometry corpus form over (stored ∪ batch)
    // under the STORE's centroids, restricted to pairs with ≥1 batch member
    val cents = EmbIndexIngest.readCentroids(spark, root)
    val batchIds = batch.select("vec_id").collect().map(_.getLong(0)).toSet
    val twin = Similarity.semanticNearDupWithCents(
        corpus.unionByName(batch), "vec_id", "embedding",
        cents, cfg.multiEps, minCosine = 0.25)
      .filter(col("id_a").isInCollection(batchIds) ||
        col("id_b").isInCollection(batchIds))
    assert(probeRows === rows(twin),
      "probe must equal the given-geometry corpus form restricted to the batch")

    // planted exact copies: every (source, copy) pair present at cos≈1
    // (sim_x100 ≥ 99 — sqrt(d)·sqrt(d) can land one ulp under d, so the
    // floored integer may read 99 for a bit-exact copy)
    val sources = corpus.orderBy("vec_id").limit(3)
      .select("vec_id").collect().map(_.getLong(0))
    sources.foreach { s =>
      assert(probeRows.exists(r =>
        r(1) == s && r(2) == s + maxId + 1000L &&
          r(3).asInstanceOf[Long] >= 99L),
        s"planted exact copy of vec $s must surface at sim_x100>=99")
    }

    // the in-memory twin (the declared q_semantic_dedup_incr form) agrees
    // with the disk probe: the store WAS bootstrapped from this corpus
    val mem = EmbIndexIngest.semanticDedupProbeWithCorpus(
      corpus, batch, "vec_id", "embedding", minCosine = 0.25, cfg)
    assert(rows(mem) === probeRows,
      "in-memory twin must equal the disk probe over a store bootstrapped from the corpus")

    // replay: after the batch is ingested as batch 1, probing it again
    // with excludeBatch=1 must not pair the batch against its own rows
    EmbIndexIngest.processBatch(spark, batch, root, "vec_id", "embedding", 1L, cfg)
    val replayed = EmbIndexIngest.semanticDedupProbe(spark, root, batch,
      "vec_id", "embedding", minCosine = 0.25, excludeBatch = 1L)
    assert(rows(replayed) === probeRows,
      "a replayed batch probed with its own batch_id excluded must reproduce the pre-ingest result")
  }

  test("semanticDedupProbe: all-zero-norm batch returns empty; wrong width raises") {
    val root = tmp("graft-embsd0")
    EmbIndexIngest.processBatch(spark, emb, root, "vec_id", "embedding", 0L, cfg)
    import spark.implicits._
    val d = emb.select(col("embedding")).head().getSeq[Float](0).length
    val zero = Seq((99999L, Array.fill(d)(0f))).toDF("vec_id", "embedding")
    val out = EmbIndexIngest.semanticDedupProbe(spark, root, zero,
      "vec_id", "embedding", minCosine = 0.25)
    assert(out.columns.toSeq === Seq("cell", "id_a", "id_b", "sim_x100"))
    assert(out.count() === 0L)
    // a batch of the WRONG vector width must raise loudly, not silently
    // assign everything to cell -1 (graft_dot nulls on length mismatch)
    val narrow = Seq((99999L, Array.fill(d / 2)(1f))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      EmbIndexIngest.semanticDedupProbe(spark, root, narrow,
        "vec_id", "embedding", minCosine = 0.25)
    }
    assert(ex.getMessage.contains("dimensional"))
  }

  test("empty/zero-norm first batch defers the bootstrap instead of bricking the store") {
    import spark.implicits._
    val root = tmp("graft-embboot0")
    val d = emb.select(col("embedding")).head().getSeq[Float](0).length
    val zeros = Seq((1L, Array.fill(d)(0f)), (2L, Array.fill(d)(0f)))
      .toDF("vec_id", "embedding")
    // plain append path: nothing trainable → no epoch, no error (an empty
    // FROZEN epoch would brick the store: books.head dies on every later
    // batch and refreshCentroids can't recover without a vectors dir)
    EmbIndexIngest.processBatch(spark, zeros, root, "vec_id", "embedding", 0L, cfg)
    assert(EmbIndexIngest.currentEpoch(spark, root).isEmpty)
    // the dedup-at-ingest path defers too: no losers identifiable without
    // geometry, batch returned unjudged, store untouched
    val kept = EmbIndexIngest.processBatchDedup(spark, zeros, root,
      "vec_id", "embedding", 1L, minCosine = 0.25, cfg = cfg)
    assert(kept.count() === 2L)
    assert(EmbIndexIngest.currentEpoch(spark, root).isEmpty)
    // the first trainable batch bootstraps normally and the store works
    EmbIndexIngest.processBatch(spark, emb, root, "vec_id", "embedding", 2L, cfg)
    assert(EmbIndexIngest.currentEpoch(spark, root) === Some(0L))
    assert(EmbIndexIngest.readVectors(spark, root).count() > 0L)
  }

  test("plain append path validates vector width against the frozen store") {
    import spark.implicits._
    val root = tmp("graft-embwidth")
    EmbIndexIngest.processBatch(spark, emb, root, "vec_id", "embedding", 0L, cfg)
    val d = emb.select(col("embedding")).head().getSeq[Float](0).length
    val narrow = Seq((99999L, Array.fill(d / 2)(1f))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      EmbIndexIngest.processBatch(spark, narrow, root, "vec_id", "embedding", 1L, cfg)
    }
    assert(ex.getMessage.contains("dimensional"),
      "a width-mismatched append lands every row in cell=-1, invisible to probes")
  }

  test("dedup-at-ingest: stored copy wins, min id wins within the batch, replay identical") {
    val root = tmp("graft-embddi")
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val b0 = emb.filter(col("vec_id") % 3 === 0).select("vec_id", "embedding")
    // at 0.99 only (near-)exact copies pair up, so the fixture itself
    // contributes no organic losers and the planted structure is exact
    val kept0 = EmbIndexIngest.processBatchDedup(
      spark, b0, root, "vec_id", "embedding", 0L, minCosine = 0.99, cfg)
    assert(kept0.count() === b0.count(),
      "no organic 0.99-near-dups expected in the bootstrap batch")

    // batch 1: fresh rows, two exact copies of STORED rows (must lose to
    // the store), and two extra copies of one fresh row f (must lose to
    // f within the batch, smallest id winning)
    val fresh = emb.filter(col("vec_id") % 3 === 1).select("vec_id", "embedding")
    val crossDups = b0.orderBy("vec_id").limit(2)
      .select((col("vec_id") + maxId + 100L).as("vec_id"), col("embedding"))
    val f = fresh.orderBy("vec_id").limit(1)
    val internal = (1 to 2).map(k =>
      f.select((col("vec_id") + maxId + 500L + k).as("vec_id"), col("embedding")))
      .reduce(_.unionByName(_))
    val b1 = fresh.unionByName(crossDups).unionByName(internal)
    val kept1 = EmbIndexIngest.processBatchDedup(
      spark, b1, root, "vec_id", "embedding", 1L, minCosine = 0.99, cfg)
    val keptIds = kept1.select("vec_id").collect().map(_.getLong(0)).toSet
    val crossIds = crossDups.select("vec_id").collect().map(_.getLong(0)).toSet
    val internalIds = internal.select("vec_id").collect().map(_.getLong(0)).toSet
    val fId = f.select("vec_id").head().getLong(0)
    assert(crossIds.forall(!keptIds.contains(_)),
      "exact copies of stored vectors must lose to the store")
    assert(internalIds.forall(!keptIds.contains(_)),
      "within-batch copies must lose to the smallest id holding the vector")
    assert(keptIds.contains(fId), "the original fresh row must survive")
    // the store holds exactly the two batches' survivors
    val storedIds = EmbIndexIngest.readVectors(spark, root)
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    val kept0Ids = kept0.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(storedIds === kept0Ids ++ keptIds)

    // replay of epoch 1: same survivors, same stored bytes (ids here)
    val keptReplay = EmbIndexIngest.processBatchDedup(
      spark, b1, root, "vec_id", "embedding", 1L, minCosine = 0.99, cfg)
    assert(keptReplay.select("vec_id").collect().map(_.getLong(0)).toSet === keptIds)
    assert(EmbIndexIngest.readVectors(spark, root)
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet === storedIds)

    // SAME-ID re-delivery in a LATER epoch (the at-least-once upstream's
    // most common duplicate): the batch copy must lose to its stored
    // self, never double-store the id
    val redelivered = f // same id, same vector, epoch 2
    val kept2 = EmbIndexIngest.processBatchDedup(
      spark, redelivered, root, "vec_id", "embedding", 2L, minCosine = 0.99, cfg)
    assert(kept2.count() === 0L, "a re-delivered id must lose to its stored copy")
    assert(EmbIndexIngest.readVectors(spark, root)
      .filter(col("vec_id") === fId).count() ===
      EmbIndexIngest.readVectors(spark, root)
        .filter(col("vec_id") === fId).select("vec_id", "cell").distinct().count(),
      "the id must not be stored twice in any cell")
    assert(EmbIndexIngest.readVectors(spark, root)
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet === storedIds)
  }

  test("streaming run with dedupMinCosine drops a later batch's copy at ingest") {
    val root = tmp("graft-embddi-stream")
    val inDir = tmp("graft-embddi-in")
    val cp = tmp("graft-embddi-cp")
    val base = emb.select("vec_id", "embedding").localCheckpoint(true)
    def landFile(df: DataFrame, name: String, mtime: Long): Unit = {
      val stage = tmp(s"graft-embddi-stage-$name")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      val dst = java.nio.file.Paths.get(inDir, s"$name.parquet")
      Files.move(part, dst)
      dst.toFile.setLastModified(mtime); ()
    }
    // file 1: half the corpus; file 2: the other half + an exact copy of
    // vec 0 (file-1 resident) under a fresh id — must never enter the store
    val copied = base.filter(col("vec_id") === 0L)
      .select(lit(77777L).as("vec_id"), col("embedding"))
    val t0 = System.currentTimeMillis() - 60000
    landFile(base.filter(col("vec_id") % 2 === 0), "f0", t0)
    landFile(base.filter(col("vec_id") % 2 === 1).unionByName(copied),
      "f1", t0 + 10000)
    EmbIndexIngest.run(spark, inDir, root, base.schema, "vec_id", "embedding",
      cp, cfg, maxFilesPerTrigger = 1, dedupMinCosine = Some(0.99))
      .awaitTermination()
    val storedIds = EmbIndexIngest.readVectors(spark, root)
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!storedIds.contains(77777L),
      "the cross-batch exact copy must be dropped at ingest")
    assert(storedIds.contains(0L) && storedIds.contains(1L))
  }

  test("semanticDedupProbe reads the store's persisted multiEps, not a default") {
    // build single-assign (multiEps=0) — a probe that silently assumed
    // the default 0.15 would multi-assign the batch against a
    // single-assigned store and mis-pair at cell boundaries
    val root = tmp("graft-embsd-eps")
    val cfg0 = Config(nlist = 8, multiEps = 0.0)
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val t = maxId * 4L / 5L
    val corpus = emb.filter(col("vec_id") <= t).select("vec_id", "embedding")
    val batch = emb.filter(col("vec_id") > t).select("vec_id", "embedding")
    EmbIndexIngest.processBatch(spark, corpus, root, "vec_id", "embedding", 0L, cfg0)
    assert(EmbIndexIngest.storedMultiEps(spark, root) === Some(0.0))
    val probe = EmbIndexIngest.semanticDedupProbe(spark, root, batch,
      "vec_id", "embedding", minCosine = 0.25) // eps NOT passed
    val cents = EmbIndexIngest.readCentroids(spark, root)
    val batchIds = batch.select("vec_id").collect().map(_.getLong(0)).toSet
    val twin = Similarity.semanticNearDupWithCents(
        corpus.unionByName(batch), "vec_id", "embedding",
        cents, eps = 0.0, minCosine = 0.25)
      .filter(col("id_a").isInCollection(batchIds) ||
        col("id_b").isInCollection(batchIds))
    assert(rows(probe) === rows(twin),
      "probe must assign the batch under the store's persisted margin")
  }
}
