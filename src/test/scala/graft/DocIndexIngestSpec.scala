package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables.Fixture
import graft.streaming.DocIndexIngest
import graft.streaming.DocIndexIngest.Config

/** The persisted-index ingest story, end to end: the "stored index" the
  * incremental dedup/simjoin operators probe is actually STORED here, by
  * the ingest path, and stays equivalent to a from-scratch build at every
  * batch boundary.
  */
class DocIndexIngestSpec extends SparkTestBase {

  private val cfg = Config(partitionMod = 16)

  private def tmp(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p.toString
  }

  private def docs: DataFrame = Fixture(spark, sfDir).documents

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("index after N batches is hash-equal to a from-scratch build") {
    val root = tmp("graft-docidx")
    val batches = (0 until 3).map(i => docs.filter(col("doc_id") % 3 === i))
    batches.zipWithIndex.foreach { case (b, i) =>
      DocIndexIngest.processBatch(spark, b, root, "text", "doc_id", i.toLong, cfg)
    }
    // LSH half: the stored (id, band, bucket) rows are per-doc, so the
    // incremental union must equal one build over the whole corpus
    val storedLsh = rows(DocIndexIngest.readLsh(spark, root, "doc_id")
      .select("doc_id", "band", "bucket"))
    val scratchLsh = rows(Dedup.bandBuckets(docs, "text", "doc_id", cfg.k, cfg.bands))
    assert(storedLsh === scratchLsh, "stored LSH index diverged from a from-scratch build")

    // prefix half: every batch ranked under the EPOCH-0 dictionary, so the
    // union must equal prefixRows(all docs) under that same stored order
    val epochDf = DocIndexIngest.readDf(spark, root)
    val storedPrefix = rows(DocIndexIngest.readPrefix(spark, root, "doc_id")
      .select("doc_id", "h", "p", "n"))
    val scratchPrefix = rows(
      Dedup.prefixRows(docs, epochDf, "text", "doc_id", cfg.minJaccPct))
    assert(storedPrefix === scratchPrefix,
      "stored prefix index diverged from a from-scratch build under the epoch order")

    // corpus store round-trips the documents themselves
    assert(rows(DocIndexIngest.readCorpus(spark, root, docs)) === rows(docs))
  }

  test("bm25 store after N batches: search ≡ full-corpus bm25TopK, exact scores; replay changes nothing") {
    val root = tmp("graft-docidx")
    val batches = (0 until 3).map(i => docs.filter(col("doc_id") % 3 === i))
    batches.zipWithIndex.foreach { case (b, i) =>
      DocIndexIngest.processBatch(spark, b, root, "text", "doc_id", i.toLong, cfg)
    }
    // postings are per-doc rows: incremental union ≡ one pass over everything
    val stored = rows(DocIndexIngest.readBm25Postings(spark, root, "doc_id")
      .select("term_h", "doc_id", "tf", "dl"))
    val scratch = rows(graft.operators.TextSearch.postingsRows(docs, "text", "doc_id"))
    assert(stored === scratch, "stored postings diverged from a from-scratch pass")

    // probe derives df + globals exactly ⇒ scores equal the in-query path,
    // not just the ranking
    val query = "dup vector stream"
    def search() = DocIndexIngest.bm25Search(spark, root, "doc_id", query, 10, cfg)
      .collect().map(_.toSeq).toSeq
    val viaStore = search()
    val inQuery = graft.operators.TextSearch.bm25TopK(docs, "text", "doc_id", query, 10)
      .collect().map(_.toSeq).toSeq
    assert(viaStore === inQuery, "incremental probe must equal full-corpus BM25 exactly")

    // the phrase index rides the same batches: probe ≡ in-query phraseCount
    val phrase = "big order scan" // present in the sf0.001 fixture
    def phrases() = DocIndexIngest.phraseSearch(spark, root, "doc_id", phrase, cfg)
      .collect().map(_.toSeq).toSeq
    val phraseViaStore = phrases()
    val phraseInQuery = graft.operators.TextSearch
      .phraseCount(docs, "text", "doc_id", phrase)
      .collect().map(_.toSeq).toSeq
    assert(phraseViaStore === phraseInQuery,
      "incremental phrase probe must equal full-corpus phraseCount")
    assert(phraseViaStore.nonEmpty, "fixture must contain the phrase")

    // epoch replay: reprocessing batch 1 overwrites its own partitions with
    // identical content — stats don't double, the search answers unchanged
    DocIndexIngest.processBatch(spark, batches(1), root, "text", "doc_id", 1L, cfg)
    assert(search() === viaStore, "replayed batch must not perturb the bm25 store")
    assert(phrases() === phraseViaStore, "replayed batch must not perturb the phrase store")

    // compaction folds the per-batch partitions and preserves the answers
    DocIndexIngest.compactStores(spark, root, upToBatch = 2L, cfg)
    assert(search() === viaStore, "compaction must preserve the bm25 answer")
    assert(phrases() === phraseViaStore, "compaction must preserve the phrase answer")
  }

  test("union of per-batch probe pairs equals the full-corpus near-dup run") {
    val root = tmp("graft-docidx")
    val batches = (0 until 3).map(i => docs.filter(col("doc_id") % 3 === i))
    val found = batches.zipWithIndex.flatMap { case (b, i) =>
      DocIndexIngest.processBatch(spark, b, root, "text", "doc_id", i.toLong, cfg)
        .collect().map(_.toSeq)
    }.toSet
    // every pair is found exactly once — at the batch its LATER member
    // arrives (same-batch pairs at that shared batch) — so the union over
    // batches must be exactly the one-shot full run
    val full = rows(Dedup.minhashPairs(
      docs, "text", "doc_id", cfg.k, cfg.bands, cfg.minJaccPct, cfg.maxBucket))
    assert(found === full,
      s"incremental union ${found.size} pairs vs full run ${full.size}")
    // and the persisted pairs/ partitions carry the same union
    val persisted = rows(spark.read.parquet(DocIndexIngest.pairsDir(root))
      .select("id_a", "id_b", "jacc_pct"))
    assert(persisted === full)
  }

  test("simjoin probe against the on-disk store matches the full exact join") {
    val root = tmp("graft-docidx")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val incoming = docs.filter(col("doc_id") % 5 === 0)
    DocIndexIngest.processBatch(spark, corpus, root, "text", "doc_id", 0L, cfg)
    val pairs = Dedup.similarityJoinIncremental(
      DocIndexIngest.readPrefix(spark, root, "doc_id"),
      DocIndexIngest.readDf(spark, root),
      DocIndexIngest.readCorpus(spark, root, docs),
      incoming, "text", "doc_id", cfg.minJaccPct, cfg.partitionMod)
    val expected = Dedup.similarityJoin(docs, "text", "doc_id", cfg.minJaccPct)
      .filter(col("id_a") % 5 === 0 || col("id_b") % 5 === 0)
    assert(rows(pairs) === rows(expected),
      "probe against the persisted index must equal the full exact join restricted to batch-touching pairs")
  }

  test("epoch replay is exactly-once: reprocessing a batch changes nothing") {
    val root = tmp("graft-docidx")
    val b0 = docs.filter(col("doc_id") % 3 === 0)
    val b1 = docs.filter(col("doc_id") % 3 === 1)
    DocIndexIngest.processBatch(spark, b0, root, "text", "doc_id", 0L, cfg)
    val p1 = rows(DocIndexIngest.processBatch(spark, b1, root, "text", "doc_id", 1L, cfg))
    val lshBefore = rows(DocIndexIngest.readLsh(spark, root, "doc_id"))
    val prefixBefore = rows(DocIndexIngest.readPrefix(spark, root, "doc_id"))
    // the crash-replay case: epoch 1 runs again (checkpoint never committed)
    val p1Again = rows(DocIndexIngest.processBatch(spark, b1, root, "text", "doc_id", 1L, cfg))
    assert(p1Again === p1, "replayed probe must emit the identical pairs (no self-pairs)")
    assert(rows(DocIndexIngest.readLsh(spark, root, "doc_id")) === lshBefore)
    assert(rows(DocIndexIngest.readPrefix(spark, root, "doc_id")) === prefixBefore)
    assert(rows(DocIndexIngest.readCorpus(spark, root, docs)) ===
      rows(b0.unionByName(b1)))
  }

  test("dictionary refresh rolls the epoch atomically; probes stay exact across it") {
    val root = tmp("graft-docidx")
    val b0 = docs.filter(col("doc_id") % 3 === 0)
    val b1 = docs.filter(col("doc_id") % 3 === 1)
    val b2 = docs.filter(col("doc_id") % 3 === 2)
    DocIndexIngest.processBatch(spark, b0, root, "text", "doc_id", 0L, cfg)
    DocIndexIngest.processBatch(spark, b1, root, "text", "doc_id", 1L, cfg)
    assert(DocIndexIngest.currentEpoch(spark, root) === Some(0L))
    // roll: re-rank everything under the corpus-wide df order
    DocIndexIngest.refreshDictionary(spark, root, docs, "text", "doc_id", 7L, cfg)
    assert(DocIndexIngest.currentEpoch(spark, root) === Some(7L))
    // the new epoch's prefix base must equal a from-scratch build under
    // the new dictionary
    val newDf = DocIndexIngest.readDf(spark, root)
    assert(rows(DocIndexIngest.readPrefix(spark, root, "doc_id")
      .select("doc_id", "h", "p", "n")) ===
      rows(Dedup.prefixRows(b0.unionByName(b1), newDf, "text", "doc_id", cfg.minJaccPct)))
    // a batch ingested AFTER the roll ranks under the new order and the
    // simjoin probe against the refreshed store is still exact
    DocIndexIngest.processBatch(spark, b2, root, "text", "doc_id", 2L, cfg)
    val pairs = Dedup.similarityJoinIncremental(
      DocIndexIngest.readPrefix(spark, root, "doc_id", excludeBatch = 2L),
      newDf,
      DocIndexIngest.readCorpus(spark, root, docs, excludeBatch = 2L),
      b2, "text", "doc_id", cfg.minJaccPct, cfg.partitionMod)
    val expected = Dedup.similarityJoin(docs, "text", "doc_id", cfg.minJaccPct)
      .filter(col("id_a") % 3 === 2 || col("id_b") % 3 === 2)
    assert(rows(pairs) === rows(expected),
      "post-refresh probe must equal the full exact join restricted to batch-2 pairs")
  }

  test("streaming ingest dedups across batch boundaries: canonical survivors") {
    // three files -> three AvailableNow micro-batches (maxFilesPerTrigger=1):
    // an exact duplicate and a near-duplicate of doc 0 arrive in LATER
    // batches and must be caught against the persisted index, corpus text
    // never rescanned
    val root = tmp("graft-stream")
    val inDir = tmp("graft-stream-in")
    val cp = tmp("graft-stream-cp")
    val base = docs.filter(col("doc_id") < 40).localCheckpoint(true)
    val d0 = base.filter(col("doc_id") === 0).head()
    val text0 = d0.getAs[String]("text")
    val schema = base.schema
    def mutated(id: Long, text: String): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          org.apache.spark.sql.Row.fromSeq(base.head().toSeq.zipWithIndex.map {
            case (_, i) if schema(i).name == "doc_id" => id
            case (_, i) if schema(i).name == "text" => text
            case (v, _) => v
          }))), schema)
    // the file stream source lists FILES, not directories — land each
    // batch as one flat parquet file with ascending mtimes so AvailableNow
    // + maxFilesPerTrigger=1 yields three ordered micro-batches
    def landFile(df: DataFrame, name: String, mtime: Long): Unit = {
      val stage = tmp(s"graft-stage-$name")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      val dst = java.nio.file.Paths.get(inDir, s"$name.parquet")
      Files.move(part, dst)
      dst.toFile.setLastModified(mtime)
    }
    val t0 = System.currentTimeMillis() - 60000
    landFile(base.filter(col("doc_id") < 20), "f0", t0)
    landFile(base.filter(col("doc_id") >= 20).unionByName(mutated(9000L, text0)),
      "f1", t0 + 10000)
    // near-dup: drop the first word — Jaccard stays >= 50% on 3-shingles
    landFile(mutated(9001L, text0.split(" ").drop(1).mkString(" ")), "f2", t0 + 20000)

    val q = DocIndexIngest.run(spark, inDir, root, schema, "text", "doc_id",
      cp, cfg, maxFilesPerTrigger = 1)
    q.awaitTermination()

    val pairs = spark.read.parquet(DocIndexIngest.pairsDir(root))
    val cross = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cross.contains((0L, 9000L)), s"exact dup across batches missed: $cross")
    assert(cross.contains((0L, 9001L)), s"near dup across batches missed: $cross")
    // canonical survivors: min-id per connected component — doc 0 survives,
    // its two later copies are dropped
    val comps = graft.operators.Curation.connectedComponents(
      pairs.select("id_a", "id_b"), "id_a", "id_b")
    val survivors = DocIndexIngest.readCorpus(spark, root, base)
      .join(comps.filter(col("id") =!= col("comp"))
          .select(col("id").as("doc_id")),
        Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors.contains(0L) && !survivors.contains(9000L) && !survivors.contains(9001L),
      s"canonical survivor set wrong around doc 0: kept ${survivors.filter(i => i == 0L || i >= 9000L)}")
    assert(DocIndexIngest.readCorpus(spark, root, base).count() === 42)
  }

  test("the store persists its build Config; drifted parameters raise, not silently miss") {
    val root = tmp("graft-docidx-cfg")
    val b = docs.filter(col("doc_id") % 7 === 0)
    DocIndexIngest.processBatch(spark, b, root, "text", "doc_id", 0L, cfg)
    assert(DocIndexIngest.storedConfig(spark, root) === Some(cfg))
    // replayed batch under the SAME config rewrites nothing and passes
    DocIndexIngest.processBatch(spark, b, root, "text", "doc_id", 0L, cfg)
    // folding a later batch under different band parameters would build
    // buckets incomparable with the stored ones - must raise loudly
    val drifted = cfg.copy(bands = 8)
    val ex = intercept[IllegalArgumentException] {
      DocIndexIngest.processBatch(spark,
        docs.filter(col("doc_id") % 7 === 1), root, "text", "doc_id", 1L, drifted)
    }
    assert(ex.getMessage.contains("built with"))
    // probing with a different partitionMod prunes the WRONG partitions
    val ex2 = intercept[IllegalArgumentException] {
      DocIndexIngest.bm25Search(spark, root, "doc_id", "the", 5,
        cfg.copy(partitionMod = cfg.partitionMod * 2))
    }
    assert(ex2.getMessage.contains("partitioned with mod"))
    val ex3 = intercept[IllegalArgumentException] {
      DocIndexIngest.phraseSearch(spark, root, "doc_id", "the data",
        cfg.copy(partitionMod = cfg.partitionMod * 2))
    }
    assert(ex3.getMessage.contains("partitioned with mod"))
    // the curate probe derives its index Config from Curation.Config -
    // a drifted derivation must raise the same way
    val croot = tmp("graft-curate-cfg")
    graft.streaming.CurateIngest.processBatch(
      spark, b, croot, "text", "doc_id", 0L)
    val ex4 = intercept[IllegalArgumentException] {
      graft.streaming.CurateIngest.curateProbe(spark, croot,
        docs.filter(col("doc_id") % 7 === 1), "text", "doc_id",
        graft.operators.Curation.Config(minhashBands = 8))
    }
    assert(ex4.getMessage.contains("built with"))
    // refreshDictionary runs the same gate: a rebuild under a drifted
    // partitionMod would mix two hmod schemes in one store (probes prune
    // by the config's mod and silently skip the drifted base rows)
    val ex5 = intercept[IllegalArgumentException] {
      DocIndexIngest.refreshDictionary(spark, root, docs, "text", "doc_id",
        1L, cfg.copy(partitionMod = cfg.partitionMod * 2))
    }
    assert(ex5.getMessage.contains("built with"))
  }

  test("an empty first batch defers the epoch-0 dictionary to the first nonempty one") {
    val root = tmp("graft-docidx-empty0")
    // realistic via CurateIngest: every row of the first batch fails the
    // lang/quality filters, so the survivor set handed here is empty. A
    // dictionary FROZEN from it would rank every shingle at df=0 for the
    // store's whole life (selectivity silently lost).
    val pairs0 = DocIndexIngest.processBatch(spark,
      docs.limit(0), root, "text", "doc_id", 0L, cfg)
    assert(pairs0.count() === 0L)
    assert(pairs0.columns.toSeq === Seq("id_a", "id_b", "jacc_pct"))
    assert(DocIndexIngest.currentEpoch(spark, root).isEmpty,
      "no epoch may freeze from an empty batch")
    // the first NONEMPTY batch bootstraps; the store then works normally
    DocIndexIngest.processBatch(spark,
      docs.filter(col("doc_id") % 3 === 1), root, "text", "doc_id", 1L, cfg)
    assert(DocIndexIngest.currentEpoch(spark, root) === Some(0L))
    assert(DocIndexIngest.readDf(spark, root).count() > 0L,
      "the deferred dictionary must carry real df rows")
  }
}
