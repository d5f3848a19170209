package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup}
import graft.sources.Tables.Fixture
import graft.streaming.{DocIndexIngest, GraphIngest}
import graft.streaming.DocIndexIngest.Config

/** The persisted near-dup graph: rank/component probes over the stored
  * degrees + merge log must equal the in-query operators over the full
  * pair list — incrementally, across batches, including merges that
  * join components born in different batches.
  */
class GraphIngestSpec extends SparkTestBase {
  import spark.implicits._

  private val cfg = Config(partitionMod = 16)

  private def tmp(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p.toString
  }

  private def docs: DataFrame = Fixture(spark, sfDir).documents

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def pairsDf(ps: Seq[(Long, Long)]): DataFrame =
    ps.toDF("id_a", "id_b")

  test("cross-batch merge chains: labels ≡ from-scratch, log stays minimal") {
    val root = tmp("graft-graph-chain")
    // batch 0 and 1 create two separate components; batch 2 merges them
    // THROUGH their non-root members (4, 6) — the resolution must chase
    // both chains to the final minimum 3
    val batches = Seq(Seq((5L, 6L)), Seq((3L, 4L)), Seq((4L, 6L)))
    batches.zipWithIndex.foreach { case (ps, i) =>
      GraphIngest.ingestPairs(spark, pairsDf(ps), root, i.toLong)
    }
    val labels = GraphIngest.ccLabelsProbe(spark, root)
    assert(rows(labels) ===
      Set(Seq(3L, 3L), Seq(4L, 3L), Seq(5L, 3L), Seq(6L, 3L)))
    assert(rows(labels) === rows(Curation.connectedComponents(
      pairsDf(batches.flatten), "id_a", "id_b")))
    // merge log: one row per ever-demoted root (4→3 at b1... no: b0
    // demotes 6→5; b1 demotes 4→3; b2 demotes 5→3 and nothing else —
    // node 6's chain 6→5→3 resolves without a second row for 6)
    assert(rows(GraphIngest.readRemap(spark, root)) ===
      Set(Seq(6L, 5L), Seq(4L, 3L), Seq(5L, 3L)))
    // degrees sum across batches: 4 and 6 gained a second edge at b2
    assert(rows(GraphIngest.readDegrees(spark, root)) ===
      Set(Seq(3L, 1L), Seq(4L, 2L), Seq(5L, 1L), Seq(6L, 2L)))
  }

  test("replayed batch rewrites identical graph stores (exactly-once)") {
    val root = tmp("graft-graph-replay")
    GraphIngest.ingestPairs(spark, pairsDf(Seq((1L, 2L))), root, 0L)
    GraphIngest.ingestPairs(spark, pairsDf(Seq((2L, 3L), (7L, 8L))), root, 1L)
    val (deg1, remap1, lab1) = (
      rows(GraphIngest.readDegrees(spark, root)),
      rows(GraphIngest.readRemap(spark, root)),
      rows(GraphIngest.ccLabelsProbe(spark, root)))
    // replay batch 1: every read inside excludes batch 1, so the refold
    // sees the pre-batch state and rewrites byte-identical partitions
    GraphIngest.ingestPairs(spark, pairsDf(Seq((2L, 3L), (7L, 8L))), root, 1L)
    assert(rows(GraphIngest.readDegrees(spark, root)) === deg1)
    assert(rows(GraphIngest.readRemap(spark, root)) === remap1)
    assert(rows(GraphIngest.ccLabelsProbe(spark, root)) === lab1)
  }

  test("probes over a 3-batch DocIndexIngest store ≡ in-query pageRank/connectedComponents") {
    val root = tmp("graft-graph-docidx")
    val batches = (0 until 3).map(i => docs.filter(col("doc_id") % 3 === i))
    batches.zipWithIndex.foreach { case (b, i) =>
      DocIndexIngest.processBatch(spark, b, root, "text", "doc_id", i.toLong, cfg)
    }
    // the stored pairs are the full run's pairs (each pair surfaces once,
    // at its later member's batch) — so probe ≡ in-query over the corpus
    val storedPairs = spark.read.parquet(DocIndexIngest.pairsDir(root))
      .select("id_a", "id_b")
    val scratchPairs = Dedup.minhashPairs(docs, "text", "doc_id",
      cfg.k, cfg.bands, cfg.minJaccPct, cfg.maxBucket).select("id_a", "id_b")
    assert(rows(storedPairs) === rows(scratchPairs),
      "stored pair partitions diverged from a from-scratch run")
    assert(storedPairs.count() > 0, "fixture produced no near-dup pairs")

    assert(rows(GraphIngest.pageRankProbe(spark, root)) ===
      rows(Curation.pageRank(scratchPairs, "id_a", "id_b")),
      "pageRankProbe diverged from in-query pageRank")
    assert(rows(GraphIngest.ccLabelsProbe(spark, root)) ===
      rows(Curation.connectedComponents(scratchPairs, "id_a", "id_b")),
      "ccLabelsProbe diverged from in-query connectedComponents")
    assert(rows(GraphIngest.dedupBestProbe(spark, root, docs, "text", "doc_id")) ===
      rows(Curation.dedupKeepBest(docs, "text", "doc_id")),
      "dedupBestProbe diverged from in-query dedupKeepBest")
  }

  test("ccLabelsProbe never scans the edge list — resolution rides the log alone") {
    val root = tmp("graft-graph-planpin")
    GraphIngest.ingestPairs(spark, pairsDf(Seq((1L, 2L), (2L, 3L))), root, 0L)
    val probe = GraphIngest.ccLabelsProbe(spark, root)
    probe.collect()
    val planStr = probe.queryExecution.executedPlan.toString
    assert(!planStr.contains("/pairs"),
      s"ccLabelsProbe plan must not read the pairs store:\n$planStr")
    assert(planStr.contains("/graph/degrees"),
      "nodes must come from the degree store")
  }

  test("ingestPairs canonicalizes: reversed/duplicate/self pairs cannot skew degrees") {
    val root = tmp("graft-graph-canon")
    // (2,1) reversed, (1,2) duplicated, (3,3) self — one real edge
    GraphIngest.ingestPairs(spark,
      pairsDf(Seq((2L, 1L), (1L, 2L), (1L, 2L), (3L, 3L))), root, 0L)
    assert(rows(GraphIngest.readDegrees(spark, root)) ===
      Set(Seq(1L, 1L), Seq(2L, 1L)))
    assert(rows(GraphIngest.ccLabelsProbe(spark, root)) ===
      Set(Seq(1L, 1L), Seq(2L, 1L)))
    // and the probe still matches the in-query operator's distinct
    // semantics over the same messy input
    assert(rows(GraphIngest.pageRankProbe(spark, root)) ===
      rows(Curation.pageRank(
        pairsDf(Seq((2L, 1L), (1L, 2L), (1L, 2L))), "id_a", "id_b")))
  }

  test("driver gates fail loudly past maxDriver, never silently truncate") {
    val root = tmp("graft-graph-gate")
    val e = intercept[IllegalArgumentException] {
      GraphIngest.ingestPairs(spark, pairsDf(Seq((1L, 2L), (3L, 4L))), root,
        0L, maxDriver = 1L)
    }
    assert(e.getMessage.contains("maxDriver"))
  }

  test("property: random graphs, random batch cuts — incremental labels ≡ from-scratch") {
    // the merge-log resolution is the subtle half of the graph store;
    // pin it over many random graphs and arbitrary batch partitions
    // (seeded, so a failure reproduces exactly)
    val rnd = new scala.util.Random(42L)
    for (trial <- 0 until 12) {
      val n = 8 + rnd.nextInt(25)                 // nodes
      val m = 5 + rnd.nextInt(40)                 // edges
      val pairs = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
        .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
        .distinct // canonical orientation BEFORE distinct — (a,b) and
                  // (b,a) are the same pair under the pairs-store
                  // uniqueness contract, so dedup must be
                  // orientation-insensitive or two batches could each
                  // carry one orientation and double-count degrees
      val nBatches = 1 + rnd.nextInt(4)
      val cut = pairs.map(p => (rnd.nextInt(nBatches), p))
      val root = tmp(s"graft-graph-prop$trial")
      (0 until nBatches).foreach { b =>
        GraphIngest.ingestPairs(spark,
          pairsDf(cut.collect { case (`b`, p) => p }), root, b.toLong)
      }
      val got = rows(GraphIngest.ccLabelsProbe(spark, root))
      val want = rows(Curation.connectedComponents(pairsDf(pairs), "id_a", "id_b"))
      assert(got === want,
        s"trial $trial (n=$n m=${pairs.size} batches=$nBatches): " +
          s"incremental labels diverged\n got=$got\nwant=$want")
      // degrees are orientation-sensitive where CC labels are not —
      // assert them against a from-scratch count so a double-counted
      // orientation can't hide behind identical labels
      val gotDeg = GraphIngest.readDegrees(spark, root).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      val wantDeg = pairs.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
        .toSeq.sortBy(_._1)
      assert(gotDeg === wantDeg,
        s"trial $trial: stored degrees diverged from from-scratch count")
    }
  }

  test("compaction folds graph stores without changing probe results") {
    val root = tmp("graft-graph-compact")
    GraphIngest.ingestPairs(spark, pairsDf(Seq((1L, 2L), (9L, 4L))), root, 0L)
    GraphIngest.ingestPairs(spark, pairsDf(Seq((2L, 4L))), root, 1L)
    val before = rows(GraphIngest.ccLabelsProbe(spark, root))
    val degBefore = rows(GraphIngest.readDegrees(spark, root))
    graft.streaming.StoreCompaction.compact(
      spark, GraphIngest.degreesDir(root), Seq.empty, 1L)
    graft.streaming.StoreCompaction.compact(
      spark, GraphIngest.remapDir(root), Seq.empty, 1L)
    assert(rows(GraphIngest.ccLabelsProbe(spark, root)) === before)
    assert(rows(GraphIngest.readDegrees(spark, root)) === degBefore)
  }
}
