package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Sampling, TrainingExport}
import graft.sources.Tables.Fixture

/** [[TrainingExport.export]] — the dataset-construction capstone. Pinned:
  * the one-call export equals the hand-composed stage pipeline row for
  * row (including shard/pos layout), the report's funnel numbers agree
  * with the written data, and re-running is byte-stable membership.
  */
class TrainingExportSpec extends SparkTestBase {

  private def tmp(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p.toString
  }

  private def rowBag(df: DataFrame): Map[Seq[Any], Int] =
    df.collect().map(_.toSeq).groupBy(identity).map { case (k, v) => (k, v.length) }

  private lazy val docs = Fixture(spark, sfDir).documents.localCheckpoint(true)
  // a tiny eval set sharing shingles with a known corpus slice
  private lazy val evalSet = docs.filter(col("doc_id") % 97 === 0)
    .withColumn("doc_id", col("doc_id") + lit(900000L))
    .localCheckpoint(true)

  private val mixture = TrainingExport.Mixture("source",
    Map("src1" -> 500, "src2" -> 300), totalBudget = 20000L,
    defaultPermille = 200)
  private val chunk = TrainingExport.Chunk(chunkTokens = 32, stride = 24)

  test("one-call export ≡ the hand-composed stage pipeline, layout included") {
    val exportDir = tmp("graft-texport")
    val report = TrainingExport.export(docs, "text", "doc_id", exportDir,
      nShards = 4, evalSet = Some(evalSet), mixture = Some(mixture),
      chunk = Some(chunk))

    // the same stages composed by hand
    val curated = Curation.curate(docs, "text", "doc_id")
    val clean = curated.join(
      Curation.decontaminate(curated, evalSet, "text", "doc_id")
        .select(col("doc_id")),
      Seq("doc_id"), "left_anti")
    val sampled = clean.join(
      Sampling.mixtureByTokenBudget(clean, "text", "doc_id", "source",
        mixture.permilleBySource, mixture.totalBudget, mixture.defaultPermille)
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    val rows = Sampling.chunkDocs(sampled, "text", "doc_id", 32, 24)
      .select(concat(col("doc_id").cast("string"), lit("#"), col("chunk_id"))
          .as("sample_id"),
        col("doc_id"), col("chunk_id"), col("n_tok"),
        col("chunk_text").as("text"))
    val manualDir = tmp("graft-texport-manual")
    graft.sources.Sinks.writeTrainingShards(rows, "sample_id", 4, manualDir)

    val got = spark.read.parquet(exportDir)
    val want = spark.read.parquet(manualDir)
    assert(got.columns.sorted.toSeq === want.columns.sorted.toSeq)
    assert(rowBag(got.select(want.columns.sorted.map(col): _*)) ===
      rowBag(want.select(want.columns.sorted.map(col): _*)),
      "export diverged from the hand-composed stages (layout included)")

    // report funnel agrees with the data, stages only ever shrink
    assert(report.n_input === docs.count())
    assert(report.n_input >= report.n_curated &&
      report.n_curated >= report.n_decontaminated &&
      report.n_decontaminated >= report.n_sampled,
      s"funnel must be monotone: $report")
    assert(report.n_sampled > 0, "fixture export must keep rows")
    assert(report.n_rows_written === got.count())
    assert(report.n_tokens_written ===
      got.agg(sum(col("n_tok"))).head().getLong(0))
    assert(report.n_shards === 4)
    // the decontam stage actually dropped the planted contamination
    assert(report.n_decontaminated < report.n_curated,
      "the planted eval overlap must remove at least one doc")
  }

  test("exportCurated over the incremental loop's curated product ≡ export over the raw corpus") {
    // the incremental world: ingest in monotone batches through
    // CurateIngest.processBatch, whose returned views ARE the curated
    // product stream run() persists under outDir — exporting their union
    // must equal the batch capstone without re-curating anything
    val root = tmp("graft-texport-incr")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val views = Seq((Long.MinValue, maxId / 2), (maxId / 2, Long.MaxValue))
      .zipWithIndex.map { case ((lo, hi), i) =>
        graft.streaming.CurateIngest.processBatch(spark,
          docs.filter(col("doc_id") > lo && col("doc_id") <= hi),
          root, "text", "doc_id", i.toLong).localCheckpoint(true)
      }
    val product = views.reduce(_.unionByName(_))
    val dIncr = tmp("graft-texport-incr-out")
    val rIncr = TrainingExport.exportCurated(product, "text", "doc_id",
      dIncr, nShards = 4, evalSet = Some(evalSet), chunk = Some(chunk))
    val dBatch = tmp("graft-texport-batch-out")
    val rBatch = TrainingExport.export(docs, "text", "doc_id", dBatch,
      nShards = 4, evalSet = Some(evalSet), chunk = Some(chunk))
    assert(rowBag(spark.read.parquet(dIncr)) ===
      rowBag(spark.read.parquet(dBatch)),
      "incremental curated product exported differently than the batch capstone")
    assert(rIncr.n_curated === rBatch.n_curated &&
      rIncr.n_rows_written === rBatch.n_rows_written &&
      rIncr.n_tokens_written === rBatch.n_tokens_written,
      s"reports diverged: $rIncr vs $rBatch")
  }

  test("stageDir: staged export ≡ default export; a killed export RESUMES from staged parquet without recomputing") {
    val dDefault = tmp("graft-texport-ck")
    TrainingExport.export(docs, "text", "doc_id", dDefault, nShards = 4,
      evalSet = Some(evalSet), mixture = Some(mixture), chunk = Some(chunk))

    val stages = tmp("graft-texport-stages")
    val dStaged = tmp("graft-texport-staged")
    val r1 = TrainingExport.export(docs, "text", "doc_id", dStaged,
      nShards = 4, evalSet = Some(evalSet), mixture = Some(mixture),
      chunk = Some(chunk), stageDir = Some(stages))
    assert(rowBag(spark.read.parquet(dStaged)) ===
      rowBag(spark.read.parquet(dDefault)),
      "stageDir materialization changed the exported product")
    for (s <- Seq("curated", "clean", "sampled", "rows"))
      assert(new java.io.File(s"$stages/$s/_DONE").exists(), s"stage $s not marked")

    // simulate the hour-9 kill: the final stage died (no _DONE, no
    // output), everything upstream completed. The resumed run gets a
    // POISONED corpus with NO text column at all — if the curated
    // stage's plan were even CONSTRUCTED (let alone executed), the
    // analyzer would throw; a completed stage must be read, with its
    // builder never invoked (Curation.curate runs eager jobs at call
    // time — recompute-and-discard is the cost class this pins out)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(s"$stages/rows"))
    rm(new java.io.File(dStaged))
    val r2 = TrainingExport.export(docs.select(col("doc_id")), "text",
      "doc_id", dStaged, nShards = 4, evalSet = Some(evalSet),
      mixture = Some(mixture), chunk = Some(chunk), stageDir = Some(stages))
    assert(rowBag(spark.read.parquet(dStaged)) ===
      rowBag(spark.read.parquet(dDefault)),
      "resume-after-kill diverged from the one-shot export")
    assert(r2.n_curated === r1.n_curated && r2.n_sampled === r1.n_sampled &&
      r2.n_rows_written === r1.n_rows_written &&
      r2.n_tokens_written === r1.n_tokens_written,
      s"resumed report diverged: $r2 vs $r1")

    // the FINGERPRINT gate: re-using the stageDir under a CHANGED export
    // shape must refuse loudly instead of resuming stale _DONE stages —
    // here a different chunk geometry (every varied param takes this
    // same path through the one fingerprint string)
    val fp = intercept[RuntimeException] {
      TrainingExport.export(docs, "text", "doc_id", tmp("graft-texport-fp"),
        nShards = 4, evalSet = Some(evalSet), mixture = Some(mixture),
        chunk = Some(TrainingExport.Chunk(64, 48)), stageDir = Some(stages))
    }
    assert(fp.getMessage.contains("DIFFERENT export config"),
      s"config drift must refuse the stageDir: ${fp.getMessage}")
    // exportCurated over the same stageDir is a different pipeline shape
    // (curation upstream) — refused for the same reason
    val fp2 = intercept[RuntimeException] {
      TrainingExport.exportCurated(docs, "text", "doc_id",
        tmp("graft-texport-fp2"), nShards = 4, evalSet = Some(evalSet),
        mixture = Some(mixture), chunk = Some(chunk), stageDir = Some(stages))
    }
    assert(fp2.getMessage.contains("DIFFERENT export config"))

    // a pre-fingerprint stageDir (completed stages, no _FINGERPRINT —
    // an upgraded deployment's leftover) must refuse too: silently
    // adopting the current config's fingerprint would resume stages
    // nobody can prove match it
    new java.io.File(s"$stages/_FINGERPRINT").delete()
    val orphan = intercept[RuntimeException] {
      TrainingExport.export(docs, "text", "doc_id",
        tmp("graft-texport-fp3"), nShards = 4, evalSet = Some(evalSet),
        mixture = Some(mixture), chunk = Some(chunk), stageDir = Some(stages))
    }
    assert(orphan.getMessage.contains("no _FINGERPRINT"),
      s"orphaned stages must refuse: ${orphan.getMessage}")
  }

  test("fingerprint covers eval-set CONTENT: a changed eval set refuses to resume; same content in any order resumes") {
    // r16 verdict's stale-resume hole: `eval=true` matched any eval set,
    // so a CHANGED set under an unchanged config silently resumed the
    // staged `clean` stage (decontaminated against the OLD set) and
    // shipped contaminated shards. The identity is count + an order-free
    // text-hash fold, so this must now refuse loudly...
    val stages = tmp("graft-texport-evalfp")
    TrainingExport.export(docs, "text", "doc_id",
      tmp("graft-texport-evalfp-out"), nShards = 4, evalSet = Some(evalSet),
      chunk = Some(chunk), stageDir = Some(stages))
    val changed = intercept[RuntimeException] {
      TrainingExport.export(docs, "text", "doc_id",
        tmp("graft-texport-evalfp-out2"), nShards = 4,
        evalSet = Some(docs.filter(col("doc_id") % 89 === 0)
          .withColumn("doc_id", col("doc_id") + lit(800000L))),
        chunk = Some(chunk), stageDir = Some(stages))
    }
    assert(changed.getMessage.contains("DIFFERENT export config"),
      s"a changed eval set must refuse the stale stageDir: ${changed.getMessage}")
    // ...while the SAME content re-ordered/re-partitioned (and even
    // re-keyed: decontamination matches on text, ids don't bind) resumes
    // — the identity is order-free by construction
    val sameContent = evalSet.orderBy(col("text"))
      .withColumn("doc_id", col("doc_id") + lit(5L)).repartition(7)
    val r = TrainingExport.export(docs, "text", "doc_id",
      tmp("graft-texport-evalfp-out3"), nShards = 4,
      evalSet = Some(sameContent), chunk = Some(chunk),
      stageDir = Some(stages))
    assert(r.n_rows_written > 0,
      "identical eval content must resume the staged stages")
  }

  test("optional stages off: export is curate → whole-doc rows → shards, and re-runs byte-stable") {
    val d1 = tmp("graft-texport-min")
    val r1 = TrainingExport.export(docs, "text", "doc_id", d1, nShards = 2)
    assert(r1.n_curated === r1.n_decontaminated &&
      r1.n_decontaminated === r1.n_sampled,
      s"pass-through stages must not drop rows: $r1")
    assert(r1.n_rows_written === r1.n_sampled,
      "whole-doc export writes one row per surviving doc")
    val got = spark.read.parquet(d1)
    // whole-doc rows carry the doc id as sample id and chunk_id = 1
    assert(got.filter(col("sample_id") =!= col("doc_id").cast("string") ||
      col("chunk_id") =!= 1L).count() === 0)
    // determinism: a second export has identical membership AND layout
    val d2 = tmp("graft-texport-min2")
    TrainingExport.export(docs, "text", "doc_id", d2, nShards = 2)
    assert(rowBag(spark.read.parquet(d2)) === rowBag(got),
      "re-running the export must be byte-stable membership and layout")
  }
}
