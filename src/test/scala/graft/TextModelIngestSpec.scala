package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Curation, TextAnalysis}
import graft.sources.Tables.Fixture
import graft.streaming.TextModelIngest

/** The persisted text-model story: DSIR / tagger / LM counts maintained
  * per ingest batch must yield probes EQUAL to the in-query retrained
  * forms — the additive-counts argument, pinned end to end — and the
  * batch-keyed overwrite must make replay exactly-once (double-counted
  * counts would silently bias every weight).
  */
class TextModelIngestSpec extends SparkTestBase {

  private def tmp(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p.toString
  }

  private def docs: DataFrame = Fixture(spark, sfDir).documents

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  private def ingest(root: String, nBatches: Int): Unit =
    (0 until nBatches).foreach { i =>
      TextModelIngest.processBatch(spark,
        docs.filter(col("doc_id") % nBatches === i), root,
        "text", "doc_id", col("lang") === "en", "lang", i.toLong)
    }

  test("probes over a 3-batch store equal the in-query retrained forms") {
    val root = tmp("graft-tmodel")
    ingest(root, 3)
    assert(rows(TextModelIngest.dsirProbe(spark, root, docs, "text", "doc_id"))
      === rows(Curation.dsirScore(docs, "text", "doc_id", col("lang") === "en")),
      "dsir probe diverged from in-query")
    assert(rows(TextModelIngest.taggerProbe(spark, root, docs, "text", "doc_id"))
      === rows(Curation.hashedTagger(docs, "text", "doc_id", "lang")),
      "tagger probe diverged from in-query")
    assert(rows(TextModelIngest.lmProbe(spark, root, docs, "text", "doc_id"))
      === rows(TextAnalysis.lmScore(docs, "text", "doc_id")),
      "lm probe diverged from in-query")
    assert(rows(TextModelIngest.qualityEnsembleProbe(spark, root, docs,
        "text", "doc_id", minLmX100k = 3386L, minDsir = -538L))
      === rows(Curation.qualityEnsemble(docs, "text", "doc_id",
        col("lang") === "en", minLmX100k = 3386L, minDsir = -538L)),
      "ensemble probe diverged from in-query")
  }

  test("replayed batch overwrites its partition — counts never double") {
    val root = tmp("graft-tmodel-replay")
    ingest(root, 2)
    val before = rows(TextModelIngest.dsirProbe(spark, root, docs, "text", "doc_id")) ->
      rows(TextModelIngest.lmProbe(spark, root, docs, "text", "doc_id"))
    // crash-replay batch 1: same data, same epoch id
    TextModelIngest.processBatch(spark,
      docs.filter(col("doc_id") % 2 === 1), root,
      "text", "doc_id", col("lang") === "en", "lang", 1L)
    val after = rows(TextModelIngest.dsirProbe(spark, root, docs, "text", "doc_id")) ->
      rows(TextModelIngest.lmProbe(spark, root, docs, "text", "doc_id"))
    assert(after === before, "replay double-counted the model store")
  }

  test("compaction folds batches without changing any probe") {
    val root = tmp("graft-tmodel-compact")
    ingest(root, 3)
    val before = Seq(
      rows(TextModelIngest.dsirProbe(spark, root, docs, "text", "doc_id")),
      rows(TextModelIngest.taggerProbe(spark, root, docs, "text", "doc_id")),
      rows(TextModelIngest.lmProbe(spark, root, docs, "text", "doc_id")))
    TextModelIngest.compactStores(spark, root, upToBatch = 2L)
    val after = Seq(
      rows(TextModelIngest.dsirProbe(spark, root, docs, "text", "doc_id")),
      rows(TextModelIngest.taggerProbe(spark, root, docs, "text", "doc_id")),
      rows(TextModelIngest.lmProbe(spark, root, docs, "text", "doc_id")))
    assert(after === before, "compaction changed a probe result")
  }

  test("dsir/tagger probes score joinless — stored weights ride as literals into the scan") {
    val root = tmp("graft-tmodel-plan")
    ingest(root, 1)
    Seq(
      TextModelIngest.dsirProbe(spark, root, docs, "text", "doc_id"),
      TextModelIngest.taggerProbe(spark, root, docs, "text", "doc_id")
    ).foreach { df =>
      df.collect()
      val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      // the store read + sum happens eagerly (driver collect of a
      // KB-scale table); the RETURNED scoring plan must match the
      // in-query form's pinned shape: no join, no keyed shuffle
      assert(!fin.contains("Join"), s"probe scoring must not join:\n$fin")
      assert(!fin.contains("hashpartitioning") && !fin.contains("rangepartitioning"),
        s"probe scoring must be a narrow per-row fold:\n$fin")
    }
  }

  test("streaming run(): file-discovered micro-batches converge to the in-query model") {
    // two files → two AvailableNow micro-batches; after the stream drains,
    // every probe must equal the in-query form over the full corpus —
    // the additive-counts claim through the real streaming entry point
    val root = tmp("graft-tmodel-stream")
    val inDir = tmp("graft-tmodel-in")
    val cp = tmp("graft-tmodel-cp")
    val base = docs.localCheckpoint(true)
    val schema = base.schema
    def landFile(df: DataFrame, name: String, mtime: Long): Unit = {
      val stage = tmp(s"graft-tmstage-$name")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      val dst = java.nio.file.Paths.get(inDir, s"$name.parquet")
      Files.move(part, dst)
      dst.toFile.setLastModified(mtime)
    }
    val t0 = System.currentTimeMillis() - 60000
    landFile(base.filter(col("doc_id") % 2 === 0), "f0", t0)
    landFile(base.filter(col("doc_id") % 2 === 1), "f1", t0 + 10000)
    val q = TextModelIngest.run(spark, inDir, root, schema, "text", "doc_id",
      col("lang") === "en", "lang", cp, maxFilesPerTrigger = 1)
    q.awaitTermination()
    assert(rows(TextModelIngest.lmProbe(spark, root, docs, "text", "doc_id"))
      === rows(TextAnalysis.lmScore(docs, "text", "doc_id")),
      "streamed lm store diverged from in-query")
    assert(rows(TextModelIngest.dsirProbe(spark, root, docs, "text", "doc_id"))
      === rows(Curation.dsirScore(docs, "text", "doc_id", col("lang") === "en")),
      "streamed dsir store diverged from in-query")
  }

  test("config is persisted with the store; mismatched batches and probes are refused") {
    val root = tmp("graft-tmodel-cfg")
    ingest(root, 1)
    assert(TextModelIngest.storedConfig(spark, root)
      === Some(TextModelIngest.Config()))
    // a later batch under different buckets would silently corrupt every
    // weight (counts binned under two moduli) — must be a loud error
    val e1 = intercept[IllegalArgumentException] {
      TextModelIngest.processBatch(spark, docs, root, "text", "doc_id",
        col("lang") === "en", "lang", 9L, TextModelIngest.Config(buckets = 512))
    }
    assert(e1.getMessage.contains("written with"))
    // and so would a probe scoring under a different bucket count
    val e2 = intercept[IllegalArgumentException] {
      TextModelIngest.dsirProbe(spark, root, docs, "text", "doc_id",
        TextModelIngest.Config(buckets = 512))
    }
    assert(e2.getMessage.contains("written with"))
  }

  test("probing a missing store fails loudly, not with silent zeros") {
    val root = tmp("graft-tmodel-missing")
    val e = intercept[RuntimeException] {
      TextModelIngest.dsirProbe(spark, root, docs, "text", "doc_id")
    }
    assert(e.getMessage.contains("no text-model store"))
    val e2 = intercept[RuntimeException] {
      TextModelIngest.bpeEncodeProbe(spark, root, docs, "text", "doc_id")
    }
    assert(e2.getMessage.contains("no text-model store"))
  }

  test("drift probe: batch-vs-stored-corpus rates equal the in-query corpusDrift exactly") {
    val root = tmp("graft-tmodel-drift")
    ingest(root, 3)
    val batch = docs.filter(col("doc_id") % 7 === 0)
      .withColumn("text", concat(col("text"), lit(" driftmarker driftmarker")))
    val probe = TextModelIngest.driftProbe(spark, root, batch, "text")
    val inQuery = TextAnalysis.corpusDrift(batch, docs, "text")
    // rate/drift columns (and therefore the top-k bucket selection) must
    // match the in-query form bit-for-bit — the stored rc counts ARE the
    // corpus side's bucket counts
    val pr = rows(probe.select("bkt", "rate_a_pm", "rate_b_pm", "drift_pm"))
    val iq = rows(inQuery.select("bkt", "rate_a_pm", "rate_b_pm", "drift_pm"))
    assert(pr === iq, "drift probe rates diverged from in-query corpusDrift")
    // example tokens draw from the BATCH (documented difference): every
    // emitted example must actually occur in the batch's token stream
    val batchToks = TextAnalysis.tokenRows(batch, "text", "doc_id")
      .select("tok").collect().map(_.getString(0)).toSet
    probe.select("example_token").collect().map(_.getString(0))
      .filter(_ != null)
      .foreach(t => assert(batchToks.contains(t), s"example $t not in batch"))
    // the planted marker should surface as a top-drift bucket's example
    assert(probe.collect().exists(r => r.getString(1) == "driftmarker"),
      "planted drift marker not surfaced")
  }

  test("stored BPE merges round-trip; encode probe equals the in-query trained encode") {
    val root = tmp("graft-tmodel-bpe")
    val trained = TextAnalysis.bpeTrain(docs, "text", iterations = 6)
    TextModelIngest.bpeTrainStore(spark, docs, root, "text", "doc_id",
      iterations = 6)
    assert(TextModelIngest.readBpeMerges(spark, root) === trained,
      "stored merge list diverged from an in-memory train over the same corpus")
    val probe = TextModelIngest.bpeEncodeProbe(spark, root, docs, "text", "doc_id")
      .orderBy("doc_id")
    val inQuery = TextAnalysis.bpeEncode(docs, "text", "doc_id", trained)
      .orderBy("doc_id")
    assert(rows(probe) === rows(inQuery),
      "bpeEncodeProbe diverged from bpeEncode under the same merges")
    // re-running the train job rewrites identical content (idempotent)
    TextModelIngest.bpeTrainStore(spark, docs, root, "text", "doc_id",
      iterations = 6)
    assert(TextModelIngest.readBpeMerges(spark, root) === trained)
  }
}
