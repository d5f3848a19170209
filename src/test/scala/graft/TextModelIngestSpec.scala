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

  test("probing a missing store fails loudly, not with silent zeros") {
    val root = tmp("graft-tmodel-missing")
    val e = intercept[RuntimeException] {
      TextModelIngest.dsirProbe(spark, root, docs, "text", "doc_id")
    }
    assert(e.getMessage.contains("no text-model store"))
  }
}
