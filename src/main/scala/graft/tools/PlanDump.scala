package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev utility: write `.explain("formatted")` output (plus the post-AQE
  * executed plan) for declared queries to `plans/<dir>/<query>_<tag>.txt`
  * — the optimization rounds' before/after plan evidence.
  *
  *   runMain graft.tools.PlanDump r17 before q_topk q_curate ...
  *
  * Session config mirrors [[graft.Bench]] (same master/shuffle partitions
  * from SPARK_GRAFT_CPUS, same extensions), data dir from
  * SPARK_GRAFT_SF_DIR, so the dumped plan is the one the bench times.
  * Pseudo-entries for the bench-only composites are supported by name
  * (`pipeline_curate`).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <dir> <tag> <query>...")
    val (dir, tag, queries) = (args(0), args(1), args.drop(2).toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(s"plans/$dir"))
    def frame(name: String): DataFrame = name match {
      case "pipeline_curate" =>
        graft.operators.Curation.curate(
          graft.sources.Tables.Fixture(spark, sfDir).documents, "text", "doc_id")
      case q => graft.SparkEntry.queries(q)(spark, sfDir)
    }
    for (q <- queries) {
      val df = frame(q)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      df.count() // force execution so the executed plan below is post-AQE
      val executed = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      Files.writeString(Paths.get(s"plans/$dir/${q}_$tag.txt"),
        s"== explain(formatted), $sfDir ==\n$formatted\n" +
          s"== executed plan (post-AQE final) ==\n$executed")
      println(s"[plandump] wrote plans/$dir/${q}_$tag.txt")
    }
    spark.stop()
  }
}
