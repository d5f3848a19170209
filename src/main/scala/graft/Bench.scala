package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query plus the end-to-end curation
  * pipeline at `SPARK_GRAFT_SF_DIR`, printing ONE JSON line.
  *
  * Each entry runs `SPARK_GRAFT_BENCH_RUNS` times (default 3) and records
  * the MEDIAN, after a global untimed warmup — single-run numbers on a
  * shared machine swing ±30% with ambient load, which made regressions
  * unattributable (a 0.35 s query once read 1.07 s purely from
  * interleaving). The headline total is the sum of medians.
  */
object Bench {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT the scan/shuffle/codegen paths and cache parquet
    // footers so the first timed query isn't charged for session cold-start.
    try {
      graft.sources.Tables.names.foreach(n =>
        graft.sources.Tables.loadNormalized(spark, sfDir, n).count())
      SparkEntry.queries.get("q_group_count").foreach(_(spark, sfDir).count())
    } catch { case _: Throwable => () }

    // optional comma-separated allowlist for local iteration (unset = all)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val allEntries: Seq[(String, () => Unit)] =
      SparkEntry.queries.toSeq.map { case (name, fn) =>
        name -> (() => { fn(spark, sfDir).count(); () })
      } :+ ("pipeline_curate" -> (() => {
        // the [NS] flagship composition: lang -> quality -> exact dedup ->
        // near dedup (LSH + connected components), end-to-end
        graft.operators.Curation.curate(
          graft.sources.Tables.Fixture(spark, sfDir).documents,
          "text", "doc_id").count()
        ()
      }))
    val entries = only.fold(allEntries)(o => allEntries.filter(e => o(e._1)))

    val results = entries.map { case (name, thunk) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { thunk(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      }
      name -> (if (times.exists(_ < 0)) -1.0 else median(times))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
