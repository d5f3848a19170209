package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: print the final (post-AQE) physical plan of declared
  * queries — `runMain graft.PlanPeek q_a q_b ...`. The same rendering the
  * PlanAuditSpec pins assert against, for iterating on plan shape before
  * writing the pin.
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.collect()
      println(s"======== $q ========")
      println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head)
    }
  }
}
