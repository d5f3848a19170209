package graft

import org.apache.spark.sql.functions._

/** Contracts for the native `graft_dot` Catalyst expression
  * ([[graft.expressions.DotProduct]]): bit-parity with the HOF fold it
  * replaces, null semantics mirroring `zip_with`+`aggregate`, SQL-surface
  * resolution through [[GraftExtensions]], and codegen execution.
  */
class DotProductSpec extends SparkTestBase {
  import spark.implicits._

  test("graft_dot is bit-identical to the HOF fold on fixture embeddings") {
    val emb = graft.sources.Tables.Fixture(spark, sfDir).embeddings
    val next = emb.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("emb_b"))
    val pairs = emb.join(next, Seq("vec_id"))
    val mismatches = pairs.withColumn("nat", call_function("graft_dot", col("embedding"), col("emb_b")))
      .withColumn("hof", expr("aggregate(zip_with(embedding, emb_b, " +
        "(x, y) -> cast(x as double) * cast(y as double)), 0d, (acc, v) -> acc + v)"))
      // bit-exact double comparison, not approximate
      .filter(col("nat") =!= col("hof"))
      .count()
    assert(mismatches === 0L, "sequential fold order must match exactly")
  }

  test("null semantics mirror zip_with+aggregate: null array, length mismatch, null element") {
    val r = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS ok,
        |  graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS null_arr,
        |  graft_dot(array(1.0D), array(1.0D, 2.0D)) AS len_mismatch,
        |  graft_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS null_elem
        |""".stripMargin).collect().head
    assert(r.getDouble(0) === 11.0)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("mixed float/double arrays work (literal centroids vs float embeddings)") {
    val out = Seq((Array(1.0f, 2.0f), Array(0.5, 0.25)))
      .toDF("f", "d")
      .select(call_function("graft_dot", col("f"), col("d")).as("s"))
      .collect().head.getDouble(0)
    assert(out === 1.0)
  }

  test("executes inside whole-stage codegen (no interpreted fallback)") {
    val emb = graft.sources.Tables.Fixture(spark, sfDir).embeddings
    val df = emb.select(call_function("graft_dot", col("embedding"), col("embedding")).as("s"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_dot"), plan)
    assert(plan.contains("*("), s"projection with graft_dot must be codegen'd:\n$plan")
  }
}
