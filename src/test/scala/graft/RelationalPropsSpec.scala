package graft

import org.apache.spark.sql.functions._
import graft.operators.{Aggregates, Search, SetOps}
import graft.sources.Tables.Fixture

/** Cheap algebraic properties over the sf0.001 fixtures (SURVEY §5c), plus
  * a smoke that every declared query materializes rows on the smallest sf.
  */
class RelationalPropsSpec extends SparkTestBase {

  private lazy val f = Fixture(spark, sfDir)

  test("filter result is a subset of the unfiltered scan") {
    val all = f.events.count()
    val some = Search.dynamicFilter(f.events, Map("event_type" -> "click")).count()
    assert(some > 0 && some < all)
  }

  test("topK(100) rows all appear in the full descending sort's head") {
    val top = Search.search(f.events, Map.empty, "ts", "event_id", 100)
      .select("event_id").collect().map(_.getLong(0)).toSeq
    val full = f.events.orderBy(desc("ts"), desc("event_id"))
      .select("event_id").limit(100).collect().map(_.getLong(0)).toSeq
    assert(top === full)
  }

  test("union cardinality = sum of parts; intersect ⊆ each side") {
    val a = f.events.filter(col("event_type") === "click").select("event_id")
    val b = f.events.filter(col("event_type") === "view").select("event_id")
    assert(SetOps.unionAll(a, b).count() === a.count() + b.count())
    val ia = f.events.filter(col("event_type") === "click").select("user_id")
    val ib = f.events.filter(col("event_type") === "error").select("user_id")
    val inter = SetOps.intersect(ia, ib).count()
    assert(inter <= ia.distinct().count() && inter <= ib.distinct().count())
  }

  test("rollup grand total equals ungrouped sum") {
    val rolled = Aggregates.rollupSum(f.lineitem, "l_returnflag", "l_linestatus", "l_quantity")
      .filter(col("l_returnflag").isNull && col("l_linestatus").isNull)
      .select("sum_v").collect().head.getDouble(0)
    val direct = f.lineitem.agg(round(sum("l_quantity"), 2)).collect().head.getDouble(0)
    assert(rolled === direct)
  }

  test("entry flagship returns rows (driver t1 smoke shape)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and yields a non-degenerate schema at sf0.001") {
    SparkEntry.allSpecs.foreach { q =>
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty, s"${q.name}: no columns")
      df.count() // must execute without throwing
    }
  }

  test("oracle coverage: every declared SURVEY §2 query has its oracle") {
    val withOracle = SparkEntry.oracleSql.keySet
    val all = SparkEntry.queries.keySet
    val noOracleAllowed = // approx / not-SQL-expressible by design
      Set("q_ann_lsh", "q_ann_ivf", "q_ann_lsh_mp", "q_ann_pq",
        "q_decontam_bloom", "q_semantic_dedup")
    assert(all -- withOracle === noOracleAllowed)
  }
}
