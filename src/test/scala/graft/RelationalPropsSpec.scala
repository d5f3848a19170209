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
    val inter = SetOps.intersect(ia, ib).collect().map(_.getLong(0)).toSet
    // membership, not cardinality: an always-empty intersect must FAIL
    val (sa, sb) = (ia.collect().map(_.getLong(0)).toSet,
      ib.collect().map(_.getLong(0)).toSet)
    assert(inter === (sa & sb))
    assert(inter.nonEmpty, "fixture click/error users must overlap")
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
    // legitimately empty at sf0.001 (verified by an exhaustive dump scan;
    // every one yields rows at sf0.01, where the oracle hash-checks it):
    // Q7's nation-pair x date slice, Q11's value-share HAVING cut, and
    // the q_phrase literal all find no match in the 500-doc fixture
    val emptyOk = Set("q_sql_q7", "q_sql_q11", "q_phrase")
    SparkEntry.allSpecs.foreach { q =>
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty, s"${q.name}: no columns")
      val n = df.count()
      assert(n > 0 || emptyOk(q.name),
        s"${q.name}: declared query degenerated to zero rows")
    }
  }

  test("semantic decontam algebra: threshold anti-monotone, eval-growth monotone, paths agree on random data") {
    import spark.implicits._
    // deterministic pseudo-random vectors (no RNG — md5-derived), wider
    // coverage than the fixture's geometry alone
    def vec(seed: Int, d: Int): Array[Float] = Array.tabulate(d) { i =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed,$i".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(6)
      (Integer.parseInt(hex, 16) % 2001 - 1000) / 1000.0f
    }
    val corpus = (0 until 60).map(i => (i.toLong, vec(i, 16))).toDF("vec_id", "embedding")
    val evalSm = (100 until 104).map(i => (i.toLong, vec(i, 16))).toDF("vec_id", "embedding")
    val evalLg = (100 until 110).map(i => (i.toLong, vec(i, 16))).toDF("vec_id", "embedding")
    def run(eval: org.apache.spark.sql.DataFrame, tau: Int) =
      graft.operators.Curation.decontaminateSemantic(corpus, eval, "vec_id", "embedding", tau)
        .collect().map(r => r.getLong(0) -> (r.getAs[Long]("max_sim_x100"), r.getAs[Long]("contaminated"))).toMap
    val lo = run(evalSm, 10); val hi = run(evalSm, 60)
    // a regressed-to-empty operator would pass every forall below vacuously
    assert(lo.size === corpus.count(), "one output row per corpus vector")
    // same eval set => identical sims; raising the threshold can only unflag
    assert(lo.keySet === hi.keySet && lo.forall { case (k, (s, _)) => hi(k)._1 == s })
    assert(hi.count(_._2._2 == 1L) <= lo.count(_._2._2 == 1L))
    assert(hi.forall { case (k, (_, c)) => c == 0L || lo(k)._2 == 1L })
    // growing the eval set can only raise each doc's max similarity
    val grown = run(evalLg, 10)
    assert(lo.forall { case (k, (s, _)) => grown(k)._1 >= s })
    // literal and broadcast-join carriers agree on this data too
    val joined = graft.operators.Curation
      .decontaminateSemanticJoin(corpus, evalSm, "vec_id", "embedding", 10)
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("max_sim_x100"), r.getAs[Long]("contaminated"))).toMap
    assert(joined === lo)
  }

  test("multi-assignment algebra: wider margin only ADDS cells/buckets, never moves the home") {
    import spark.implicits._
    val emb = Fixture(spark, sfDir).embeddings
    def cellsAt(eps: Double): Map[Long, Set[Int]] =
      graft.operators.Similarity.assignCellsMulti(
          graft.operators.Similarity.withUnit(emb, "embedding")
            .select(col("vec_id"), col("__u")), "__u",
          graft.operators.Similarity.kmeansCentroids(
            graft.operators.Similarity.withUnit(emb, "embedding")
              .select(col("vec_id"), col("__u")), "vec_id", "__u", 8),
          eps)
        .select("vec_id", "cell").as[(Long, Int)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val narrow = cellsAt(0.05); val wide = cellsAt(0.15)
    assert(narrow.nonEmpty, "assignments must exist (empty forall is vacuous)")
    assert(narrow.forall { case (id, s) => s.subsetOf(wide(id)) },
      "widening eps must be monotone: every narrow assignment survives")
    assert(wide.values.map(_.size).sum > narrow.values.map(_.size).sum,
      "the wider margin must actually add assignments on this fixture")
    def bucketsAt(eps: Double): Map[Long, Set[Long]] =
      graft.operators.Similarity.lshBucketsMulti(emb, "embedding", 4, eps)
        .select("vec_id", "bucket").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val bn = bucketsAt(0.03); val bw = bucketsAt(0.12)
    assert(bn.nonEmpty)
    assert(bn.forall { case (id, s) => s.subsetOf(bw(id)) })
    assert(bw.values.map(_.size).sum > bn.values.map(_.size).sum)
  }

  test("oracle coverage: every declared SURVEY §2 query has its oracle") {
    val withOracle = SparkEntry.oracleSql.keySet
    val all = SparkEntry.queries.keySet
    val noOracleAllowed = // approx / not-SQL-expressible by design
      Set("q_ann_lsh", "q_ann_ivf", "q_ann_lsh_mp", "q_ann_pq",
        "q_decontam_bloom", "q_semantic_dedup", "q_semantic_dedup_incr")
    assert(all -- withOracle === noOracleAllowed)
  }
}
