package graft

import graft.operators.Similarity
import graft.sources.Tables.Fixture

/** Similarity-search contracts: exact cosine on hand vectors, and recall of
  * the approximate tiers against the exact baseline on the sf0.001 fixture.
  */
class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("cosineTopK: hand-checked vectors rank by cosine, not magnitude") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(100.0f, 0.1f, 0.0f)), // nearly parallel to q, big magnitude
      (2L, Array(0.7f, 0.7f, 0.0f)), // 45 degrees
      (3L, Array(0.0f, 1.0f, 0.0f)), // orthogonal
      (4L, Array(-1.0f, 0.0f, 0.0f))) // opposite
      .toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(emb, "vec_id", "embedding", queryId = 0L, k = 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(top === Seq(1L, 2L, 3L, 4L))
    val sims = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 4)
      .select("sim_x100").as[Long].collect().toSeq
    assert(sims.head === 99L) // cos ≈ 0.999999 → floor(x*100) = 99
    assert(sims(2) === 0L) // orthogonal
    assert(sims(3) === -100L) // opposite
  }

  test("blockedNearDup only pairs within a block and respects the threshold") {
    val emb = Seq(
      (0, 0L, Array(1.0f, 0.0f)), (0, 1L, Array(0.99f, 0.1f)), (0, 2L, Array(0.0f, 1.0f)),
      (1, 3L, Array(1.0f, 0.0f)), (1, 4L, Array(1.0f, 0.01f)))
      .toDF("label", "vec_id", "embedding")
    val pairs = Similarity.blockedNearDup(emb, "label", "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L), (3L, 4L))) // cross-label (0,3) etc. never scored
  }

  test("ANN recall vs exact top-10 on fixture embeddings") {
    val emb = Fixture(spark, sfDir).embeddings
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    val ivf = Similarity.annIvf(emb, "vec_id", "embedding", 0L, 10, nlist = 16, nprobe = 8)
      .select("vec_id").as[Long].collect().toSet
    val lsh = Similarity.annLsh(emb, "vec_id", "embedding", 0L, 10, planes = 2)
      .select("vec_id").as[Long].collect().toSet
    // approximate tiers trade recall for scan fraction; k-means cells with
    // half the table probed must recover well over half the true top-10
    assert(ivf.intersect(exact).size >= 6, s"IVF recall too low: ${ivf.intersect(exact).size}/10")
    assert(lsh.intersect(exact).size >= 3, s"LSH recall too low: ${lsh.intersect(exact).size}/10")
    // PQ: 4-byte codes + ADC over everything, exact rerank of top-100 —
    // near-random fixture vectors are PQ's worst case, so the pin is modest
    val pq = Similarity.annPq(emb, "vec_id", "embedding", 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(pq.intersect(exact).size >= 5, s"PQ recall too low: ${pq.intersect(exact).size}/10")
  }

  test("semantic near-dup: sound on cosine, high recall on planted near-dups") {
    // deterministic subset by id, NOT limit(): an unordered limit can pick
    // different rows each time the plan branch is evaluated
    val emb = Fixture(spark, sfDir).embeddings.filter($"vec_id" < 200)
    // plant a near-dup of every vector: scaled 1.5x — different bytes and
    // magnitude, identical direction (cosine 1 up to f32 rounding). On
    // this near-RANDOM fixture the cell margins are thin (distances
    // concentrate in high-d), so a semantically-perturbed dup can
    // legitimately straddle a cell; the scaled copy isolates the
    // operator's contract from the fixture's adversarial geometry.
    val planted = emb.selectExpr(
      "vec_id + 1000000 AS vec_id",
      "transform(embedding, v -> CAST(v * 1.5 AS FLOAT)) AS embedding",
      "label")
    val corpus = emb.unionByName(planted)
    val pairs = Similarity.semanticNearDup(corpus, "vec_id", "embedding",
        nlist = 8, minCosine = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // soundness: every emitted pair really is >= 0.95 cosine (exact check
    // against the brute-force blocked pass over a single shared block)
    val brute = Similarity.blockedNearDup(
        corpus.withColumn("one", org.apache.spark.sql.functions.lit(1)),
        "one", "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.subsetOf(brute), s"unsound pairs: ${pairs.diff(brute).take(5)}")
    // recall: the planted (v, 1.5v') pairs are near-cosine-1; identical
    // directions land in the same k-means cell, so nearly all must be found
    val plantedPairs = (0 until 200).map(i => (i.toLong, i + 1000000L)).toSet
    val found = pairs.intersect(plantedPairs)
    assert(found.size >= 195, s"recall too low: ${found.size}/200")
  }

  test("PQ tolerates zero-norm embeddings in the corpus") {
    // a zero vector has no direction: it must be silently excluded, not
    // poison the k-means fold (NaN scores -> cell -1 -> driver AIOOBE)
    val emb = Fixture(spark, sfDir).embeddings
    val dims = emb.selectExpr("size(embedding) AS d").head().getInt(0)
    val poisoned = emb.unionByName(
      spark.range(900000L, 900005L).selectExpr(
        "id AS vec_id",
        s"transform(sequence(1, $dims), x -> CAST(0.0 AS FLOAT)) AS embedding",
        "CAST(id % 5 AS INT) AS label"))
    val clean = Similarity.annPq(emb, "vec_id", "embedding", 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    val withZeros = Similarity.annPq(poisoned, "vec_id", "embedding", 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(withZeros === clean, "zero-norm rows must not change the answer")
  }

  test("query-directed multi-probe: full budget recovers exact; budgeted beats single-probe") {
    val emb = Fixture(spark, sfDir).embeddings
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    // probing every bucket is a full scan — the probe/rerank machinery must
    // then degenerate to the exact answer
    val full = Similarity.annLshMultiProbe(emb, "vec_id", "embedding", 0L, 10,
        planes = 4, probeBuckets = 16)
      .select("vec_id").as[Long].collect().toSet
    assert(full === exact, s"full probe budget must be exact, missed ${exact -- full}")
    // at the Hamming-1 scan budget (planes+1 buckets), cost-ordered probing
    // must do at least as well as the single-probe tier
    val mp = Similarity.annLshMultiProbe(emb, "vec_id", "embedding", 0L, 10, planes = 4)
      .select("vec_id").as[Long].collect().toSet
    val sp = Similarity.annLsh(emb, "vec_id", "embedding", 0L, 10, planes = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(mp.intersect(exact).size >= sp.intersect(exact).size,
      s"directed probing must not lose to single-probe: mp=${mp.intersect(exact).size} sp=${sp.intersect(exact).size}")
    // the DECLARED q_ann_lsh configuration (T=4 of 16 buckets) must hold a
    // usable recall floor — the whole point of retiring the single-probe
    // baseline from the declared set (recall 0.1 two rounds running)
    val declared = Similarity.annLshMultiProbe(emb, "vec_id", "embedding", 0L, 10,
        planes = 4, probeBuckets = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(declared.intersect(exact).size >= 5,
      s"declared T=4 budget recall too low: ${declared.intersect(exact).size}/10")
  }

  test("lshBuckets: bucket ids deterministic and bounded by plane count") {
    val emb = Fixture(spark, sfDir).embeddings
    val b1 = Similarity.lshBuckets(emb, "embedding", 4).select("vec_id", "bucket")
      .as[(Long, Long)].collect().toMap
    val b2 = Similarity.lshBuckets(emb, "embedding", 4).select("vec_id", "bucket")
      .as[(Long, Long)].collect().toMap
    assert(b1 === b2, "same vectors must always hash to the same buckets")
    assert(b1.values.forall(b => b >= 0 && b < 16))
    assert(b1.values.toSet.size > 1, "4 planes should split 500 vectors into >1 bucket")
  }

  test("lshBucketsMulti: eps=0 reproduces single-assignment; spill adds ≤1 one-bit-away bucket") {
    val emb = Fixture(spark, sfDir).embeddings
    val single = Similarity.lshBuckets(emb, "embedding", 4)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    val zero = Similarity.lshBucketsMulti(emb, "embedding", 4, eps = 0.0)
      .select("vec_id", "bucket").as[(Long, Long)].collect()
    assert(zero.toMap === single && zero.length === single.size,
      "eps=0 must assign exactly the single bucket")
    val multi = Similarity.lshBucketsMulti(emb, "embedding", 4, eps = 0.1)
      .select("vec_id", "bucket").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(multi.values.forall(s => s.size <= 2), "replication must be bounded at 2")
    assert(multi.forall { case (id, s) => s.contains(single(id)) },
      "the home bucket is always assigned")
    assert(multi.forall { case (_, s) =>
      s.size == 1 || java.lang.Long.bitCount(s.toSeq(0) ^ s.toSeq(1)) == 1
    }, "a spilled bucket differs from home by exactly one plane bit")
    assert(multi.values.exists(_.size == 2), "eps=0.1 should spill SOME boundary vectors")
  }

  test("annLshProbe over a bucket-partitioned store equals in-query multi-probe; scan prunes") {
    val emb = Fixture(spark, sfDir).embeddings
    val dir = java.nio.file.Files.createTempDirectory("graft-annlsh-store").toString
    Similarity.lshBuckets(emb, "embedding", 4)
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
    val stored = spark.read.parquet(dir)
    val q = emb.filter($"vec_id" === 0L)
      .select($"embedding").head().getSeq[Float](0).toArray
    val probeDf = Similarity.annLshProbe(stored, q, "vec_id", "embedding",
      excludeId = 0L, k = 10, planes = 4, probeBuckets = 4)
    val probe = probeDf.collect().map(_.toSeq).toSeq
    val inQuery = Similarity.annLshMultiProbe(emb, "vec_id", "embedding",
        queryId = 0L, k = 10, planes = 4, probeBuckets = 4)
      .collect().map(_.toSeq).toSeq
    assert(probe === inQuery, "stored-layout probe must answer exactly the in-query multi-probe")
    // bucket filter must reach the scan as a partition filter (T of 2^planes read)
    val plan = probeDf.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"bucket must prune as a partition filter:\n$plan")
  }

  test("assignCellsMulti: home cell matches cosine argmax; replication bounded; eps grows coverage monotonically") {
    val emb = Fixture(spark, sfDir).embeddings
    val unit = Similarity.withUnit(emb, "embedding").select($"vec_id", $"__u")
    val cents = Similarity.kmeansCentroids(unit, "vec_id", "__u", 8)
    def cellsAt(eps: Double): Map[Long, Set[Int]] =
      Similarity.assignCellsMulti(unit, "__u", cents, eps)
        .select("vec_id", "cell").as[(Long, Int)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val tight = cellsAt(0.0)
    val wide = cellsAt(0.15)
    assert(tight.values.forall(_.size == 1), "eps=0: exactly one cell per vector")
    assert(wide.values.forall(s => s.nonEmpty && s.size <= 2), "replication bounded at 2")
    assert(wide.forall { case (id, s) => s.contains(tight(id).head) },
      "the home (argmax-cosine) cell is always kept")
    assert(wide.values.count(_.size == 2) > 0, "a wide margin should replicate SOME vectors")
    // home cell is the true cosine argmax against the centroid matrix
    val vecs = unit.select("vec_id", "__u").as[(Long, Seq[Double])].collect()
    def cos(a: Seq[Double], c: Array[Double]): Double = {
      val d = a.indices.map(i => a(i) * c(i)).sum
      d / math.sqrt(c.map(x => x * x).sum) // a is unit already
    }
    vecs.take(50).foreach { case (id, u) =>
      val best = cents.indices.maxBy(i => (cos(u, cents(i)), -i))
      assert(tight(id).head === best, s"home cell of $id must be the cosine argmax")
    }
  }

  test("plane counts past the Long's bucket bits are refused, not wrapped") {
    // shiftleft(1L, 64) == 1L: planes=64 would silently alias plane 64
    // onto plane 0's bit — colliding buckets, degraded recall, no error
    val emb = Fixture(spark, sfDir).embeddings
    val e = intercept[IllegalArgumentException] {
      Similarity.lshBuckets(emb, "embedding", planes = 64)
    }
    assert(e.getMessage.contains("1..63"))
    val z = intercept[IllegalArgumentException] {
      Similarity.lshProbeBuckets(emb, "vec_id", "embedding", 0L,
        planes = 0, probeBuckets = 4)
    }
    assert(z.getMessage.contains("1..63"))
  }
}
