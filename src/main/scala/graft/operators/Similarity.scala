package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns._

/** Similarity search over embedding columns ([NS], SURVEY §2.10 N2).
  *
  * Ref-absent (the reference has no vector surface); semantics are standard
  * cosine k-NN. Three tiers, trading exactness for scale:
  *
  *  - [[cosineTopK]] — brute force: broadcast the query vector, score every
  *    row (narrow, codegen'd higher-order funcs), `TakeOrderedAndProject`
  *    top-k. Exact; O(N·d) scan — the right baseline and the correctness
  *    oracle for the approximate tiers.
  *  - [[lshBuckets]] / [[annLsh]] — sign-random-projection LSH: a vector
  *    hashes to a bucket by the sign pattern of `planes` pseudo-random
  *    projections (hyperplane weights derived from md5 of (plane, dim), so
  *    the scheme is deterministic, model-free, and identical on every
  *    executor with zero side state). At 100 TB the table is written
  *    partitioned/bucketed by `bucket` and a probe prunes to one partition —
  *    ~1/2^planes of the scan.
  *  - [[annIvf]] — IVF: deterministic coarse centroids, every vector
  *    assigned to its nearest centroid via one broadcast + per-row argmin
  *    (no shuffle of the table), queries rerank within the `nprobe`
  *    nearest cells.
  */
object Similarity {

  /** Exact cosine top-k against the vector with id `queryId`.
    * Raw (unrounded) doubles order the result; the emitted score is
    * `floor(sim*100)` — exact integer, portable across engines.
    */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String, queryId: Long, k: Int): DataFrame = {
    // Query norm is computed once on the broadcast row; per scanned row one
    // dot fold + one own-norm fold. sqrt(a)·sqrt(b) matches the oracle's
    // operation order bit-for-bit.
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("q_vec"), l2norm(col(vecCol)).as("q_nrm"))
    emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("sim", dot(col(vecCol), col("q_vec")) / (l2norm(col(vecCol)) * col("q_nrm")))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
      .select(col(idCol), floor(col("sim") * 100).cast("long").as("sim_x100"))
  }

  /** All-pairs near-duplicates within a blocking key (a label or a coarse
    * cluster id): the blocked self-join keeps the pair count at Σ|block|²
    * instead of N². At 100 TB the block key IS the partition key, so each
    * block's pairs are generated co-located, shuffle-free after one
    * repartition.
    */
  def blockedNearDup(
      emb: DataFrame, blockCol: String, idCol: String, vecCol: String,
      minCosine: Double): DataFrame = {
    // Norms are materialized per row BELOW the join (one fold per row), so
    // each of the Σ|block|² pairs costs a single dot fold — 3× fewer
    // interpreted array folds than computing full cosine per pair.
    val a = emb.select(col(blockCol), col(idCol).as("id_a"), col(vecCol).as("vec_a"),
      l2norm(col(vecCol)).as("nrm_a"))
    val b = emb.select(col(blockCol), col(idCol).as("id_b"), col(vecCol).as("vec_b"),
      l2norm(col(vecCol)).as("nrm_b"))
    a.join(b, Seq(blockCol))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("sim") >= minCosine)
      .select(col(blockCol), col("id_a"), col("id_b"),
        floor(col("sim") * 100).cast("long").as("sim_x100"))
  }

  /** Deterministic md5-derived hyperplane weight in [-0.5, 0.5) for
    * (plane, dim) — computed ONCE on the driver (the per-row SQL-md5
    * variant evaluated planes·dims md5 calls per vector).
    */
  private def planeWeight(p: Int, i: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p,$i".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % 1000001L) / 1000000.0 - 0.5
  }

  /** Sign-LSH bucket id (bit p = sign(v · plane_p)). The weight matrix is a
    * plan-time literal (`dims` capped at the embedding width), so the
    * per-row work is `planes` dot products — no hashing on the hot path.
    * SQL-string expression because `shiftleft`'s DSL overload takes only
    * literal positions.
    */
  def lshBuckets(emb: DataFrame, vecCol: String, planes: Int, dims: Int = 64): DataFrame = {
    val w = Array.tabulate(planes, dims)((p, i) => planeWeight(p, i))
    // fixed-point rendering: %.6f never produces E-notation the SQL parser
    // would reject with a D suffix
    val wLit = w.map(_.map(v => f"${v}%.6fD").mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")
    emb.withColumn("bucket", expr(
      s"""aggregate(
         |  transform(sequence(0, ${planes - 1}), p ->
         |    CASE WHEN aggregate(
         |        zip_with($vecCol, element_at($wLit, p + 1), (x, wi) -> cast(x as double) * wi),
         |        0d, (acc, v) -> acc + v) > 0d
         |    THEN shiftleft(1L, p) ELSE 0L END),
         |  0L, (acc, v) -> acc + v)""".stripMargin))
  }

  /** Shared ANN probe tail: join candidates to the broadcast probe-bucket
    * set, score, exact-rerank top-k.
    */
  private def probeAndRerank(bucketed: DataFrame, probes: DataFrame,
                             idCol: String, vecCol: String, queryId: Long, k: Int): DataFrame =
    bucketed.filter(col(idCol) =!= queryId)
      .join(broadcast(probes), col("bucket") === col("probe_bucket"))
      .withColumn("sim", cosine(col(vecCol), col("q_vec")))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
      .select(col(idCol), floor(col("sim") * 100).cast("long").as("sim_x100"))

  /** Approximate NN: score only vectors sharing the query's LSH bucket,
    * then exact-rerank. Recall tunes via `planes` (fewer planes → bigger
    * buckets → higher recall, more compute).
    */
  def annLsh(emb: DataFrame, idCol: String, vecCol: String, queryId: Long,
             k: Int, planes: Int): DataFrame = {
    val bucketed = lshBuckets(emb, vecCol, planes)
    val probes = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("q_vec"), col("bucket").as("probe_bucket"))
    probeAndRerank(bucketed, probes, idCol, vecCol, queryId, k)
  }

  /** Multi-probe LSH: probe the query's bucket AND every bucket at Hamming
    * distance 1 (one flipped hyperplane sign) — the standard recall fix for
    * sign-LSH without shrinking `planes`. Scan fraction ≈ (planes+1)/2^planes
    * of the table; near-misses that straddle one hyperplane are recovered.
    */
  def annLshMultiProbe(emb: DataFrame, idCol: String, vecCol: String, queryId: Long,
                       k: Int, planes: Int): DataFrame = {
    val bucketed = lshBuckets(emb, vecCol, planes)
    // q_bucket ∪ { q_bucket ^ 2^p : p < planes } — built as a column so the
    // probe set needs no driver round-trip
    val probes = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("q_vec"), col("bucket").as("q_bucket"))
      .select(col("q_vec"),
        explode(concat(array(col("q_bucket")),
          expr(s"transform(sequence(0, ${planes - 1}), p -> q_bucket ^ shiftleft(1L, p))")))
          .as("probe_bucket"))
    probeAndRerank(bucketed, probes, idCol, vecCol, queryId, k)
  }

  /** Deterministic coarse centroids: the `nlist` smallest-id vectors
    * (model-free; a k-means refinement would slot in without changing the
    * plan shape), collected to one broadcastable array row.
    */
  private def centroidArray(emb: DataFrame, idCol: String, vecCol: String, nlist: Int): DataFrame =
    emb.filter(col(idCol) < nlist)
      .select(struct(col(idCol).cast("long").as("cent_id"), col(vecCol).as("cent_vec")).as("c"))
      .agg(sort_array(collect_list(col("c"))).as("cents"))

  /** IVF assignment: `cell` = id of the nearest centroid (L2). One broadcast
    * of the centroid array + a per-row argmin — the table itself never
    * shuffles.
    */
  def ivfAssign(emb: DataFrame, idCol: String, vecCol: String, nlist: Int): DataFrame =
    emb.crossJoin(broadcast(centroidArray(emb, idCol, vecCol, nlist)))
      .withColumn("cell", expr(
        s"""aggregate(
           |  transform(cents, c -> named_struct(
           |    'dist', aggregate(zip_with($vecCol, c.cent_vec, (x, y) ->
           |        (cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))),
           |      0d, (a, v) -> a + v),
           |    'cent_id', c.cent_id)),
           |  named_struct('dist', cast('Infinity' as double), 'cent_id', cast(-1 as bigint)),
           |  (acc, s) -> CASE WHEN s.dist < acc.dist THEN s ELSE acc END).cent_id""".stripMargin))
      .drop("cents")

  /** IVF probe: exact rerank within the `nprobe` cells nearest the query. */
  def annIvf(emb: DataFrame, idCol: String, vecCol: String, queryId: Long,
             k: Int, nlist: Int, nprobe: Int): DataFrame = {
    val assigned = ivfAssign(emb, idCol, vecCol, nlist)
    // query row straight from the base table — probing must not re-evaluate
    // the whole assignment subtree just to read one vector
    val qRow = emb.filter(col(idCol) === queryId).select(col(vecCol).as("q_vec"))
    val probeCells = emb.filter(col(idCol) < nlist)
      .select(col(idCol).cast("long").as("cell"), col(vecCol).as("cent_vec"))
      .crossJoin(broadcast(qRow))
      .withColumn("negsim", -cosine(col("cent_vec"), col("q_vec")))
      .orderBy(col("negsim"), col("cell")).limit(nprobe)
      .select(col("cell"))
    assigned.filter(col(idCol) =!= queryId)
      .join(broadcast(probeCells), Seq("cell"))
      .crossJoin(broadcast(qRow))
      .withColumn("sim", cosine(col(vecCol), col("q_vec")))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
      .select(col(idCol), floor(col("sim") * 100).cast("long").as("sim_x100"))
  }
}
