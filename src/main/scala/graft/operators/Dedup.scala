package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns._

/** Deduplication operators for training-data pipelines ([NS], SURVEY §2.10).
  *
  * The reference deduplicates implicitly — one row per `transaction_id`,
  * enforced by its update-join (`reference/src/lambda/processQueue.ts:230-238`).
  * At 100 TB corpus scale the real need is content dedup; each operator here
  * is a declarative pipeline whose only wide operations are hash-partitioned
  * aggregations/joins on dedup keys:
  *
  *  - exact: one shuffle keyed by the full text (map-side partial agg first);
  *  - fingerprint: same shuffle but on a 128-bit digest of normalized text —
  *    at scale the digest (16 bytes) shuffles instead of the document;
  *  - MinHash+LSH: per-doc signatures are embarrassingly parallel; only
  *    (band, bucket) keys + doc ids shuffle, candidate verification re-joins
  *    signatures by id — the document text itself never shuffles twice;
  *  - SimHash: signature is a per-row scalar; near-dup = small Hamming
  *    distance between signatures.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical text (deterministic
    * canonical pick), with the duplicate count.
    */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("n_copies"))

  /** Normalized fingerprint: lowercase, collapse non-alphanumerics, md5.
    * `is_canonical` marks the smallest doc id per fingerprint group.
    */
  def fingerprint(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val norm = trim(regexp_replace(lower(col(textCol)), "[^a-z0-9]+", " "))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    docs.withColumn("fp", substring(md5(norm), 1, 16))
      .withColumn("is_canonical", col(idCol) === min(col(idCol)).over(w))
  }

  /** MinHash signatures: id → k-wide BIGINT signature over word-3-gram
    * shingles. Pure per-row compute (narrow, codegen'd).
    */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame =
    docs.select(col(idCol), shingles3(tokens(col(textCol))).as("shingles"))
      .withColumn("mh", minhash(col("shingles"), k))

  /** MinHash+LSH near-dup pairs: band the signature, self-join on
    * (band, bucket) for candidates, then verify exact shingle-set Jaccard.
    *
    * Scale shape: the candidate join shuffles only `(band, bucket, id)`;
    * verification joins signatures back by id (ids + shingle arrays shuffle
    * once each). Output: (id_a < id_b, jacc_pct) for pairs ≥ `minJaccPct`.
    */
  def minhashPairs(
      docs: DataFrame, textCol: String, idCol: String,
      k: Int, bands: Int, minJaccPct: Int): DataFrame = {
    val r = k / bands
    val sig = minhashSignatures(docs, textCol, idCol, k)
      .withColumn("sh_set", array_distinct(col("shingles")))
      .select(col(idCol), col("sh_set"), explode(bandBuckets(col("mh"), bands, r)).as("bb"))
      .select(col(idCol), col("sh_set"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val a = sig.select(col(idCol).as("id_a"), col("sh_set").as("set_a"), col("band"), col("bucket"))
    val b = sig.select(col(idCol).as("id_b"), col("sh_set").as("set_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccardPct(col("set_a"), col("set_b")).as("jacc_pct"))
      .distinct()
      .filter(col("jacc_pct") >= minJaccPct)
  }

  /** SimHash signature per doc plus Hamming distance to the next doc id —
    * a deterministic O(n) near-dup probe (full pairing would use the same
    * signature with an LSH-style prefix bucket).
    */
  def simhashWithNeighborDistance(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val sigs = docs.select(col(idCol), simhash32(textCol).as("simhash"))
    val next = sigs.select((col(idCol) - 1).as(idCol), col("simhash").as("next_simhash"))
    sigs.join(next, Seq(idCol), "left")
      .select(col(idCol), col("simhash"),
        expr("cast(bit_count(simhash ^ next_simhash) as int)").as("hamming_next"))
  }

  /** Character-n-gram Jaccard between explicit pairs (here: consecutive doc
    * ids — O(n) deterministic pairing that exercises the n-gram path).
    */
  def ngramJaccardNeighbors(docs: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    val grams = docs.select(col(idCol), charNgrams(lower(col(textCol)), n).as("grams"))
    val next = grams.select((col(idCol) - 1).as(idCol), col("grams").as("grams_b"))
    grams.join(next, Seq(idCol), "inner")
      .select(col(idCol).as("doc_a"), (col(idCol) + 1).as("doc_b"),
        jaccardPct(col("grams"), col("grams_b")).as("jacc_pct"))
  }
}
