package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing ([NS], SURVEY north star): image/audio/video
  * as opaque `binary` columns with typed metadata, processed per-partition.
  *
  * The reference's nearest analog is its multipart file ingest — opaque
  * uploaded bytes stored addressable by key
  * (`reference/src/middleware/audit.middleware.ts:29-41`,
  * `reference/src/services/s3.service.ts:50-67`); it never decodes them.
  *
  * Design for 100 TB: bytes live in Parquet binary columns (or are
  * referenced by URI and loaded via the `binaryFile` source); decode /
  * feature-extraction runs as `mapPartitions` over a typed Dataset — one
  * decoder instantiation per partition, vectorized batches within — and the
  * output is a narrow typed feature row, so everything downstream (dedup by
  * content hash, join to text metadata) is plain columnar Spark. The media
  * codec itself is STUBBED here (no image/audio libraries in this
  * environment): [[decodeStub]] derives deterministic pseudo-features from
  * the bytes. The Spark-side contract — schema, partitioning, per-partition
  * batching, feature row shape — is real and spec-tested; swapping the stub
  * for a real codec changes only the function body.
  */
object Multimodal {

  /** A media record: opaque bytes + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      meta: Map[String, String])

  /** Extracted features — the row shape a real decoder would emit. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      content_sha: String,
      width: Int, // STUB: pseudo-decoded
      height: Int, // STUB: pseudo-decoded
      duration_ms: Long, // STUB: pseudo-decoded
      feature: Array[Float]) // STUB: pseudo-embedding

  /** ======= STUB DECODER =======
    * Stands in for a real image/audio codec (unavailable in this
    * environment). Deterministic in the bytes: same input ⇒ same features,
    * so pipelines built on top are testable end-to-end.
    */
  private def pseudoDecode(r: MediaRecord): MediaFeatures = {
    val sha = MessageDigest.getInstance("SHA-256").digest(r.bytes)
    val hex = sha.map("%02x".format(_)).mkString
    def b(i: Int): Int = sha(i % sha.length) & 0xff
    MediaFeatures(
      media_id = r.media_id,
      kind = r.kind,
      n_bytes = r.bytes.length.toLong,
      content_sha = hex,
      width = 16 * (1 + b(0) % 120), // 16..1920
      height = 16 * (1 + b(1) % 68), // 16..1088
      duration_ms = if (r.kind == "image") 0L else 1000L * (1 + b(2) % 600),
      feature = Array.tabulate(8)(i => (b(i) / 255.0f) - 0.5f))
  }

  /** Decode / feature-extract: `mapPartitions` so a real implementation
    * amortizes codec init per partition and can batch rows into the
    * decoder (the JVM analog of Arrow-batched `mapInPandas`).
    */
  def decode(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition init happens here (codec handles, model weights, …)
      rows.map(pseudoDecode)
    }
  }

  /** Exact media dedup by content hash — binary payloads never shuffle,
    * only (sha, id).
    */
  def dedupByContent(features: DataFrame): DataFrame =
    features.groupBy(col("content_sha"))
      .agg(min(col("media_id")).as("media_id"), count(lit(1)).as("n_copies"))

  /** Frame sampling plan for video rows: one row per sampled frame index —
    * a `Generator` (explode) over a computed sequence; a real pipeline
    * would then decode each (media_id, frame_idx) pair.
    */
  def sampleFrames(features: DataFrame, everyMs: Long): DataFrame =
    features.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))).as("frame_ms"))

  /** Resize stub: emits the target geometry a real resizer would apply,
    * preserving aspect ratio (integer math only).
    */
  def resizePlan(features: DataFrame, maxSide: Int): DataFrame =
    features.select(col("media_id"), col("width"), col("height"),
      when(greatest(col("width"), col("height")) <= maxSide, col("width"))
        .otherwise((col("width") * maxSide) / greatest(col("width"), col("height")))
        .cast("int").as("out_width"),
      when(greatest(col("width"), col("height")) <= maxSide, col("height"))
        .otherwise((col("height") * maxSide) / greatest(col("width"), col("height")))
        .cast("int").as("out_height"))

  /** Ingest raw media files from a directory via the `binaryFile` source —
    * the engine-side analog of the reference's multipart upload landing in
    * the blob store (`audit.middleware.ts:29-41`). Kind is inferred from the
    * extension; file path becomes metadata. `pathGlobFilter`/partitioned
    * directories bound the listing at scale.
    */
  def readMediaDir(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content"))
      .map { r =>
        val path = r.getString(0)
        val kind = path.substring(path.lastIndexOf('.') + 1) match {
          case "png" | "jpg" | "jpeg" => "image"
          case "wav" | "mp3" => "audio"
          case "mp4" | "mkv" => "video"
          case other => other
        }
        // 63-bit id from md5(path): String.hashCode collides trivially
        // (32-bit) and math.abs(Int.MinValue) is negative
        val d = MessageDigest.getInstance("MD5").digest(path.getBytes("UTF-8"))
        val id = java.nio.ByteBuffer.wrap(d).getLong & Long.MaxValue
        MediaRecord(id, kind, r.getAs[Array[Byte]](1), Map("path" -> path))
      }
  }

  /** Demo corpus builder for specs/smokes (deterministic). */
  def syntheticCorpus(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val i: Long = id
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      // duplicate every 10th payload to exercise content dedup
      val seed: Long = if (i % 10 == 0) 0L else i
      MediaRecord(i, kind,
        Array.tabulate(64 + (seed % 64).toInt)(j => ((seed * 31 + j) % 251).toByte),
        Map("origin" -> s"synthetic-$kind"))
    }
  }
}
