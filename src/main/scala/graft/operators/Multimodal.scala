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
  * content hash, join to text metadata) is plain columnar Spark.
  *
  * IMAGES decode for real: `javax.imageio` (JDK built-in — PNG/JPEG/GIF/BMP)
  * yields true dimensions and an 8-bin luminance histogram as the feature
  * vector. AUDIO/VIDEO codecs are unavailable in this environment, so those
  * kinds (and undecodable image bytes) fall back to [[pseudoDecode]], a
  * clearly-marked deterministic stand-in — the Spark-side contract (schema,
  * partitioning, per-partition codec init, feature row shape) is identical
  * either way and spec-tested against a real generated PNG.
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

  private def sha256Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes).map("%02x".format(_)).mkString

  /** Real image decode via `javax.imageio`: true width/height plus an
    * 8-bin luminance histogram (sampled at ≤256×256 grid points so a
    * pathological 100-megapixel row can't stall its partition) as the
    * feature vector. None when the bytes aren't a decodable image.
    */
  private def decodeImage(r: MediaRecord): Option[MediaFeatures] = {
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes)))
      catch { case _: java.io.IOException => None }
    img.map { im =>
      val w = im.getWidth
      val h = im.getHeight
      val stepX = math.max(1, w / 256)
      val stepY = math.max(1, h / 256)
      val hist = new Array[Float](8)
      var n = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = im.getRGB(x, y)
          val lum = ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
          hist(lum * 8 / 256) += 1f
          n += 1
          x += stepX
        }
        y += stepY
      }
      if (n > 0) { var i = 0; while (i < 8) { hist(i) /= n; i += 1 } }
      MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, sha256Hex(r.bytes),
        width = w, height = h, duration_ms = 0L, feature = hist)
    }
  }

  /** ======= STUB DECODER =======
    * Stands in for a real audio/video codec (unavailable in this
    * environment; images decode for real via [[decodeImage]]).
    * Deterministic in the bytes: same input ⇒ same features, so pipelines
    * built on top are testable end-to-end.
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
      // per-partition codec init: no temp-file cache for in-memory decode
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        if (r.kind == "image") decodeImage(r).getOrElse(pseudoDecode(r))
        else pseudoDecode(r)
      }
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
