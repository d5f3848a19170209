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
  * vector. WAV/AIFF/AU AUDIO decodes for real too: `javax.sound.sampled`
  * (JDK built-in) yields true duration, sample rate, and an amplitude
  * histogram. VIDEO decodes for real too: MJPEG-in-AVI gets true
  * pixel-level FRAME decode (a RIFF chunk walker extracts the JPEG frame
  * payloads, `javax.imageio` decodes sampled frames —
  * [[decodeAviFrames]]); animated GIF gets true frame pixels, count and
  * per-frame delays ([[decodeGifFrames]]); MP4/MOV gets real container
  * metadata (ISO-BMFF box parser, [[decodeVideoMeta]] — true duration and
  * track geometry), and an MPEG audio frame-header walker
  * ([[decodeMp3Meta]]) yields true MP3 duration and sample rate the same
  * way. Only sample-level decode with no JDK codec (H.264/AV1 video
  * frames, MP3 waveforms) — and any undecodable bytes — falls back to
  * [[pseudoDecode]], a clearly-marked deterministic stand-in; the
  * Spark-side contract (schema, partitioning, per-partition codec init,
  * feature row shape) is identical either way and spec-tested against a
  * real generated PNG, WAV, MP3, MP4, MJPEG AVI, and animated GIF.
  */
object Multimodal {

  /** A media record: opaque bytes + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      meta: Map[String, String])

  /** Extracted features — the row shape a real decoder would emit.
    * `width`/`height` are real for decodable images, `duration_ms` and
    * `sample_rate` are real for decodable WAV audio; the remaining
    * combinations come from the marked [[pseudoDecode]] stub.
    */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      content_sha: String,
      width: Int,
      height: Int,
      duration_ms: Long,
      sample_rate: Int,
      feature: Array[Float])

  private def sha256Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes).map("%02x".format(_)).mkString

  /** 8-bin luminance histogram sampled at ≤256×256 grid points, so a
    * pathological 100-megapixel frame can't stall its partition. Shared by
    * the still-image and video-frame decoders.
    */
  private def lumHistogram(im: java.awt.image.BufferedImage): Array[Float] = {
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
    hist
  }

  /** Real image decode via `javax.imageio`: true width/height plus an
    * 8-bin luminance histogram as the feature vector. None when the bytes
    * aren't a decodable image.
    */
  private[graft] def decodeImage(r: MediaRecord): Option[MediaFeatures] = {
    val img =
      // NonFatal, not just IOException: ImageIO.read throws RuntimeExceptions
      // on malformed inputs too (CMMException on bad color profiles,
      // IllegalArgumentException from broken headers) — any of them must
      // take the documented stub fallback, not fail the task
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes)))
      catch { case scala.util.control.NonFatal(_) => None }
    img.map { im =>
      MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, sha256Hex(r.bytes),
        width = im.getWidth, height = im.getHeight, duration_ms = 0L,
        sample_rate = 0, feature = lumHistogram(im))
    }
  }

  /** Real audio decode via `javax.sound.sampled` (JDK built-in — WAV/AIFF/
    * AU): true duration from the frame count and frame rate, the true
    * sample rate, and an 8-bin absolute-amplitude histogram over ≤65,536
    * frames of 16-bit PCM (a bounded read, so an hours-long recording
    * can't stall its partition). µ-law/A-law streams (the classic AU
    * encodings) route through the JDK's OWN companded→PCM conversion
    * stream first — pure-JDK, so their waveforms are REAL too, not
    * stubbed. None when the bytes aren't decodable audio (e.g. MP3 — no
    * JDK codec), which takes the stub fallback.
    */
  private[graft] def decodeAudio(r: MediaRecord): Option[MediaFeatures] =
    try {
      val rawAis = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.bytes))
      val rawFmt = rawAis.getFormat
      val rawFrames = rawAis.getFrameLength
      import javax.sound.sampled.AudioFormat.Encoding
      // companded encodings: convert to 16-bit PCM through the built-in
      // codec (1 frame in = 1 frame out, so duration math is unchanged)
      val ais =
        if (rawFmt.getEncoding == Encoding.ULAW || rawFmt.getEncoding == Encoding.ALAW)
          javax.sound.sampled.AudioSystem.getAudioInputStream(
            new javax.sound.sampled.AudioFormat(Encoding.PCM_SIGNED,
              rawFmt.getSampleRate, 16, rawFmt.getChannels,
              rawFmt.getChannels * 2, rawFmt.getSampleRate, rawFmt.isBigEndian),
            rawAis)
        else rawAis
      try {
        val fmt = ais.getFormat
        if (rawFrames <= 0 || rawFmt.getFrameRate <= 0) None
        else {
          val durationMs = (rawFrames * 1000.0 / rawFmt.getFrameRate).toLong
          val hist = new Array[Float](8)
          if (fmt.getEncoding == Encoding.PCM_SIGNED
              && fmt.getSampleSizeInBits == 16 && fmt.getFrameSize > 0) {
            val frameSize = fmt.getFrameSize
            val maxFrames = math.min(rawFrames, 65536L).toInt
            val buf = new Array[Byte](frameSize)
            var n = 0
            var done = false
            while (n < maxFrames && !done) {
              var got = 0
              while (got < frameSize && !done) {
                val k = ais.read(buf, got, frameSize - got)
                if (k < 0) done = true else got += k
              }
              if (!done) {
                // first channel's 16-bit sample, honoring endianness
                val s =
                  if (fmt.isBigEndian) (buf(0) << 8 | (buf(1) & 0xff)).toShort
                  else (buf(1) << 8 | (buf(0) & 0xff)).toShort
                hist(math.min(7, math.abs(s.toInt) * 8 / 32768)) += 1f
                n += 1
              }
            }
            if (n > 0) { var i = 0; while (i < 8) { hist(i) /= n; i += 1 } }
          }
          Some(MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong,
            sha256Hex(r.bytes), width = 0, height = 0, duration_ms = durationMs,
            sample_rate = rawFmt.getSampleRate.toInt, feature = hist))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Real MP3 METADATA decode: an MPEG audio frame-header walker — pure
    * byte parsing, same technique as [[decodeVideoMeta]], no codec needed.
    * Yields the true sample rate and duration: a `Xing`/`Info` header in
    * the first frame (VBR) gives the exact frame count; otherwise every
    * frame header is walked (header ⇒ frame byte length ⇒ next header),
    * accumulating samples — exact for CBR and VBR alike, O(#frames) over
    * bytes already in memory. Sample-level decode (the actual waveform)
    * would need an MPEG codec (none in the JDK) and stays with
    * [[pseudoDecode]]'s feature vector. Returns None when no valid frame
    * sync is found, which takes the stub fallback.
    *
    * Frame grammar (public MPEG-1/2 audio spec): 4-byte header
    * `sync(11) version(2) layer(2) crc(1) | bitrate(4) samplerate(2)
    * padding(1) private(1) | mode(2) ...`; frame length in bytes =
    * `samplesPerFrame/8 * bitrate / samplerate + padding` (×4 slots for
    * Layer I). The walker is offset-monotonic by construction: a parsed
    * frame always advances ≥ 5 bytes, and anything unparseable ends the
    * walk (ID3v1 trailers, truncation, garbage).
    */
  private[graft] def decodeMp3Meta(r: MediaRecord): Option[MediaFeatures] =
    try {
      val b = r.bytes
      if (b.length < 4) return None
      // skip a leading ID3v2 tag: "ID3" ver(2) flags(1) syncsafe-size(4)
      var start = 0
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
        val sz = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
          ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
        start = 10 + sz
        if (start < 10 || start + 4 > b.length) return None
      }
      // (frameBytes, samplesPerFrame, sampleRate, mpeg1, mono)
      def parseHeader(o: Int): Option[(Int, Int, Int, Boolean, Boolean)] = {
        if (o < 0 || o + 4 > b.length) return None
        val h1 = b(o + 1) & 0xff; val h2 = b(o + 2) & 0xff; val h3 = b(o + 3) & 0xff
        if ((b(o) & 0xff) != 0xff || (h1 & 0xe0) != 0xe0) return None
        val verBits = (h1 >> 3) & 3 // 0=MPEG2.5 1=reserved 2=MPEG2 3=MPEG1
        val layerBits = (h1 >> 1) & 3 // 1=III 2=II 3=I
        if (verBits == 1 || layerBits == 0) return None
        val brIdx = (h2 >> 4) & 0xf
        val srIdx = (h2 >> 2) & 3
        if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None // free-format/bad
        val mpeg1 = verBits == 3
        val sampleRate = {
          val base = Array(44100, 48000, 32000)(srIdx)
          if (mpeg1) base else if (verBits == 2) base / 2 else base / 4
        }
        val kbps = ((mpeg1, layerBits) match {
          case (true, 3) => Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
          case (true, 2) => Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
          case (true, _) => Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
          case (false, 3) => Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
          case (false, _) => Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
        })(brIdx)
        val samples =
          if (layerBits == 3) 384
          else if (layerBits == 2) 1152
          else if (mpeg1) 1152 else 576
        val padding = (h2 >> 1) & 1
        val frameBytes =
          if (layerBits == 3) (12 * kbps * 1000 / sampleRate + padding) * 4
          else samples / 8 * kbps * 1000 / sampleRate + padding
        if (frameBytes < 5) None // malformed: would not advance the walk
        else Some((frameBytes, samples, sampleRate, mpeg1, (h3 >> 6 & 3) == 3))
      }
      // first sync: scan a bounded window, demanding the NEXT frame (or
      // EOF) also parses so a lone 0xFF in junk can't fake a stream. A
      // strict miss falls back to accepting a lone parse — a one-frame
      // file with an ID3v1 "TAG" trailer (or any non-frame tail) is a
      // real MP3 the two-frame rule would wrongly reject.
      val scanEnd = math.min(b.length - 4, start + 65536)
      def findSync(strict: Boolean): Int = {
        var found = -1
        var i = start
        while (found < 0 && i <= scanEnd) {
          parseHeader(i) match {
            case Some((fb, _, _, _, _))
              if !strict || i + fb + 4 > b.length || parseHeader(i + fb).isDefined =>
              found = i
            case _ => i += 1
          }
        }
        found
      }
      val first = { val strict = findSync(strict = true)
                    if (strict >= 0) strict else findSync(strict = false) }
      if (first < 0) return None
      val (fb0, samples0, sr0, mpeg1, mono) = parseHeader(first).get
      def u32(o: Int): Long =
        ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
          ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
      // VBR: Xing/Info sits after the side info of the first frame
      val xingOff = first + 4 + (if (mpeg1) { if (mono) 17 else 32 }
                                 else { if (mono) 9 else 17 })
      val xingFrames: Option[Long] =
        if (xingOff + 12 <= b.length && xingOff + 12 <= first + fb0 &&
          { val t = new String(b, xingOff, 4, "ISO-8859-1"); t == "Xing" || t == "Info" } &&
          (u32(xingOff + 4) & 1L) == 1L)
          Some(u32(xingOff + 8))
        else None
      val durUs: Long = xingFrames match {
        case Some(n) => n * samples0 * 1000000L / sr0
        case None =>
          // walk every frame; offset strictly increases (frameBytes >= 5)
          var o = first
          var us = 0L
          var frames = 0
          var done = false
          while (!done && frames < (1 << 22)) {
            parseHeader(o) match {
              case Some((fb, sm, sr, _, _)) => us += sm * 1000000L / sr; o += fb; frames += 1
              case None => done = true
            }
          }
          us
      }
      if (durUs <= 0) None
      else Some(MediaFeatures(r.media_id, r.kind, b.length.toLong, sha256Hex(b),
        width = 0, height = 0, duration_ms = durUs / 1000,
        sample_rate = sr0, feature = pseudoDecode(r).feature))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Real video FRAME decode for MJPEG-in-AVI: a RIFF chunk walker (pure
    * byte parsing, little-endian — the third container walker next to
    * ISO-BMFF and MPEG audio) finds the `avih` main header (true
    * width/height, per-frame duration, frame count) and the `movi` video
    * chunks (`##dc`/`##db`); each MJPEG frame payload is a complete JPEG,
    * which `javax.imageio` CAN decode — so for this codec the pixel level
    * is real, not stubbed: the feature vector is the mean 8-bin luminance
    * histogram over ≤8 evenly-sampled frames (bounded work per row, the
    * frame-sampling policy of [[sampleFrames]] applied inside the decoder).
    * Videos in codecs with no JDK decoder (H.264/AV1/…) still carry real
    * container metadata here but keep [[pseudoDecode]]'s feature vector.
    * None for non-AVI bytes, which fall through to [[decodeVideoMeta]].
    *
    * Chunk grammar (public RIFF/AVI spec): `[4cc id][u32le size][payload]`
    * padded to even length; `LIST` chunks carry a 4cc list type then
    * sub-chunks (`hdrl` holds `avih`; `movi` holds frame chunks, possibly
    * inside `rec ` lists). The walk is offset-monotonic: every chunk
    * advances ≥ 8 bytes and a size overrunning its parent ends that level.
    */
  private[graft] def decodeAviFrames(r: MediaRecord): Option[MediaFeatures] =
    try {
      val b = r.bytes
      def u32le(o: Int): Long =
        (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
          ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      def fourcc(o: Int): String = new String(b, o, 4, "ISO-8859-1")
      if (b.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None

      var usPerFrame = 0L
      var totalFrames = 0L
      var width = 0
      var height = 0
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (offset, size)
      def isFrameChunk(id: String): Boolean =
        id.length == 4 && id(0).isDigit && id(1).isDigit &&
          (id.endsWith("dc") || id.endsWith("db"))
      def walk(from: Long, to: Long, depth: Int): Unit = {
        var off = from
        while (off + 8 <= to && depth < 8) {
          val id = fourcc(off.toInt)
          val size = u32le(off.toInt + 4)
          val payload = off + 8
          if (size < 0 || payload + size > to) return // malformed: stop level
          id match {
            case "LIST" if size >= 4 =>
              walk(payload + 4, payload + size, depth + 1)
            case "avih" if size >= 40 =>
              usPerFrame = u32le(payload.toInt)
              totalFrames = u32le(payload.toInt + 16)
              width = u32le(payload.toInt + 32).toInt
              height = u32le(payload.toInt + 36).toInt
            case f if isFrameChunk(f) && size > 0 =>
              frames += ((payload.toInt, size.toInt))
            case _ => ()
          }
          off = payload + size + (size & 1) // chunks pad to even length
        }
      }
      walk(12L, math.min(b.length.toLong, 8L + u32le(4)), 0)
      if (usPerFrame <= 0 && frames.isEmpty) return None

      // frame-sample ≤8 evenly spaced frames and decode (MJPEG ⇒ JPEG)
      val step = math.max(1, frames.length / 8)
      val hist = new Array[Float](8)
      var decoded = 0
      var i = 0
      while (i < frames.length && decoded < 8) {
        val (o, sz) = frames(i)
        val im =
          try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b, o, sz)))
          catch { case scala.util.control.NonFatal(_) => None }
        im.foreach { frame =>
          val h = lumHistogram(frame)
          var k = 0
          while (k < 8) { hist(k) += h(k); k += 1 }
          if (width <= 0) { width = frame.getWidth; height = frame.getHeight }
          decoded += 1
        }
        i += step
      }
      if (decoded > 0) { var k = 0; while (k < 8) { hist(k) /= decoded; k += 1 } }
      // Both avih fields are attacker-controlled u32s (up to ~4.29e9 each);
      // a naive Long product can wrap negative. BigInt the product and
      // floor anything absurd (negative, or > ~292 years) to 0.
      val durationMs = {
        val p = (BigInt(usPerFrame) * BigInt(totalFrames)) / 1000
        if (p < 0 || p > Long.MaxValue) 0L else p.toLong
      }
      Some(MediaFeatures(r.media_id, r.kind, b.length.toLong, sha256Hex(b),
        width = width, height = height, duration_ms = durationMs, sample_rate = 0,
        feature = if (decoded > 0) hist else pseudoDecode(r).feature))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Real ANIMATED-GIF frame decode — the second motion format the JDK can
    * fully decode (next to MJPEG-AVI): `javax.imageio`'s GIF reader yields
    * every frame as a `BufferedImage`, so frame count, true geometry, total
    * duration AND pixels are all real. Geometry comes from the logical
    * screen descriptor (bytes 6–9 of the header — frames are patches on
    * that canvas and may be smaller); duration is the sum of per-frame
    * Graphic Control Extension delays (centiseconds → ms) read from the
    * standard `javax_imageio_gif_image_1.0` metadata tree, capped at 4096
    * frames of metadata walk (hostile frame counts stay bounded; pixels
    * were already bounded at ≤8 sampled frames). The feature vector is the
    * mean 8-bin luminance histogram over ≤8 evenly-sampled frames — the
    * same frame-sampling policy as [[decodeAviFrames]]. Frames are decoded
    * as stored patches (no disposal-method compositing — the histogram is
    * a content feature, not a renderer). None for non-GIF bytes.
    */
  private[graft] def decodeGifFrames(r: MediaRecord): Option[MediaFeatures] =
    try {
      val b = r.bytes
      if (b.length < 13 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F' ||
          b(3) != '8' || !(b(4) == '7' || b(4) == '9') || b(5) != 'a') return None
      val width = (b(6) & 0xff) | ((b(7) & 0xff) << 8)
      val height = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
      val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
      if (!readers.hasNext) return None
      val reader = readers.next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        reader.setInput(iis, false, false)
        val n = reader.getNumImages(true)
        if (n <= 0) return None
        var durationMs = 0L
        var i = 0
        val metaCap = math.min(n, 4096)
        while (i < metaCap) {
          val tree = reader.getImageMetadata(i)
            .getAsTree("javax_imageio_gif_image_1.0")
            .asInstanceOf[org.w3c.dom.Element]
          val gce = tree.getElementsByTagName("GraphicControlExtension")
          if (gce.getLength > 0) {
            val d = gce.item(0).asInstanceOf[org.w3c.dom.Element]
              .getAttribute("delayTime")
            durationMs +=
              (try d.toLong * 10L catch { case _: NumberFormatException => 0L })
          }
          i += 1
        }
        val step = math.max(1, n / 8)
        val hist = new Array[Float](8)
        var decoded = 0
        var j = 0
        while (j < n && decoded < 8) {
          val im =
            try Option(reader.read(j))
            catch { case scala.util.control.NonFatal(_) => None }
          im.foreach { frame =>
            val h = lumHistogram(frame)
            var k = 0
            while (k < 8) { hist(k) += h(k); k += 1 }
            decoded += 1
          }
          j += step
        }
        if (decoded == 0) return None
        var k = 0
        while (k < 8) { hist(k) /= decoded; k += 1 }
        Some(MediaFeatures(r.media_id, r.kind, b.length.toLong, sha256Hex(b),
          width = width, height = height, duration_ms = durationMs,
          sample_rate = 0, feature = hist))
      } finally { reader.dispose(); iis.close() }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Real video CONTAINER decode: an ISO-BMFF (MP4/MOV) box walker — pure
    * byte parsing, no codec required. `mvhd` yields the true presentation
    * duration (`duration / timescale`), `tkhd` the true track geometry
    * (16.16 fixed-point width/height; the max across tracks, since audio
    * tracks carry 0×0). Frame PIXEL decode would need an H.264/AV1 codec
    * (unavailable here) and stays with [[pseudoDecode]]'s feature vector —
    * but the metadata a pipeline partitions/filters/joins on (duration,
    * geometry, byte size, content hash) is real. Returns None for
    * non-BMFF bytes (e.g. MKV/EBML — different container, not parsed),
    * which take the stub fallback.
    *
    * Box grammar: `[u32 size][4cc type][payload]`; size 1 ⇒ u64 largesize
    * follows, size 0 ⇒ box extends to EOF; `moov`/`trak` are containers.
    */
  private[graft] def decodeVideoMeta(r: MediaRecord): Option[MediaFeatures] =
    try {
      val b = r.bytes
      def u32(o: Int): Long =
        ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
          ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
      def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
      def fourcc(o: Int): String = new String(b, o, 4, "ISO-8859-1")
      // BMFF sniff: the first box must parse and carry a known top-level type
      if (b.length < 16) return None
      val firstType = fourcc(4)
      if (!Set("ftyp", "moov", "mdat", "free", "skip", "wide", "styp").contains(firstType))
        return None

      var durationMs = 0L
      var width = 0
      var height = 0
      def walk(from: Long, to: Long, depth: Int): Unit = {
        var off = from
        while (off + 8 <= to && depth < 8) {
          val size0 = u32(off.toInt)
          val typ = fourcc(off.toInt + 4)
          val (payload, size) =
            if (size0 == 1L && off + 16 <= to) (off + 16, u64(off.toInt + 8))
            else if (size0 == 0L) (off + 8, to - off)
            else (off + 8, size0)
          if (size < 8 || off + size > to) return // malformed length: stop this level
          val end = off + size
          typ match {
            case "moov" | "trak" => walk(payload, end, depth + 1)
            case "mvhd" if payload + 4 <= end =>
              val v = b(payload.toInt) & 0xff
              // v0: ver/flags(4) ctime(4) mtime(4) timescale(4) duration(4)
              // v1: ver/flags(4) ctime(8) mtime(8) timescale(4) duration(8)
              val (ts, dur) =
                if (v == 1 && payload + 32 <= end) (u32(payload.toInt + 20), u64(payload.toInt + 24))
                else if (payload + 24 <= end) (u32(payload.toInt + 12), u32(payload.toInt + 16))
                else (0L, 0L)
              if (ts > 0) durationMs = dur * 1000L / ts
            case "tkhd" if payload + 4 <= end =>
              val v = b(payload.toInt) & 0xff
              // fields before width: v0 = 76 bytes (ctime/mtime/id/duration
              // u32s), v1 = 88 (those three widen to u64); then 16.16 w, h
              val wOff = payload + (if (v == 1) 88 else 76)
              if (wOff + 8 <= end) {
                width = math.max(width, (u32(wOff.toInt) >> 16).toInt)
                height = math.max(height, (u32(wOff.toInt + 4) >> 16).toInt)
              }
            case _ => ()
          }
          off = end
        }
      }
      walk(0L, b.length.toLong, 0)
      if (durationMs <= 0 && width <= 0) None
      else Some(MediaFeatures(r.media_id, r.kind, b.length.toLong, sha256Hex(b),
        width = width, height = height, duration_ms = durationMs,
        sample_rate = 0, feature = pseudoDecode(r).feature))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** ======= STUB DECODER =======
    * Stands in for real pixel/sample decode where no codec exists in this
    * environment — after [[decodeImage]] (real images), [[decodeAudio]]
    * (real WAV/AIFF/AU), [[decodeMp3Meta]] (real MP3 duration/sample-rate),
    * [[decodeAviFrames]] (real MJPEG-AVI frame pixels),
    * [[decodeGifFrames]] (real animated-GIF frame pixels/count/delays) and
    * [[decodeVideoMeta]] (real MP4/MOV metadata), only frame pixels in
    * codecs the JDK can't decode (H.264/AV1/…) and MP3 waveform samples
    * remain stubbed. Deterministic in the bytes: same input ⇒ same
    * features, so pipelines built on top are testable end-to-end.
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
      sample_rate = if (r.kind == "audio") 8000 * (1 + b(3) % 6) else 0,
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
        else if (r.kind == "audio")
          decodeAudio(r).orElse(decodeMp3Meta(r)).getOrElse(pseudoDecode(r))
        else if (r.kind == "video")
          decodeAviFrames(r).orElse(decodeGifFrames(r))
            .orElse(decodeVideoMeta(r)).getOrElse(pseudoDecode(r))
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
        // every extension a [[decode]] branch can handle for real must
        // map to that branch's kind — an unmapped extension silently
        // routes to the stub (GIF is "video": decodeGifFrames reads
        // frame count/delays; a still GIF is its 1-frame case)
        val kind = path.substring(path.lastIndexOf('.') + 1) match {
          case "png" | "jpg" | "jpeg" | "bmp" => "image"
          case "wav" | "mp3" | "au" | "aiff" | "aif" => "audio"
          case "mp4" | "mkv" | "avi" | "mov" | "gif" => "video"
          case other => other
        }
        // 63-bit id from md5(path): String.hashCode collides trivially
        // (32-bit) and math.abs(Int.MinValue) is negative
        val d = MessageDigest.getInstance("MD5").digest(path.getBytes("UTF-8"))
        val id = java.nio.ByteBuffer.wrap(d).getLong & Long.MaxValue
        MediaRecord(id, kind, r.getAs[Array[Byte]](1), Map("path" -> path))
      }
  }

  /** REAL-bytes synthetic corpus for the bench/scale entries: PNG via
    * `ImageIO` (true pixels), WAV via `AudioSystem` (true PCM), MP4 via
    * hand-assembled ISO-BMFF boxes — the same constructions the decode
    * specs pin, so the benched path exercises the REAL decoders, not
    * [[pseudoDecode]]. Payloads are generated per-partition on
    * executors (fixture generation itself scales like any source);
    * every 10th row repeats payload seed 0, so exact content duplicates
    * exist within each kind for [[dedupByContent]]. Deterministic in
    * (n, row id).
    */
  def syntheticMediaCorpus(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val i: Long = id
      val seed: Long = if (i % 10 == 0) 0L else i
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val bytes = (i % 3) match {
        case 0 => realPngBytes(seed)
        case 1 => realWavBytes(seed)
        case _ => realMp4Bytes(seed)
      }
      MediaRecord(i, kind, bytes, Map("origin" -> s"synthetic-real-$kind"))
    }
  }

  private def realPngBytes(seed: Long): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        im.setRGB(x, y, ((seed * 2654435761L + x * 7 + y * 131) % 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  private def realWavBytes(seed: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val sampleRate = 8000
    val nFrames = 2000 // 250 ms
    val hz = 220.0 + (seed % 200).toDouble
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = (math.sin(i * hz / sampleRate * 2 * math.Pi) * 20000).toInt.toShort
      pcm(2 * i) = (s & 0xff).toByte // little-endian PCM, the WAV layout
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def realMp4Bytes(seed: Long): Array[Byte] = {
    def u32(v: Long): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      u32(8L + payload.length) ++ typ.getBytes("ISO-8859-1") ++ payload
    val dur = 600L * (1L + seed % 30) // timescale 600 → 1..30 s
    val ftyp = box("ftyp", "isom".getBytes ++ u32(0) ++ "isom".getBytes)
    val mvhd = box("mvhd",
      u32(0) ++ u32(0) ++ u32(0) ++ u32(600) ++ u32(dur) ++ Array.fill(80)(0.toByte))
    val tkhd = box("tkhd",
      u32(0) ++ u32(0) ++ u32(0) ++ u32(1) ++ u32(0) ++ u32(dur) ++
        Array.fill(52)(0.toByte) ++ u32(640L << 16) ++ u32(360L << 16))
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
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
