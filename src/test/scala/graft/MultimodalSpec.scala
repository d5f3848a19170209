package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkTestBase {

  private lazy val corpus = Multimodal.syntheticCorpus(spark, 30)
  private lazy val features = Multimodal.decode(corpus).toDF()

  test("decode is deterministic and total over the corpus") {
    val a = features.select("media_id", "content_sha").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val b = Multimodal.decode(Multimodal.syntheticCorpus(spark, 30)).toDF()
      .select("media_id", "content_sha").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(a === b)
    assert(a.size === 30)
  }

  test("content dedup collapses identical payloads to min id") {
    val deduped = Multimodal.dedupByContent(features)
    // every 10th record shares payload seed 0 → ids 0,10,20 collapse
    val dupGroup = deduped.filter("n_copies = 3").collect()
    assert(dupGroup.length === 1)
    assert(dupGroup.head.getAs[Long]("media_id") === 0L)
    assert(deduped.count() === 28)
  }

  test("frame sampling emits rows only for video, stepped by interval") {
    val frames = Multimodal.sampleFrames(features, everyMs = 60000)
    val kinds = features.filter("kind = 'video'").count()
    assert(kinds > 0)
    assert(frames.count() >= kinds) // at least frame 0 per video
    assert(frames.filter("frame_ms % 60000 != 0").count() === 0)
  }

  test("binaryFile source ingests a media directory into typed records") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media")
    java.nio.file.Files.write(dir.resolve("a.png"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(dir.resolve("b.wav"), Array[Byte](4, 5, 6, 7))
    val ds = Multimodal.readMediaDir(spark, dir.toString)
    val byKind = ds.collect().map(r => r.kind -> r.bytes.length).toMap
    assert(byKind === Map("image" -> 3, "audio" -> 4))
    val feats = Multimodal.decode(ds).collect()
    assert(feats.forall(_.content_sha.length === 64))
  }

  test("readMediaDir routes gif/mov/bmp to their REAL decode branches") {
    // each of these extensions has a real decoder behind decode()'s kind
    // dispatch — an extension missing from readMediaDir's map silently
    // falls through to the stub's fabricated geometry (the bug this pins)
    val dir = java.nio.file.Files.createTempDirectory("graft-extmap")
    java.nio.file.Files.write(dir.resolve("anim.gif"),
      animatedGif(Seq(0x000000, 0xffffff), w = 12, h = 7, delayCs = 4))
    val bmpImg = new java.awt.image.BufferedImage(
      9, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bmpImg, "bmp", bos)
    java.nio.file.Files.write(dir.resolve("logo.bmp"), bos.toByteArray)
    def u32(v: Long): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      u32(8L + payload.length) ++ typ.getBytes("ISO-8859-1") ++ payload
    val ftyp = box("ftyp", "qt  ".getBytes ++ u32(0) ++ "qt  ".getBytes)
    val mvhd = box("mvhd",
      u32(0) ++ u32(0) ++ u32(0) ++ u32(600) ++ u32(1200) ++
        Array.fill(80)(0.toByte))
    val tkhd = box("tkhd",
      u32(0) ++ u32(0) ++ u32(0) ++ u32(1) ++ u32(0) ++ u32(1200) ++
        Array.fill(52)(0.toByte) ++ u32(320L << 16) ++ u32(240L << 16))
    java.nio.file.Files.write(dir.resolve("clip.mov"),
      ftyp ++ box("moov", mvhd ++ box("trak", tkhd)))

    val feats = Multimodal.decode(Multimodal.readMediaDir(spark, dir.toString))
      .collect()
    assert(feats.length === 3)
    val gif = feats.find(f => f.kind == "video" && f.width == 12).get
    assert(gif.height === 7 && gif.duration_ms === 80L,
      s"gif must hit decodeGifFrames (2 frames @40ms), got $gif")
    val bmp = feats.find(_.kind == "image").get
    assert(bmp.width === 9 && bmp.height === 5,
      s"bmp must hit decodeImage, got $bmp")
    val mov = feats.find(f => f.kind == "video" && f.width == 320).get
    assert(mov.height === 240 && mov.duration_ms === 2000L,
      s"mov must hit decodeVideoMeta, got $mov")
  }

  test("real PNG decodes to true dimensions and a normalized luminance histogram") {
    import java.awt.image.BufferedImage
    // 37x21: left half black, right half white → histogram mass in the
    // darkest and brightest bins only
    val img = new BufferedImage(37, 21, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 21; x <- 0 until 37)
      img.setRGB(x, y, if (x < 18) 0x000000 else 0xffffff)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val dir = java.nio.file.Files.createTempDirectory("graft-realpng")
    java.nio.file.Files.write(dir.resolve("half.png"), buf.toByteArray)

    val feats = Multimodal.decode(Multimodal.readMediaDir(spark, dir.toString)).collect()
    assert(feats.length === 1)
    val f = feats.head
    assert(f.width === 37 && f.height === 21,
      s"imageio must report true dimensions, got ${f.width}x${f.height}")
    assert(f.duration_ms === 0L)
    assert(math.abs(f.feature.sum - 1.0f) < 1e-4, "histogram must be normalized")
    assert(f.feature(0) > 0.4f && f.feature(7) > 0.4f,
      s"half-black/half-white image must fill only the extreme bins: ${f.feature.toSeq}")
    assert((1 to 6).forall(i => f.feature(i) === 0.0f))
  }

  test("real WAV decodes to true duration, sample rate, and amplitude histogram") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 1.5 s of a loud square wave at 8 kHz mono 16-bit PCM: 12,000 frames
    val sampleRate = 8000
    val nFrames = 12000
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val s: Short = if ((i / 20) % 2 == 0) 30000 else -30000
      pcm(2 * i) = (s & 0xff).toByte // little-endian
      pcm(2 * i + 1) = (s >> 8).toByte
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, buf)
    val dir = java.nio.file.Files.createTempDirectory("graft-realwav")
    java.nio.file.Files.write(dir.resolve("square.wav"), buf.toByteArray)

    val feats = Multimodal.decode(Multimodal.readMediaDir(spark, dir.toString)).collect()
    assert(feats.length === 1)
    val f = feats.head
    assert(f.kind === "audio")
    assert(f.duration_ms === 1500L,
      s"javax.sound.sampled must report the true duration, got ${f.duration_ms}")
    assert(f.sample_rate === 8000)
    assert(f.width === 0 && f.height === 0)
    assert(math.abs(f.feature.sum - 1.0f) < 1e-4, "amplitude histogram must be normalized")
    assert(f.feature(7) > 0.99f,
      s"a full-scale square wave lives in the loudest bin: ${f.feature.toSeq}")
  }

  test("µ-law AU decodes a REAL waveform through the JDK conversion stream") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // the same loud square wave, companded to µ-law and written as AU —
    // the classic telephony format whose waveform was formerly stubbed
    val sampleRate = 8000
    val nFrames = 8000
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val s: Short = if ((i / 20) % 2 == 0) 30000 else -30000
      pcm(2 * i) = (s >> 8).toByte // big-endian PCM feeds the ULAW codec
      pcm(2 * i + 1) = (s & 0xff).toByte
    }
    val pcmFmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, true)
    val pcmAis = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), pcmFmt, nFrames.toLong)
    val ulawFmt = new AudioFormat(AudioFormat.Encoding.ULAW,
      sampleRate.toFloat, 8, 1, 1, sampleRate.toFloat, true)
    val ulawAis = AudioSystem.getAudioInputStream(ulawFmt, pcmAis)
    val buf = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ulawAis, AudioFileFormat.Type.AU, buf)
    val dir = java.nio.file.Files.createTempDirectory("graft-ulaw")
    java.nio.file.Files.write(dir.resolve("square.au"), buf.toByteArray)

    val feats = Multimodal.decode(Multimodal.readMediaDir(spark, dir.toString)).collect()
    assert(feats.length === 1)
    val f = feats.head
    assert(f.kind === "audio")
    assert(f.duration_ms === 1000L, s"true AU duration, got ${f.duration_ms}")
    assert(f.sample_rate === 8000)
    assert(math.abs(f.feature.sum - 1.0f) < 1e-4,
      s"µ-law waveform must histogram for real (stub would not normalize to the same shape): ${f.feature.toSeq}")
    // µ-law's max code decodes near full scale — the loudest bin dominates
    assert(f.feature(7) > 0.9f,
      s"square wave must land in the loudest bin after µ-law round-trip: ${f.feature.toSeq}")
  }

  test("real MP4 container decodes to true duration and track geometry") {
    // hand-assembled ISO-BMFF: ftyp + moov(mvhd v0 + trak(tkhd v0)) — the
    // mvhd declares timescale 600 / duration 4500 (= 7500 ms), the tkhd a
    // 640×360 track in 16.16 fixed point
    def u32(v: Long): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      u32(8L + payload.length) ++ typ.getBytes("ISO-8859-1") ++ payload
    val ftyp = box("ftyp", "isom".getBytes ++ u32(0) ++ "isom".getBytes)
    val mvhd = box("mvhd",
      u32(0) ++ u32(0) ++ u32(0) ++ u32(600) ++ u32(4500) ++ Array.fill(80)(0.toByte))
    val tkhd = box("tkhd",
      u32(0) ++ u32(0) ++ u32(0) ++ u32(1) ++ u32(0) ++ u32(4500) ++ // 24 B
        Array.fill(52)(0.toByte) ++ // reserved/layer/volume/matrix → width at 76
        u32(640L << 16) ++ u32(360L << 16))
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    val dir = java.nio.file.Files.createTempDirectory("graft-realmp4")
    java.nio.file.Files.write(dir.resolve("clip.mp4"), ftyp ++ moov)

    val feats = Multimodal.decode(Multimodal.readMediaDir(spark, dir.toString)).collect()
    assert(feats.length === 1)
    val f = feats.head
    assert(f.kind === "video")
    assert(f.duration_ms === 7500L,
      s"mvhd duration/timescale must yield the true duration, got ${f.duration_ms}")
    assert(f.width === 640 && f.height === 360,
      s"tkhd 16.16 geometry must decode, got ${f.width}x${f.height}")
    assert(f.sample_rate === 0)
  }

  // hand-assembled MJPEG AVI: RIFF(AVI ) { LIST(hdrl){avih} LIST(movi){00dc*} }
  // with real ImageIO-encoded JPEG frame payloads of a known solid color
  private def mjpegAvi(frameColors: Seq[Int], w: Int, h: Int,
      usPerFrame: Long, totalFramesOverride: Option[Long] = None): Array[Byte] = {
    def u32le(v: Long): Array[Byte] =
      Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] =
      id.getBytes("ISO-8859-1") ++ u32le(payload.length.toLong) ++ payload ++
        (if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("ISO-8859-1") ++ body)
    def jpegFrame(rgb: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = im.createGraphics()
      g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "jpg", bos)
      bos.toByteArray
    }
    val avih = chunk("avih",
      u32le(usPerFrame) ++ u32le(0) ++ u32le(0) ++ u32le(0) ++
        u32le(totalFramesOverride.getOrElse(frameColors.length.toLong)) ++
        u32le(0) ++ u32le(1) ++ u32le(0) ++
        u32le(w.toLong) ++ u32le(h.toLong) ++ Array.fill(16)(0.toByte))
    val movi = list("movi", frameColors.toArray.flatMap(c => chunk("00dc", jpegFrame(c))))
    val body = "AVI ".getBytes("ISO-8859-1") ++ list("hdrl", avih) ++ movi
    "RIFF".getBytes("ISO-8859-1") ++ u32le(body.length.toLong) ++ body
  }

  test("AVI duration never goes negative on hostile u32 avih fields") {
    // usPerFrame = totalFrames = 0xffffffff: the naive Long product wraps
    // negative (1.84e19 > Long.MaxValue); the BigInt path must yield the
    // true (absurd but non-negative) duration
    val bytes = mjpegAvi(Seq(0xffffff), w = 16, h = 16, usPerFrame = 0xffffffffL,
      totalFramesOverride = Some(0xffffffffL))
    val f = Multimodal.decodeAviFrames(
      Multimodal.MediaRecord(1L, "video", bytes, Map.empty)).get
    val expected = (BigInt(0xffffffffL) * BigInt(0xffffffffL) / 1000).toLong
    assert(f.duration_ms === expected && f.duration_ms >= 0L,
      s"hostile avih product must not wrap: ${f.duration_ms}")
  }

  test("MJPEG AVI decodes true geometry, duration, AND real frame pixels") {
    // 3 bright + 2 dark frames at 25 fps: the mean luminance histogram
    // must put ~0.6 in the top bin and ~0.4 in the bottom — provably
    // decoded from the actual pixels, not a stub
    val bytes = mjpegAvi(Seq(0xffffff, 0x000000, 0xffffff, 0x000000, 0xffffff),
      w = 64, h = 48, usPerFrame = 40000L)
    val f = Multimodal.decode(
      spark.createDataset(Seq(
        Multimodal.MediaRecord(1L, "video", bytes, Map.empty)))(
        org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord])).head()
    assert(f.width === 64 && f.height === 48, s"avih geometry: ${f.width}x${f.height}")
    assert(f.duration_ms === 200L, s"5 frames @40ms = 200ms, got ${f.duration_ms}")
    assert(math.abs(f.feature(7) - 0.6f) < 0.05f,
      s"3/5 white frames => top luminance bin ~0.6, got ${f.feature.toSeq}")
    assert(math.abs(f.feature(0) - 0.4f) < 0.05f,
      s"2/5 black frames => bottom luminance bin ~0.4, got ${f.feature.toSeq}")
  }

  // real animated GIF via ImageIO's sequence writer: per-frame delay set
  // through the standard javax_imageio_gif_image_1.0 metadata tree
  private def animatedGif(frameColors: Seq[Int], w: Int, h: Int,
                          delayCs: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frameColors.foreach { c =>
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = im.createGraphics()
      g.setColor(new java.awt.Color(c)); g.fillRect(0, 0, w, h); g.dispose()
      val meta = writer.getDefaultImageMetadata(
        javax.imageio.ImageTypeSpecifier.createFromRenderedImage(im),
        writer.getDefaultWriteParam)
      val fmt = "javax_imageio_gif_image_1.0"
      val tree = meta.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val gce = {
        val found = tree.getElementsByTagName("GraphicControlExtension")
        if (found.getLength > 0) found.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        else {
          val n = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
          tree.appendChild(n); n
        }
      }
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("transparentColorIndex", "0")
      gce.setAttribute("delayTime", delayCs.toString)
      meta.setFromTree(fmt, tree)
      writer.writeToSequence(new javax.imageio.IIOImage(im, null, meta), null)
    }
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("animated GIF decodes true geometry, frame delays, AND real frame pixels") {
    // 3 white + 2 black frames at 10cs (100ms) each: total 500ms, mean
    // luminance histogram ~0.6 top bin / ~0.4 bottom — provably decoded
    // from the actual frames, not the stub or a first-frame-only read
    val bytes = animatedGif(Seq(0xffffff, 0x000000, 0xffffff, 0x000000, 0xffffff),
      w = 40, h = 24, delayCs = 10)
    val f = Multimodal.decode(
      spark.createDataset(Seq(
        Multimodal.MediaRecord(7L, "video", bytes, Map.empty)))(
        org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord])).head()
    assert(f.width === 40 && f.height === 24,
      s"logical screen geometry: ${f.width}x${f.height}")
    assert(f.duration_ms === 500L, s"5 frames @100ms = 500ms, got ${f.duration_ms}")
    assert(math.abs(f.feature(7) - 0.6f) < 0.05f,
      s"3/5 white frames => top luminance bin ~0.6, got ${f.feature.toSeq}")
    assert(math.abs(f.feature(0) - 0.4f) < 0.05f,
      s"2/5 black frames => bottom luminance bin ~0.4, got ${f.feature.toSeq}")
  }

  test("single-frame GIF as an image still decodes via the plain image path") {
    val bytes = animatedGif(Seq(0x808080), w = 12, h = 8, delayCs = 0)
    val f = Multimodal.decode(
      spark.createDataset(Seq(
        Multimodal.MediaRecord(8L, "image", bytes, Map.empty)))(
        org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord])).head()
    assert(f.width === 12 && f.height === 8)
    assert(f.duration_ms === 0L, "images carry no duration")
  }

  test("AVI with undecodable (non-MJPEG) frames still yields real container metadata") {
    val good = mjpegAvi(Seq(0x808080), w = 32, h = 16, usPerFrame = 100000L)
    // corrupt the JPEG payloads but keep the RIFF structure: find the movi
    // frame chunk and zero its payload
    val bytes = good.clone()
    val idx = {
      var i = -1
      var o = 0
      while (i < 0 && o + 4 <= bytes.length) {
        if (bytes(o) == '0' && bytes(o + 1) == '0' && bytes(o + 2) == 'd' && bytes(o + 3) == 'c') i = o
        o += 1
      }
      i
    }
    assert(idx > 0)
    java.util.Arrays.fill(bytes, idx + 8, bytes.length, 0.toByte)
    val f = Multimodal.decode(
      spark.createDataset(Seq(
        Multimodal.MediaRecord(2L, "video", bytes, Map.empty)))(
        org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord])).head()
    assert(f.width === 32 && f.height === 16)
    assert(f.duration_ms === 100L)
  }

  // MPEG1 Layer III 128 kbps @ 44100 Hz stereo, no padding: header
  // FF FB 90 00, frame length 144*128000/44100 = 417 bytes
  private def mp3Frame(payload: Array[Byte] => Unit = _ => ()): Array[Byte] = {
    val f = new Array[Byte](417)
    f(0) = 0xff.toByte; f(1) = 0xfb.toByte; f(2) = 0x90.toByte; f(3) = 0x00
    payload(f)
    f
  }

  test("real MP3 decodes true duration and sample rate by walking frame headers") {
    // ID3v2 tag (100-byte body) + 10 CBR frames: each frame is 1152
    // samples at 44100 Hz = 26122 µs → 261220 µs total → 261 ms
    val id3 = "ID3".getBytes("ISO-8859-1") ++ Array[Byte](4, 0, 0, 0, 0, 0, 100) ++
      Array.fill(100)(0.toByte)
    val bytes = id3 ++ Array.fill(10)(mp3Frame()).flatten
    val dir = java.nio.file.Files.createTempDirectory("graft-realmp3")
    java.nio.file.Files.write(dir.resolve("tone.mp3"), bytes)

    val feats = Multimodal.decode(Multimodal.readMediaDir(spark, dir.toString)).collect()
    assert(feats.length === 1)
    val f = feats.head
    assert(f.kind === "audio")
    assert(f.duration_ms === 261L,
      s"frame walk must yield the true duration, got ${f.duration_ms}")
    assert(f.sample_rate === 44100)
    assert(f.width === 0 && f.height === 0)
  }

  test("single-frame MP3 with an ID3v1 trailer still decodes (strict sync fallback)") {
    // one valid frame + the 128-byte "TAG" trailer: the two-frame sync
    // rule fails (next bytes are not a frame), the lone-parse fallback
    // must still accept the real sync at offset 0 — 1152 samples at
    // 44100 Hz = 26 ms, not a stub duration
    val bytes = mp3Frame() ++ ("TAG" + "x" * 125).getBytes("ISO-8859-1")
    val dir = java.nio.file.Files.createTempDirectory("graft-mp3tag")
    java.nio.file.Files.write(dir.resolve("one.mp3"), bytes)
    val feats = Multimodal.decode(Multimodal.readMediaDir(spark, dir.toString)).collect()
    assert(feats.length === 1)
    assert(feats.head.duration_ms === 26L,
      s"lone frame + tag trailer must decode for real, got ${feats.head.duration_ms}")
    assert(feats.head.sample_rate === 44100)
  }

  test("MP3 Xing (VBR) header takes precedence over the frame walk") {
    // first frame carries Xing at side-info offset 32+4 declaring 250
    // frames → 250 * 1152 * 1e6 / 44100 = 6530612 µs → 6530 ms, even
    // though only two physical frames follow in the byte stream
    val first = mp3Frame { f =>
      "Xing".getBytes("ISO-8859-1").copyToArray(f, 36)
      f(43) = 1 // flags: frames field present
      f(44) = 0; f(45) = 0; f(46) = 0; f(47) = 250.toByte
    }
    val bytes = first ++ mp3Frame()
    val dir = java.nio.file.Files.createTempDirectory("graft-xingmp3")
    java.nio.file.Files.write(dir.resolve("vbr.mp3"), bytes)

    val feats = Multimodal.decode(Multimodal.readMediaDir(spark, dir.toString)).collect()
    assert(feats.length === 1)
    assert(feats.head.duration_ms === 6530L,
      s"Xing frame count must define the duration, got ${feats.head.duration_ms}")
    assert(feats.head.sample_rate === 44100)
  }

  test("non-BMFF video bytes fall back to the deterministic stub") {
    val dir = java.nio.file.Files.createTempDirectory("graft-badmp4")
    java.nio.file.Files.write(dir.resolve("broken.mp4"), Array[Byte](0x1a, 0x45, -33, -93, 9, 9))
    val feats = Multimodal.decode(Multimodal.readMediaDir(spark, dir.toString)).collect()
    assert(feats.length === 1 && feats.head.kind === "video")
    assert(feats.head.content_sha.length === 64)
    assert(feats.head.duration_ms > 0L, "stub still emits plausible duration")
  }

  test("non-WAV audio bytes fall back to the deterministic stub") {
    val dir = java.nio.file.Files.createTempDirectory("graft-badwav")
    java.nio.file.Files.write(dir.resolve("broken.mp3"), Array[Byte](3, 1, 4, 1, 5))
    val feats = Multimodal.decode(Multimodal.readMediaDir(spark, dir.toString)).collect()
    assert(feats.length === 1 && feats.head.kind === "audio")
    assert(feats.head.content_sha.length === 64)
    assert(feats.head.duration_ms > 0L, "stub still emits plausible duration")
  }

  test("undecodable image bytes fall back to the deterministic stub") {
    val dir = java.nio.file.Files.createTempDirectory("graft-badpng")
    java.nio.file.Files.write(dir.resolve("broken.png"), Array[Byte](9, 9, 9))
    val feats = Multimodal.decode(Multimodal.readMediaDir(spark, dir.toString)).collect()
    assert(feats.length === 1 && feats.head.content_sha.length === 64)
    assert(feats.head.width > 0 && feats.head.height > 0)
  }

  test("resize plan preserves aspect ratio within integer rounding, caps max side") {
    val plan = Multimodal.resizePlan(features, maxSide = 256).collect()
    plan.foreach { r =>
      val (w, h, ow, oh) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(math.max(ow, oh) <= 256)
      if (math.max(w, h) <= 256) assert(ow === w && oh === h)
      else assert(math.max(ow, oh) === 256)
    }
  }

  test("real-bytes synthetic corpus decodes through the REAL decoders, not the stub") {
    // the benched fixture must exercise ImageIO/AudioSystem/the box
    // walker — pin the true decoded values so a generator regression
    // can't silently route the bench through pseudoDecode
    val feats = Multimodal.decode(Multimodal.syntheticMediaCorpus(spark, 30))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats.size === 30)
    val img = feats(3L) // seed 3, image
    assert(img.kind === "image" && img.width === 32 && img.height === 32,
      s"PNG must decode its true 32x32 geometry, got ${img.width}x${img.height}")
    assert(math.abs(img.feature.sum - 1.0f) < 1e-4,
      "image histogram must normalize (stub features do not)")
    val aud = feats(4L) // seed 4, audio
    assert(aud.kind === "audio" && aud.sample_rate === 8000 &&
      aud.duration_ms === 250L,
      s"WAV must decode true rate/duration, got ${aud.sample_rate}/${aud.duration_ms}")
    val vid = feats(5L) // seed 5, video: dur = 600*(1+5%30) ticks @600 → 6000 ms
    assert(vid.kind === "video" && vid.duration_ms === 6000L &&
      vid.width === 640 && vid.height === 360,
      s"MP4 mvhd/tkhd must decode, got ${vid.duration_ms} ${vid.width}x${vid.height}")
    // every 10th row repeats payload seed 0 within its kind → content
    // dedup collapses them (ids 0,30 image; 10,40 audio; 20,50 video at
    // n=30: ids 0/10/20 are the only seed-0 rows, each kind-distinct)
    val dedup = Multimodal.dedupByContent(
      Multimodal.decode(Multimodal.syntheticMediaCorpus(spark, 60)).toDF())
    val copies = dedup.collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(copies(0L) === 2L && copies(10L) === 2L && copies(20L) === 2L,
      s"seed-0 payloads must collapse per kind: $copies")
  }
}
