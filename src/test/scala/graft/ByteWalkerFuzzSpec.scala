package graft

import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

/** Adversarial fuzz over the pure-byte media walkers ([[Multimodal]]):
  * hostile inputs must neither throw out of the decode API nor loop.
  * Every walker is total — `Some(features)` or `None`, nothing else —
  * because a single crafted blob in a 100 TB corpus must cost one stub
  * fallback, not a task retry storm or a hung executor.
  *
  * Termination is asserted for real, not assumed: each fuzz batch runs on
  * a watchdog thread with a hard timeout, so a size-cycle or non-advancing
  * parse loop fails the suite instead of hanging it. The walkers'
  * termination arguments: the BMFF walk rejects any box with
  * `size < 8 || off + size > to` and otherwise advances `off` by ≥ 8 with
  * recursion capped at depth 8; the MP3 walk only accepts frames with
  * `frameBytes ≥ 5` (strict forward progress) under an absolute frame cap;
  * sync scanning is bounded to a 64 KiB window.
  *
  * Mutations are seeded — failures reproduce exactly.
  */
class ByteWalkerFuzzSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  /** Run `body` under a hard wall-clock bound on a daemon watchdog thread. */
  private def bounded[T](seconds: Int, what: String)(body: => T): T = {
    val ex = Executors.newSingleThreadExecutor { r =>
      val t = new Thread(r, "walker-fuzz"); t.setDaemon(true); t
    }
    try {
      val fut = ex.submit(new java.util.concurrent.Callable[T] { def call(): T = body })
      try fut.get(seconds.toLong, TimeUnit.SECONDS)
      catch {
        case _: TimeoutException => fail(s"$what did not terminate within ${seconds}s")
      }
    } finally ex.shutdownNow()
  }

  // --- real base artifacts (same constructions the decode specs pin) ---

  private def u32be(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    u32be(8L + payload.length) ++ typ.getBytes("ISO-8859-1") ++ payload

  private val realMp4: Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes ++ u32be(0) ++ "isom".getBytes)
    val mvhd = box("mvhd",
      u32be(0) ++ u32be(0) ++ u32be(0) ++ u32be(600) ++ u32be(4500) ++
        Array.fill(80)(0.toByte))
    val tkhd = box("tkhd",
      u32be(0) ++ u32be(0) ++ u32be(0) ++ u32be(1) ++ u32be(0) ++ u32be(4500) ++
        Array.fill(52)(0.toByte) ++ u32be(640L << 16) ++ u32be(360L << 16))
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
  }

  private def mp3Frame: Array[Byte] = {
    val f = new Array[Byte](417)
    f(0) = 0xff.toByte; f(1) = 0xfb.toByte; f(2) = 0x90.toByte
    f
  }
  private val realMp3: Array[Byte] =
    "ID3".getBytes("ISO-8859-1") ++ Array[Byte](4, 0, 0, 0, 0, 0, 100) ++
      Array.fill(100)(0.toByte) ++ Array.fill(6)(mp3Frame).flatten

  private val realWav: Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val pcm = Array.tabulate(4000 * 2)(i => ((i * 37) % 251).toByte)
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, 4000L)
    val buf = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  private def u32le(v: Long): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def riffChunk(id: String, payload: Array[Byte]): Array[Byte] =
    id.getBytes("ISO-8859-1") ++ u32le(payload.length.toLong) ++ payload ++
      (if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
  private def riffList(typ: String, body: Array[Byte]): Array[Byte] =
    riffChunk("LIST", typ.getBytes("ISO-8859-1") ++ body)

  private val realAvi: Array[Byte] = {
    val im = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "jpg", bos)
    val avih = riffChunk("avih",
      u32le(40000L) ++ u32le(0) ++ u32le(0) ++ u32le(0) ++ u32le(3) ++ u32le(0) ++
        u32le(1) ++ u32le(0) ++ u32le(16) ++ u32le(16) ++ Array.fill(16)(0.toByte))
    val movi = riffList("movi", Array.fill(3)(riffChunk("00dc", bos.toByteArray)).flatten)
    val body = "AVI ".getBytes("ISO-8859-1") ++ riffList("hdrl", avih) ++ movi
    "RIFF".getBytes("ISO-8859-1") ++ u32le(body.length.toLong) ++ body
  }

  // --- seeded mutators ---

  private val hostileWords =
    Seq(0L, 1L, 2L, 7L, 8L, 16L, 0x7fffffffL, 0xffffffffL, 0xfffffff8L)

  private def mutations(base: Array[Byte], seed: Long): Seq[Array[Byte]] = {
    val truncs = samples(Gen.choose(0, base.length), 40, seed)
      .map(n => base.take(n))
    val flips = samples(Gen.zip(Gen.choose(0, base.length - 1), Gen.choose(0, 255)), 60, seed + 1000)
      .map { case (i, v) => val c = base.clone(); c(i) = v.toByte; c }
    val splices = samples(
      Gen.zip(Gen.choose(0, math.max(0, base.length - 4)), Gen.oneOf(hostileWords)),
      60, seed + 2000)
      .map { case (i, w) => val c = base.clone(); u32be(w).copyToArray(c, i); c }
    val doubled = Seq(base ++ base, base.reverse, base.drop(base.length / 2) ++ base)
    truncs ++ flips ++ splices ++ doubled
  }

  private def rec(bytes: Array[Byte], kind: String) =
    MediaRecord(1L, kind, bytes, Map.empty)

  test("BMFF walker is total and terminates on mutated/hostile boxes") {
    bounded(90, "decodeVideoMeta") {
      val crafted = Seq(
        // size=0 first box (extends to EOF), then truncated garbage
        u32be(0) ++ "moov".getBytes ++ Array.fill(11)(0x6d.toByte),
        // size=1 + 64-bit largesize far past EOF
        u32be(1) ++ "moov".getBytes ++ u32be(0x7fffffffL) ++ u32be(0xffffffffL) ++ Array.fill(8)(0.toByte),
        // size=1 + largesize=8: zero-payload largebox (end == off+8 < payload)
        u32be(1) ++ "ftyp".getBytes ++ u32be(0) ++ u32be(8) ++ Array.fill(16)(0.toByte),
        // depth bomb: 64 nested containers
        (1 to 64).foldLeft(box("mvhd", Array.fill(28)(0.toByte)))((acc, _) => box("moov", acc)),
        // box size exactly 8 repeated to EOF (minimal forward progress)
        Array.fill(512)(box("free", Array.empty[Byte])).flatten,
        // backward-pointing size is unrepresentable (u32), but size=9 with
        // one payload byte missing at EOF must stop cleanly
        box("moov", Array.empty[Byte]).dropRight(1) ++ u32be(9) ++ "trak".getBytes)
      (mutations(realMp4, 7L) ++ crafted).foreach { bytes =>
        val out = Multimodal.decodeVideoMeta(rec(bytes, "video"))
        out.foreach(f => assert(f.duration_ms >= 0 && f.width >= 0 && f.height >= 0))
      }
    }
  }

  test("MP3 walker is total and terminates on mutated/hostile frames") {
    bounded(90, "decodeMp3Meta") {
      val crafted = Seq(
        // ID3 size claiming past EOF
        "ID3".getBytes ++ Array[Byte](4, 0, 0, 0x7f, 0x7f, 0x7f, 0x7f) ++ Array.fill(4)(0.toByte),
        // all sync bytes: every offset looks like a header start
        Array.fill(8192)(0xff.toByte),
        // valid first header, frame body truncated mid-stream
        mp3Frame.take(200),
        // reserved version / reserved layer / bad bitrate / bad samplerate
        Array(0xff, 0xeb, 0x90, 0x00).map(_.toByte) ++ Array.fill(64)(0.toByte),
        Array(0xff, 0xf9, 0x90, 0x00).map(_.toByte) ++ Array.fill(64)(0.toByte),
        Array(0xff, 0xfb, 0xf0, 0x00).map(_.toByte) ++ Array.fill(64)(0.toByte),
        Array(0xff, 0xfb, 0x9c, 0x00).map(_.toByte) ++ Array.fill(64)(0.toByte),
        // Xing flag set but frame-count field beyond the buffer
        mp3Frame.take(40) ++ "Xing".getBytes ++ Array[Byte](0, 0, 0, 1))
      (mutations(realMp3, 11L) ++ crafted).foreach { bytes =>
        val out = Multimodal.decodeMp3Meta(rec(bytes, "audio"))
        out.foreach(f => assert(f.duration_ms >= 0 && f.sample_rate > 0))
      }
    }
  }

  test("AVI walker is total and terminates on mutated/hostile chunks") {
    bounded(90, "decodeAviFrames") {
      val hdr = "RIFF".getBytes ++ u32le(0xffffffffL) ++ "AVI ".getBytes
      val crafted = Seq(
        // RIFF size far past EOF (walk must cap at the buffer)
        hdr ++ riffChunk("avih", Array.fill(56)(0.toByte)),
        // zero-size chunks repeated: minimal (8-byte) forward progress
        hdr ++ Array.fill(512)(riffChunk("junk", Array.empty[Byte])).flatten,
        // LIST whose declared size overruns its parent: stop that level
        hdr ++ "LIST".getBytes ++ u32le(0x7fffffffL) ++ "hdrl".getBytes,
        // depth bomb: 64 nested LISTs
        hdr ++ (1 to 64).foldLeft(riffChunk("avih", Array.fill(56)(0.toByte)))(
          (acc, _) => riffList("hdrl", acc)),
        // frame chunk with a giant size claim
        hdr ++ riffList("movi", "00dc".getBytes ++ u32le(0xfffffff8L) ++ Array.fill(16)(0.toByte)),
        // odd-size chunk at EOF with the pad byte missing
        hdr ++ riffChunk("avih", Array.fill(56)(0.toByte)) ++
          "00dc".getBytes ++ u32le(3L) ++ Array[Byte](1, 2, 3))
      (mutations(realAvi, 17L) ++ crafted).foreach { bytes =>
        val out = Multimodal.decodeAviFrames(rec(bytes, "video"))
        out.foreach(f => assert(f.duration_ms >= 0 && f.width >= 0 && f.height >= 0))
      }
    }
  }

  test("WAV decode is total on mutated RIFF bytes; cross-fed formats never throw") {
    bounded(90, "decodeAudio/cross-feed") {
      mutations(realWav, 13L).foreach { bytes =>
        Multimodal.decodeAudio(rec(bytes, "audio"))
      }
      // cross-feed every artifact to every walker: wrong-format bytes must
      // yield None (or a well-formed accidental parse), never an exception
      for (bytes <- Seq(realMp4, realMp3, realWav, realAvi)) {
        Multimodal.decodeVideoMeta(rec(bytes, "video"))
        Multimodal.decodeMp3Meta(rec(bytes, "audio"))
        Multimodal.decodeAudio(rec(bytes, "audio"))
        Multimodal.decodeImage(rec(bytes, "image"))
        Multimodal.decodeAviFrames(rec(bytes, "video"))
      }
    }
  }
}
