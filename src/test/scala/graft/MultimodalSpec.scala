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

  test("resize plan preserves aspect ratio within integer rounding, caps max side") {
    val plan = Multimodal.resizePlan(features, maxSide = 256).collect()
    plan.foreach { r =>
      val (w, h, ow, oh) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(math.max(ow, oh) <= 256)
      if (math.max(w, h) <= 256) assert(ow === w && oh === h)
      else assert(math.max(ow, oh) === 256)
    }
  }
}
