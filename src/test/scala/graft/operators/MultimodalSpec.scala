package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Binary-column multimodal plumbing: schemas, decode round-trip, frame
  * sampling shape, feature determinism. The codec is a documented stub;
  * the Spark mechanics (mapPartitions/flatMap pipelines over Dataset[T])
  * are what's under test.
  */
class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  import Multimodal._

  private def records = Seq(
    MediaRecord(1L, "image", FakeCodec.encode(640, 480, Array.fill[Byte](100)(7))),
    MediaRecord(2L, "image", FakeCodec.encode(64, 64, Array.fill[Byte](10)(1))),
    MediaRecord(3L, "video", FakeCodec.encode(1920, 1080, Array.fill[Byte](256)(2)))
  ).toDS()

  test("decodeMeta recovers encoded dimensions and byte counts") {
    val meta = decodeMeta(records).collect().sortBy(_.id)
    assert(meta.map(m => (m.id, m.width, m.height, m.nBytes)).toSeq == Seq(
      (1L, 640, 480, 108L), (2L, 64, 64, 18L), (3L, 1920, 1080, 264L)))
  }

  test("metaStats aggregates per media type with long sums") {
    val stats = metaStats(decodeMeta(records)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats("image") == (2L, 704L)) // 640 + 64
    assert(stats("video") == (1L, 1920L))
  }

  test("sampleFrames yields stride-sampled fixed-size chunks, capped") {
    // video payload 256 bytes, 32-byte frames → 8 chunks; stride 2 → 4;
    // cap 3 → frames 0, 2, 4
    val frames = sampleFrames(records.filter(_.mediaType == "video"),
      frameBytes = 32, stride = 2, maxFrames = 3).collect().sortBy(_.frameIndex)
    assert(frames.map(_.frameIndex).toSeq == Seq(0, 2, 4))
    assert(frames.forall(_.frame.length == 32))
    assert(frames.forall(_.id == 3L))
  }

  test("extractFeatures is deterministic and embedding-shaped") {
    val a = extractFeatures(records, dim = 16).collect().sortBy(_.id)
    val b = extractFeatures(records, dim = 16).collect().sortBy(_.id)
    assert(a.length == 3 && a.forall(_.embedding.length == 16))
    assert(a.zip(b).forall { case (x, y) => x.embedding.sameElements(y.embedding) })
    assert(a.forall(_.embedding.forall(v => v >= 0.0f && v <= 1.0f)))
    // different payloads → different features
    assert(!a(0).embedding.sameElements(a(1).embedding))
  }

  test("resize downsamples to maxDim with integer scale; small images untouched") {
    import spark.implicits._
    val raster = Array.tabulate(12 * 8)(i => i.toByte) // 12×8 image
    val recs = Seq(
      Multimodal.MediaRecord(1L, "image", Multimodal.FakeCodec.encode(12, 8, raster)),
      Multimodal.MediaRecord(2L, "image", Multimodal.FakeCodec.encode(4, 3, new Array[Byte](12)))
    ).toDS()
    val out = Multimodal.resize(recs, maxDim = 6).collect().sortBy(_.id)
    val (w1, h1) = Multimodal.FakeCodec.decode(out(0).media)
    assert((w1, h1) == (6, 4)) // scale 2
    // nearest-neighbor: pixel (y, x) of the output is (2y, 2x) of the input
    val outPayload = out(0).media.drop(8)
    assert(outPayload(0) == raster(0) && outPayload(1) == raster(2))
    assert(outPayload(6) == raster(2 * 12)) // output row 1 col 0
    val (w2, h2) = Multimodal.FakeCodec.decode(out(1).media)
    assert((w2, h2) == (4, 3)) // under maxDim: untouched
  }
}
