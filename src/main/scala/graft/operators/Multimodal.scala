package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal column handling for LLM training-data pipelines
  * (north-star): image/audio/video payloads ride through the engine as
  * opaque `binary` columns with typed metadata alongside, exactly like a
  * production lakehouse layout (parquet keeps binaries columnar and
  * page-compressed; metadata columns stay prunable).
  *
  * The *decode* kernels here are STUBS — deterministic fake codecs over a
  * toy 8-byte header (this container ships no image/audio libraries). The
  * Spark-side plumbing is real and is the point: case-class schemas,
  * iterator-to-iterator `mapPartitions` (no per-row lambda dispatch, no
  * driver round-trip, streaming-friendly at 100 TB), and explode-shaped
  * frame sampling. Swap [[FakeCodec]] for a real JNI/library codec and
  * nothing else changes.
  */
object Multimodal {

  /** An opaque media payload plus routing metadata. */
  final case class MediaRecord(id: Long, mediaType: String, media: Array[Byte])

  /** Decoded (fake) image header + payload stats. */
  final case class MediaMeta(id: Long, mediaType: String, width: Int, height: Int, nBytes: Long)

  /** Fixed-size feature vector extracted from the payload. */
  final case class MediaFeatures(id: Long, embedding: Array[Float])

  /** One sampled frame of a (fake) video payload. */
  final case class Frame(id: Long, frameIndex: Int, frame: Array[Byte])

  /** STUB codec: header = width (int32 BE) ++ height (int32 BE), payload
    * follows. A real implementation would parse JPEG/PNG/WAV containers.
    */
  object FakeCodec {
    def encode(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + payload.length)
      bb.putInt(width).putInt(height).put(payload)
      bb.array()
    }
    def decode(media: Array[Byte]): (Int, Int) = {
      val bb = ByteBuffer.wrap(media)
      (bb.getInt, bb.getInt)
    }
  }

  /** Decode typed metadata out of the binary column — one pass, executed
    * inside the partition iterator (no shuffle, no driver).
    */
  def decodeMeta(records: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val (w, h) = FakeCodec.decode(r.media)
        MediaMeta(r.id, r.mediaType, w, h, r.media.length.toLong)
      }
    }
  }

  /** STUB feature extractor: `dim` floats derived from a rolling hash of
    * the payload — deterministic, embedding-shaped. A real pipeline would
    * run a vision/audio encoder here (batched per partition).
    */
  def extractFeatures(records: Dataset[MediaRecord], dim: Int): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val v = new Array[Float](dim)
        var h = 0xCBF29CE484222325L
        var i = 0
        while (i < r.media.length) { h ^= (r.media(i) & 0xFFL); h *= 0x100000001B3L; i += 1 }
        var d = 0
        while (d < dim) {
          h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 33)
          v(d) = (h & 0xFFFF).toFloat / 0xFFFF
          d += 1
        }
        MediaFeatures(r.id, v)
      }
    }
  }

  /** STUB resize: nearest-neighbor downsample of the fake w×h byte
    * raster so that max(w, h) <= maxDim (integer scale factor; never
    * upscales). Binary in → binary out inside the partition iterator —
    * the standard pre-tokenization image normalization step; swap the
    * loop for a real scaler and the plan is unchanged.
    */
  def resize(records: Dataset[MediaRecord], maxDim: Int): Dataset[MediaRecord] = {
    require(maxDim > 0, "maxDim must be positive")
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val (w, h) = FakeCodec.decode(r.media)
        val scale = math.max(1, math.ceil(math.max(w, h).toDouble / maxDim).toInt)
        if (scale == 1) r
        else {
          val payload = r.media.drop(8)
          val nw = math.max(1, w / scale)
          val nh = math.max(1, h / scale)
          val out = new Array[Byte](nw * nh)
          var y = 0
          while (y < nh) {
            var x = 0
            while (x < nw) {
              val idx = (y * scale) * w + (x * scale)
              out(y * nw + x) = if (idx < payload.length) payload(idx) else 0
              x += 1
            }
            y += 1
          }
          MediaRecord(r.id, r.mediaType, FakeCodec.encode(nw, nh, out))
        }
      }
    }
  }

  /** Sample every `stride`-th fixed-size chunk of the payload as a
    * "frame" (explode shape: one row in, up to `maxFrames` rows out).
    */
  def sampleFrames(
      records: Dataset[MediaRecord],
      frameBytes: Int,
      stride: Int,
      maxFrames: Int): Dataset[Frame] = {
    import records.sparkSession.implicits._
    records.flatMap { r =>
      val payload = r.media.drop(8)
      val nChunks = payload.length / frameBytes
      (0 until nChunks by stride).take(maxFrames).map { c =>
        Frame(r.id, c, payload.slice(c * frameBytes, (c + 1) * frameBytes))
      }
    }
  }

  /** Per-media-type stats over decoded metadata (the end of the demo
    * pipeline: binary in, prunable relational columns out).
    */
  def metaStats(meta: Dataset[MediaMeta]): DataFrame = {
    import org.apache.spark.sql.functions._
    meta.toDF()
      .groupBy(col("mediaType").as("media_type"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("width").cast("long")).as("sum_width"),
        sum(col("height").cast("long")).as("sum_height"),
        sum(col("nBytes")).as("sum_bytes"))
      .select(col("media_type"), col("n_media"), col("sum_width"),
        col("sum_height"), col("sum_bytes"))
  }
}
