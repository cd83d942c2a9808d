package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns travelling next to a typed metadata struct.
  *
  * The Spark-side mechanics here are real and tested — schema, per-partition
  * batched processing, deterministic output — while the actual codec work is
  * STUBBED (`DecoderStub`): the image/audio libraries are not present in
  * this environment. Swapping `DecoderStub.decode` for a real JNI/FFmpeg/
  * libvips call changes nothing about the plan shape: decode stays a
  * narrow (shuffle-free) per-partition map whose parallelism is the file
  * split count, which is exactly what a 100 TB media crawl needs.
  */
object Multimodal {

  /** Typed media metadata — what a real decoder would extract. */
  case class MediaMeta(format: String, width: Int, height: Int,
                       channels: Int, sizeBytes: Long)

  case class MediaRow(doc_id: Long, content: Array[Byte])
  case class DecodedRow(doc_id: Long, meta: MediaMeta, features: Array[Float])

  /** STUB decoder: parses our deterministic fake header instead of a real
    * codec. Replace the body (only) with e.g. ImageIO/libvips to go live. */
  object DecoderStub {
    val HeaderLen = 16
    def decode(payload: Array[Byte]): MediaMeta = {
      require(payload.length >= HeaderLen, "truncated media payload")
      val bb = java.nio.ByteBuffer.wrap(payload)
      val fmt = payload(0) match {
        case 0 => "png"; case 1 => "jpeg"; case 2 => "wav"; case _ => "bin"
      }
      MediaMeta(fmt, bb.getInt(4), bb.getInt(8), bb.getInt(12) & 0x7, payload.length.toLong)
    }
    /** Fake feature extractor: 8 deterministic moments of the payload bytes. */
    def features(payload: Array[Byte], n: Int = 8): Array[Float] = {
      val out = new Array[Float](n)
      var i = 0
      while (i < payload.length) {
        out(i % n) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      var j = 0
      while (j < n) { out(j) /= math.max(1, payload.length / n).toFloat; j += 1 }
      out
    }
  }

  /** Synthesize a deterministic binary media column from an integer id —
    * stands in for reading real media files; keeps tests hermetic. The
    * generation itself is a narrow typed map (same shape as reading real
    * payloads with `binaryFile` source). */
  def syntheticMedia(spark: SparkSession, df: DataFrame, idCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val bodyLen = (id % 1024).toInt + 32
      val bb = java.nio.ByteBuffer.allocate(DecoderStub.HeaderLen + bodyLen)
      bb.put(0, (id % 3).toByte)
      bb.putInt(4, (id % 64).toInt * 16 + 16)  // width
      bb.putInt(8, (id % 48).toInt * 16 + 16)  // height
      bb.putInt(12, 3)                          // channels
      var i = 0
      while (i < bodyLen) {
        bb.put(DecoderStub.HeaderLen + i, ((id * 31 + i * 7) % 251).toByte)
        i += 1
      }
      MediaRow(id, bb.array())
    }
  }

  /** Decode + feature-extract: batched per-partition map (no shuffle). The
    * real-world analogue of `mapInPandas` batches on the JVM side. */
  def decodeAndFeaturize(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          DecodedRow(r.doc_id, DecoderStub.decode(r.content), DecoderStub.features(r.content))
        }
      }
  }

  /** Frame sampling for video-like payloads: emit every `stride`-th chunk of
    * the body as a frame row — demonstrates the 1→N generator shape
    * (posexplode over in-row chunking, still shuffle-free). Frames are
    * base64 text chunks here; a real sampler would slice decoded frames. */
  def frameSample(media: DataFrame, stride: Int): DataFrame = {
    val b64 = base64(col("content"))
    media.select(col("doc_id"),
      posexplode(transform(
        sequence(lit(0), greatest(ceil(length(b64) / stride) - 1, lit(0))),
        i => b64.substr((i * stride + 1).cast("int"), lit(stride))))
        .as(Seq("frame_no", "frame")))
  }
}
