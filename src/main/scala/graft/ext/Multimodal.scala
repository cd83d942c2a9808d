package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns travelling next to a typed metadata struct.
  *
  * The Spark-side mechanics — schema, per-partition batched processing,
  * deterministic output — are codec-agnostic: decode is a narrow
  * (shuffle-free) per-partition map whose parallelism is the file split
  * count, which is exactly what a 100 TB media crawl needs. The codec
  * itself is a pluggable [[MediaDecoder]]:
  *
  *  - [[ImageIoDecoder]] — a REAL image decode via the JDK's `javax.imageio`
  *    (PNG/JPEG/GIF/BMP), no external libraries;
  *  - [[HeaderStubDecoder]] — a deterministic fake-header parser standing in
  *    for codecs whose libraries aren't present (audio/video); swap in a
  *    JNI/FFmpeg/libvips-backed decoder without touching the plan shape.
  */
object Multimodal {

  /** Typed media metadata — what a real decoder would extract. */
  case class MediaMeta(format: String, width: Int, height: Int,
                       channels: Int, sizeBytes: Long)

  case class MediaRow(doc_id: Long, content: Array[Byte])
  case class DecodedRow(doc_id: Long, meta: MediaMeta, features: Array[Float])

  /** Pluggable codec boundary: bytes in, typed metadata + a fixed-width
    * feature vector out. Implementations must be Serializable (the decoder
    * ships inside the task closure) and thread-safe per executor. */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): MediaMeta
    def features(payload: Array[Byte], n: Int = 8): Array[Float]
  }

  /** STUB decoder: parses the deterministic fake header [[syntheticMedia]]
    * writes — the stand-in for codecs with no JVM library here. */
  object HeaderStubDecoder extends MediaDecoder {
    val HeaderLen = 16
    override def decode(payload: Array[Byte]): MediaMeta = {
      require(payload.length >= HeaderLen, "truncated media payload")
      val bb = java.nio.ByteBuffer.wrap(payload)
      val fmt = payload(0) match {
        case 0 => "png"; case 1 => "jpeg"; case 2 => "wav"; case _ => "bin"
      }
      MediaMeta(fmt, bb.getInt(4), bb.getInt(8), bb.getInt(12) & 0x7, payload.length.toLong)
    }
    /** Fake feature extractor: 8 deterministic moments of the payload bytes. */
    override def features(payload: Array[Byte], n: Int = 8): Array[Float] = {
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

  /** Real image decode on the JDK's ImageIO (PNG/JPEG/GIF/BMP — headless,
    * no native deps). Format comes from the matched ImageReader, dimensions
    * and band count from the decoded raster; features are per-strip mean
    * luminances over `n` vertical strips of the image — a deterministic,
    * resolution-independent 8-float thumbnail signature. */
  object ImageIoDecoder extends MediaDecoder {
    private def read(payload: Array[Byte]): (String, java.awt.image.BufferedImage) = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, "no ImageIO reader recognizes this payload")
        val reader = readers.next()
        try {
          reader.setInput(iis)
          (reader.getFormatName.toLowerCase, reader.read(0))
        } finally reader.dispose()
      } finally iis.close()
    }

    override def decode(payload: Array[Byte]): MediaMeta = {
      val (fmt, img) = read(payload)
      MediaMeta(fmt, img.getWidth, img.getHeight,
        img.getRaster.getNumBands, payload.length.toLong)
    }

    override def features(payload: Array[Byte], n: Int = 8): Array[Float] = {
      val (_, img) = read(payload)
      val out = new Array[Float](n)
      val counts = new Array[Int](n)
      val w = img.getWidth; val h = img.getHeight
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val strip = math.min(n - 1, x * n / w)
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / (3f * 255f)
          out(strip) += lum
          counts(strip) += 1
          x += 1
        }
        y += 1
      }
      var i = 0
      while (i < n) { out(i) /= math.max(1, counts(i)); i += 1 }
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
      val bb = java.nio.ByteBuffer.allocate(HeaderStubDecoder.HeaderLen + bodyLen)
      bb.put(0, (id % 3).toByte)
      bb.putInt(4, (id % 64).toInt * 16 + 16)  // width
      bb.putInt(8, (id % 48).toInt * 16 + 16)  // height
      bb.putInt(12, 3)                          // channels
      var i = 0
      while (i < bodyLen) {
        bb.put(HeaderStubDecoder.HeaderLen + i, ((id * 31 + i * 7) % 251).toByte)
        i += 1
      }
      MediaRow(id, bb.array())
    }
  }

  /** Synthesize REAL PNG payloads (procedural gradient, dimensions derived
    * from the id the same way [[syntheticMedia]] stamps its header) — real
    * bytes for the [[ImageIoDecoder]] path with no media files on disk.
    * Same narrow typed-map shape as a `binaryFile` read. */
  def syntheticImageMedia(spark: SparkSession, df: DataFrame, idCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val w = (id % 64).toInt * 16 + 16
      val h = (id % 48).toInt * 16 + 16
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (((x * 255 / w) << 16) | ((y * 255 / h) << 8) |
            ((id % 251).toInt)).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      MediaRow(id, bos.toByteArray)
    }
  }

  // ------------------------------------------------------------- audio ----

  case class AudioMeta(format: String, sampleRate: Int, channels: Int,
                       frames: Long, sizeBytes: Long)
  case class DecodedAudioRow(doc_id: Long, meta: AudioMeta, features: Array[Float])

  /** Audio twin of [[MediaDecoder]]: bytes in, typed audio metadata + a
    * fixed-width feature vector out. */
  trait AudioDecoder extends Serializable {
    def decode(payload: Array[Byte]): AudioMeta
    def features(payload: Array[Byte], n: Int = 8): Array[Float]
  }

  /** REAL audio decode on the JDK's `javax.sound.sampled` (WAV/AIFF/AU —
    * headless, no native deps). Metadata comes from the parsed header;
    * features are per-window RMS amplitudes over `n` equal windows of the
    * 16-bit PCM stream — a deterministic, duration-independent loudness
    * envelope. */
  object WavDecoder extends AudioDecoder {
    override def decode(payload: Array[Byte]): AudioMeta = {
      val bis = new java.io.ByteArrayInputStream(payload)
      val fileFmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(bis)
      val fmt = fileFmt.getFormat
      AudioMeta(fileFmt.getType.toString.toLowerCase,
        fmt.getSampleRate.toInt, fmt.getChannels,
        fileFmt.getFrameLength.toLong, payload.length.toLong)
    }

    override def features(payload: Array[Byte], n: Int = 8): Array[Float] = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16, "WavDecoder features expect 16-bit PCM")
        val bytes = ais.readAllBytes()
        val bb = java.nio.ByteBuffer.wrap(bytes).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        val nSamples = bytes.length / 2
        val out = new Array[Float](n)
        val counts = new Array[Int](n)
        var i = 0
        while (i < nSamples) {
          val w = math.min(n - 1, i * n / math.max(1, nSamples))
          val s = bb.getShort(i * 2) / 32768.0f
          out(w) += s * s
          counts(w) += 1
          i += 1
        }
        var j = 0
        while (j < n) {
          out(j) = math.sqrt(out(j) / math.max(1, counts(j))).toFloat; j += 1
        }
        out
      } finally ais.close()
    }
  }

  /** Synthesize REAL RIFF/WAVE payloads (16-bit PCM, deterministic
    * pseudo-noise, rate/channels/length derived from the id) — real bytes
    * for the [[WavDecoder]] path with no media files on disk. */
  def syntheticWavMedia(spark: SparkSession, df: DataFrame, idCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val rate = 8000 + (id % 4).toInt * 4000
      val channels = 1 + (id % 2).toInt
      val frames = 256 + (id % 512).toInt
      val pcm = new Array[Byte](frames * channels * 2)
      val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < frames * channels) {
        bb.putShort(i * 2, (((id * 31 + i * 7) % 251 - 125) * 200).toShort)
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      MediaRow(id, bos.toByteArray)
    }
  }

  /** Audio decode + feature-extract: same batched per-partition map shape
    * as [[decodeAndFeaturize]] (no shuffle). */
  def decodeAndFeaturizeAudio(spark: SparkSession, media: DataFrame,
                              decoder: AudioDecoder = WavDecoder): Dataset[DecodedAudioRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          DecodedAudioRow(r.doc_id, decoder.decode(r.content), decoder.features(r.content))
        }
      }
  }

  /** Read a directory of real media files through Spark's `binaryFile`
    * source into the (doc_id, content) shape the decode tier consumes:
    * one row per file, content as the raw bytes, doc_id a deterministic
    * hash of the file path (the path itself rides along for lineage).
    * Parallelism is the file-split count — the same narrow-scan shape every
    * other tier here assumes. `pathGlobFilter` (e.g. "*.png") prunes at the
    * listing, not after the read. */
  def readMediaDir(spark: SparkSession, path: String,
                   globFilter: Option[String] = None): DataFrame = {
    val reader = spark.read.format("binaryFile")
    globFilter.foreach(g => reader.option("pathGlobFilter", g))
    reader.load(path)
      .select(xxhash64(col("path")).as("doc_id"), col("path"),
        col("length").as("size_bytes"), col("content"))
  }

  /** Decode + feature-extract: batched per-partition map (no shuffle). The
    * real-world analogue of `mapInPandas` batches on the JVM side. */
  def decodeAndFeaturize(spark: SparkSession, media: DataFrame,
                         decoder: MediaDecoder = HeaderStubDecoder): Dataset[DecodedRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          DecodedRow(r.doc_id, decoder.decode(r.content), decoder.features(r.content))
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
