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

  // ------------------------------------------------------------- video ----
  // No JVM video CODEC ships in this container, so frame DECODE stays out of
  // scope — but container METADATA needs no codec: MP4 metadata lives in
  // plain ISO-BMFF boxes (ISO/IEC 14496-12) and Matroska/WebM metadata in
  // EBML elements (RFC 8794), both walkable with nothing but ByteBuffer.

  /** Typed video-container metadata — what a demuxer's probe returns:
    * container format, video codec id, track dimensions, duration. */
  case class VideoMeta(format: String, codec: String, width: Int, height: Int,
                       duration_ms: Long, sizeBytes: Long)
  case class DecodedVideoRow(doc_id: Long, meta: VideoMeta)

  trait VideoDecoder extends Serializable {
    def decode(payload: Array[Byte]): VideoMeta
  }

  /** REAL container-metadata parse for MP4 (ISO-BMFF box walk: ftyp,
    * moov/mvhd for timescale+duration, trak/tkhd for track dims,
    * stbl/stsd for the codec fourcc) and Matroska/WebM (EBML walk:
    * DocType, Info/TimestampScale+Duration, Tracks/TrackEntry/Video for
    * dims and CodecID). Sniffs the container from the leading bytes. */
  object ContainerVideoDecoder extends VideoDecoder {

    override def decode(payload: Array[Byte]): VideoMeta = {
      require(payload.length >= 8, "truncated video payload")
      if (payload(4) == 'f' && payload(5) == 't' && payload(6) == 'y' && payload(7) == 'p')
        parseMp4(payload)
      else if ((payload(0) & 0xFF) == 0x1A && (payload(1) & 0xFF) == 0x45 &&
               (payload(2) & 0xFF) == 0xDF && (payload(3) & 0xFF) == 0xA3)
        parseMkv(payload)
      else throw new IllegalArgumentException("neither an ISO-BMFF nor an EBML container")
    }

    // ---- ISO-BMFF ----

    private def u32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
        ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

    private def u64(b: Array[Byte], off: Int): Long =
      (u32(b, off) << 32) | u32(b, off + 4)

    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    private final class Mp4State {
      var codec = ""; var w = 0; var h = 0; var timescale = 0L; var dur = 0L
    }

    private def parseMp4(b: Array[Byte]): VideoMeta = {
      val st = new Mp4State
      walkBoxes(b, 0, b.length, st)
      val ms = if (st.timescale > 0) st.dur * 1000L / st.timescale else 0L
      VideoMeta("mp4", st.codec, st.w, st.h, ms, b.length.toLong)
    }

    private def walkBoxes(b: Array[Byte], start: Int, end: Int, st: Mp4State): Unit = {
      var off = start
      while (off + 8 <= end) {
        val size = u32(b, off)
        val typ = fourcc(b, off + 4)
        val (hdr, boxEnd) =
          if (size == 1L && off + 16 <= end) (16, off + u64(b, off + 8).toInt)
          else if (size == 0L) (8, end) // "to end of file"
          else (8, off + size.toInt)
        if (boxEnd <= off || boxEnd > end) return // corrupt size: stop
        typ match {
          case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
            walkBoxes(b, off + hdr, boxEnd, st)
          case "mvhd" =>
            val v = b(off + hdr) & 0xFF
            if (v == 1) { // 64-bit times
              st.timescale = u32(b, off + hdr + 4 + 16)
              st.dur = u64(b, off + hdr + 4 + 20)
            } else {
              st.timescale = u32(b, off + hdr + 4 + 8)
              st.dur = u32(b, off + hdr + 4 + 12)
            }
          case "tkhd" =>
            val v = b(off + hdr) & 0xFF
            val wOff = off + hdr + (if (v == 1) 88 else 76) // width: 16.16 fixed
            val tw = (u32(b, wOff) >>> 16).toInt
            val th = (u32(b, wOff + 4) >>> 16).toInt
            if (tw > 0) { st.w = tw; st.h = th } // the video track
          case "stsd" =>
            if (u32(b, off + hdr + 4) >= 1) // entry_count; fourcc of entry 1
              st.codec = fourcc(b, off + hdr + 12)
          case _ => // mdat / free / unknown: skip
        }
        off = boxEnd
      }
    }

    // ---- EBML (Matroska/WebM) ----

    /** Read an EBML vint at `off`: (value, encodedLength). For element IDs
      * keep the marker bit (IDs are compared with it); for sizes clear it. */
    private def vint(b: Array[Byte], off: Int, clearMarker: Boolean): (Long, Int) = {
      val first = b(off) & 0xFF
      val len = java.lang.Integer.numberOfLeadingZeros(first) - 23 // 1..8
      require(len >= 1 && len <= 8, s"bad EBML vint lead byte $first")
      var v = if (clearMarker) (first & (0xFF >>> len)).toLong else first.toLong
      var i = 1
      while (i < len) { v = (v << 8) | (b(off + i) & 0xFFL); i += 1 }
      (v, len)
    }

    private final class MkvState {
      var docType = "matroska"; var codec = ""; var w = 0; var h = 0
      var tsScale = 1000000L; var durTicks = 0.0
      var inVideoTrack = false; var trackCodec = ""
    }

    private def parseMkv(b: Array[Byte]): VideoMeta = {
      val st = new MkvState
      walkEbml(b, 0, b.length, st)
      val ms = math.round(st.durTicks * st.tsScale / 1e6)
      VideoMeta(st.docType, st.codec, st.w, st.h, ms, b.length.toLong)
    }

    private def uintAt(b: Array[Byte], off: Int, len: Int): Long = {
      var v = 0L; var i = 0
      while (i < len) { v = (v << 8) | (b(off + i) & 0xFFL); i += 1 }
      v
    }

    private def floatAt(b: Array[Byte], off: Int, len: Int): Double = len match {
      case 4 => java.lang.Float.intBitsToFloat(uintAt(b, off, 4).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(uintAt(b, off, 8))
      case _ => 0.0
    }

    private def walkEbml(b: Array[Byte], start: Int, end: Int, st: MkvState): Unit = {
      var off = start
      while (off < end) {
        val (id, idLen) = vint(b, off, clearMarker = false)
        val (sz, szLen) = vint(b, off + idLen, clearMarker = true)
        val bodyOff = off + idLen + szLen
        val bodyEnd = bodyOff + sz.toInt
        if (bodyEnd > end || bodyEnd <= off) return // corrupt: stop
        id match {
          case 0x1A45DFA3L | 0x18538067L | 0x1549A966L | 0x1654AE6BL | 0xE0L =>
            walkEbml(b, bodyOff, bodyEnd, st) // header/Segment/Info/Tracks/Video
          case 0xAEL => // TrackEntry: commit codec only for the video track
            st.inVideoTrack = false; st.trackCodec = ""
            walkEbml(b, bodyOff, bodyEnd, st)
            if (st.inVideoTrack && st.trackCodec.nonEmpty) st.codec = st.trackCodec
          case 0x4282L => st.docType = new String(b, bodyOff, sz.toInt,
            java.nio.charset.StandardCharsets.US_ASCII)
          case 0x2AD7B1L => st.tsScale = uintAt(b, bodyOff, sz.toInt)
          case 0x4489L => st.durTicks = floatAt(b, bodyOff, sz.toInt)
          case 0x83L => st.inVideoTrack = uintAt(b, bodyOff, sz.toInt) == 1L
          case 0x86L => st.trackCodec = new String(b, bodyOff, sz.toInt,
            java.nio.charset.StandardCharsets.US_ASCII)
          case 0xB0L => st.w = uintAt(b, bodyOff, sz.toInt).toInt
          case 0xBAL => st.h = uintAt(b, bodyOff, sz.toInt).toInt
          case _ => // Void / Cluster / unknown: skip
        }
        off = bodyEnd
      }
    }
  }

  // ---- synthetic container writers (REAL bytes, deterministic from id) ----

  private def mp4Box(typ: String, parts: Array[Byte]*): Array[Byte] = {
    val body = parts.flatten.toArray
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
    bb.putInt(8 + body.length)
    bb.put(typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.put(body)
    bb.array()
  }

  private def be32(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(v).array()

  private def buildMp4(codec: String, w: Int, h: Int, durMs: Long,
                       bodyLen: Int, id: Long): Array[Byte] = {
    val ftyp = mp4Box("ftyp", "isom".getBytes, be32(512), "isomiso2".getBytes)
    val mvhd = { // version 0: timescale 1000 ⇒ duration field is in ms
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(12, 1000); bb.putInt(16, durMs.toInt)
      bb.putInt(20, 0x00010000); bb.putShort(24, 0x0100.toShort)
      bb.putInt(36, 0x00010000); bb.putInt(52, 0x00010000); bb.putInt(68, 0x40000000)
      bb.putInt(96, 2) // next track id
      mp4Box("mvhd", bb.array())
    }
    val tkhd = { // version 0, flags=3 (enabled|in-movie); width/height 16.16
      val bb = java.nio.ByteBuffer.allocate(84)
      bb.putInt(0, 3); bb.putInt(12, 1); bb.putInt(20, durMs.toInt)
      bb.putInt(40, 0x00010000); bb.putInt(56, 0x00010000); bb.putInt(72, 0x40000000)
      bb.putInt(76, w << 16); bb.putInt(80, h << 16)
      mp4Box("tkhd", bb.array())
    }
    val hdlr = mp4Box("hdlr", new Array[Byte](8), "vide".getBytes,
      new Array[Byte](12), Array[Byte](0))
    val stsd = { // entry_count=1, one 16-byte sample entry: its fourcc IS the codec id
      val entry = java.nio.ByteBuffer.allocate(16)
      entry.putInt(0, 16)
      entry.position(4); entry.put(codec.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      mp4Box("stsd", new Array[Byte](4), be32(1), entry.array())
    }
    val moov = mp4Box("moov", mvhd,
      mp4Box("trak", tkhd, mp4Box("mdia", hdlr, mp4Box("minf", mp4Box("stbl", stsd)))))
    val body = new Array[Byte](bodyLen)
    var i = 0
    while (i < bodyLen) { body(i) = ((id * 31 + i * 7) % 251).toByte; i += 1 }
    ftyp ++ moov ++ mp4Box("mdat", body)
  }

  /** EBML element: raw id bytes + 8-octet size (always-maximal encoding,
    * legal per RFC 8794 §4.2 and simplest to nest). */
  private def ebmlEl(idBytes: Array[Byte], parts: Array[Byte]*): Array[Byte] = {
    val body = parts.flatten.toArray
    val size = new Array[Byte](8)
    size(0) = 0x01 // 8-octet length marker
    var v = body.length.toLong; var i = 7
    while (i >= 1) { size(i) = (v & 0xFF).toByte; v >>= 8; i -= 1 }
    idBytes ++ size ++ body
  }

  private def ebmlUint(v: Long, len: Int): Array[Byte] = {
    val out = new Array[Byte](len); var x = v; var i = len - 1
    while (i >= 0) { out(i) = (x & 0xFF).toByte; x >>= 8; i -= 1 }
    out
  }

  private def buildMkv(codec: String, w: Int, h: Int, durMs: Long,
                       bodyLen: Int, id: Long): Array[Byte] = {
    def idb(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray
    val header = ebmlEl(idb(0x1A, 0x45, 0xDF, 0xA3),
      ebmlEl(idb(0x42, 0x82), "matroska".getBytes)) // DocType
    val info = ebmlEl(idb(0x15, 0x49, 0xA9, 0x66),
      ebmlEl(idb(0x2A, 0xD7, 0xB1), ebmlUint(1000000L, 3)), // ns per tick
      ebmlEl(idb(0x44, 0x89), // Duration: float64 ticks (= ms at this scale)
        java.nio.ByteBuffer.allocate(8).putDouble(durMs.toDouble).array()))
    val trackEntry = ebmlEl(idb(0xAE),
      ebmlEl(idb(0x83), ebmlUint(1L, 1)), // TrackType video
      ebmlEl(idb(0x86), codec.getBytes),  // CodecID
      ebmlEl(idb(0xE0),
        ebmlEl(idb(0xB0), ebmlUint(w.toLong, 2)),
        ebmlEl(idb(0xBA), ebmlUint(h.toLong, 2))))
    val tracks = ebmlEl(idb(0x16, 0x54, 0xAE, 0x6B), trackEntry)
    val body = new Array[Byte](bodyLen)
    var i = 0
    while (i < bodyLen) { body(i) = ((id * 31 + i * 7) % 251).toByte; i += 1 }
    val voidEl = ebmlEl(idb(0xEC), body) // Void: skippable padding
    header ++ ebmlEl(idb(0x18, 0x53, 0x80, 0x67), info, tracks, voidEl)
  }

  /** Synthesize REAL MP4 / Matroska container payloads (even ids ISO-BMFF,
    * odd ids EBML; codec/dims/duration derived from the id) — real bytes
    * for the [[ContainerVideoDecoder]] path with no media files on disk.
    * Same narrow typed-map shape as a `binaryFile` read. */
  def syntheticVideoMedia(spark: SparkSession, df: DataFrame, idCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val w = (id % 64).toInt * 16 + 16
      val h = (id % 48).toInt * 16 + 16
      val durMs = 1000L + (id % 60) * 500L
      val bodyLen = (id % 1024).toInt + 32
      val payload =
        if (id % 2 == 0)
          buildMp4(if (id % 4 == 0) "avc1" else "hev1", w, h, durMs, bodyLen, id)
        else
          buildMkv(if (id % 4 == 1) "V_VP9" else "V_AV1", w, h, durMs, bodyLen, id)
      MediaRow(id, payload)
    }
  }

  /** Video-container probe: same batched per-partition map shape as
    * [[decodeAndFeaturize]] (no shuffle). */
  def decodeVideoMeta(spark: SparkSession, media: DataFrame,
                      decoder: VideoDecoder = ContainerVideoDecoder): Dataset[DecodedVideoRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[MediaRow]
      .mapPartitions(rows => rows.map(r => DecodedVideoRow(r.doc_id, decoder.decode(r.content))))
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
