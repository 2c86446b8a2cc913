package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (north-star; SURVEY §2.11): images/audio/video
  * as opaque `binary` columns with typed metadata, processed in batches via
  * `mapPartitions` over typed Datasets (the JVM analogue of the
  * mapInPandas/Arrow-batch shape — per-partition iterator, codec state
  * initialised once per partition, never per row).
  *
  * Image decode is REAL (`javax.imageio` ships with the JDK): width,
  * height and mean luminance come from actual pixel data for any format
  * ImageIO reads (PNG/JPEG/BMP/GIF). Audio decode is REAL for the
  * formats the JDK ships codecs for (`javax.sound.sampled`: WAV/AIFF/AU
  * PCM): sample rate, channels, duration and mean amplitude from the
  * actual frames. Video codecs are STUBBED (this container ships no
  * media libraries): `decodeStub` derives deterministic pseudo-features
  * from the bytes, and undecodable image/audio payloads fall back to it
  * too. Every Spark-side contract — schema, binary payload handling,
  * per-partition batching, feature/resize/frame-sample signatures — is
  * real and tested; swapping `decodeStub` for a JNI/JavaCV call is a
  * one-function change.
  */
object Multimodal {

  /** Asset row: opaque payload + typed metadata (the lakehouse pattern for
    * multimodal training data: bytes in the column, facts in metadata). */
  final case class MediaAsset(
      asset_id: Long,
      media_type: String,     // "image" | "audio" | "video"
      content: Array[Byte],
      source_uri: String,
      n_bytes: Long)

  final case class MediaFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,             // decoded dimensions (stub: derived)
      height: Int,
      duration_ms: Long,      // audio/video only (stub: derived)
      mean_intensity: Double, // stub: byte-mean proxy
      feature_hash: Long)

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("source_uri", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = false)))

  /** STUB decoder — deterministic fake standing in for the real codec
    * (===> replace with an actual image/audio decode when libs exist).
    * Derives stable pseudo-dimensions/intensity from the payload bytes so
    * tests and oracles are reproducible. */
  private[ext] def decodeStub(a: MediaAsset): MediaFeatures = {
    val bytes = Option(a.content).getOrElse(Array.emptyByteArray)
    var h = 1125899906842597L // deterministic FNV-ish fold
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 31 + bytes(i)
      sum += bytes(i) & 0xFF
      i += 1
    }
    val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
    MediaFeatures(
      asset_id = a.asset_id,
      media_type = a.media_type,
      n_bytes = bytes.length.toLong,
      width = 64 + (math.abs(h) % 1024).toInt,
      height = 64 + (math.abs(h / 1024) % 1024).toInt,
      duration_ms = if (a.media_type == "image") 0L else math.abs(h) % 600000L,
      mean_intensity = mean,
      feature_hash = h)
  }

  /** Real image decode via the JDK's own codec: dimensions straight from
    * the decoded raster; mean intensity = average luminance (0–255,
    * ITU-R 601 weights) over a bounded deterministic sample grid (≤64×64
    * points — a 100-megapixel scan costs the same as a thumbnail);
    * feature_hash folds the same sampled pixels. Returns None when the
    * bytes aren't a decodable image (ImageIO sniffs magic bytes), letting
    * the caller fall back to the deterministic stub. */
  private[ext] def decodeImage(a: MediaAsset): Option[MediaFeatures] = {
    val bytes = Option(a.content).getOrElse(Array.emptyByteArray)
    if (bytes.isEmpty) return None
    try {
      // Header-only dimension check BEFORE decoding: a ~100 KB PNG can
      // declare 60000×60000 and ImageIO.read would allocate the full
      // ~14 GB raster (an OutOfMemoryError no catch below survives).
      // Reject decompression bombs from the header alone.
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); return None }
      val reader = readers.next()
      val img =
        try {
          reader.setInput(iis)
          if (reader.getWidth(0).toLong * reader.getHeight(0) > 100000000L)
            return None // > 100 MP: refuse to materialize the raster
          reader.read(0)
        } finally { reader.dispose(); iis.close() }
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      // ceil division: stride guarantees ≤64 samples per axis for EVERY
      // size (floor div sampled up to 127×127 points in the 65–127 band)
      val sx = (w + 63) / 64
      val sy = (h + 63) / 64
      var sum = 0.0
      var n = 0L
      var hash = 1125899906842597L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
            0.114 * (rgb & 0xFF)
          sum += lum
          n += 1
          hash = hash * 31 + rgb
          x += sx
        }
        y += sy
      }
      Some(MediaFeatures(
        asset_id = a.asset_id,
        media_type = a.media_type,
        n_bytes = bytes.length.toLong,
        width = w,
        height = h,
        duration_ms = 0L,
        mean_intensity = if (n == 0) 0.0 else sum / n,
        feature_hash = hash))
    } catch { case _: Exception => None }
  }

  /** Real audio decode via the JDK's sampled-sound codecs (WAV/AIFF/AU).
    * Feature mapping for audio rows: width = sample rate (Hz), height =
    * channel count, duration_ms from the header frame count, mean
    * intensity = mean |amplitude| in [0,1] over AT MOST the first 64k
    * frames of signed-16-bit PCM (bounded work — an hour-long recording
    * costs the same as a clip; non-16-bit encodings report header
    * features with intensity 0). Returns None for bytes the JDK can't
    * parse as audio, letting the caller fall back to the stub. */
  private[ext] def decodeAudio(a: MediaAsset): Option[MediaFeatures] = {
    val bytes = Option(a.content).getOrElse(Array.emptyByteArray)
    if (bytes.isEmpty) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val frames = ais.getFrameLength
        val rate = fmt.getFrameRate
        if (frames < 0 || rate <= 0) return None
        val pcm16 = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && fmt.getFrameSize > 0
        var sum = 0.0
        var n = 0L
        var hash = 1125899906842597L
        if (pcm16) {
          val want = math.min(frames, 65536L) * fmt.getFrameSize
          val buf = new Array[Byte](math.min(want, 1L << 22).toInt)
          var off = 0
          var read = 0
          while (off < buf.length &&
            { read = ais.read(buf, off, buf.length - off); read > 0 })
            off += read
          val be = fmt.isBigEndian
          var i = 0
          while (i + 1 < off) {
            val s =
              if (be) ((buf(i) << 8) | (buf(i + 1) & 0xFF)).toShort
              else ((buf(i + 1) << 8) | (buf(i) & 0xFF)).toShort
            sum += math.abs(s / 32768.0)
            n += 1
            hash = hash * 31 + s
            i += 2
          }
        }
        Some(MediaFeatures(
          asset_id = a.asset_id,
          media_type = a.media_type,
          n_bytes = bytes.length.toLong,
          width = math.round(fmt.getSampleRate),
          height = fmt.getChannels,
          duration_ms = math.round(frames * 1000.0 / rate),
          mean_intensity = if (n == 0) 0.0 else sum / n,
          feature_hash = hash))
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** Dispatch: real codec where one exists (images and PCM audio, via the
    * JDK), stub for video and undecodable payloads. */
  private[ext] def decode(a: MediaAsset): MediaFeatures =
    if (a.media_type == "image") decodeImage(a).getOrElse(decodeStub(a))
    else if (a.media_type == "audio") decodeAudio(a).getOrElse(decodeStub(a))
    else decodeStub(a)

  /** Batched feature extraction: one decoder context per partition (the
    * expensive-init pattern for real codecs), iterator-to-iterator so
    * nothing materialises per partition. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real codec init happens lazily per partition (ImageIO scanners are
      // process-wide; an expensive per-codec context would be built HERE)
      it.map(decode)
    }
  }

  /** Frame sampling contract for video payloads: emits `framesPer` rows per
    * asset with deterministic pseudo-frame hashes (flatMap shape — the
    * generator/explode pattern on binary data). */
  def sampleFrames(assets: Dataset[MediaAsset], framesPer: Int): DataFrame = {
    import assets.sparkSession.implicits._
    assets.filter(_.media_type == "video").flatMap { a =>
      val base = decode(a)
      (0 until framesPer).map { f =>
        (a.asset_id, f, base.feature_hash * 31 + f, base.width, base.height)
      }
    }.toDF("asset_id", "frame_idx", "frame_hash", "width", "height")
  }

  /** Build a deterministic asset table from any text corpus (test/demo
    * harness: payload = utf-8 bytes; at production the payload comes from
    * binary files / object storage). */
  def assetsFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (col("doc_id") % 3).cast(IntegerType) + 1).as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      concat(lit("synthetic://"), col("doc_id")).as("source_uri"),
      // byte length of the actual payload (length of a binary column is
      // octets; length of the text column would be characters)
      length(encode(col("text"), "UTF-8")).cast(LongType).as("n_bytes"))
      .as[MediaAsset]
  }
}
