package graft.ext

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal RIFF/AVI container support, pure JDK, for every INTRAFRAME
  * video family a JVM can decode without external codecs: MOTION-JPEG
  * (a JPEG per frame — the built-in ImageIO reader does the pixel
  * work), UNCOMPRESSED BI_RGB (raw bottom-up BGR(X) DIB frames at
  * 8/24/32 bpp, decoded here directly — [[dibImage]]), and BI_RLE8
  * run-length frames (ditto). Interframe codecs (H.264, VP9, AV1…)
  * remain honestly out of scope: they need an entropy/motion decode no
  * JDK API provides, and a hand-rolled one would be a security
  * liability, not a feature.
  *
  * Parsing is a bounds-checked linear walk of the RIFF chunk tree —
  * `avih` (dims, frame timing, count) from the `hdrl` LIST, frame
  * payloads from `00dc`/`00db` chunks of the `movi` LIST. Malformed or
  * truncated input yields None, never a throw (corpus media is
  * untrusted; the caller falls back to its stub path). Frame payload
  * COUNT and BYTES are capped by the caller via `maxFrames` — a hostile
  * chunk list cannot balloon memory past the sampled frames.
  *
  * The writer emits the mirror-image minimal structure (RIFF(AVI ) →
  * hdrl(avih, strl(strh+strf)) → movi(00dc…)) so synthetic fixtures and
  * tests can build REAL byte-level AVI files without shipping media.
  */
private[graft] object Avi {

  final case class Header(width: Int, height: Int, usPerFrame: Long,
      totalFrames: Int,
      // stream format (strf BITMAPINFOHEADER): biBitCount and
      // biCompression (0 = BI_RGB uncompressed, 1 = BI_RLE8, else a
      // codec fourCC like 'MJPG'), plus the palette (BGRX quads) an
      // 8-bit stream carries after the header. Defaults describe the
      // MJPEG files the writer below has always produced.
      bitCount: Int = 24, compression: Int = 0x47504A4D /* 'MJPG' */,
      palette: Array[Byte] = Array.emptyByteArray) {
    /** Frames are raw device-independent bitmaps the pure-JDK
      * [[dibImage]] decodes itself — no ImageIO codec involved. */
    def isDib: Boolean = compression == 0 || compression == 1
  }

  private def fourCC(s: String): Int = {
    require(s.length == 4)
    (s(0) & 0xFF) | ((s(1) & 0xFF) << 8) | ((s(2) & 0xFF) << 16) |
      ((s(3) & 0xFF) << 24)
  }
  private val RIFF = fourCC("RIFF")
  private val AVI_ = fourCC("AVI ")
  private val LIST = fourCC("LIST")
  private val HDRL = fourCC("hdrl")
  private val AVIH = fourCC("avih")
  private val MOVI = fourCC("movi")
  private val DC00 = fourCC("00dc")
  private val DB00 = fourCC("00db")
  private val STRL = fourCC("strl")
  private val STRF = fourCC("strf")

  def isAvi(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 && {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      bb.getInt(0) == RIFF && bb.getInt(8) == AVI_
    }

  /** Header + evenly-sampled frame payloads (≤ maxFrames, first frame
    * always included when any exist). Frame indices are positions in the
    * movi chunk order — the storage order, which for MJPEG (every frame
    * a keyframe) is playback order. */
  def parse(bytes: Array[Byte],
      maxFrames: Int): Option[(Header, Seq[Array[Byte]])] = {
    if (!isAvi(bytes) || maxFrames <= 0) return None
    try {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      var header: Option[Header] = None
      // stream format from the FIRST strf (minimal AVIs carry one video
      // stream; the writer below emits exactly that shape)
      var bitCount = 24
      var compression = fourCC("MJPG")
      var palette = Array.emptyByteArray
      var sawStrf = false
      // collect (offset, length) only during the walk; copy bytes just
      // for the sampled frames — bounded memory regardless of frame count
      val frameOffsets = List.newBuilder[(Int, Int)] // (payload off, len)
      def walk(off: Int, end: Int): Unit = {
        var p = off
        while (p + 8 <= end) {
          val id = bb.getInt(p)
          val size = bb.getInt(p + 4)
          if (size < 0 || p + 8 + size > end) return // malformed: stop
          if (id == LIST && size >= 4) {
            val listType = bb.getInt(p + 8)
            if (listType == HDRL || listType == MOVI || listType == STRL)
              walk(p + 12, p + 8 + size)
          } else if (id == AVIH && size >= 40) {
            header = Some(Header(
              width = bb.getInt(p + 8 + 32),
              height = bb.getInt(p + 8 + 36),
              usPerFrame = bb.getInt(p + 8).toLong & 0xFFFFFFFFL,
              totalFrames = bb.getInt(p + 8 + 16)))
          } else if (id == STRF && size >= 40 && !sawStrf) {
            sawStrf = true
            bitCount = bb.getShort(p + 8 + 14) & 0xFFFF
            compression = bb.getInt(p + 8 + 16)
            // 8-bit streams: BGRX palette quads follow the 40-byte header
            if (size > 40)
              palette = java.util.Arrays.copyOfRange(
                bytes, p + 8 + 40, p + 8 + math.min(size, 40 + 1024))
          } else if (id == DC00 || id == DB00) {
            frameOffsets += ((p + 8, size))
          }
          p += 8 + size + (size & 1) // chunks pad to even
        }
      }
      val riffSize = bb.getInt(4)
      val end = math.min(bytes.length, 8L + riffSize).toInt
      walk(12, end)
      val offs = frameOffsets.result()
      val h = header
        .map(_.copy(bitCount = bitCount, compression = compression,
          palette = palette))
        .getOrElse(return None)
      if (offs.isEmpty) return Some((h, Nil))
      val take = math.min(offs.size, maxFrames)
      val sampled = (0 until take).map { i =>
        val (o, len) = offs((i.toLong * offs.size / take).toInt)
        java.util.Arrays.copyOfRange(bytes, o, o + len)
      }
      Some((h, sampled))
    } catch { case _: Exception => None }
  }

  /** Pure-JDK decode of a raw DIB frame payload (what an UNCOMPRESSED
    * or RLE8 AVI stores per `00db`/`00dc` chunk — a bitmap with no file
    * header): BI_RGB at 24/32 bpp (BGR(X) pixels, rows bottom-up, each
    * row padded to 4 bytes), 8 bpp through the stream palette, and
    * BI_RLE8 (run-length: (count, index) runs; escapes 0=EOL, 1=end,
    * 2=delta, n>2 absolute mode padded to even). Anything malformed —
    * short rows, palette indexes past the table, deltas off the raster —
    * decodes what it can and leaves the rest black, never throws (corpus
    * media is untrusted). None for depths/compressions out of scope
    * (16 bpp, BI_RLE4, interframe codecs). */
  def dibImage(h: Header,
      payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    val w = h.width
    val ht = h.height
    if (w <= 0 || ht <= 0 || payload == null) return None
    def palColor(idx: Int): Int = {
      val o = idx * 4
      if (o + 2 >= h.palette.length) 0
      else ((h.palette(o + 2) & 0xFF) << 16) |
        ((h.palette(o + 1) & 0xFF) << 8) | (h.palette(o) & 0xFF)
    }
    try {
      val img = new java.awt.image.BufferedImage(w, ht,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      h.compression match {
        case 0 if h.bitCount == 24 || h.bitCount == 32 =>
          val bpp = h.bitCount / 8
          val stride = (w * bpp + 3) & ~3
          var y = 0
          while (y < ht) {
            val row = (ht - 1 - y) * stride // bottom-up storage
            var x = 0
            while (x < w) {
              val o = row + x * bpp
              if (o + 2 < payload.length)
                img.setRGB(x, y, ((payload(o + 2) & 0xFF) << 16) |
                  ((payload(o + 1) & 0xFF) << 8) | (payload(o) & 0xFF))
              x += 1
            }
            y += 1
          }
          Some(img)
        case 0 if h.bitCount == 8 =>
          val stride = (w + 3) & ~3
          var y = 0
          while (y < ht) {
            val row = (ht - 1 - y) * stride
            var x = 0
            while (x < w) {
              if (row + x < payload.length)
                img.setRGB(x, y, palColor(payload(row + x) & 0xFF))
              x += 1
            }
            y += 1
          }
          Some(img)
        case 1 if h.bitCount == 8 => // BI_RLE8
          var x = 0
          var y = 0 // y counts from the BOTTOM row (BMP order)
          var p = 0
          var done = false
          while (!done && p + 1 < payload.length && y < ht) {
            val cnt = payload(p) & 0xFF
            val v = payload(p + 1) & 0xFF
            p += 2
            if (cnt > 0) { // encoded run
              val c = palColor(v)
              var i = 0
              while (i < cnt) {
                if (x < w) img.setRGB(x, ht - 1 - y, c)
                x += 1; i += 1
              }
            } else v match {
              case 0 => x = 0; y += 1 // end of line
              case 1 => done = true // end of bitmap
              case 2 => // delta: skipped pixels stay background
                if (p + 1 < payload.length) {
                  x += payload(p) & 0xFF; y += payload(p + 1) & 0xFF
                }
                p += 2
              case n => // absolute mode: n literal indexes, even-padded
                var i = 0
                while (i < n && p + i < payload.length) {
                  if (x < w && y < ht)
                    img.setRGB(x, ht - 1 - y, palColor(payload(p + i) & 0xFF))
                  x += 1; i += 1
                }
                p += n + (n & 1)
            }
          }
          Some(img)
        case _ => None
      }
    } catch { case _: Exception => None }
  }

  /** Pack a raster as a raw 24-bpp BI_RGB DIB frame payload (bottom-up
    * BGR rows, 4-byte row padding) — the mirror image of [[dibImage]]'s
    * uncompressed path, for fixtures and tests. */
  def dib24Bytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val w = img.getWidth
    val h = img.getHeight
    val stride = (w * 3 + 3) & ~3
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val row = (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        out(row + x * 3) = (rgb & 0xFF).toByte
        out(row + x * 3 + 1) = ((rgb >> 8) & 0xFF).toByte
        out(row + x * 3 + 2) = ((rgb >> 16) & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Minimal MJPEG-AVI writer: each element of `jpegFrames` must be a
    * complete JPEG stream (ImageIO `jpg` writer output). Deterministic
    * bytes for deterministic inputs. */
  def write(jpegFrames: Seq[Array[Byte]], width: Int, height: Int,
      usPerFrame: Long = 33333L): Array[Byte] =
    writeContainer(jpegFrames, width, height, usPerFrame,
      handler = "MJPG", bitCount = 24, compression = None,
      palette = Array.emptyByteArray, frameChunk = "00dc")

  /** Minimal UNCOMPRESSED / RLE8 AVI writer: each element of `dibFrames`
    * is a raw DIB payload ([[dib24Bytes]] for 24-bpp BI_RGB, or a
    * hand-built RLE8 stream with `compression = 1` + a BGRX `palette`).
    * Deterministic bytes for deterministic inputs. */
  def writeDib(dibFrames: Seq[Array[Byte]], width: Int, height: Int,
      bitCount: Int = 24, compression: Int = 0,
      palette: Array[Byte] = Array.emptyByteArray,
      usPerFrame: Long = 33333L): Array[Byte] =
    writeContainer(dibFrames, width, height, usPerFrame,
      handler = "DIB ", bitCount = bitCount, compression = Some(compression),
      palette = palette, frameChunk = "00db")

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val hdr = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    hdr.put(id.getBytes("US-ASCII")); hdr.putInt(data.length)
    out.write(hdr.array()); out.write(data)
    if ((data.length & 1) == 1) out.write(0) // even padding
    out.toByteArray
  }
  private def list(listType: String, payload: Array[Byte]): Array[Byte] =
    chunk("LIST", listType.getBytes("US-ASCII") ++ payload)
  private def u32s(vs: Long*): Array[Byte] = {
    val b = ByteBuffer.allocate(vs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(v => b.putInt(v.toInt)); b.array()
  }

  private def writeContainer(frames: Seq[Array[Byte]], width: Int,
      height: Int, usPerFrame: Long, handler: String, bitCount: Int,
      compression: Option[Int], palette: Array[Byte],
      frameChunk: String): Array[Byte] = {
    val n = frames.size
    val maxBytes = if (n == 0) 0L else frames.map(_.length).max.toLong
    // avih: usPerFrame, maxBytesPerSec, padding, flags, totalFrames,
    // initialFrames, streams, suggestedBuffer, width, height, reserved×4
    val avih = chunk("avih", u32s(usPerFrame, 0, 0, 0, n.toLong, 0, 1,
      maxBytes, width.toLong, height.toLong, 0, 0, 0, 0))
    // strh: fccType 'vids', fccHandler, flags, prio+lang,
    // initialFrames, scale, rate, start, length, suggestedBuffer,
    // quality, sampleSize, rcFrame
    val strh = chunk("strh", "vids".getBytes("US-ASCII") ++
      handler.getBytes("US-ASCII") ++
      u32s(0, 0, 0, usPerFrame, 1000000L, 0, n.toLong, maxBytes,
        0xFFFFFFFFL, 0, 0))
    // strf: BITMAPINFOHEADER (size, w, h, planes+bitcount, compression —
    // the handler fourCC for codec streams, 0/1 for BI_RGB/BI_RLE8 —
    // imageSize, ppm×2, clrUsed, clrImportant), palette quads after
    val comp = compression
      .map(c => u32s(c.toLong))
      .getOrElse(handler.getBytes("US-ASCII"))
    val strf = chunk("strf", u32s(40, width.toLong, height.toLong,
      (bitCount.toLong << 16) | 1) ++ comp ++
      u32s(width.toLong * height * (bitCount / 8).max(1),
        0, 0, palette.length.toLong / 4, 0) ++ palette)
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi",
      frames.flatMap(f => chunk(frameChunk, f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val out = new ByteArrayOutputStream()
    val hdr = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    hdr.put("RIFF".getBytes("US-ASCII")); hdr.putInt(body.length)
    out.write(hdr.array()); out.write(body)
    out.toByteArray
  }

  /** Encode a BufferedImage as JPEG bytes (the JDK's own writer). */
  def jpegBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }
}
