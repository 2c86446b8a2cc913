package graft.ext

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal RIFF/AVI container support for MOTION-JPEG video, pure JDK —
  * upgrades the multimodal layer's video handling from "stubbed" to a
  * real decode for the one mainstream video format whose frames the JDK
  * can decompress itself (MJPEG = a JPEG per frame; the built-in JPEG
  * ImageIO reader does the pixel work). Interframe codecs (H.264, VP9,
  * AV1…) remain honestly out of scope: they need an entropy/motion
  * decode no JDK API provides.
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
      totalFrames: Int)

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
            if (listType == HDRL || listType == MOVI)
              walk(p + 12, p + 8 + size)
          } else if (id == AVIH && size >= 40) {
            header = Some(Header(
              width = bb.getInt(p + 8 + 32),
              height = bb.getInt(p + 8 + 36),
              usPerFrame = bb.getInt(p + 8).toLong & 0xFFFFFFFFL,
              totalFrames = bb.getInt(p + 8 + 16)))
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
      val h = header.getOrElse(return None)
      if (offs.isEmpty) return Some((h, Nil))
      val take = math.min(offs.size, maxFrames)
      val sampled = (0 until take).map { i =>
        val (o, len) = offs((i.toLong * offs.size / take).toInt)
        java.util.Arrays.copyOfRange(bytes, o, o + len)
      }
      Some((h, sampled))
    } catch { case _: Exception => None }
  }

  /** Minimal MJPEG-AVI writer: each element of `jpegFrames` must be a
    * complete JPEG stream (ImageIO `jpg` writer output). Deterministic
    * bytes for deterministic inputs. */
  def write(jpegFrames: Seq[Array[Byte]], width: Int, height: Int,
      usPerFrame: Long = 33333L): Array[Byte] = {
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val hdr = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      hdr.put(id.getBytes("US-ASCII")); hdr.putInt(data.length)
      out.write(hdr.array()); out.write(data)
      if ((data.length & 1) == 1) out.write(0) // even padding
      out.toByteArray
    }
    def list(listType: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ payload)
    def u32s(vs: Long*): Array[Byte] = {
      val b = ByteBuffer.allocate(vs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(v => b.putInt(v.toInt)); b.array()
    }
    val n = jpegFrames.size
    val maxBytes = if (n == 0) 0L else jpegFrames.map(_.length).max.toLong
    // avih: usPerFrame, maxBytesPerSec, padding, flags, totalFrames,
    // initialFrames, streams, suggestedBuffer, width, height, reserved×4
    val avih = chunk("avih", u32s(usPerFrame, 0, 0, 0, n.toLong, 0, 1,
      maxBytes, width.toLong, height.toLong, 0, 0, 0, 0))
    // strh: fccType 'vids', fccHandler 'MJPG', flags, prio+lang,
    // initialFrames, scale, rate, start, length, suggestedBuffer,
    // quality, sampleSize, rcFrame
    val strh = chunk("strh", "vids".getBytes("US-ASCII") ++
      "MJPG".getBytes("US-ASCII") ++
      u32s(0, 0, 0, usPerFrame, 1000000L, 0, n.toLong, maxBytes,
        0xFFFFFFFFL, 0, 0))
    // strf: BITMAPINFOHEADER (size, w, h, planes+bitcount, 'MJPG',
    // imageSize, ppm×2, clrUsed, clrImportant)
    val strf = chunk("strf", u32s(40, width.toLong, height.toLong,
      (24L << 16) | 1) ++ "MJPG".getBytes("US-ASCII") ++
      u32s(width.toLong * height * 3, 0, 0, 0, 0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi",
      jpegFrames.flatMap(f => chunk("00dc", f)).toArray)
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
