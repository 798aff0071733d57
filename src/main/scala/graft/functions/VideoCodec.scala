package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/**
 * Real AVI (RIFF) container codec, zero dependencies, mirroring
 * [[ImageCodec]]/[[AudioCodec]]: static methods so the wrapping Catalyst
 * expressions inline into whole-stage codegen.
 *
 * The JDK ships no video FRAME codec, so frame PIXELS stay opaque — but the
 * container is a plain RIFF structure, and the metadata a training-data
 * pipeline routes on (dimensions, frame rate, frame count, codec fourcc) is
 * all in the header chunks. [[decode]] is a genuine RIFF parser: it walks
 * the chunk tree, reads the `avih` main header and the video `strh` stream
 * header, and counts the frame chunks actually present in the `movi` list
 * (a truncated file reports its true frame count, not the header claim —
 * same contract as [[AudioCodec.decode]]'s PCM-body frame count). It parses
 * any standard-layout AVI, not just the generator's.
 *
 * The generator side ([[encodeAvi]]) writes a real, spec-layout AVI
 * (RIFF/hdrl/avih/strl/strh/strf/movi with one `00dc` chunk per frame) with
 * deterministic seeded parameters — the sandbox stand-in for crawled video
 * bytes (reference capability analog: the C360 media columns its agent
 * pipelines consume). Frame payloads are seeded opaque bytes: decoding them
 * to rasters would need an external codec (ffmpeg) on a real deployment.
 */
object VideoCodec {

  private def mix64(z0: Long): Long = {
    // splitmix64 finalizer (public-domain constant set)
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val Dims = Array((176, 144), (320, 240), (640, 360), (1280, 720))
  private val Fps = Array(15, 24, 30)

  /** Deterministic (width, height, fps, nFrames) a seed encodes to. */
  def params(seed: Long): (Int, Int, Int, Int) = {
    val m = mix64(seed)
    val (w, h) = Dims(Math.floorMod(m, Dims.length.toLong).toInt)
    (w, h, Fps(Math.floorMod(m >>> 8, Fps.length.toLong).toInt),
      8 + Math.floorMod(m >>> 16, 120L).toInt)
  }

  private def u32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }
  private def u16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def fcc(out: ByteArrayOutputStream, s: String): Unit = {
    var i = 0; while (i < 4) { out.write(s.charAt(i).toInt & 0x7f); i += 1 }
  }

  private val FrameBytes = 8 // opaque seeded payload per frame chunk

  /** Deterministic spec-layout AVI container from a 64-bit seed. */
  def encodeAvi(seed: Long): Array[Byte] = {
    val (w, h, fps, n) = params(seed)
    // build inner lists first so RIFF sizes are exact
    val hdrl = new ByteArrayOutputStream()
    fcc(hdrl, "hdrl")
    fcc(hdrl, "avih"); u32(hdrl, 56)
    u32(hdrl, 1000000L / fps) // dwMicroSecPerFrame
    u32(hdrl, fps.toLong * FrameBytes) // dwMaxBytesPerSec
    u32(hdrl, 0); u32(hdrl, 0x10 /* AVIF_HASINDEX off: none */ & 0)
    u32(hdrl, n) // dwTotalFrames (header claim)
    u32(hdrl, 0); u32(hdrl, 1) // dwInitialFrames, dwStreams
    u32(hdrl, FrameBytes); u32(hdrl, w); u32(hdrl, h)
    u32(hdrl, 0); u32(hdrl, 0); u32(hdrl, 0); u32(hdrl, 0) // dwReserved[4]
    val strl = new ByteArrayOutputStream()
    fcc(strl, "strl")
    fcc(strl, "strh"); u32(strl, 56)
    fcc(strl, "vids"); fcc(strl, "MJPG") // fccType, fccHandler
    u32(strl, 0); u16(strl, 0); u16(strl, 0) // dwFlags, wPriority, wLanguage
    u32(strl, 0) // dwInitialFrames
    u32(strl, 1); u32(strl, fps) // dwScale, dwRate → fps = rate/scale
    u32(strl, 0); u32(strl, n) // dwStart, dwLength (frames)
    u32(strl, FrameBytes); u32(strl, 0xffffffffL) // bufSize, quality
    u32(strl, 0) // dwSampleSize
    u16(strl, 0); u16(strl, 0); u16(strl, w); u16(strl, h) // rcFrame
    fcc(strl, "strf"); u32(strl, 40) // BITMAPINFOHEADER
    u32(strl, 40); u32(strl, w); u32(strl, h)
    u16(strl, 1); u16(strl, 24) // biPlanes, biBitCount
    fcc(strl, "MJPG") // biCompression
    u32(strl, w.toLong * h * 3); u32(strl, 0); u32(strl, 0); u32(strl, 0); u32(strl, 0)
    val movi = new ByteArrayOutputStream()
    fcc(movi, "movi")
    var i = 0
    while (i < n) {
      fcc(movi, "00dc"); u32(movi, FrameBytes)
      val fb = mix64(seed ^ (0x51deL + i))
      var b = 0
      while (b < FrameBytes) { movi.write(((fb >>> (8 * b)) & 0xff).toInt); b += 1 }
      i += 1
    }
    val out = new ByteArrayOutputStream()
    fcc(out, "RIFF")
    val hdrlBytes = hdrl.toByteArray; val strlBytes = strl.toByteArray
    val moviBytes = movi.toByteArray
    // RIFF payload: 'AVI ' + LIST(hdrl+strl) + LIST(movi)
    val hdrlListSize = hdrlBytes.length + 8 + strlBytes.length
    u32(out, 4L + 8 + hdrlListSize + 8 + moviBytes.length)
    fcc(out, "AVI ")
    // the strl LIST is nested inside the hdrl LIST's extent (spec layout)
    fcc(out, "LIST"); u32(out, hdrlListSize)
    out.write(hdrlBytes, 0, hdrlBytes.length)
    fcc(out, "LIST"); u32(out, strlBytes.length)
    out.write(strlBytes, 0, strlBytes.length)
    fcc(out, "LIST"); u32(out, moviBytes.length)
    out.write(moviBytes, 0, moviBytes.length)
    out.toByteArray
  }

  private def readU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def fourcc(b: Array[Byte], off: Int): String =
    new String(Array(b(off), b(off + 1), b(off + 2), b(off + 3)), "US-ASCII")

  /** Parse AVI bytes → (width, height, fps, n_frames, codec) InternalRow;
    * null when the bytes are not a RIFF/AVI container (a corrupt payload at
    * 100 TB must never kill a stage). `n_frames` counts the frame chunks
    * actually present in `movi`, not the header claim. */
  def decode(payload: Array[Byte]): InternalRow = {
    try {
      if (payload.length < 24 || fourcc(payload, 0) != "RIFF" ||
          fourcc(payload, 8) != "AVI ") return null
      val end = math.min(payload.length.toLong, 8 + readU32(payload, 4)).toInt
      var width = -1; var height = -1; var fps = 0.0
      var frames = 0; var codec: String = null; var sawAvih = false
      def walk(from: Int, to: Int): Unit = {
        var off = from
        while (off + 8 <= to) {
          val id = fourcc(payload, off)
          val sz = math.max(0, readU32(payload, off + 4).toInt)
          val body = off + 8
          val complete = body + sz <= to // leaf chunks count only when whole
          id match {
            case "LIST" =>
              // a truncated trailing LIST still yields its complete prefix
              val lend = math.min(body.toLong + sz, to.toLong).toInt
              if (body + 4 <= lend) {
                val listType = fourcc(payload, body)
                if (listType == "hdrl" || listType == "strl" || listType == "movi")
                  walk(body + 4, lend)
              }
            case "avih" if sz >= 40 && complete =>
              sawAvih = true
              val usPerFrame = readU32(payload, body)
              if (fps == 0.0 && usPerFrame > 0) fps = 1e6 / usPerFrame
              width = readU32(payload, body + 32).toInt
              height = readU32(payload, body + 36).toInt
            case "strh" if sz >= 32 && complete =>
              if (fourcc(payload, body) == "vids") {
                codec = fourcc(payload, body + 4).trim.toLowerCase(java.util.Locale.ROOT)
                val scale = readU32(payload, body + 20)
                val rate = readU32(payload, body + 24)
                if (scale > 0 && rate > 0) fps = rate.toDouble / scale
              }
            case _ =>
              // movi data chunks: '##dc'/'##db' are video frames — counted
              // only when the chunk's bytes are actually all present
              if (complete && (id.endsWith("dc") || id.endsWith("db")))
                frames += 1
          }
          off = body + sz + (sz & 1) // chunks are word-aligned
        }
      }
      walk(12, end)
      if (!sawAvih || width <= 0 || height <= 0) return null
      val row = new GenericInternalRow(5)
      row.update(0, width)
      row.update(1, height)
      row.update(2, fps)
      row.update(3, frames)
      row.update(4, UTF8String.fromString(if (codec == null) "unknown" else codec))
      row
    } catch { case _: Exception => null }
  }
}
