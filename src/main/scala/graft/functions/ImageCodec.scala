package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/**
 * Real image codec on the JDK's built-in `javax.imageio` readers/writers
 * (PNG, JPEG, BMP, GIF — no external dependency). Static methods so the
 * wrapping Catalyst expressions inline them into whole-stage codegen the
 * same way the Sim/HtmlText kernels do.
 *
 * The generator side ([[encodePng]]) synthesizes a deterministic PNG per
 * seed — the sandbox stand-in for real crawled image bytes (reference
 * capability analog: the C360 media columns its agent pipelines consume).
 * The decode side is the REAL thing: [[decode]] parses whatever bytes it is
 * given through ImageIO and reports the actual raster dimensions + format.
 */
object ImageCodec {

  // disk-backed ImageIO stream caching defaults ON — that is a temp-file
  // create+delete PER DECODED ROW in the executor hot path (and lands in
  // /dev/shm when the bench redirects tmpdir); byte-array inputs need no
  // cache file at all
  ImageIO.setUseCache(false)

  private def mix64(z0: Long): Long = {
    // splitmix64 finalizer (public-domain constant set)
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic (width, height) a seed encodes to — exposed for tests. */
  def dims(seed: Long): (Int, Int) = {
    val m = mix64(seed)
    (16 + (Math.floorMod(m, 64L)).toInt, 16 + (Math.floorMod(m >>> 8, 64L)).toInt)
  }

  /** Deterministic small PNG: seeded per-pixel pattern, real PNG container. */
  def encodePng(seed: Long): Array[Byte] = {
    val (w, h) = dims(seed)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (mix64(seed ^ (y.toLong << 32) ^ x) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Decode image bytes → (width, height, format) InternalRow; null when the
    * bytes are not a decodable image (caller sees a NULL struct, not a
    * task failure — at 100 TB a corrupt payload must never kill a stage). */
  def decode(payload: Array[Byte]): InternalRow = {
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return null
        val r = readers.next()
        r.setInput(iis)
        val img = r.read(0) // full raster decode, not just the header
        val row = new GenericInternalRow(3)
        row.update(0, img.getWidth)
        row.update(1, img.getHeight)
        row.update(2, UTF8String.fromString(r.getFormatName.toLowerCase))
        r.dispose()
        row
      } finally iis.close()
    } catch { case _: Exception => null }
  }
}
