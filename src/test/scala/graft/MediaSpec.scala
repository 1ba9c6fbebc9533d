package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** The REAL image codec (JDK javax.imageio): PNG byte round-trips are
  * exact, JPEG decodes, the aHash is computed from decoded pixels with
  * the exact-integer rule, and real signatures flow through the same
  * banded near-dup join the opaque-payload tier uses. */
class MediaSpec extends SparkSpec {

  /** Expected luma of synthPng pixel (x,y) for a given seed. */
  private def g(seed: Long, x: Int, y: Int): Int =
    java.lang.Math.floorMod(37L * seed + x.toLong * x + 5L * y, 256L).toInt

  test("synthPng produces genuine PNG bytes that round-trip exactly") {
    val bytes = Multimodal.synthPng(7L, 24, 16)
    // PNG magic: 89 50 4E 47
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G')
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 24 && img.getHeight == 16)
    for (y <- 0 until 16; x <- 0 until 24)
      assert(img.getRaster.getSample(x, y, 0) == g(7L, x, y),
        s"pixel ($x,$y) lost in PNG round-trip")
  }

  test("imageFeature: dimensions, exact luma sum, analytic aHash") {
    val (w, h) = (32, 24)
    val f = Multimodal.imageFeature(3L, Multimodal.synthPng(3L, w, h))
    assert(f.ok && f.width == w && f.height == h)
    val expectedSum = (for (y <- 0 until h; x <- 0 until w)
      yield g(3L, x, y).toLong).sum
    assert(f.px_sum == expectedSum)
    // recompute the aHash from first principles with the same exact
    // integer rule and compare bit-for-bit
    val cellSum = new Array[Long](64)
    val cellPx = new Array[Long](64)
    for (y <- 0 until h; x <- 0 until w) {
      val b = (y * 8 / h) * 8 + (x * 8 / w)
      cellSum(b) += g(3L, x, y); cellPx(b) += 1
    }
    val nPx = w.toLong * h
    var hi = 0L; var lo = 0L
    for (b <- 0 until 64)
      if (cellPx(b) > 0 && cellSum(b) * nPx >= expectedSum * cellPx(b)) {
        if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
      }
    assert(f.phash_hi == hi && f.phash_lo == lo)
    assert(f.phash_hi >= 0L && f.phash_lo >= 0L) // 32-bit halves, sign-safe
  }

  test("JPEG blobs decode through the same path (dims survive lossy coding)") {
    val img = new java.awt.image.BufferedImage(
      40, 30, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 30; x <- 0 until 40)
      img.setRGB(x, y, ((x * 8) << 16) | ((y * 8) << 8) | 0x40)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val f = Multimodal.imageFeature(9L, baos.toByteArray)
    assert(f.ok && f.width == 40 && f.height == 30)
    assert(f.px_sum > 0) // lossy pixels, but decoded content is real
  }

  test("malformed blobs produce the ok=false sentinel, never an exception") {
    // crawler reality: headers that promise an image whose body lies.
    // JDK readers throw RUNTIME exceptions (not just IOException) on
    // these — the codec contract is a sentinel row, not a dead task.
    val png = Multimodal.synthPng(7L, 24, 16)
    val truncated = png.take(30) // valid PNG signature, body cut off
    val corrupted = png.clone()
    for (i <- 20 until math.min(60, corrupted.length))
      corrupted(i) = (corrupted(i) ^ 0x5a).toByte // scrambled chunk data
    val garbage = Array.fill[Byte](256)(0x42)
    Seq(truncated, corrupted, garbage, Array.emptyByteArray, null).foreach { b =>
      val f = Multimodal.imageFeature(1L, b)
      assert(!f.ok && f.width == 0 && f.height == 0)
    }
  }

  test("real-pixel aHash has perceptual locality: edits flip few bits, inversions flip many") {
    // base: half dark / half bright — every 8x8 cell decisively off-mean
    def paint(edit: Boolean, invert: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 64; x <- 0 until 64) {
        val base = if (x < 32) 30 else 220
        val v0 = if (invert) 250 - base else base
        // edit: brighten ONLY the top-left 8x8 cell
        val v = if (edit && x < 8 && y < 8) 220 else v0
        img.getRaster.setSample(x, y, 0, v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    def sig(b: Array[Byte]): Long = {
      val f = Multimodal.imageFeature(0L, b)
      (f.phash_hi << 32) | f.phash_lo
    }
    val base = sig(paint(edit = false, invert = false))
    val edited = sig(paint(edit = true, invert = false))
    val inverted = sig(paint(edit = false, invert = true))
    assert(java.lang.Long.bitCount(base ^ edited) <= 2,
      "single-cell edit must flip at most a couple of aHash bits")
    assert(java.lang.Long.bitCount(base ^ inverted) >= 32,
      "luma inversion must flip most aHash bits")
  }

  test("mediaNearDups over REAL decoded signatures finds edits, not inversions") {
    import spark.implicits._
    def blob(seed: Long, tweakCell: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        32, 32, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v0 = if (((x / 4) + (y / 4)) % 2 == 0) 40 else 210 // checker
        val v = if (tweakCell && x < 4 && y < 4) 210 - v0 + 40 else v0
        img.getRaster.setSample(x, y, 0, math.min(255, math.max(0, v)))
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    def inv(b: Array[Byte]): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        img.getRaster.setSample(x, y, 0,
          255 - img.getRaster.getSample(x, y, 0))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val rows = Seq(
      (0L, blob(0L, tweakCell = false)),
      (1L, blob(0L, tweakCell = true)), // one-cell tweak: near-dup of 0
      (2L, inv(blob(0L, tweakCell = false))), // inverted: far from all
      (3L, blob(0L, tweakCell = false))) // exact copy of 0
      .toDF("media_id", "bytes")
    val sigs = Multimodal.perceptualHashImagePartitioned(rows)
    val pairs = Multimodal.mediaNearDups(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L), (0L, 3L), (1L, 3L)))
  }
}
