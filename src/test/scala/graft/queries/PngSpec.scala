package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** PNG decoder contracts across the full color-type matrix (r13).
  * Cross-validation: images encoded by the JDK's independent ImageIO
  * PNG writer (gray 8/16, truecolor, indexed incl. transparency, RGBA)
  * must decode through OUR path to exactly the pixels ImageIO itself
  * reads back (composited over white with the same integer formula).
  * Adam7 interlace has no ImageIO writer, so a hand-built interlaced
  * stream (7 passes, spec geometry, real CRCs) must decode to the same
  * pixels as the equivalent sequential file. */
class PngSpec extends AnyFunSuite {

  private def imageIoPng(bi: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    bos.toByteArray
  }

  /** ImageIO's view of the file, composited over white with the
    * decoder's exact formula. */
  private def refRgb(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val w = bi.getWidth; val h = bi.getHeight
    def comp(c: Int, a: Int) = (c * a + 255 * (255 - a) + 127) / 255
    val out = new Array[Int](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = bi.getRGB(x, y)
      val a = (argb >>> 24) & 0xff
      out((y * w + x) * 3) = comp((argb >> 16) & 0xff, a)
      out((y * w + x) * 3 + 1) = comp((argb >> 8) & 0xff, a)
      out((y * w + x) * 3 + 2) = comp(argb & 0xff, a)
    }
    (w, h, out)
  }

  private def assertMatchesImageIo(bytes: Array[Byte], label: String): Unit = {
    val v = MultiModalOps.pngDecodeOf(bytes)
    val (w, h, ref) = refRgb(bytes)
    assert(v.width == w && v.height == h, label)
    var maxDiff = 0
    for (i <- ref.indices)
      maxDiff = math.max(maxDiff, math.abs((v.pixels(i) & 0xff) - ref(i)))
    assert(maxDiff == 0, s"$label: max pixel diff $maxDiff vs ImageIO")
  }

  test("grayscale 8-bit and 16-bit decode exactly (16-bit strips the low byte)") {
    // compare against ImageIO's RAW raster (getRGB would apply the
    // linear-gray -> sRGB color conversion, which PNG decode does not)
    def assertGray(bytes: Array[Byte], shift: Int, label: String): Unit = {
      val v = MultiModalOps.pngDecodeOf(bytes)
      val bi = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      for (y <- 0 until v.height; x <- 0 until v.width) {
        val want = bi.getRaster.getSample(x, y, 0) >> shift
        val o = (y * v.width + x) * 3
        assert((v.pixels(o) & 0xff) == want &&
          v.pixels(o) == v.pixels(o + 1) && v.pixels(o) == v.pixels(o + 2),
          s"$label ($x,$y): ${v.pixels(o) & 0xff} vs $want")
      }
    }
    val (w, h) = (13, 9)
    val g8 = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      g8.getRaster.setSample(x, y, 0, (x * 21 + y * 13) % 256)
    assertGray(imageIoPng(g8), 0, "gray8")
    val g16 = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      g16.getRaster.setSample(x, y, 0, (x * 5211 + y * 3177) % 65536)
    // our decode keeps the high byte; ImageIO's 16-bit raster >> 8
    assertGray(imageIoPng(g16), 8, "gray16")
  }

  test("palette (indexed) PNGs decode, including tRNS transparency") {
    val (w, h) = (16, 11)
    // an indexed model with one fully-transparent entry: ImageIO's PNG
    // writer emits PLTE + tRNS for it
    val n = 8
    val r = Array.tabulate(n)(i => (i * 36).toByte)
    val g = Array.tabulate(n)(i => (255 - i * 30).toByte)
    val b = Array.tabulate(n)(i => (i * 17 + 40).toByte)
    val a = Array.tabulate(n)(i => if (i == 3) 0.toByte else 255.toByte)
    val icm = new java.awt.image.IndexColorModel(3, n, r, g, b, a)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, (x + y * 3) % n)
    val bytes = imageIoPng(bi)
    // the writer genuinely produced a palette file with transparency
    assert(new String(bytes, "ISO-8859-1").contains("PLTE"))
    assert(new String(bytes, "ISO-8859-1").contains("tRNS"))
    assertMatchesImageIo(bytes, "palette+tRNS")
  }

  test("RGBA decodes with exact white compositing") {
    val (w, h) = (12, 10)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h; x <- 0 until w) {
      val a = (x * 23 + y * 11) % 256
      bi.setRGB(x, y, (a << 24) | (((x * 19) % 256) << 16) |
        (((y * 31) % 256) << 8) | ((x * y) % 256))
    }
    val bytes = imageIoPng(bi)
    assertMatchesImageIo(bytes, "rgba")
  }

  test("binary (1-bit) images decode") {
    val (w, h) = (19, 7) // odd width: the last byte of each row is ragged
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, (x + y) % 2)
    assertMatchesImageIo(imageIoPng(bi), "1-bit")
  }

  // ---- Adam7: hand-built interlaced stream vs the sequential twin ----

  private def crc32(data: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32(); c.update(data); c.getValue.toInt
  }
  private def chunk(typ: String, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + body.length)
    bb.putInt(body.length); bb.put(typ.getBytes("ASCII")); bb.put(body)
    bb.putInt(crc32(typ.getBytes("ASCII") ++ body))
    bb.array()
  }

  /** Encode 8-bit RGB pixels as an ADAM7-interlaced PNG (filter 0 rows —
    * the decoder's unfilter family is already covered sequentially). */
  private def adam7Png(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val x0 = Array(0, 4, 0, 2, 0, 1, 0); val y0 = Array(0, 0, 4, 0, 2, 0, 1)
    val dx = Array(8, 8, 4, 4, 2, 2, 1); val dy = Array(8, 8, 8, 4, 4, 2, 2)
    val raw = new java.io.ByteArrayOutputStream()
    for (p <- 0 until 7) {
      val wp = if (w > x0(p)) (w - x0(p) + dx(p) - 1) / dx(p) else 0
      val hp = if (h > y0(p)) (h - y0(p) + dy(p) - 1) / dy(p) else 0
      if (wp > 0 && hp > 0)
        for (y <- 0 until hp) {
          raw.write(0) // filter: None
          for (i <- 0 until wp) {
            val src = ((y0(p) + y * dy(p)) * w + x0(p) + i * dx(p)) * 3
            raw.write(rgb(src) & 0xff)
            raw.write(rgb(src + 1) & 0xff)
            raw.write(rgb(src + 2) & 0xff)
          }
        }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw.toByteArray); defl.finish()
    val zbuf = new Array[Byte](raw.size() + 128)
    val zlen = defl.deflate(zbuf); defl.end()
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w); ihdr.putInt(h)
    ihdr.put(8.toByte); ihdr.put(2.toByte) // depth 8, truecolor
    ihdr.put(0.toByte); ihdr.put(0.toByte); ihdr.put(1.toByte) // Adam7
    Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte) ++
      chunk("IHDR", ihdr.array()) ++
      chunk("IDAT", java.util.Arrays.copyOf(zbuf, zlen)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  test("Adam7 interlaced decode equals the sequential decode of the same pixels") {
    // odd geometry: every pass has ragged coverage, passes 1 and 3 are
    // narrow, and 11x5 leaves some passes nearly empty
    for ((w, h) <- Seq((11, 5), (8, 8), (17, 13), (3, 2), (1, 1), (2, 9))) {
      val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
      val seq = MultiModalOps.pngEncode(w, h, rgb)
      val lace = adam7Png(w, h, rgb)
      val a = MultiModalOps.pngDecodeOf(seq)
      val b = MultiModalOps.pngDecodeOf(lace)
      assert(a.width == b.width && a.height == b.height, s"${w}x$h dims")
      assert(java.util.Arrays.equals(a.pixels, b.pixels),
        s"${w}x$h: interlaced pixels differ from sequential")
      // ImageIO agrees on the hand-built interlaced file too
      assertMatchesImageIo(lace, s"adam7 ${w}x$h")
    }
  }

  test("corrupt palette index and missing PLTE fail by name") {
    // palette file with a 4-entry PLTE but an index byte of 7
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(2); ihdr.putInt(1)
    ihdr.put(8.toByte); ihdr.put(3.toByte)
    ihdr.put(0.toByte); ihdr.put(0.toByte); ihdr.put(0.toByte)
    val plte = Array.tabulate(12)(i => (i * 20).toByte)
    val row = Array[Byte](0, 1, 7) // filter 0, idx 1, idx 7 (beyond PLTE)
    val defl = new java.util.zip.Deflater()
    defl.setInput(row); defl.finish()
    val zbuf = new Array[Byte](64); val zlen = defl.deflate(zbuf); defl.end()
    val sig = Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte)
    val bad = sig ++ chunk("IHDR", ihdr.array()) ++ chunk("PLTE", plte) ++
      chunk("IDAT", java.util.Arrays.copyOf(zbuf, zlen)) ++
      chunk("IEND", Array.emptyByteArray)
    val e = intercept[IllegalArgumentException](MultiModalOps.pngDecodeOf(bad))
    assert(e.getMessage.contains("palette index"), e.getMessage)
    // same file without the PLTE chunk: named error before any decode
    val noPlte = sig ++ chunk("IHDR", ihdr.array()) ++
      chunk("IDAT", java.util.Arrays.copyOf(zbuf, zlen)) ++
      chunk("IEND", Array.emptyByteArray)
    val e2 = intercept[IllegalArgumentException](MultiModalOps.pngDecodeOf(noPlte))
    assert(e2.getMessage.contains("PLTE"), e2.getMessage)
  }
}
