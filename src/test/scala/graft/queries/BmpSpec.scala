package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** BMP decoder contracts (r13 — the seventh probe container):
  * 24-bit truecolor and 8-bit palette files written by the JDK's own
  * ImageIO BMP writer decode pixel-for-pixel; a hand-built TOP-DOWN
  * 32-bit variant covers the negative-height row order; corrupt
  * offsets/indices fail by name. */
class BmpSpec extends AnyFunSuite {

  private def imageIoBmp(bi: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "bmp", bos)
    bos.toByteArray
  }

  private def assertMatches(bytes: Array[Byte], label: String): Unit = {
    val v = MultiModalOps.bmpDecodeOf(bytes)
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(v.width == bi.getWidth && v.height == bi.getHeight, label)
    for (y <- 0 until v.height; x <- 0 until v.width) {
      val rgb = bi.getRGB(x, y)
      val o = (y * v.width + x) * 3
      assert((v.pixels(o) & 0xff) == ((rgb >> 16) & 0xff) &&
        (v.pixels(o + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
        (v.pixels(o + 2) & 0xff) == (rgb & 0xff),
        s"$label pixel ($x,$y)")
    }
  }

  test("24-bit and 8-bit palette BMPs from ImageIO decode pixel-for-pixel") {
    val (w, h) = (13, 7) // 13*3 = 39 bytes/row: real 4-byte padding
    val rgb = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      rgb.setRGB(x, y, ((x * 19) << 16) | ((y * 31) << 8) | ((x * y * 7) % 256))
    assertMatches(imageIoBmp(rgb), "bmp24")
    val idx = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until h; x <- 0 until w)
      idx.getRaster.setSample(x, y, 0, (x + y * 5) % 200)
    assertMatches(imageIoBmp(idx), "bmp8")
  }

  test("top-down (negative height) 32-bit BMP decodes in natural row order") {
    val (w, h) = (3, 2)
    val px = Array(0xFF0000, 0x00FF00, 0x0000FF, 0x102030, 0x405060, 0x708090)
    val b = java.nio.ByteBuffer.allocate(54 + w * h * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte); b.put('M'.toByte)
    b.putInt(54 + w * h * 4); b.putInt(0); b.putInt(54)
    b.putInt(40); b.putInt(w); b.putInt(-h) // NEGATIVE: top-down
    b.putShort(1); b.putShort(32); b.putInt(0); b.putInt(w * h * 4)
    b.putInt(2835); b.putInt(2835); b.putInt(0); b.putInt(0)
    px.foreach(p => b.putInt(p)) // BGRA little-endian == 0xAARRGGBB int
    val v = MultiModalOps.bmpDecodeOf(b.array())
    assert(v.width == w && v.height == h)
    for (i <- px.indices) {
      assert((v.pixels(i * 3) & 0xff) == ((px(i) >> 16) & 0xff), s"R $i")
      assert((v.pixels(i * 3 + 1) & 0xff) == ((px(i) >> 8) & 0xff), s"G $i")
      assert((v.pixels(i * 3 + 2) & 0xff) == (px(i) & 0xff), s"B $i")
    }
    // the probe dispatches BMP by magic
    val p = MultiModalOps.probeOf(b.array() ++ new Array[Byte](8))
    assert(p.container == "bmp" && p.width == w && p.height == h)
  }

  test("P5 grayscale PGM decodes and probes like P6 (r13)") {
    val (w, h) = (6, 4)
    val header = s"P5\n$w $h\n255\n".getBytes("ASCII")
    val plane = Array.tabulate(w * h)(i => ((i * 11 + 7) % 256).toByte)
    val pgm = header ++ plane
    val (pw, ph, r, g, b) = MultiModalOps.decodePpm(pgm)
    val mean = plane.map(_ & 0xff).map(_.toLong).sum / (w * h)
    assert(pw == w && ph == h && r == mean && g == mean && b == mean)
    val p = MultiModalOps.probeOf(pgm ++ new Array[Byte](0))
    assert(p.container == "ppm" && p.width == w && p.nUnits == w.toLong * h)
  }

  test("compressed BMPs and out-of-bounds pixel data fail by name") {
    val good = imageIoBmp(new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR))
    val rle = good.clone()
    rle(30) = 1 // compression = BI_RLE8
    val e = intercept[IllegalArgumentException](MultiModalOps.bmpDecodeOf(rle))
    assert(e.getMessage.contains("compression"), e.getMessage)
    val cut = java.util.Arrays.copyOf(good, good.length - 8)
    val e2 = intercept[IllegalArgumentException](MultiModalOps.bmpDecodeOf(cut))
    assert(e2.getMessage.contains("exceeds file bounds"), e2.getMessage)
  }
}
