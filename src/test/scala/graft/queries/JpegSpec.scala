package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Baseline-JPEG codec contracts. Two directions of cross-validation
  * against the JDK's independent ImageIO JPEG codec:
  *
  *   1. fixtures we ENCODE must be legal JPEG — ImageIO decodes them
  *      bit-exactly (DC-only blocks are integer-exact in any conforming
  *      decoder);
  *   2. images ImageIO encodes (general AC coefficients, libjpeg-style
  *      default Huffman tables, 4:2:0 color) must decode through OUR
  *      path within IDCT/upsampling rounding tolerance.
  */
class JpegSpec extends AnyFunSuite {

  private def blockVal(id: Long)(b: Int): Int = ((id * 17 + b * 29) % 256).toInt

  test("DC-only fixture decodes to the exact closed-form constants") {
    for (id <- 0L to 6L) {
      val w = 8 * (2 + (id % 3)).toInt
      val h = 8 * (1 + (id % 2)).toInt
      val bytes = Jpeg.encodeGrayDcOnly(w, h, blockVal(id))
      val img = Jpeg.decode(bytes)
      assert(img.width == w && img.height == h && img.nComponents == 1)
      val bw = w / 8
      for (y <- 0 until h; x <- 0 until w) {
        val b = (y / 8) * bw + (x / 8)
        assert((img.pixels(y * w + x) & 0xff) == blockVal(id)(b),
          s"id=$id pixel ($x,$y) block $b")
      }
      assert(img.nRestarts == 0)
    }
  }

  test("ImageIO reads our fixtures bit-exactly (they are legal JPEG)") {
    for (id <- Seq(1L, 4L)) {
      val w = 8 * (2 + (id % 3)).toInt
      val h = 8 * (1 + (id % 2)).toInt
      val bytes = Jpeg.encodeGrayDcOnly(w, h, blockVal(id))
      val bi = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(bi != null, "ImageIO refused the fixture")
      assert(bi.getWidth == w && bi.getHeight == h)
      val bw = w / 8
      for (y <- 0 until h; x <- 0 until w) {
        val b = (y / 8) * bw + (x / 8)
        val gray = bi.getRaster.getSample(x, y, 0)
        assert(gray == blockVal(id)(b), s"id=$id ImageIO pixel ($x,$y)")
      }
    }
  }

  test("restart intervals: RST markers consumed, DC predictors reset, pixels unchanged") {
    val id = 5L
    val (w, h) = (32, 24) // 12 blocks
    val plain = Jpeg.decode(Jpeg.encodeGrayDcOnly(w, h, blockVal(id)))
    val rst = Jpeg.decode(Jpeg.encodeGrayDcOnly(w, h, blockVal(id),
      restartInterval = 2))
    assert(rst.nRestarts == (12 - 1) / 2, s"got ${rst.nRestarts} restarts")
    assert(java.util.Arrays.equals(plain.pixels, rst.pixels))
    // ImageIO agrees on the restart-interval variant too
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Jpeg.encodeGrayDcOnly(w, h, blockVal(id), restartInterval = 2)))
    for (y <- 0 until h; x <- 0 until w)
      assert(bi.getRaster.getSample(x, y, 0) ==
        (plain.pixels(y * w + x) & 0xff))
  }

  /** Encode a BufferedImage to baseline JPEG bytes via ImageIO. */
  private def imageIoJpeg(bi: java.awt.image.BufferedImage,
                          quality: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), p)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("ImageIO-encoded GRAYSCALE (general AC + libjpeg tables) decodes within rounding") {
    val (w, h) = (40, 24)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, (x * 5 + y * 3 + ((x * y) % 7)) % 256)
    val bytes = imageIoJpeg(bi, 0.9f)
    val ours = Jpeg.decode(bytes)
    assert(ours.width == w && ours.height == h && ours.nComponents == 1)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs((ours.pixels(y * w + x) & 0xff) -
        ref.getRaster.getSample(x, y, 0))
      maxDiff = math.max(maxDiff, d)
    }
    info(s"grayscale max |ours - ImageIO| = $maxDiff")
    assert(maxDiff <= 1,
      s"IDCT drift vs ImageIO: $maxDiff (expected <= 1 from rounding)")
  }

  test("ImageIO-encoded COLOR (4:2:0 YCbCr) decodes within upsampling tolerance") {
    val (w, h) = (32, 32)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      // smooth gradient: chroma varies gently so box-vs-triangle chroma
      // upsampling differences stay within a few counts
      val r = 40 + x * 4; val g = 60 + y * 4; val b = 90 + ((x + y) * 2)
      bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bytes = imageIoJpeg(bi, 0.95f)
    val ours = Jpeg.decode(bytes)
    assert(ours.nComponents == 3)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0; var sumDiff = 0L
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val rgb = ref.getRGB(x, y)
      val rc = c match {
        case 0 => (rgb >> 16) & 0xff; case 1 => (rgb >> 8) & 0xff
        case _ => rgb & 0xff
      }
      val d = math.abs((ours.pixels((y * w + x) * 3 + c) & 0xff) - rc)
      maxDiff = math.max(maxDiff, d); sumDiff += d
    }
    val meanMilli = 1000 * sumDiff / (w * h * 3)
    info(s"color max |ours - ImageIO| = $maxDiff, mean milli = $meanMilli")
    assert(maxDiff <= 8, s"color drift vs ImageIO: max $maxDiff")
    assert(meanMilli <= 1500, s"color drift vs ImageIO: mean milli $meanMilli")
  }

  test("odd (partial-MCU) dimensions decode within rounding at several qualities") {
    // real files are rarely 8-aligned: the right/bottom edge blocks are
    // padded at encode and must be CROPPED at reassembly — exercise
    // gray 37x21 and 4:2:0 color 30x26 (odd chroma geometry) across
    // quality settings
    for (q <- Seq(0.5f, 0.75f, 0.95f)) {
      val (w, h) = (37, 21)
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        bi.getRaster.setSample(x, y, 0, (x * 6 + y * 5) % 256)
      val bytes = imageIoJpeg(bi, q)
      val ours = Jpeg.decode(bytes)
      assert(ours.width == w && ours.height == h)
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w)
        maxDiff = math.max(maxDiff, math.abs(
          (ours.pixels(y * w + x) & 0xff) - ref.getRaster.getSample(x, y, 0)))
      info(s"gray 37x21 q=$q max diff = $maxDiff")
      assert(maxDiff <= 1, s"q=$q gray drift $maxDiff")
    }
    locally {
      val (w, h) = (30, 26)
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w)
        bi.setRGB(x, y, ((50 + x * 3) << 16) | ((70 + y * 3) << 8) |
          (100 + x + y))
      val bytes = imageIoJpeg(bi, 0.95f)
      val ours = Jpeg.decode(bytes)
      assert(ours.width == w && ours.height == h && ours.nComponents == 3)
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val rgb = ref.getRGB(x, y)
        val rc = c match {
          case 0 => (rgb >> 16) & 0xff; case 1 => (rgb >> 8) & 0xff
          case _ => rgb & 0xff
        }
        maxDiff = math.max(maxDiff,
          math.abs((ours.pixels((y * w + x) * 3 + c) & 0xff) - rc))
      }
      info(s"color 30x26 4:2:0 max diff = $maxDiff")
      assert(maxDiff <= 8, s"odd-dims color drift $maxDiff")
    }
  }

  test("unsupported variants fail by name") {
    val bytes = Jpeg.encodeGrayDcOnly(16, 16, _ => 100)
    // progressive SOF2: flip the SOF0 marker byte
    val prog = bytes.clone()
    val sof = prog.indices.find(i => (prog(i) & 0xff) == 0xff &&
      i + 1 < prog.length && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    val e = intercept[UnsupportedOperationException](Jpeg.decode(prog))
    assert(e.getMessage.contains("baseline"), e.getMessage)
    // not a JPEG at all
    val e2 = intercept[IllegalArgumentException](
      Jpeg.decode("not a jpeg".getBytes))
    assert(e2.getMessage.contains("SOI"), e2.getMessage)
  }

  test("0xFF fill bytes before markers are skipped (T.81 B.1.1.2)") {
    val id = 3L
    val (w, h) = (24, 16)
    val plain = Jpeg.encodeGrayDcOnly(w, h, blockVal(id))
    val ref = Jpeg.decode(plain)
    // pad EVERY marker in the header stream (up to and including SOS) with
    // two fill bytes: spec-legal output some encoders emit
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    var inHeader = true
    while (i < plain.length) {
      if (i >= 2 && // the file must still BEGIN with SOI
        inHeader && (plain(i) & 0xff) == 0xff && i + 1 < plain.length &&
        (plain(i + 1) & 0xff) != 0x00) {
        out.write(0xff); out.write(0xff) // fill bytes
        if ((plain(i + 1) & 0xff) == 0xda) inHeader = false // entropy data next
      }
      out.write(plain(i)); i += 1
    }
    val padded = Jpeg.decode(out.toByteArray)
    assert(padded.width == w && padded.height == h)
    assert(java.util.Arrays.equals(ref.pixels, padded.pixels),
      "fill-byte padding changed decoded pixels")
  }

  test("empty SOS body (length field == 2) fails by name, not AIOOBE") {
    val bytes = Jpeg.encodeGrayDcOnly(16, 8, _ => 50)
    val sos = bytes.indices.find(i => (bytes(i) & 0xff) == 0xff &&
      i + 1 < bytes.length && (bytes(i + 1) & 0xff) == 0xda).get
    val truncated = java.util.Arrays.copyOfRange(bytes, 0, sos + 4)
    truncated(sos + 2) = 0x00; truncated(sos + 3) = 0x02 // len=2: empty body
    val e = intercept[IllegalArgumentException](Jpeg.decode(truncated))
    assert(e.getMessage.contains("short SOS"), e.getMessage)
  }
}
