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
    // lossless SOF3: flip the SOF0 marker byte
    val lossless = bytes.clone()
    val sof = lossless.indices.find(i => (lossless(i) & 0xff) == 0xff &&
      i + 1 < lossless.length && (lossless(i + 1) & 0xff) == 0xc0).get
    lossless(sof + 1) = 0xc3.toByte
    val e = intercept[UnsupportedOperationException](Jpeg.decode(lossless))
    assert(e.getMessage.contains("baseline"), e.getMessage)
    // SOF2 with a baseline FULL-BAND scan (Ss=0, Se=63) is illegal
    // Annex-G geometry: a DC scan may not carry a spectral band
    val prog = bytes.clone()
    prog(sof + 1) = 0xc2.toByte
    val e3 = intercept[IllegalArgumentException](Jpeg.decode(prog))
    assert(e3.getMessage.contains("spectral band"), e3.getMessage)
    // not a JPEG at all
    val e2 = intercept[IllegalArgumentException](
      Jpeg.decode("not a jpeg".getBytes))
    assert(e2.getMessage.contains("SOI"), e2.getMessage)
  }

  // ------------------------------------------------- progressive (SOF2)

  test("progressive fixture decodes to the exact closed-form constants") {
    for (id <- 0L to 6L; ri <- Seq(0, 2)) {
      val w = 8 * (2 + (id % 3)).toInt
      val h = 8 * (1 + (id % 2)).toInt
      val bytes = Jpeg.encodeGrayDcOnlyProgressive(w, h, blockVal(id),
        restartInterval = ri)
      // the stream really is SOF2
      assert(bytes.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2))
      val img = Jpeg.decode(bytes)
      assert(img.width == w && img.height == h && img.nComponents == 1)
      val bw = w / 8
      for (y <- 0 until h; x <- 0 until w) {
        val b = (y / 8) * bw + (x / 8)
        assert((img.pixels(y * w + x) & 0xff) == blockVal(id)(b),
          s"id=$id ri=$ri pixel ($x,$y) block $b")
      }
      if (ri > 0) {
        // restarts fire inside all three scans
        val blocks = (w / 8) * (h / 8)
        assert(img.nRestarts == 3L * ((blocks - 1) / ri),
          s"id=$id ri=$ri got ${img.nRestarts} restarts")
      }
    }
  }

  test("progressive pixels match the baseline encoding of the same content") {
    for (id <- Seq(2L, 5L)) {
      val (w, h) = (32, 24)
      val base = Jpeg.decode(Jpeg.encodeGrayDcOnly(w, h, blockVal(id)))
      val prog = Jpeg.decode(Jpeg.encodeGrayDcOnlyProgressive(w, h, blockVal(id)))
      assert(java.util.Arrays.equals(base.pixels, prog.pixels))
    }
  }

  test("ImageIO reads our progressive fixtures bit-exactly (legal Annex G)") {
    for ((id, ri) <- Seq((1L, 0), (4L, 2))) {
      val w = 8 * (2 + (id % 3)).toInt
      val h = 8 * (1 + (id % 2)).toInt
      val bytes = Jpeg.encodeGrayDcOnlyProgressive(w, h, blockVal(id),
        restartInterval = ri)
      val bi = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(bi != null, "ImageIO refused the progressive fixture")
      assert(bi.getWidth == w && bi.getHeight == h)
      val bw = w / 8
      for (y <- 0 until h; x <- 0 until w) {
        val b = (y / 8) * bw + (x / 8)
        assert(bi.getRaster.getSample(x, y, 0) == blockVal(id)(b),
          s"id=$id ri=$ri ImageIO pixel ($x,$y)")
      }
    }
  }

  /** ImageIO progressive-JPEG bytes (the IJG standard scan script:
    * spectral selection AND successive approximation, general AC). */
  private def imageIoProgressiveJpeg(bi: java.awt.image.BufferedImage,
                                     quality: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), p)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("ImageIO-encoded PROGRESSIVE grayscale (IJG scan script) decodes within rounding") {
    val (w, h) = (40, 24)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, (x * 5 + y * 3 + ((x * y) % 7)) % 256)
    val bytes = imageIoProgressiveJpeg(bi, 0.9f)
    // the writer really emitted SOF2 (otherwise this test is vacuous)
    assert(bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
      "ImageIO did not produce a progressive stream")
    val ours = Jpeg.decode(bytes)
    assert(ours.width == w && ours.height == h && ours.nComponents == 1)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs((ours.pixels(y * w + x) & 0xff) -
        ref.getRaster.getSample(x, y, 0))
      maxDiff = math.max(maxDiff, d)
    }
    info(s"progressive grayscale max |ours - ImageIO| = $maxDiff")
    assert(maxDiff <= 1,
      s"progressive IDCT drift vs ImageIO: $maxDiff (expected <= 1)")
  }

  test("ImageIO-encoded PROGRESSIVE color (4:2:0, interleaved DC scan) decodes within tolerance") {
    val (w, h) = (34, 26) // odd geometry: partial MCUs in every direction
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = 40 + x * 4; val g = 60 + y * 4; val b = 90 + ((x + y) * 2)
      bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bytes = imageIoProgressiveJpeg(bi, 0.95f)
    assert(bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
      "ImageIO did not produce a progressive stream")
    val ours = Jpeg.decode(bytes)
    assert(ours.width == w && ours.height == h && ours.nComponents == 3)
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
    info(s"progressive color max |ours - ImageIO| = $maxDiff, mean milli = $meanMilli")
    assert(maxDiff <= 8, s"progressive color drift vs ImageIO: max $maxDiff")
    assert(meanMilli <= 1500, s"progressive color drift: mean milli $meanMilli")
  }

  test("progressive named errors: AC before DC, refinement before first pass") {
    // build a legal progressive stream, then reorder scans by hand
    val good = Jpeg.encodeGrayDcOnlyProgressive(16, 8, _ => 77)
    // find the three SOS offsets
    val sosAt = good.indices.filter(i => (good(i) & 0xff) == 0xff &&
      i + 1 < good.length && (good(i + 1) & 0xff) == 0xda)
    assert(sosAt.length == 3)
    // drop everything from the first SOS, then append the AC scan first:
    // AC scan before the component's DC scan must fail by name
    val header = good.slice(0, sosAt(0))
    val acScan = good.slice(sosAt(2), good.length - 2) // third scan, no EOI
    val bad = header ++ acScan ++ Array(0xff.toByte, 0xd9.toByte)
    val e = intercept[IllegalArgumentException](Jpeg.decode(bad))
    assert(e.getMessage.contains("AC scan before"), e.getMessage)
    // DC refinement (Ah=1) before any first pass fails by name too
    val dcRefine = good.slice(sosAt(1), sosAt(2))
    val bad2 = header ++ dcRefine ++ Array(0xff.toByte, 0xd9.toByte)
    val e2 = intercept[IllegalArgumentException](Jpeg.decode(bad2))
    assert(e2.getMessage.contains("DC refinement before"), e2.getMessage)
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

  // ------------------------------------------------- 4:2:2 / 4:4:0 (r14)

  /** Find the SOF0/SOF2 segment and return (h, v) per component. */
  private def sofSampling(bytes: Array[Byte]): Seq[(Int, Int)] = {
    var i = 2
    while (i + 4 < bytes.length) {
      if ((bytes(i) & 0xff) == 0xff) {
        val m = bytes(i + 1) & 0xff
        if (m == 0xc0 || m == 0xc2) {
          val nf = bytes(i + 9) & 0xff
          return (0 until nf).map { ci =>
            val hv = bytes(i + 11 + ci * 3) & 0xff
            ((hv >> 4) & 0xf, hv & 0xf)
          }
        } else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2
        else i += 2 + (((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff))
      } else i += 1
    }
    fail("no SOF marker found")
  }

  test("4:2:2 fixture decodes to the exact closed-form constants (RGB = Y x3)") {
    for ((id, ri) <- Seq((3L, 0), (15L, 0), (27L, 2))) {
      val (w, h) = (32, 16) // 2x2 MCUs of 16x8
      val bytes = Jpeg.encodeColor422DcOnly(w, h, blockVal(id),
        restartInterval = ri)
      assert(sofSampling(bytes) == Seq((2, 1), (1, 1), (1, 1)))
      val img = Jpeg.decode(bytes)
      assert(img.width == w && img.height == h && img.nComponents == 3)
      val bw = w / 8
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val b = (y / 8) * bw + (x / 8)
        assert((img.pixels((y * w + x) * 3 + c) & 0xff) == blockVal(id)(b),
          s"id=$id ri=$ri pixel ($x,$y) ch $c block $b")
      }
      val nMcus = (w / 16) * (h / 8)
      assert(img.nRestarts == (if (ri > 0) (nMcus - 1) / ri else 0),
        s"id=$id ri=$ri got ${img.nRestarts} restarts")
    }
  }

  test("ImageIO reads our 4:2:2 fixtures (neutral chroma bit-exact, tinted within rounding)") {
    val (w, h) = (32, 16)
    val id = 3L
    // neutral chroma: RGB = (Y, Y, Y) in ANY conforming decoder
    locally {
      val bytes = Jpeg.encodeColor422DcOnly(w, h, blockVal(id))
      val bi = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(bi != null, "ImageIO refused the 4:2:2 fixture")
      assert(bi.getWidth == w && bi.getHeight == h)
      val bw = w / 8
      for (y <- 0 until h; x <- 0 until w) {
        val b = (y / 8) * bw + (x / 8)
        val rgb = bi.getRGB(x, y)
        for (shift <- Seq(16, 8, 0))
          assert(((rgb >> shift) & 0xff) == blockVal(id)(b),
            s"ImageIO 4:2:2 pixel ($x,$y) shift $shift")
      }
    }
    // tinted constant chroma: constant planes are invariant under any
    // chroma upsampling filter, so only the integer-vs-double RGB
    // conversion rounding can differ (<= 1 count)
    locally {
      val bytes = Jpeg.encodeColor422DcOnly(w, h, blockVal(id),
        cb = 140, cr = 112)
      val bi = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(bi != null)
      val ours = Jpeg.decode(bytes)
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val rgb = bi.getRGB(x, y)
        val rc = c match {
          case 0 => (rgb >> 16) & 0xff; case 1 => (rgb >> 8) & 0xff
          case _ => rgb & 0xff
        }
        maxDiff = math.max(maxDiff,
          math.abs((ours.pixels((y * w + x) * 3 + c) & 0xff) - rc))
      }
      info(s"tinted 4:2:2 max |ours - ImageIO| = $maxDiff")
      assert(maxDiff <= 1, s"4:2:2 RGB-conversion drift $maxDiff")
    }
  }

  /** ImageIO baseline JPEG with EXPLICIT luma sampling factors (set via
    * the native metadata tree — the JDK writer honors the sof node). */
  private def imageIoJpegSampled(bi: java.awt.image.BufferedImage,
                                 quality: Float, lh: Int,
                                 lv: Int): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val typ = javax.imageio.ImageTypeSpecifier.createFromRenderedImage(bi)
    val md = writer.getDefaultImageMetadata(typ, p)
    val fmt = "javax_imageio_jpeg_image_1.0"
    val tree = md.getAsTree(fmt).asInstanceOf[org.w3c.dom.Element]
    def walk(n: org.w3c.dom.Node): Unit = {
      if (n.getNodeName == "componentSpec") {
        val e = n.asInstanceOf[org.w3c.dom.Element]
        val luma = e.getAttribute("componentId") == "1"
        e.setAttribute("HsamplingFactor", if (luma) lh.toString else "1")
        e.setAttribute("VsamplingFactor", if (luma) lv.toString else "1")
      }
      var c = n.getFirstChild
      while (c != null) { walk(c); c = c.getNextSibling }
    }
    walk(tree)
    md.setFromTree(fmt, tree)
    writer.write(null, new javax.imageio.IIOImage(bi, null, md), p)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("ImageIO-encoded 4:2:2 and 4:4:0 color (general AC) decode within tolerance") {
    for (((lh, lv), name) <- Seq(((2, 1), "4:2:2"), ((1, 2), "4:4:0"))) {
      imageIoSampledCase(lh, lv, name, maxTol = 8, meanTolMilli = 1500)
    }
  }

  test("ImageIO-encoded 4:1:1-family color (luma factors up to 4) decode within tolerance") {
    // the DV-video-derived still layouts: 4x chroma subsampling means
    // box-vs-libjpeg ("fancy") upsampling can differ by more on a
    // gradient, so the bound is proportionally looser
    for (((lh, lv), name) <- Seq(((4, 1), "4:1:1"), ((1, 4), "4:1:1-T"),
        ((4, 2), "4x2"), ((2, 4), "2x4"), ((3, 1), "3x1")))
      imageIoSampledCase(lh, lv, name, maxTol = 16, meanTolMilli = 3000)
  }

  private def imageIoSampledCase(lh: Int, lv: Int, name: String,
                                 maxTol: Int, meanTolMilli: Long): Unit = {
      val (w, h) = (34, 26) // odd geometry: partial MCUs both directions
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) {
        val r = 40 + x * 4; val g = 60 + y * 4; val b = 90 + ((x + y) * 2)
        bi.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val bytes = imageIoJpegSampled(bi, 0.95f, lh, lv)
      // the writer really produced the requested sampling (non-vacuous)
      assert(sofSampling(bytes) == Seq((lh, lv), (1, 1), (1, 1)),
        s"ImageIO did not honor $name sampling")
      val ours = Jpeg.decode(bytes)
      assert(ours.width == w && ours.height == h && ours.nComponents == 3)
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
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
      info(s"$name max |ours - ImageIO| = $maxDiff, mean milli = $meanMilli")
      assert(maxDiff <= maxTol, s"$name drift vs ImageIO: max $maxDiff")
      assert(meanMilli <= meanTolMilli, s"$name drift: mean milli $meanMilli")
  }

  test("4:2:2 pixels match the grayscale encoding of the same luma (color path vs gray path)") {
    val id = 15L
    val (w, h) = (32, 16)
    val gray = Jpeg.decode(Jpeg.encodeGrayDcOnly(w, h, blockVal(id)))
    val color = Jpeg.decode(Jpeg.encodeColor422DcOnly(w, h, blockVal(id)))
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      assert(color.pixels((y * w + x) * 3 + c) == gray.pixels(y * w + x),
        s"($x,$y) ch $c")
  }

  test("chroma subsampling other than 1x1 fails by name; SOS table id > 3 is a named error") {
    // 2x1 CHROMA (luma 1x1) is outside the supported matrix
    val good = Jpeg.encodeColor422DcOnly(32, 16, _ => 100)
    val sof = good.indices.find(i => (good(i) & 0xff) == 0xff &&
      i + 1 < good.length && (good(i + 1) & 0xff) == 0xc0).get
    val bad = good.clone()
    bad(sof + 14) = 0x21 // Cb sampling byte (id at +13, hv at +14): 2x1
    val e = intercept[IllegalArgumentException](Jpeg.decode(bad))
    assert(e.getMessage.contains("chroma sampling"), e.getMessage)
    // SOS naming a Huffman table id >= 4 must fail by name, not AIOOBE
    // (baseline and progressive scan headers both bound the nibbles)
    for (prog <- Seq(false, true)) {
      val src =
        if (prog) Jpeg.encodeGrayDcOnlyProgressive(16, 8, _ => 77)
        else Jpeg.encodeGrayDcOnly(16, 8, _ => 77)
      val sos = src.indices.find(i => (src(i) & 0xff) == 0xff &&
        i + 1 < src.length && (src(i + 1) & 0xff) == 0xda).get
      val mut = src.clone()
      mut(sos + 6) = 0x44.toByte // table byte (ns at +4, id at +5): dc=ac=4
      val e2 = intercept[IllegalArgumentException](Jpeg.decode(mut))
      assert(e2.getMessage.contains("Huffman table id"),
        s"prog=$prog: ${e2.getMessage}")
    }
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
