package graft.tiff

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.MultiModalOps
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import java.awt.image.BufferedImage

/** TIFF/GeoTIFF codec contracts (r15). The load-bearing property is the
  * INTEROP one (the r13 GIF lesson): every compression/layout leg that
  * ImageIO's independent TIFF plugin can express is cross-validated in
  * BOTH directions, across geometries that vary tile clipping, short
  * strips, and every LZW code-width boundary. BigTIFF — which ImageIO
  * cannot read — and 16-bit predictor-2 — which ImageIO's reader
  * refuses (its limitation, not the spec's) — are validated
  * differentially against their ImageIO-validated classic/pred-1
  * twins. */
class TiffSpec extends AnyFunSuite {

  private def px8(id: Int)(x: Int, y: Int, c: Int): Int =
    (x * 7 + y * 13 + id * 17 + c * 41) % 256
  private def noise(x: Int, y: Int, c: Int): Int =
    (x * 31 + y * 17 + x * y + c * 53) % 256

  /** Geometries chosen to vary: single pixel, sub-tile, exact tile,
    * tile+1, short last strip, multi-tile grids with right/bottom
    * clipping. */
  private val geoms = Seq((1, 1), (7, 5), (16, 16), (17, 16), (24, 16),
    (33, 31), (56, 32), (130, 67))

  private def imageioRead(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new ByteArrayInputStream(bytes))

  private def imageioWrite(img: BufferedImage, compName: Option[String],
                           tiled: Boolean): Array[Byte] = {
    val w = ImageIO.getImageWritersByFormatName("tiff").next()
    val p = w.getDefaultWriteParam
    compName.foreach { cn =>
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType(cn)
    }
    if (tiled) {
      p.setTilingMode(ImageWriteParam.MODE_EXPLICIT)
      p.setTiling(16, 16, 0, 0)
    }
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  test("round trip across the full axis matrix, with GeoTIFF keys") {
    var n = 0
    for ((w, h) <- geoms; comp <- Seq(1, 5, 8, 32773); bits <- Seq(8, 16);
         samples <- Seq(1, 3); tiled <- Seq(false, true);
         le <- Seq(true, false); pred <- Seq(1, 2)
         if !(pred == 2 && (comp == 1 || comp == 32773)) &&
           !(bits == 16 && samples == 3)) {
      val f = (x: Int, y: Int, c: Int) =>
        if (bits == 8) px8(3)(x, y, c) else px8(3)(x, y, c) * 257
      val enc = Tiff.encode(w, h, bits, samples, le, comp, pred,
        if (tiled) Some((16, 16)) else None, 7, bigTiff = false, f,
        Some(Tiff.Geo(0.5, 0.5, -179.0, 88.0, 4326, geographic = true)))
      val img = Tiff.decode(enc)
      assert(img.width == w && img.height == h &&
        img.bits == bits && img.samples == samples &&
        img.compression == comp && img.predictor == pred &&
        img.littleEndian == le && img.tiled == tiled,
        s"facts w=$w h=$h comp=$comp bits=$bits s=$samples")
      assert(img.epsg == 4326 && img.modelType == 2 &&
        img.citation == "graft" && math.abs(img.scaleX - 0.5) < 1e-12 &&
        math.abs(img.tieX + 179.0) < 1e-12 && math.abs(img.tieY - 88.0) < 1e-12)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until samples)
        assert(img.pixels((y * w + x) * samples + c) == f(x, y, c),
          s"pixel ($x,$y,$c) w=$w h=$h comp=$comp bits=$bits tiled=$tiled pred=$pred")
      n += 1
    }
    assert(n > 400, s"matrix should be dense, got $n combos")
  }

  test("ours -> ImageIO: every ImageIO-readable leg decodes to our pixels") {
    for ((w, h) <- geoms; comp <- Seq(1, 5, 8, 32773); samples <- Seq(1, 3);
         tiled <- Seq(false, true); le <- Seq(true, false);
         pred <- Seq(1, 2) if !(pred == 2 && (comp == 1 || comp == 32773))) {
      val f = (x: Int, y: Int, c: Int) => px8(5)(x, y, c)
      val enc = Tiff.encode(w, h, 8, samples, le, comp, pred,
        if (tiled) Some((16, 16)) else None, 7, bigTiff = false, f, None)
      val img = imageioRead(enc)
      assert(img != null && img.getWidth == w && img.getHeight == h,
        s"ImageIO read w=$w h=$h comp=$comp")
      for (y <- 0 until h; x <- 0 until w; c <- 0 until samples)
        assert(img.getRaster.getSample(x, y, c) == f(x, y, c),
          s"pixel ($x,$y,$c) w=$w h=$h comp=$comp s=$samples tiled=$tiled le=$le pred=$pred")
    }
    // 16-bit gray: ImageIO reads pred=1; pred=2 is refused by ImageIO's
    // reader (its limitation), so that leg is differential below
    for ((w, h) <- Seq((24, 16), (33, 31)); comp <- Seq(1, 5, 8);
         le <- Seq(true, false)) {
      val f = (x: Int, y: Int, c: Int) => px8(7)(x, y, c) * 257
      val img = imageioRead(
        Tiff.encode(w, h, 16, 1, le, comp, 1, None, 7, false, f, None))
      assert(img != null)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRaster.getSample(x, y, 0) == f(x, y, 0),
          s"16-bit pixel ($x,$y) comp=$comp le=$le")
      if (comp != 1) {
        val a = Tiff.decode(Tiff.encode(w, h, 16, 1, le, comp, 1, None, 7, false, f, None))
        val b = Tiff.decode(Tiff.encode(w, h, 16, 1, le, comp, 2, None, 7, false, f, None))
        assert(java.util.Arrays.equals(a.pixels, b.pixels),
          s"16-bit pred2 differential comp=$comp le=$le")
      }
    }
  }

  test("ImageIO -> ours: every ImageIO compression, strips and tiles, gray and RGB") {
    for ((w, h) <- geoms;
         compName <- Seq(None, Some("LZW"), Some("ZLib"), Some("Deflate"),
           Some("PackBits"));
         rgb <- Seq(false, true); tiled <- Seq(false, true)) {
      val img = new BufferedImage(w, h,
        if (rgb) BufferedImage.TYPE_3BYTE_BGR else BufferedImage.TYPE_BYTE_GRAY)
      val samples = if (rgb) 3 else 1
      for (y <- 0 until h; x <- 0 until w; c <- 0 until samples)
        img.getRaster.setSample(x, y, c, px8(11)(x, y, c))
      val dec = Tiff.decode(imageioWrite(img, compName, tiled))
      assert(dec.width == w && dec.height == h && dec.samples == samples,
        s"dims/samples w=$w h=$h comp=$compName rgb=$rgb")
      for (y <- 0 until h; x <- 0 until w; c <- 0 until samples)
        assert(dec.pixels((y * w + x) * samples + c) == px8(11)(x, y, c),
          s"pixel ($x,$y,$c) w=$w h=$h comp=$compName rgb=$rgb tiled=$tiled")
    }
  }

  test("LZW code-width boundaries: noise sweep crossing 511/1023/2047 and the clear, both directions") {
    val w = 256
    for (h <- Seq(1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64)) {
      // ours -> ImageIO
      val enc = Tiff.encode(w, h, 8, 1, false, 5, 1, None, h, false, noise, None)
      val img = imageioRead(enc)
      assert(img != null, s"ImageIO read ${w}x$h")
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRaster.getSample(x, y, 0) == noise(x, y, 0),
          s"ours->imageio pixel ($x,$y) h=$h")
      // ImageIO -> ours
      val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        bi.getRaster.setSample(x, y, 0, noise(x, y, 0))
      val dec = Tiff.decode(imageioWrite(bi, Some("LZW"), tiled = false))
      for (y <- 0 until h; x <- 0 until w)
        assert(dec.pixels(y * w + x) == noise(x, y, 0),
          s"imageio->ours pixel ($x,$y) h=$h")
      // raw kernel self round-trip (largest h drives a mid-stream clear)
      val plane = Array.tabulate[Byte](w * h)(i => noise(i % w, i / w, 0).toByte)
      assert(java.util.Arrays.equals(
        Tiff.lzwDecode(Tiff.lzwEncode(plane), plane.length), plane),
        s"lzw self h=$h")
    }
  }

  test("BigTIFF: differential vs classic (ImageIO cannot read magic 43), and the 8-byte structures parse") {
    for ((w, h) <- geoms; comp <- Seq(1, 5); tiled <- Seq(false, true)) {
      val f = (x: Int, y: Int, c: Int) => px8(9)(x, y, c)
      val classic = Tiff.encode(w, h, 8, 1, true, comp, 1,
        if (tiled) Some((16, 16)) else None, 7, bigTiff = false, f,
        Some(Tiff.Geo(0.25, 0.25, 12.0, 55.0, 32633, geographic = false)))
      val big = Tiff.encode(w, h, 8, 1, true, comp, 1,
        if (tiled) Some((16, 16)) else None, 7, bigTiff = true, f,
        Some(Tiff.Geo(0.25, 0.25, 12.0, 55.0, 32633, geographic = false)))
      val (a, b) = (Tiff.decode(classic), Tiff.decode(big))
      assert(!a.bigTiff && b.bigTiff)
      assert(big(2) == 43 && big(3) == 0) // II magic 43, little-endian
      assert(java.util.Arrays.equals(a.pixels, b.pixels),
        s"pixel differential w=$w h=$h comp=$comp tiled=$tiled")
      assert(a.nSegments == b.nSegments && a.epsg == b.epsg &&
        b.epsg == 32633 && b.modelType == 1)
    }
  }

  test("m16 fixtures: decoded facts equal the synthesis closed forms") {
    for (id <- 0L until 64L) {
      val v = Tiff.decode(MultiModalOps.tiffBytes(id))
      val (w, h) = (24 + (id % 5) * 8, 16 + (id % 3) * 8)
      assert(v.width == w && v.height == h, s"id=$id dims")
      assert(v.littleEndian == (id % 2 == 0), s"id=$id endianness")
      assert(v.bigTiff == (id % 8 == 7), s"id=$id bigtiff")
      assert(v.samples == (if (id % 4 == 2) 3 else 1), s"id=$id samples")
      assert(v.bits == (if (id % 6 == 3) 16 else 8), s"id=$id bits")
      assert(v.tiled == (id % 3 == 0), s"id=$id layout")
      val expSegs =
        if (id % 3 == 0) ((w + 15) / 16) * ((h + 15) / 16) else (h + 6) / 7
      assert(v.nSegments == expSegs, s"id=$id segments ${v.nSegments} != $expSegs")
      assert(v.epsg == (if (id % 7 == 0) 32633 else 4326), s"id=$id epsg")
      assert(v.modelType == (if (id % 7 == 0) 1 else 2), s"id=$id modelType")
      assert(v.nPages == (if (id % 9 == 4) 2 else 1), s"id=$id nPages")
      if (id % 9 == 4) {
        val ov = Tiff.decodePages(MultiModalOps.tiffBytes(id))(1)
        assert(ov.subfileType == 1 && ov.width == v.width / 2, s"id=$id overview")
      }
      var (sum, expSum) = (0L, 0L)
      v.pixels.foreach(sum += _)
      for (y <- 0 until h.toInt; x <- 0 until w.toInt; c <- 0 until v.samples) {
        val base = (x * 7 + y * 13 + id * 17 + c * 41) % 256
        expSum += (if (v.bits == 16) base * 257 else base)
      }
      assert(sum == expSum, s"id=$id px_sum $sum != $expSum")
    }
  }

  test("unsupported shapes fail by name; PackBits+predictor is refused at encode") {
    def enc(patch: Array[Byte] => Unit): Array[Byte] = {
      val b = Tiff.encode(24, 16, 8, 1, true, 1, 1, None, 7, false,
        (x, y, _) => (x + y) % 256, None)
      patch(b); b
    }
    // compression 2 (CCITT) is real but out of scope: named error
    val e1 = intercept[IllegalArgumentException] {
      // compression SHORT sits in the IFD; find tag 259 and patch its value
      val b = enc(_ => ())
      val ifd = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .getInt(4)
      val n = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .getShort(ifd) & 0xFFFF
      var patched = false
      for (i <- 0 until n) {
        val at = ifd + 2 + i * 12
        val tag = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          .getShort(at) & 0xFFFF
        if (tag == 259) { b(at + 8) = 2; patched = true }
      }
      assert(patched, "no compression tag found")
      Tiff.decode(b)
    }
    assert(e1.getMessage.contains("compression 2 not supported"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Tiff.decode("II not a tiff at all".getBytes("ASCII"))
    }
    assert(e2.getMessage.contains("not a TIFF"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Tiff.encode(8, 8, 8, 1, true, 32773, 2, None, 8, false, (_, _, _) => 0, None)
    }
    assert(e3.getMessage.contains("predictor 2 with PackBits"), e3.getMessage)
  }

  test("readFragment: rioxarray conventions — pixel-center coords, band-major RGB, crs attr, narrow dtypes") {
    import graft.core.{AttrValue, DType, Slc}
    val geo = Some(Tiff.Geo(0.25, 0.25, -20.0, 60.0, 4326, geographic = true))
    // single-band geo
    val f1 = Tiff.readFragment(Tiff.encode(40, 8, 8, 1, true, 8, 1, None, 4,
      false, (x, y, _) => px8(3)(x, y, 0), geo))
    assert(f1.dims == Map("y" -> 8, "x" -> 40))
    assert(f1.attrs.get("crs").contains(AttrValue("EPSG:4326")))
    val xs = f1.coords("x").data
    assert(xs.dtype == DType.F8 && xs.getDouble(0) == -20.0 + 0.5 * 0.25 &&
      xs.getDouble(39) == -20.0 + 39.5 * 0.25)
    val ys = f1.coords("y").data
    assert(ys.getDouble(0) == 60.0 - 0.5 * 0.25 &&
      ys.getDouble(7) == 60.0 - 7.5 * 0.25, "y descends from the tiepoint")
    val d1 = f1.dataVars("band_data")
    assert(d1.dims == Vector("y", "x") && d1.dtype == DType.U1)
    assert((d1.data.data.asInstanceOf[Array[Byte]](40 + 3) & 0xFF) ==
      px8(3)(3, 1, 0))
    // RGB: band-major (band, y, x) with a 1-based band coord
    val f3 = Tiff.readFragment(Tiff.encode(10, 6, 8, 3, false, 1, 1, None, 6,
      false, (x, y, c) => px8(5)(x, y, c), None))
    assert(f3.dims == Map("band" -> 3, "y" -> 6, "x" -> 10))
    assert(f3.coords("band").data.data.asInstanceOf[Array[Int]].toVector ==
      Vector(1, 2, 3))
    val d3 = f3.dataVars("band_data").data.data.asInstanceOf[Array[Byte]]
    for (b <- 0 until 3; y <- 0 until 6; x <- 0 until 10)
      assert((d3(b * 60 + y * 10 + x) & 0xFF) == px8(5)(x, y, b))
    // no geo tags: identity transform, 0.5-offset indices, no crs
    assert(f3.attrs.isEmpty)
    assert(f3.coords("x").data.getDouble(2) == 2.5 &&
      f3.coords("y").data.getDouble(0) == 0.5)
    // 16-bit -> uint16 shorts
    val f16 = Tiff.readFragment(Tiff.encode(9, 5, 16, 1, false, 1, 1, None, 5,
      false, (x, y, _) => px8(7)(x, y, 0) * 257, None))
    assert(f16.dataVars("band_data").dtype == DType.U2)
    assert((f16.dataVars("band_data").data.data.asInstanceOf[Array[Short]](0)
      & 0xFFFF) == px8(7)(0, 0, 0) * 257)
    // isel composes (the pipeline's region slicing)
    assert(f1.isel(Map("y" -> Slc(2, 5))).dims("y") == 3)
  }

  test("opener engine: FileType.Tiff resolves to rasterio and opens through the registry") {
    import graft.patterns.FileType
    import graft.transforms.Openers
    assert(Openers.resolveEngine(FileType.Tiff) == "rasterio")
    // conflicting user engine rejected, reference _set_engine semantics
    val e = intercept[IllegalArgumentException] {
      Openers.resolveEngine(FileType.Tiff, Some("scipy"))
    }
    assert(e.getMessage.contains("conflicts"))
    val dir = java.nio.file.Files.createTempDirectory("graft_tiff_open")
    val p = dir.resolve("a.tif").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      Tiff.encode(24, 16, 8, 1, true, 5, 1, Some((16, 16)), 0, false,
        (x, y, _) => px8(9)(x, y, 0),
        Some(Tiff.Geo(0.5, 0.5, 10.0, 50.0, 32633, geographic = false))))
    val f = Openers.open(FileType.Tiff, p)
    assert(f.dims == Map("y" -> 16, "x" -> 24))
    assert(f.attrs.get("crs").contains(graft.core.AttrValue("EPSG:32633")))
  }

  test("kerchunk scanTiff: segments become zarr chunk refs; virtual store equals Tiff.read; rejections by name") {
    import graft.kerchunk.RefSet
    val dir = java.nio.file.Files.createTempDirectory("graft_tiff_scan")
    def write(name: String, bytes: Array[Byte]): String = {
      val p = dir.resolve(name).toString
      java.nio.file.Files.write(java.nio.file.Paths.get(p), bytes); p
    }
    val geo = Some(Tiff.Geo(0.25, 0.25, -20.0, 60.0, 4326, geographic = true))
    // deflate strips, 16-bit, BIG-endian: covers the zlib codec ref,
    // the u2 dtype and the bigEndian metadata flag at once
    val pDef = write("def.tif", Tiff.encode(40, 8, 16, 1, false, 8, 1, None,
      4, false, (x, y, _) => px8(3)(x, y, 0) * 257, geo))
    // uncompressed tiles, classic + BigTIFF twins
    val pTile = write("tile.tif", Tiff.encode(40, 24, 8, 1, true, 1, 1,
      Some((16, 16)), 0, false, (x, y, _) => px8(5)(x, y, 0), geo))
    val pBig = write("big.tif", Tiff.encode(40, 24, 8, 1, true, 1, 1,
      Some((16, 16)), 0, true, (x, y, _) => px8(5)(x, y, 0), geo))
    Seq(pDef, pTile, pBig).foreach { p =>
      val refs = RefSet.scanTiff(p)
      assert(refs.asZarrGroup(p).readFragment().sameAs(Tiff.read(p)),
        s"virtual store differs for $p")
    }
    // the scan is header-only metadata: chunk POINTERS dominate (only
    // sub-threshold segments inline), and the tile grid is addressed 2-D
    val refs = RefSet.scanTiff(pTile, inlineThreshold = 0)
    assert(refs.keys.contains("band_data/c/1/2"))
    assert(refs("band_data/c/0/0").url.contains(pTile))
    assert(refs("band_data/c/0/0").length == 256)
    // rejections, each by name with the decode fallback stated
    def rejects(bytes: Array[Byte], what: String): Unit = {
      val p = write(s"rej_${what.hashCode & 0xFFF}.tif", bytes)
      val e = intercept[RuntimeException](RefSet.scanTiff(p))
      assert(e.getMessage.contains("decode via Tiff.read"),
        s"$what: ${e.getMessage}")
    }
    rejects(Tiff.encode(40, 8, 8, 1, true, 5, 1, None, 4, false,
      (x, y, _) => px8(3)(x, y, 0), None), "lzw")
    rejects(Tiff.encode(40, 8, 8, 1, true, 32773, 1, None, 4, false,
      (x, y, _) => px8(3)(x, y, 0), None), "packbits")
    rejects(Tiff.encode(40, 8, 8, 1, true, 8, 2, None, 4, false,
      (x, y, _) => px8(3)(x, y, 0), None), "predictor")
    rejects(Tiff.encode(40, 8, 8, 1, true, 1, 1, None, 3, false,
      (x, y, _) => px8(3)(x, y, 0), None), "short last strip")
    rejects(Tiff.encode(10, 8, 8, 3, true, 1, 1, None, 4, false,
      (x, y, c) => px8(3)(x, y, c), None), "rgb")
  }

  test("multi-page: IFD chains encode/decode, COG overview pyramid shape, ImageIO both directions") {
    // a COG-shaped pyramid: full-res page 0 + two reduced-res overviews
    // (subfileType 1), mixed codecs per page
    val pages = Seq(
      Tiff.Page(64, 48, 8, 1, 5, 1, Some((16, 16)), 0,
        (x, y, _) => px8(3)(x, y, 0),
        Some(Tiff.Geo(0.25, 0.25, -20.0, 60.0, 4326, geographic = true))),
      Tiff.Page(32, 24, 8, 1, 8, 1, None, 8,
        (x, y, _) => px8(3)(2 * x, 2 * y, 0), subfileType = 1),
      Tiff.Page(16, 12, 8, 1, 1, 1, None, 12,
        (x, y, _) => px8(3)(4 * x, 4 * y, 0), subfileType = 1))
    for (big <- Seq(false, true)) {
      val bytes = Tiff.encodeMulti(pages, littleEndian = true, bigTiff = big)
      // decode() = the full-resolution page, chain length surfaced
      val full = Tiff.decode(bytes)
      assert(full.width == 64 && full.nPages == 3 && full.subfileType == 0)
      assert(full.epsg == 4326)
      val all = Tiff.decodePages(bytes)
      assert(all.length == 3)
      assert(all.map(_.width) == Vector(64, 32, 16))
      assert(all.map(_.subfileType) == Vector(0, 1, 1),
        "overviews must carry NewSubfileType 1")
      assert(all.map(_.compression) == Vector(5, 8, 1))
      for (p <- all; y <- 0 until p.height; x <- 0 until p.width) {
        val scale = 64 / p.width
        assert(p.pixels(y * p.width + x) == px8(3)(scale * x, scale * y, 0),
          s"page ${p.width} pixel ($x,$y) big=$big")
      }
      assert(java.util.Arrays.equals(all(0).pixels, full.pixels))
    }
    // classic multi-page reads through ImageIO page-for-page
    val classic = Tiff.encodeMulti(pages, littleEndian = false, bigTiff = false)
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(classic))
    val reader = ImageIO.getImageReadersByFormatName("tiff").next()
    reader.setInput(iis)
    assert(reader.getNumImages(true) == 3)
    for (pi <- 0 until 3) {
      val img = reader.read(pi)
      val scale = 64 / img.getWidth
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        assert(img.getRaster.getSample(x, y, 0) == px8(3)(scale * x, scale * y, 0),
          s"imageio page $pi pixel ($x,$y)")
    }
    reader.dispose(); iis.close()
    // ImageIO-written multi-page sequence decodes through decodePages
    val w = ImageIO.getImageWritersByFormatName("tiff").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    for (n <- Seq(20, 10)) {
      val bi = new BufferedImage(n, n, BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until n; x <- 0 until n)
        bi.getRaster.setSample(x, y, 0, px8(13)(x, y, 0))
      w.writeToSequence(new IIOImage(bi, null, null), null)
    }
    w.endWriteSequence(); ios.close(); w.dispose()
    val decoded = Tiff.decodePages(bos.toByteArray)
    assert(decoded.map(_.width) == Vector(20, 10))
    for (p <- decoded; y <- 0 until p.height; x <- 0 until p.width)
      assert(p.pixels(y * p.width + x) == px8(13)(x, y, 0),
        s"imageio-written page ${p.width} pixel ($x,$y)")
  }

  test("palette-color (photometric 3): ColorMap surfaces, indices preserved, ImageIO both directions") {
    val pal = Array.tabulate(256)(i =>
      ((i * 7 % 256) << 16) | ((i * 13 % 256) << 8) | (i * 29 % 256))
    val (w0, h0) = (24, 16)
    val idx = (x: Int, y: Int, _: Int) => (x * 5 + y * 11) % 256
    for (comp <- Seq(1, 5, 8, 32773); le <- Seq(true, false)) {
      val enc = Tiff.encode(w0, h0, 8, 1, le, comp, 1, None, 7, false, idx,
        None, palette = Some(pal))
      val dec = Tiff.decode(enc)
      assert(dec.palette.length == 256 &&
        (0 until 256).forall(i => dec.palette(i) == pal(i)),
        s"palette round-trip comp=$comp le=$le")
      for (y <- 0 until h0; x <- 0 until w0)
        assert(dec.pixels(y * w0 + x) == idx(x, y, 0), "indices preserved")
      // ImageIO expands through the same ColorMap: its RGB must equal
      // palette(index)
      val img = imageioRead(enc)
      assert(img != null, s"ImageIO read comp=$comp")
      for (y <- 0 until h0; x <- 0 until w0)
        assert((img.getRGB(x, y) & 0xFFFFFF) == pal(idx(x, y, 0)),
          s"ImageIO palette expansion ($x,$y) comp=$comp le=$le")
    }
    // ImageIO-written indexed image decodes to OUR indices + palette
    val cm = new java.awt.image.IndexColorModel(8, 256,
      pal.map(p => ((p >> 16) & 0xFF).toByte),
      pal.map(p => ((p >> 8) & 0xFF).toByte),
      pal.map(p => (p & 0xFF).toByte))
    val bi = new BufferedImage(w0, h0, BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until h0; x <- 0 until w0)
      bi.getRaster.setSample(x, y, 0, idx(x, y, 0))
    val dec = Tiff.decode(imageioWrite(bi, Some("LZW"), tiled = false))
    assert(dec.palette.length == 256)
    for (y <- 0 until h0; x <- 0 until w0)
      assert(dec.palette(dec.pixels(y * w0 + x)) == pal(idx(x, y, 0)),
        s"imageio-written palette pixel ($x,$y)")
    // malformed: palette page with a missing ColorMap fails by name
    val enc = Tiff.encode(w0, h0, 8, 1, true, 1, 1, None, 7, false, idx,
      None, palette = Some(pal))
    val ifd = java.nio.ByteBuffer.wrap(enc).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(4)
    val n = java.nio.ByteBuffer.wrap(enc).order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort(ifd) & 0xFFFF
    for (i <- 0 until n) {
      val at = ifd + 2 + i * 12
      val tag = java.nio.ByteBuffer.wrap(enc).order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort(at) & 0xFFFF
      if (tag == 320) enc(at + 1) = 0x7F.toByte // mangle the tag id upward
    }
    val e = intercept[IllegalArgumentException](Tiff.decode(enc))
    assert(e.getMessage.contains("ColorMap"), e.getMessage)
  }

  test("the unified media probe sniffs TIFF as its ninth container, classic and BigTIFF") {
    for (big <- Seq(false, true); le <- Seq(true, false)) {
      val bytes = Tiff.encode(24, 16, 8, 1, le, 5, 1, None, 7, big,
        (x, y, _) => px8(3)(x, y, 0), None)
      val p = MultiModalOps.probeOf(bytes)
      assert(p.container == "tiff" && p.width == 24 && p.height == 16 &&
        p.nUnits == 384, s"big=$big le=$le: $p")
    }
    val e = intercept[IllegalArgumentException] {
      MultiModalOps.probeOf("IIxx definitely not a tiff".getBytes("ASCII"))
    }
    assert(e.getMessage.contains("unknown media container"), e.getMessage)
  }

  test("corruption sweep: every byte flip fails diagnosably, never crash-class") {
    val forbidden: Set[Class[_]] = Set(
      classOf[NegativeArraySizeException], classOf[OutOfMemoryError],
      classOf[StackOverflowError], classOf[NullPointerException],
      classOf[ArrayIndexOutOfBoundsException], classOf[MatchError])
    val values = Array(0x00.toByte, 0xFF.toByte, 0x7F.toByte)
    var read = 0; var failed = 0
    for (fixtureId <- Seq(0L, 7L, 9L, 14L, 23L)) { // spans big/classic, tile/strip, every codec
      val orig = MultiModalOps.tiffBytes(fixtureId)
      val dense = math.min(96, orig.length)
      val positions = (0 until dense) ++ (dense until orig.length by 11)
      for (pos <- positions; v <- values if orig(pos) != v) {
        val mutated = orig.clone()
        mutated(pos) = v
        try { Tiff.decode(mutated); read += 1 }
        catch {
          case t: Throwable =>
            assert(!forbidden.contains(t.getClass),
              s"fixture $fixtureId byte $pos := 0x${"%02X".format(v)} escaped as " +
                s"${t.getClass.getSimpleName}: ${t.getMessage}")
            failed += 1
        }
      }
    }
    info(s"tiff sweep: $read corruptions read, $failed failed diagnosably")
    assert(read + failed > 1000)
  }
}
