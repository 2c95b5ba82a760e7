package graft.tiff

import java.util.zip.{Deflater, Inflater}

/** TIFF / GeoTIFF raster codec — the raster twin of m10's AVI demuxer
  * and m15's MP3 indexer: GeoTIFF is the dominant satellite/raster
  * interchange format, and one the reference names as a supported
  * input family ("via rasterio, GeoTIFF and other geospatial raster
  * formats" — /root/reference/docs/composition/styles.md:8-9, feeding
  * the same xarray engine dispatch as openers.py:70-80). A corpus
  * triage stage needs the real container walk:
  * IFD parse, strip/tile assembly, decompression, predictor undo,
  * pixel statistics, and the GeoTIFF georeferencing keys.
  *
  * Implemented from the public TIFF 6.0 specification (Aldus/Adobe,
  * 1992), the BigTIFF extension (version 43, 8-byte offsets), and the
  * OGC GeoTIFF 1.1 key directory layout:
  *
  *   - classic (magic 42) and BigTIFF (magic 43) headers, both byte
  *     orders ("II" little / "MM" big); first IFD only
  *   - strip (RowsPerStrip/StripOffsets/StripByteCounts) and tile
  *     (TileWidth/TileLength/TileOffsets/TileByteCounts) layouts,
  *     edge tiles padded to full tile size per spec §15
  *   - compression 1 (none), 5 (LZW, the TIFF MSB-first early-change
  *     variant of spec §13), 8/32946 (zlib Deflate), 32773 (PackBits)
  *   - Predictor 2 (horizontal differencing, per sample channel, on
  *     the declared bit width)
  *   - 8- and 16-bit samples, 1 (grayscale) or 3 (RGB chunky) samples
  *     per pixel
  *   - GeoTIFF tags 33550 ModelPixelScale, 33922 ModelTiepoint, 34735
  *     GeoKeyDirectory (GTModelType + Geographic/ProjectedCSType →
  *     EPSG), 34737 GeoAsciiParams
  *
  * The encoder exists for fixtures and for the writer leg of the
  * cross-validation contract: every compression/layout combination is
  * validated in BOTH directions against the JDK's independent ImageIO
  * TIFF plugin (TiffSpec); BigTIFF — which ImageIO cannot read — is
  * validated differentially (same pixels, classic vs BigTIFF) plus
  * multi-geometry probes, per the repo's standing codec rule.
  *
  * Corruption contract: every offset, count, and size is bounded
  * against the file length and fixed caps before any allocation or
  * slice; unsupported layouts fail by NAME ("TIFF ... not supported"),
  * malformed structure fails as "corrupt TIFF: ..." — never a
  * crash-class throwable.
  */
object Tiff {

  /** Decoded raster + container facts + GeoTIFF surface.
    * `pixels` is row-major, channel-interleaved, one Int per sample
    * (0..255 for 8-bit, 0..65535 for 16-bit). Geo fields are NaN /
    * -1 when the file carries no GeoTIFF tags. */
  final case class TiffImage(
      width: Int, height: Int, bits: Int, samples: Int,
      littleEndian: Boolean, bigTiff: Boolean,
      compression: Int, predictor: Int,
      tiled: Boolean, nSegments: Int,
      pixels: Array[Int],
      scaleX: Double = Double.NaN, scaleY: Double = Double.NaN,
      tieX: Double = Double.NaN, tieY: Double = Double.NaN,
      /** 1 = projected, 2 = geographic, -1 = absent. */
      modelType: Int = -1,
      epsg: Int = -1,
      citation: String = "",
      /** tag 254 NewSubfileType: 1 = reduced-resolution overview (the
        * COG pyramid pages), 2 = multi-page document page, 0 = full
        * image / absent. */
      subfileType: Int = 0,
      /** photometric-3 ColorMap as 256 packed 0xRRGGBB entries (empty
        * for non-palette images); `pixels` keeps the INDICES, the
        * tifffile/rasterio convention. */
      palette: Array[Int] = Array.emptyIntArray,
      /** IFD chain length of the containing file. */
      nPages: Int = 1)

  /** GeoTIFF georeferencing for the encoder. */
  final case class Geo(scaleX: Double, scaleY: Double,
                       tieX: Double, tieY: Double,
                       epsg: Int, geographic: Boolean,
                       citation: String = "graft")

  // tag numbers (TIFF 6.0 §8 + GeoTIFF 1.1)
  private val TNewSubfileType = 254
  private val TImageWidth = 256
  private val TImageLength = 257
  private val TBitsPerSample = 258
  private val TCompression = 259
  private val TPhotometric = 262
  private val TStripOffsets = 273
  private val TSamplesPerPixel = 277
  private val TRowsPerStrip = 278
  private val TStripByteCounts = 279
  private val TPlanarConfig = 284
  private val TPredictor = 317
  private val TColorMap = 320
  private val TTileWidth = 322
  private val TTileLength = 323
  private val TTileOffsets = 324
  private val TTileByteCounts = 325
  private val TModelPixelScale = 33550
  private val TModelTiepoint = 33922
  private val TGeoKeyDirectory = 34735
  private val TGeoAsciiParams = 34737

  private val MaxDim = 1 << 20
  private val MaxSamplesTotal = 1L << 26
  private val MaxSegments = 1 << 20
  private val MaxPages = 4096

  // ------------------------------------------------------------ decode

  private final class R(val b: Array[Byte], val le: Boolean) {
    def u16(at: Long): Int = {
      require(at >= 0 && at + 2 <= b.length, s"corrupt TIFF: read past EOF at $at")
      val i = at.toInt
      val (x, y) = ((b(i) & 0xFF), (b(i + 1) & 0xFF))
      if (le) x | (y << 8) else (x << 8) | y
    }
    def u32(at: Long): Long = {
      require(at >= 0 && at + 4 <= b.length, s"corrupt TIFF: read past EOF at $at")
      if (le) (u16(at) & 0xFFFFL) | ((u16(at + 2) & 0xFFFFL) << 16)
      else ((u16(at) & 0xFFFFL) << 16) | (u16(at + 2) & 0xFFFFL)
    }
    def u64(at: Long): Long = {
      require(at >= 0 && at + 8 <= b.length, s"corrupt TIFF: read past EOF at $at")
      val (lo, hi) = if (le) (u32(at), u32(at + 4)) else (u32(at + 4), u32(at))
      val v = (hi << 32) | lo
      require(v >= 0, "corrupt TIFF: 64-bit value exceeds signed range")
      v
    }
  }

  /** One parsed IFD entry: integer values widened to Long (DOUBLEs via
    * [[doubles]]). */
  private final case class Entry(tag: Int, tpe: Int, count: Long, valueAt: Long,
                                 inline: Boolean)

  private def typeSize(t: Int): Int = t match {
    case 1 | 2 | 6 | 7 => 1
    case 3 | 8 => 2
    case 4 | 9 | 11 => 4
    case 5 | 10 | 12 | 16 | 17 | 18 => 8
    case _ => -1 // unknown field type: the spec says skip the field
  }

  private def longs(r: R, e: Entry): Array[Long] = {
    require(e.count <= MaxSegments, s"corrupt TIFF: tag ${e.tag} count ${e.count}")
    val n = e.count.toInt
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val at = e.valueAt + i.toLong * typeSize(e.tpe)
      out(i) = e.tpe match {
        case 1 | 7 =>
          require(at >= 0 && at < r.b.length, s"corrupt TIFF: read past EOF at $at")
          (r.b(at.toInt) & 0xFF).toLong
        case 3 => r.u16(at).toLong
        case 4 => r.u32(at)
        case 16 => r.u64(at)
        case other => throw new IllegalArgumentException(
          s"TIFF tag ${e.tag}: integer field type $other not supported")
      }
      i += 1
    }
    out
  }

  private def doubles(r: R, e: Entry): Array[Double] = {
    require(e.tpe == 12, s"TIFF tag ${e.tag}: expected DOUBLE, got type ${e.tpe}")
    require(e.count <= 64, s"corrupt TIFF: tag ${e.tag} count ${e.count}")
    val out = new Array[Double](e.count.toInt)
    var i = 0
    while (i < out.length) {
      val at = e.valueAt + i * 8L
      require(at >= 0 && at + 8 <= r.b.length, s"corrupt TIFF: read past EOF at $at")
      var bits = 0L
      var k = 0
      while (k < 8) {
        val byte = (r.b(at.toInt + k) & 0xFFL)
        bits |= (if (r.le) byte << (8 * k) else byte << (8 * (7 - k)))
        k += 1
      }
      out(i) = java.lang.Double.longBitsToDouble(bits)
      i += 1
    }
    out
  }

  /** Decode the FIRST IFD (a COG's full-resolution raster); `nPages`
    * reports the chain length. [[decodePages]] decodes every page. */
  def decode(bytes: Array[Byte]): TiffImage = {
    val (r, le, bigTiff, first) = header(bytes)
    val (img, _) = decodeIfdAt(bytes, r, le, bigTiff, first)
    img.copy(nPages = chainLength(r, bigTiff, first))
  }

  /** Every page of a multi-IFD file in chain order — page 0 is the
    * primary raster, later pages are COG overviews (subfileType 1) or
    * further document pages (subfileType 2). */
  def decodePages(bytes: Array[Byte]): Vector[TiffImage] = {
    val (r, le, bigTiff, first) = header(bytes)
    val out = Vector.newBuilder[TiffImage]
    var off = first
    var seen = Set.empty[Long]
    while (off != 0) {
      require(!seen.contains(off), "corrupt TIFF: IFD chain cycle")
      require(seen.size < MaxPages, s"corrupt TIFF: more than $MaxPages IFDs")
      seen += off
      val (img, next) = decodeIfdAt(bytes, r, le, bigTiff, off)
      out += img
      off = next
    }
    val pages = out.result()
    pages.map(_.copy(nPages = pages.length))
  }

  private def header(bytes: Array[Byte]): (R, Boolean, Boolean, Long) = {
    require(bytes.length >= 8, "not a TIFF file (too short)")
    val le = (bytes(0), bytes(1)) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _ => throw new IllegalArgumentException(
        "not a TIFF file (bad byte-order mark)")
    }
    val r = new R(bytes, le)
    val magic = r.u16(2)
    val bigTiff = magic match {
      case 42 => false
      case 43 => true
      case other => throw new IllegalArgumentException(
        s"not a TIFF file (magic $other)")
    }
    val ifdOff =
      if (!bigTiff) r.u32(4)
      else {
        require(r.u16(4) == 8, "corrupt TIFF: BigTIFF offset size must be 8")
        require(r.u16(6) == 0, "corrupt TIFF: BigTIFF header pad must be 0")
        r.u64(8)
      }
    (r, le, bigTiff, ifdOff)
  }

  /** Chain length by hopping next-IFD pointers (entry counts only —
    * no tag decode). */
  private def chainLength(r: R, bigTiff: Boolean, first: Long): Int = {
    var off = first
    var seen = Set.empty[Long]
    while (off != 0) {
      require(!seen.contains(off), "corrupt TIFF: IFD chain cycle")
      require(seen.size < MaxPages, s"corrupt TIFF: more than $MaxPages IFDs")
      seen += off
      val n = if (bigTiff) r.u64(off) else r.u16(off).toLong
      require(n >= 1 && n <= 512, s"corrupt TIFF: IFD entry count $n")
      val nextAt = off + (if (bigTiff) 8 else 2) +
        n * (if (bigTiff) 20 else 12)
      off = if (bigTiff) r.u64(nextAt) else r.u32(nextAt)
      require(off == 0 || (off >= 8 && off < r.b.length),
        s"corrupt TIFF: next-IFD offset $off")
    }
    seen.size
  }

  private def decodeIfdAt(bytes: Array[Byte], r: R, le: Boolean,
                          bigTiff: Boolean, ifdOff: Long): (TiffImage, Long) = {
    // ---- IFD walk
    val nEntries = if (bigTiff) r.u64(ifdOff) else r.u16(ifdOff).toLong
    require(nEntries >= 1 && nEntries <= 512,
      s"corrupt TIFF: IFD entry count $nEntries")
    val entrySize = if (bigTiff) 20 else 12
    val inlineCap = if (bigTiff) 8 else 4
    val entries = new java.util.TreeMap[Integer, Entry]()
    var i = 0L
    var prevTag = -1
    while (i < nEntries) {
      val at = ifdOff + (if (bigTiff) 8 else 2) + i * entrySize
      val tag = r.u16(at)
      val tpe = r.u16(at + 2)
      val count = if (bigTiff) r.u64(at + 4) else r.u32(at + 4)
      require(count >= 0 && count <= Int.MaxValue,
        s"corrupt TIFF: tag $tag count $count")
      require(tag > prevTag, s"corrupt TIFF: IFD tags not ascending at tag $tag")
      prevTag = tag
      val tsz = typeSize(tpe)
      if (tsz > 0) { // unknown field types are skipped per TIFF 6.0 §2
        val byteLen = count * tsz
        val vAt = at + (if (bigTiff) 12 else 8)
        val valueAt =
          if (byteLen <= inlineCap) vAt
          else {
            val off = if (bigTiff) r.u64(vAt) else r.u32(vAt)
            require(off >= 8 && off + byteLen <= bytes.length,
              s"corrupt TIFF: tag $tag values at $off run past EOF")
            off
          }
        entries.put(tag, Entry(tag, tpe, count, valueAt, byteLen <= inlineCap))
      }
      i += 1
    }
    def get(tag: Int): Option[Entry] = Option(entries.get(tag))
    def need(tag: Int, name: String): Entry = {
      val e = entries.get(tag)
      require(e != null, s"corrupt TIFF: required tag $name ($tag) missing")
      e
    }
    def one(tag: Int, dflt: Long = -1L): Long =
      get(tag).map { e =>
        val v = longs(r, e)
        require(v.nonEmpty, s"corrupt TIFF: tag ${e.tag} has no value")
        v(0)
      }.getOrElse(dflt)

    // ---- raster geometry
    val w = one(TImageWidth)
    val h = one(TImageLength)
    require(w >= 1 && w <= MaxDim && h >= 1 && h <= MaxDim,
      s"corrupt TIFF: image dimensions ${w}x$h")
    val samples = one(TSamplesPerPixel, 1L).toInt
    require(samples == 1 || samples == 3,
      s"TIFF SamplesPerPixel $samples not supported")
    val bitsArr = get(TBitsPerSample).map(longs(r, _)).getOrElse(Array(1L))
    require(bitsArr.nonEmpty && bitsArr.forall(_ == bitsArr(0)),
      "TIFF mixed per-channel bit depths not supported")
    val bits = bitsArr(0).toInt
    require(bits == 8 || bits == 16, s"TIFF BitsPerSample $bits not supported")
    val comp = one(TCompression, 1L).toInt
    require(comp == 1 || comp == 5 || comp == 8 || comp == 32946 || comp == 32773,
      s"TIFF compression $comp not supported")
    val photo = one(TPhotometric, 1L).toInt
    require(photo == 0 || photo == 1 || photo == 2 || photo == 3,
      s"TIFF photometric interpretation $photo not supported")
    require(one(TPlanarConfig, 1L) == 1L,
      "TIFF planar configuration 2 not supported")
    val predictor = one(TPredictor, 1L).toInt
    require(predictor == 1 || predictor == 2,
      s"TIFF predictor $predictor not supported")
    require(w * h * samples <= MaxSamplesTotal,
      s"corrupt TIFF: raster ${w}x$h x$samples exceeds cap")
    val bytesPer = bits / 8

    // ---- segment table (strips or tiles)
    val tiled = entries.containsKey(TTileOffsets)
    val (offs, cnts, segW, segH, across) =
      if (tiled) {
        val tw = one(TTileWidth)
        val th = one(TTileLength)
        require(tw >= 16 && th >= 16 && tw % 16 == 0 && th % 16 == 0 &&
          tw <= MaxDim && th <= MaxDim,
          s"corrupt TIFF: tile size ${tw}x$th")
        val o = longs(r, need(TTileOffsets, "TileOffsets"))
        val c = longs(r, need(TTileByteCounts, "TileByteCounts"))
        val na = ((w + tw - 1) / tw).toInt
        val nd = ((h + th - 1) / th).toInt
        require(o.length == na.toLong * nd && c.length == o.length,
          s"corrupt TIFF: ${o.length} tiles for a ${na}x$nd grid")
        (o, c, tw.toInt, th.toInt, na)
      } else {
        val rps = one(TRowsPerStrip, h)
        require(rps >= 1 && rps <= MaxDim, s"corrupt TIFF: RowsPerStrip $rps")
        val o = longs(r, need(TStripOffsets, "StripOffsets"))
        val c = longs(r, need(TStripByteCounts, "StripByteCounts"))
        val n = ((h + rps - 1) / rps).toInt
        require(o.length == n && c.length == n,
          s"corrupt TIFF: ${o.length} strips, expected $n")
        (o, c, w.toInt, rps.toInt, 1)
      }
    require(offs.length <= MaxSegments, s"corrupt TIFF: ${offs.length} segments")

    // ---- decode segments into the raster
    val pixels = new Array[Int](w.toInt * h.toInt * samples)
    var seg = 0
    while (seg < offs.length) {
      val (off, cnt) = (offs(seg), cnts(seg))
      require(off >= 8 && cnt >= 0 && off + cnt <= bytes.length,
        s"corrupt TIFF: segment $seg at $off+$cnt runs past EOF")
      val rows0 = if (tiled) segH else math.min(segH.toLong, h - seg.toLong * segH).toInt
      val want = segW * rows0 * samples * bytesPer
      val raw = bytes.slice(off.toInt, (off + cnt).toInt)
      val plane = comp match {
        case 1 =>
          require(raw.length >= want,
            s"corrupt TIFF: segment $seg has ${raw.length} bytes, expected $want")
          raw
        case 5 => lzwDecode(raw, want)
        case 8 | 32946 => inflate(raw, want)
        case 32773 => packBitsDecode(raw, want)
      }
      if (predictor == 2) undiff(plane, segW, rows0, samples, bits, le)
      // scatter into the raster, clipping tile padding
      val (x0, y0) =
        if (tiled) ((seg % across) * segW, (seg / across) * segH) else (0, seg * segH)
      val copyW = math.min(segW.toLong, w - x0).toInt
      val copyH = math.min(rows0.toLong, h - y0).toInt
      var row = 0
      while (row < copyH) {
        var col = 0
        while (col < copyW * samples) {
          val src = (row * segW * samples + col) * bytesPer
          val v =
            if (bytesPer == 1) plane(src) & 0xFF
            else if (le) (plane(src) & 0xFF) | ((plane(src + 1) & 0xFF) << 8)
            else ((plane(src) & 0xFF) << 8) | (plane(src + 1) & 0xFF)
          pixels(((y0 + row) * w.toInt + x0) * samples + col) = v
          col += 1
        }
        row += 1
      }
      seg += 1
    }

    // ---- GeoTIFF surface
    var (sx, sy, tx, ty) = (Double.NaN, Double.NaN, Double.NaN, Double.NaN)
    get(TModelPixelScale).foreach { e =>
      val d = doubles(r, e)
      require(d.length >= 2, "corrupt TIFF: ModelPixelScale needs 3 doubles")
      sx = d(0); sy = d(1)
    }
    get(TModelTiepoint).foreach { e =>
      val d = doubles(r, e)
      require(d.length >= 6, "corrupt TIFF: ModelTiepoint needs 6 doubles")
      tx = d(3); ty = d(4)
    }
    var (modelType, epsg) = (-1, -1)
    get(TGeoKeyDirectory).foreach { e =>
      val ks = longs(r, e)
      require(ks.length >= 4 && ks(0) == 1,
        "corrupt TIFF: GeoKeyDirectory version must be 1")
      val nk = ks(3).toInt
      require(ks.length >= 4 * (1 + nk), "corrupt TIFF: GeoKeyDirectory truncated")
      var k = 0
      while (k < nk) {
        val (id, loc, v) = (ks(4 + 4 * k).toInt, ks(5 + 4 * k).toInt, ks(7 + 4 * k).toInt)
        if (loc == 0) id match {
          case 1024 => modelType = v
          case 2048 | 3072 => epsg = v
          case _ => ()
        }
        k += 1
      }
    }
    val citation = get(TGeoAsciiParams).map { e =>
      require(e.valueAt + e.count <= bytes.length,
        "corrupt TIFF: GeoAsciiParams runs past EOF")
      new String(bytes, e.valueAt.toInt, e.count.toInt, "US-ASCII")
        .takeWhile(c => c != '\u0000' && c != '|')
    }.getOrElse("")

    // ---- palette (photometric 3): surface the ColorMap, keep indices
    val palette: Array[Int] =
      if (photo == 3) {
        require(bits == 8 && samples == 1,
          "TIFF palette-color requires 8-bit single-sample data")
        val cm = longs(r, need(TColorMap, "ColorMap"))
        require(cm.length == 768,
          s"corrupt TIFF: ColorMap has ${cm.length} entries, expected 768")
        Array.tabulate(256) { i =>
          ((((cm(i) >> 8) & 0xFF) << 16) |
            (((cm(256 + i) >> 8) & 0xFF) << 8) |
            ((cm(512 + i) >> 8) & 0xFF)).toInt
        }
      } else Array.emptyIntArray

    val nextAt = ifdOff + (if (bigTiff) 8 else 2) +
      nEntries * (if (bigTiff) 20 else 12)
    val nextIfd = if (bigTiff) r.u64(nextAt) else r.u32(nextAt)
    require(nextIfd == 0 || (nextIfd >= 8 && nextIfd < bytes.length),
      s"corrupt TIFF: next-IFD offset $nextIfd")

    (TiffImage(w.toInt, h.toInt, bits, samples, le, bigTiff, comp,
      predictor, tiled, offs.length, pixels, sx, sy, tx, ty, modelType,
      epsg, citation, subfileType = one(TNewSubfileType, 0L).toInt,
      palette = palette), nextIfd)
  }

  // --------------------------------------------------------- predictor

  /** Undo Predictor 2 (horizontal differencing) in place: per row, per
    * channel, on the declared sample width (TIFF 6.0 §14). */
  private def undiff(plane: Array[Byte], w: Int, rows: Int, samples: Int,
                     bits: Int, le: Boolean): Unit = {
    val rowBytes = w * samples * (bits / 8)
    var row = 0
    while (row < rows) {
      val base = row * rowBytes
      if (bits == 8) {
        var i = samples
        while (i < w * samples) {
          plane(base + i) = (plane(base + i) + plane(base + i - samples)).toByte
          i += 1
        }
      } else {
        var i = samples
        while (i < w * samples) {
          val at = base + 2 * i
          val prev = base + 2 * (i - samples)
          val pv = if (le) (plane(prev) & 0xFF) | ((plane(prev + 1) & 0xFF) << 8)
                   else ((plane(prev) & 0xFF) << 8) | (plane(prev + 1) & 0xFF)
          val cv = if (le) (plane(at) & 0xFF) | ((plane(at + 1) & 0xFF) << 8)
                   else ((plane(at) & 0xFF) << 8) | (plane(at + 1) & 0xFF)
          val v = (cv + pv) & 0xFFFF
          if (le) { plane(at) = v.toByte; plane(at + 1) = (v >> 8).toByte }
          else { plane(at) = (v >> 8).toByte; plane(at + 1) = v.toByte }
          i += 1
        }
      }
      row += 1
    }
  }

  /** Apply Predictor 2 in place (encoder side — exact inverse of
    * [[undiff]], iterating right-to-left). */
  private def diff(plane: Array[Byte], w: Int, rows: Int, samples: Int,
                   bits: Int, le: Boolean): Unit = {
    val rowBytes = w * samples * (bits / 8)
    var row = 0
    while (row < rows) {
      val base = row * rowBytes
      if (bits == 8) {
        var i = w * samples - 1
        while (i >= samples) {
          plane(base + i) = (plane(base + i) - plane(base + i - samples)).toByte
          i -= 1
        }
      } else {
        var i = w * samples - 1
        while (i >= samples) {
          val at = base + 2 * i
          val prev = base + 2 * (i - samples)
          val pv = if (le) (plane(prev) & 0xFF) | ((plane(prev + 1) & 0xFF) << 8)
                   else ((plane(prev) & 0xFF) << 8) | (plane(prev + 1) & 0xFF)
          val cv = if (le) (plane(at) & 0xFF) | ((plane(at + 1) & 0xFF) << 8)
                   else ((plane(at) & 0xFF) << 8) | (plane(at + 1) & 0xFF)
          val v = (cv - pv) & 0xFFFF
          if (le) { plane(at) = v.toByte; plane(at + 1) = (v >> 8).toByte }
          else { plane(at) = (v >> 8).toByte; plane(at + 1) = v.toByte }
          i -= 1
        }
      }
      row += 1
    }
  }

  // --------------------------------------------------------------- LZW
  // TIFF 6.0 §13: MSB-first bit packing, ClearCode 256, EOI 257, first
  // free entry 258, 9→12 bit codes with the EARLY width change (the
  // historical Aldus off-by-one: the width bumps when the table reaches
  // 511/1023/2047 entries, one code before the power of two) — the
  // exact convention libtiff and ImageIO's TIFFLZWDecompressor use.
  // Cross-validated against ImageIO in both directions (TiffSpec);
  // the same "one code early" class of bug bit the GIF decoder in r13,
  // which is why the validation sweep crosses every width boundary.

  private val LzwClear = 256
  private val LzwEoi = 257
  private val LzwFirst = 258
  private val LzwMax = 4096

  private[graft] def lzwDecode(in: Array[Byte], want: Int): Array[Byte] = {
    val out = new Array[Byte](want)
    var outAt = 0
    // table: per code, (prefix code, final byte, length)
    val prefix = new Array[Int](LzwMax)
    val last = new Array[Byte](LzwMax)
    val len = new Array[Int](LzwMax)
    var next = LzwFirst
    var width = 9
    var bitPos = 0L
    val totalBits = in.length.toLong * 8
    def read(): Int = {
      require(bitPos + width <= totalBits,
        "corrupt TIFF: LZW stream ends mid-code")
      var v = 0
      var k = 0
      while (k < width) {
        val bit = bitPos + k
        v = (v << 1) | ((in((bit >> 3).toInt) >> (7 - (bit & 7))) & 1)
        k += 1
      }
      bitPos += width
      v
    }
    def reset(): Unit = {
      var c = 0
      while (c < 256) { prefix(c) = -1; last(c) = c.toByte; len(c) = 1; c += 1 }
      next = LzwFirst
      width = 9
    }
    def emit(code: Int): Byte = {
      require(code >= 0 && code < next && code != LzwClear && code != LzwEoi,
        s"corrupt TIFF: LZW code $code beyond table size $next")
      val l = len(code)
      require(outAt + l <= want,
        s"corrupt TIFF: LZW output exceeds expected $want bytes")
      var c = code
      var at = outAt + l - 1
      while (c >= 0) { out(at) = last(c); at -= 1; c = prefix(c) }
      outAt += l
      out(outAt - l)
    }
    reset()
    var old = -1
    var done = false
    while (!done) {
      val code = read()
      if (code == LzwEoi) done = true
      else if (code == LzwClear) { reset(); old = -1 }
      else {
        require(next < LzwMax, "corrupt TIFF: LZW table overflow")
        if (old < 0) { emit(code); old = code }
        else {
          val first: Byte =
            if (code < next) emit(code)
            else {
              // the KwKwK case: code being defined right now
              require(code == next, s"corrupt TIFF: LZW code $code beyond table")
              val l = len(old) + 1
              require(outAt + l <= want,
                s"corrupt TIFF: LZW output exceeds expected $want bytes")
              var c = old
              var at = outAt + l - 2
              while (c >= 0) { out(at) = last(c); at -= 1; c = prefix(c) }
              out(outAt + l - 1) = out(outAt)
              outAt += l
              out(outAt - l)
            }
          prefix(next) = old; last(next) = first; len(next) = len(old) + 1
          next += 1
          old = code
        }
        // early change: the NEXT read must use the wider code as soon
        // as the table holds 2^width - 1 entries
        if (next == (1 << width) - 1 && width < 12) width += 1
      }
      if (outAt == want && !done) {
        // the stream must close with EOI (possibly after pad bits)
        done = true
      }
    }
    require(outAt == want,
      s"corrupt TIFF: LZW produced $outAt of $want bytes")
    out
  }

  private[graft] def lzwEncode(in: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(in.length / 2 + 16)
    var cur = 0
    var curBits = 0
    var width = 9
    def put(code: Int): Unit = {
      cur = (cur << width) | code
      curBits += width
      while (curBits >= 8) {
        bos.write((cur >> (curBits - 8)) & 0xFF)
        curBits -= 8
      }
    }
    // string table: hash of (prefixCode << 8 | byte) -> code
    val table = new java.util.HashMap[Integer, Integer](4096)
    var next = LzwFirst
    def reset(): Unit = { table.clear(); next = LzwFirst; width = 9 }
    reset()
    put(LzwClear)
    var ent = -1
    var i = 0
    while (i < in.length) {
      val c = in(i) & 0xFF
      if (ent < 0) ent = c
      else {
        val key = (ent << 8) | c
        val hit = table.get(key)
        if (hit != null) ent = hit.intValue()
        else {
          put(ent)
          table.put(key, next)
          next += 1
          ent = c
          // the encoder's table runs ONE entry ahead of the decoder's
          // (its add coincides with the emission; the decoder's lags
          // one code), so where the early-change decoder widens at
          // table size 2^w - 1, the emitter widens at 2^w
          if (next == LzwMax - 2) {
            // table full: clear (libtiff convention — leaves room for
            // the EOI that may follow immediately)
            put(LzwClear)
            reset()
          } else if (next == (1 << width) && width < 12) width += 1
        }
      }
      i += 1
    }
    if (ent >= 0) put(ent)
    // the final emission has no table add of its own, so encoder and
    // decoder counts now AGREE: EOI widens on the decoder's 2^w - 1
    if (next == (1 << width) - 1 && width < 12) width += 1
    put(LzwEoi)
    if (curBits > 0) bos.write((cur << (8 - curBits)) & 0xFF)
    bos.toByteArray
  }

  // ---------------------------------------------------------- PackBits

  private[graft] def packBitsDecode(in: Array[Byte], want: Int): Array[Byte] = {
    val out = new Array[Byte](want)
    var (i, o) = (0, 0)
    while (o < want) {
      require(i < in.length, "corrupt TIFF: PackBits stream ends early")
      val n = in(i)
      i += 1
      if (n >= 0) {
        val lit = n + 1
        require(i + lit <= in.length && o + lit <= want,
          "corrupt TIFF: PackBits literal overruns")
        System.arraycopy(in, i, out, o, lit)
        i += lit; o += lit
      } else if (n != -128) {
        val run = 1 - n
        require(i < in.length && o + run <= want,
          "corrupt TIFF: PackBits run overruns")
        java.util.Arrays.fill(out, o, o + run, in(i))
        i += 1; o += run
      } // -128: no-op per spec
    }
    out
  }

  /** PackBits-encode one row (the spec packs each row separately). */
  private def packBitsRow(b: Array[Byte], from: Int, until: Int,
                          bos: java.io.ByteArrayOutputStream): Unit = {
    var i = from
    while (i < until) {
      var j = i
      while (j + 1 < until && b(j + 1) == b(j) && j - i < 127) j += 1
      val run = j - i + 1
      if (run >= 2) {
        bos.write(1 - run)
        bos.write(b(i))
        i = j + 1
      } else {
        var k = i
        var stop = false
        while (k < until && k - i < 128 && !stop) {
          if (k + 2 < until && b(k) == b(k + 1) && b(k + 1) == b(k + 2)) stop = true
          else k += 1
        }
        bos.write(k - i - 1)
        bos.write(b, i, k - i)
        i = k
      }
    }
  }

  // ----------------------------------------------------------- Deflate

  private def inflate(in: Array[Byte], want: Int): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(in)
      val out = new Array[Byte](want)
      var at = 0
      while (at < want && !inf.finished()) {
        val n =
          try inf.inflate(out, at, want - at)
          catch {
            case e: java.util.zip.DataFormatException =>
              throw new IllegalArgumentException(
                s"corrupt TIFF: bad zlib stream (${e.getMessage})")
          }
        require(n > 0 || inf.finished(), "corrupt TIFF: zlib stream stalls")
        at += n
      }
      require(at == want, s"corrupt TIFF: zlib produced $at of $want bytes")
      out
    } finally inf.end()
  }

  private def deflate(in: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](in.length + 64)
      val bos = new java.io.ByteArrayOutputStream(in.length / 2 + 16)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      bos.toByteArray
    } finally d.end()
  }

  // ------------------------------------------------------------ encode

  /** One page of a (possibly multi-IFD) file. `subfileType` becomes
    * tag 254 NewSubfileType when nonzero (1 = reduced-resolution
    * overview, the COG pyramid convention; 2 = page of a multi-page
    * document); `palette` (256 packed 0xRRGGBB entries) switches the
    * page to palette-color — photometric 3 + a ColorMap of 16-bit
    * entries (v*257, the 255->65535 scaling ImageIO uses), 8-bit
    * single-sample only. */
  final case class Page(w: Int, h: Int, bits: Int, samples: Int,
      compression: Int, predictor: Int,
      tile: Option[(Int, Int)], rowsPerStrip: Int,
      px: (Int, Int, Int) => Int,
      geo: Option[Geo] = None,
      subfileType: Int = 0,
      palette: Option[Array[Int]] = None)

  /** Emit a single-page classic or BigTIFF file. `px(x, y, c)` supplies
    * sample values (masked to the bit width). Tiles are 16-aligned per
    * spec; edge tiles are zero-padded. */
  def encode(w: Int, h: Int, bits: Int, samples: Int, littleEndian: Boolean,
             compression: Int, predictor: Int,
             tile: Option[(Int, Int)], rowsPerStrip: Int,
             bigTiff: Boolean,
             px: (Int, Int, Int) => Int,
             geo: Option[Geo] = None,
             palette: Option[Array[Int]] = None): Array[Byte] =
    encodeMulti(Seq(Page(w, h, bits, samples, compression, predictor, tile,
      rowsPerStrip, px, geo, 0, palette)), littleEndian, bigTiff)

  /** Emit a classic or BigTIFF file with one IFD per page, chained
    * through the next-IFD pointers — the multi-page / COG-overview
    * layout. All pages share the byte order and header format. */
  def encodeMulti(pages: Seq[Page], littleEndian: Boolean,
                  bigTiff: Boolean): Array[Byte] = {
    require(pages.nonEmpty, "TIFF encode: at least one page")
    val le = littleEndian
    final case class E(tag: Int, tpe: Int, count: Long, ints: Array[Long] = null,
                       dbls: Array[Double] = null, ascii: Array[Byte] = null)
    // one page's layout, every offset ABSOLUTE in the final file
    final case class P(segments: Array[Array[Byte]], segOffs: Array[Long],
                       entries: Array[E], extOffs: Array[Long],
                       ifdOff: Long, nextFieldAt: Long)
    val headerLen = if (bigTiff) 16 else 8
    val entrySize = if (bigTiff) 20 else 12
    val inlineCap = if (bigTiff) 8 else 4
    val segType = if (bigTiff) 16 else 4
    def align(x: Long): Long = (x + 7) & ~7L

    // ---- pass 1: build every page's segments + entries + positions
    var cursor = align(headerLen.toLong)
    val built = pages.map { pg =>
      import pg._
      require(w >= 1 && h >= 1 && (bits == 8 || bits == 16) &&
        (samples == 1 || samples == 3))
      require(compression == 1 || compression == 5 || compression == 8 ||
        compression == 32773)
      // TIFF 6.0 defines Predictor (its section 14) for LZW-class codecs
      // only; PackBits readers (ImageIO among them) ignore the tag, so
      // the combination would silently decode wrong elsewhere — refuse it
      require(!(predictor == 2 && compression == 32773),
        "TIFF predictor 2 with PackBits not supported")
      palette.foreach { p =>
        require(p.length == 256 && bits == 8 && samples == 1,
          "TIFF palette pages are 8-bit single-sample with 256 entries")
      }
      val bytesPer = bits / 8

      def serialize(x0: Int, y0: Int, sw: Int, rows: Int): Array[Byte] = {
        val plane = new Array[Byte](sw * rows * samples * bytesPer)
        var row = 0
        while (row < rows) {
          var col = 0
          while (col < sw) {
            var c = 0
            while (c < samples) {
              val v =
                if (x0 + col < w && y0 + row < h) px(x0 + col, y0 + row, c)
                else 0
              val at = ((row * sw + col) * samples + c) * bytesPer
              if (bytesPer == 1) plane(at) = v.toByte
              else if (le) { plane(at) = v.toByte; plane(at + 1) = (v >> 8).toByte }
              else { plane(at) = (v >> 8).toByte; plane(at + 1) = v.toByte }
              c += 1
            }
            col += 1
          }
          row += 1
        }
        plane
      }

      def compress(plane: Array[Byte], sw: Int, rows: Int): Array[Byte] = {
        if (predictor == 2) diff(plane, sw, rows, samples, bits, le)
        compression match {
          case 1 => plane
          case 5 => lzwEncode(plane)
          case 8 => deflate(plane)
          case 32773 =>
            val bos = new java.io.ByteArrayOutputStream(plane.length + 16)
            val rowBytes = sw * samples * bytesPer
            var r0 = 0
            while (r0 < rows) {
              packBitsRow(plane, r0 * rowBytes, (r0 + 1) * rowBytes, bos)
              r0 += 1
            }
            bos.toByteArray
        }
      }

      val segments: Array[Array[Byte]] = tile match {
        case Some((tw, th)) =>
          require(tw % 16 == 0 && th % 16 == 0, "TIFF tiles must be 16-aligned")
          val (na, nd) = ((w + tw - 1) / tw, (h + th - 1) / th)
          (for (ty <- 0 until nd; tx <- 0 until na)
            yield compress(serialize(tx * tw, ty * th, tw, th), tw, th)).toArray
        case None =>
          val n = (h + rowsPerStrip - 1) / rowsPerStrip
          (for (s <- 0 until n) yield {
            val rows = math.min(rowsPerStrip, h - s * rowsPerStrip)
            compress(serialize(0, s * rowsPerStrip, w, rows), w, rows)
          }).toArray
      }
      val segOffs = new Array[Long](segments.length)
      for (s <- segments.indices) {
        segOffs(s) = cursor
        cursor = align(cursor + segments(s).length)
      }

      val es = scala.collection.mutable.ArrayBuffer[E]()
      if (subfileType != 0)
        es += E(TNewSubfileType, 4, 1, Array(subfileType.toLong))
      es += E(TImageWidth, 4, 1, Array(w.toLong))
      es += E(TImageLength, 4, 1, Array(h.toLong))
      es += E(TBitsPerSample, 3, samples, Array.fill(samples)(bits.toLong))
      es += E(TCompression, 3, 1, Array(compression.toLong))
      es += E(TPhotometric, 3, 1, Array(
        if (palette.isDefined) 3L else if (samples == 3) 2L else 1L))
      tile match {
        case Some((tw, th)) =>
          es += E(TSamplesPerPixel, 3, 1, Array(samples.toLong))
          if (predictor == 2) es += E(TPredictor, 3, 1, Array(2L))
          es += E(TTileWidth, 3, 1, Array(tw.toLong))
          es += E(TTileLength, 3, 1, Array(th.toLong))
          es += E(TTileOffsets, segType, segments.length, segOffs)
          es += E(TTileByteCounts, segType, segments.length,
            segments.map(_.length.toLong))
        case None =>
          es += E(TStripOffsets, segType, segments.length, segOffs)
          es += E(TSamplesPerPixel, 3, 1, Array(samples.toLong))
          es += E(TRowsPerStrip, 4, 1, Array(rowsPerStrip.toLong))
          es += E(TStripByteCounts, segType, segments.length,
            segments.map(_.length.toLong))
          if (predictor == 2) es += E(TPredictor, 3, 1, Array(2L))
      }
      es += E(TPlanarConfig, 3, 1, Array(1L))
      palette.foreach { p =>
        // ColorMap: 16-bit entries, all reds then greens then blues
        val cm = new Array[Long](768)
        for (i <- 0 until 256) {
          cm(i) = ((p(i) >> 16) & 0xFF).toLong * 257
          cm(256 + i) = ((p(i) >> 8) & 0xFF).toLong * 257
          cm(512 + i) = (p(i) & 0xFF).toLong * 257
        }
        es += E(TColorMap, 3, 768, cm)
      }
      geo.foreach { g =>
        es += E(TModelPixelScale, 12, 3, dbls = Array(g.scaleX, g.scaleY, 0.0))
        es += E(TModelTiepoint, 12, 6,
          dbls = Array(0.0, 0.0, 0.0, g.tieX, g.tieY, 0.0))
        val keys = Array[Long](
          1, 1, 1, 3, // version 1.1.0, 3 keys
          1024, 0, 1, if (g.geographic) 2L else 1L,
          1025, 0, 1, 1, // RasterPixelIsArea
          if (g.geographic) 2048L else 3072L, 0, 1, g.epsg.toLong)
        es += E(TGeoKeyDirectory, 3, keys.length, keys)
        val cit = (g.citation + "|\u0000").getBytes("US-ASCII")
        es += E(TGeoAsciiParams, 2, cit.length, ascii = cit)
      }
      val sorted = es.sortBy(_.tag).toArray
      require(sorted.map(_.tag).distinct.length == sorted.length)

      val extOffs = new Array[Long](sorted.length)
      for (i <- sorted.indices) {
        val e = sorted(i)
        val byteLen = e.count * typeSize(e.tpe)
        if (byteLen > inlineCap) { extOffs(i) = cursor; cursor = align(cursor + byteLen) }
        else extOffs(i) = -1
      }
      val ifdOff = cursor
      val countLen = if (bigTiff) 8 else 2
      val nextFieldAt = ifdOff + countLen + sorted.length.toLong * entrySize
      cursor = align(nextFieldAt + (if (bigTiff) 8 else 4))
      P(segments, segOffs, sorted, extOffs, ifdOff, nextFieldAt)
    }

    val total = cursor
    require(total <= Int.MaxValue, "TIFF encode: file exceeds 2 GiB")
    val out = new Array[Byte](total.toInt)

    // ---- pass 2: write header, every page, chain the IFDs
    def put16(at: Long, v: Int): Unit = {
      val i = at.toInt
      if (le) { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
      else { out(i) = (v >> 8).toByte; out(i + 1) = v.toByte }
    }
    def put32(at: Long, v: Long): Unit = {
      if (le) { put16(at, (v & 0xFFFF).toInt); put16(at + 2, ((v >> 16) & 0xFFFF).toInt) }
      else { put16(at, ((v >> 16) & 0xFFFF).toInt); put16(at + 2, (v & 0xFFFF).toInt) }
    }
    def put64(at: Long, v: Long): Unit = {
      if (le) { put32(at, v & 0xFFFFFFFFL); put32(at + 4, v >>> 32) }
      else { put32(at, v >>> 32); put32(at + 4, v & 0xFFFFFFFFL) }
    }
    def putVal(at: Long, e: E, idx: Int): Unit = e.tpe match {
      case 2 => out(at.toInt) = e.ascii(idx)
      case 3 => put16(at, e.ints(idx).toInt)
      case 4 => put32(at, e.ints(idx))
      case 16 => put64(at, e.ints(idx))
      case 12 =>
        val bits = java.lang.Double.doubleToLongBits(e.dbls(idx))
        put64(at, bits)
    }

    out(0) = (if (le) 'I' else 'M').toByte
    out(1) = out(0)
    put16(2, if (bigTiff) 43 else 42)
    if (bigTiff) { put16(4, 8); put16(6, 0); put64(8, built.head.ifdOff) }
    else put32(4, built.head.ifdOff)
    for (pi <- built.indices) {
      val p = built(pi)
      for (s <- p.segments.indices)
        System.arraycopy(p.segments(s), 0, out, p.segOffs(s).toInt,
          p.segments(s).length)
      if (bigTiff) put64(p.ifdOff, p.entries.length.toLong)
      else put16(p.ifdOff, p.entries.length)
      for (i <- p.entries.indices) {
        val e = p.entries(i)
        val eAt = p.ifdOff + (if (bigTiff) 8 else 2) + i.toLong * entrySize
        put16(eAt, e.tag)
        put16(eAt + 2, e.tpe)
        if (bigTiff) put64(eAt + 4, e.count) else put32(eAt + 4, e.count)
        val vAt = eAt + (if (bigTiff) 12 else 8)
        if (p.extOffs(i) >= 0) {
          if (bigTiff) put64(vAt, p.extOffs(i)) else put32(vAt, p.extOffs(i))
          for (k <- 0 until e.count.toInt)
            putVal(p.extOffs(i) + k.toLong * typeSize(e.tpe), e, k)
        } else {
          for (k <- 0 until e.count.toInt)
            putVal(vAt + k.toLong * typeSize(e.tpe), e, k)
        }
      }
      val next = if (pi + 1 < built.length) built(pi + 1).ifdOff else 0L
      if (bigTiff) put64(p.nextFieldAt, next) else put32(p.nextFieldAt, next)
    }
    out
  }

  // --------------------------------------------------- fragment reader

  /** Open a GeoTIFF as an engine Fragment, rioxarray-style (the
    * reference names "via rasterio, GeoTIFF and other geospatial raster
    * formats" as an input family — docs/composition/styles.md:8-9):
    * dims (y, x) for a single band, (band, y, x) for RGB; x/y coords
    * are PIXEL CENTERS from the GeoTIFF affine transform — the
    * ModelTiepoint is the outer corner of pixel (0,0) under the
    * RasterPixelIsArea convention, so x_i = tieX + (i+0.5)·scaleX and
    * y_j = tieY − (j+0.5)·scaleY (north-up, y descending, exactly
    * rasterio's `transform * (col+0.5, row+0.5)`); without geo tags the
    * identity transform yields 0.5-offset pixel indices (y ascending).
    * The CRS surfaces as a global `crs` attr ("EPSG:nnnn"). Sample
    * dtype maps width-for-width (uint8/uint16), like every other
    * opener's narrow-dtype contract. */
  def readFragment(bytes: Array[Byte]): graft.core.Fragment = {
    import graft.core._
    val img = decode(bytes)
    val (w, h, s) = (img.width, img.height, img.samples)
    val geo = !img.scaleX.isNaN && !img.tieX.isNaN
    val xs = Array.tabulate(w)(i =>
      if (geo) img.tieX + (i + 0.5) * img.scaleX else i + 0.5)
    val ys = Array.tabulate(h)(j =>
      if (geo) img.tieY - (j + 0.5) * img.scaleY else j + 0.5)
    val dtype = if (img.bits == 8) DType.U1 else DType.U2
    val n = w * h * s
    val data: AnyRef =
      if (img.bits == 8) {
        val a = new Array[Byte](n)
        if (s == 1) { var i = 0; while (i < n) { a(i) = img.pixels(i).toByte; i += 1 } }
        else {
          // interleaved (y,x,band) -> band-major (band,y,x), the
          // rioxarray/rasterio axis order
          var i = 0
          while (i < w * h) {
            var b = 0
            while (b < s) { a(b * w * h + i) = img.pixels(i * s + b).toByte; b += 1 }
            i += 1
          }
        }
        a
      } else {
        val a = new Array[Short](n)
        if (s == 1) { var i = 0; while (i < n) { a(i) = img.pixels(i).toShort; i += 1 } }
        else {
          var i = 0
          while (i < w * h) {
            var b = 0
            while (b < s) { a(b * w * h + i) = img.pixels(i * s + b).toShort; b += 1 }
            i += 1
          }
        }
        a
      }
    val dims0 =
      if (s == 1) Map("y" -> h, "x" -> w)
      else Map("band" -> s, "y" -> h, "x" -> w)
    val varDims = if (s == 1) Vector("y", "x") else Vector("band", "y", "x")
    val shape = if (s == 1) Vector(h, w) else Vector(s, h, w)
    val coords0 = Map(
      "x" -> Variable(Vector("x"), NDArray(DType.F8, Vector(w), xs)),
      "y" -> Variable(Vector("y"), NDArray(DType.F8, Vector(h), ys))) ++
      (if (s == 1) Map.empty[String, Variable]
       else Map("band" -> Variable(Vector("band"),
         NDArray(DType.I4, Vector(s), Array.tabulate(s)(_ + 1)))))
    val gattrs: Attrs.Attrs =
      if (img.epsg > 0) Map("crs" -> AttrValue(s"EPSG:${img.epsg}"))
      else Map.empty
    Fragment(
      dims = dims0,
      coords = coords0,
      dataVars = Map("band_data" ->
        Variable(varDims, NDArray(dtype, shape, data))),
      attrs = gattrs)
  }

  /** File path form of [[readFragment]] — the opener-engine entry. */
  def read(path: String): graft.core.Fragment =
    readFragment(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))

  // --------------------------------------------------- header-only scan

  /** Structural facts a chunk-ref mapping needs — everything but the
    * pixels. Geo fields NaN / -1 when absent. */
  final case class Layout(width: Int, height: Int, bits: Int, samples: Int,
      littleEndian: Boolean, bigTiff: Boolean, compression: Int,
      predictor: Int, tiled: Boolean, segW: Int, segH: Int,
      segOffsets: Array[Long], segCounts: Array[Long],
      scaleX: Double = Double.NaN, scaleY: Double = Double.NaN,
      tieX: Double = Double.NaN, tieY: Double = Double.NaN,
      epsg: Int = -1)

  /** Header-only layout scan over a positioned reader (the kerchunk
    * scanner's entry): parses the header, the first IFD, and the tag
    * arrays — never a segment byte. `pread(off, len)` must return
    * exactly `len` bytes. Shares [[decode]]'s bounds discipline: every
    * offset/count is checked against `fileSize` and the fixed caps
    * before any read or allocation. */
  def scanLayout(pread: (Long, Int) => Array[Byte], fileSize: Long): Layout = {
    require(fileSize >= 8, "not a TIFF file (too short)")
    val head = pread(0, 16.min(fileSize.toInt))
    val le = (head(0), head(1)) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _ => throw new IllegalArgumentException(
        "not a TIFF file (bad byte-order mark)")
    }
    val hr = new R(head, le)
    val bigTiff = hr.u16(2) match {
      case 42 => false
      case 43 => true
      case other => throw new IllegalArgumentException(
        s"not a TIFF file (magic $other)")
    }
    val ifdOff =
      if (!bigTiff) hr.u32(4)
      else {
        require(head.length >= 16, "corrupt TIFF: truncated BigTIFF header")
        require(hr.u16(4) == 8, "corrupt TIFF: BigTIFF offset size must be 8")
        require(hr.u16(6) == 0, "corrupt TIFF: BigTIFF header pad must be 0")
        hr.u64(8)
      }
    val countLen = if (bigTiff) 8 else 2
    require(ifdOff >= 8 && ifdOff + countLen <= fileSize,
      s"corrupt TIFF: IFD offset $ifdOff")
    val cnt = new R(pread(ifdOff, countLen), le)
    val nEntries = if (bigTiff) cnt.u64(0) else cnt.u16(0).toLong
    require(nEntries >= 1 && nEntries <= 512,
      s"corrupt TIFF: IFD entry count $nEntries")
    val entrySize = if (bigTiff) 20 else 12
    val inlineCap = if (bigTiff) 8 else 4
    require(ifdOff + countLen + nEntries * entrySize <= fileSize,
      "corrupt TIFF: IFD runs past EOF")
    val block = pread(ifdOff + countLen, (nEntries * entrySize).toInt)
    val br = new R(block, le)
    // tag -> (type, count, value bytes + reader positioned at 0)
    var vals = Map.empty[Int, (Int, Long, R)]
    var prevTag = -1
    var i = 0L
    while (i < nEntries) {
      val at = i * entrySize
      val tag = br.u16(at)
      val tpe = br.u16(at + 2)
      val count = if (bigTiff) br.u64(at + 4) else br.u32(at + 4)
      require(count >= 0 && count <= Int.MaxValue,
        s"corrupt TIFF: tag $tag count $count")
      require(tag > prevTag, s"corrupt TIFF: IFD tags not ascending at tag $tag")
      prevTag = tag
      val tsz = typeSize(tpe)
      if (tsz > 0) {
        val byteLen = count * tsz
        require(byteLen <= (MaxSegments.toLong * 8),
          s"corrupt TIFF: tag $tag values of $byteLen bytes")
        val vAt = at + (if (bigTiff) 12 else 8)
        val bytes =
          if (byteLen <= inlineCap)
            java.util.Arrays.copyOfRange(block, vAt.toInt, vAt.toInt + inlineCap)
          else {
            val off = if (bigTiff) br.u64(vAt) else br.u32(vAt)
            require(off >= 8 && off + byteLen <= fileSize,
              s"corrupt TIFF: tag $tag values at $off run past EOF")
            pread(off, byteLen.toInt)
          }
        vals += tag -> ((tpe, count, new R(bytes, le)))
      }
      i += 1
    }
    def longsOf(tag: Int): Option[Array[Long]] = vals.get(tag).map {
      case (tpe, count, r) =>
        val n = count.toInt
        Array.tabulate(n) { k =>
          tpe match {
            case 1 | 7 => (r.b(k) & 0xFF).toLong
            case 3 => r.u16(k * 2L).toLong
            case 4 => r.u32(k * 4L)
            case 16 => r.u64(k * 8L)
            case other => throw new IllegalArgumentException(
              s"TIFF tag $tag: integer field type $other not supported")
          }
        }
    }
    def one(tag: Int, dflt: Long = -1L): Long =
      longsOf(tag).map { v =>
        require(v.nonEmpty, s"corrupt TIFF: tag $tag has no value")
        v(0)
      }.getOrElse(dflt)
    def doublesOf(tag: Int): Option[Array[Double]] = vals.get(tag).map {
      case (tpe, count, r) =>
        require(tpe == 12, s"TIFF tag $tag: expected DOUBLE, got type $tpe")
        require(count <= 64, s"corrupt TIFF: tag $tag count $count")
        Array.tabulate(count.toInt) { k =>
          var bits = 0L
          var j = 0
          while (j < 8) {
            val byte = r.b(k * 8 + j) & 0xFFL
            bits |= (if (le) byte << (8 * j) else byte << (8 * (7 - j)))
            j += 1
          }
          java.lang.Double.longBitsToDouble(bits)
        }
    }
    val w = one(TImageWidth)
    val h = one(TImageLength)
    require(w >= 1 && w <= MaxDim && h >= 1 && h <= MaxDim,
      s"corrupt TIFF: image dimensions ${w}x$h")
    val samples = one(TSamplesPerPixel, 1L).toInt
    require(samples == 1 || samples == 3,
      s"TIFF SamplesPerPixel $samples not supported")
    val bitsArr = longsOf(TBitsPerSample).getOrElse(Array(1L))
    require(bitsArr.nonEmpty && bitsArr.forall(_ == bitsArr(0)),
      "TIFF mixed per-channel bit depths not supported")
    val bits = bitsArr(0).toInt
    require(bits == 8 || bits == 16, s"TIFF BitsPerSample $bits not supported")
    val comp = one(TCompression, 1L).toInt
    require(comp == 1 || comp == 5 || comp == 8 || comp == 32946 || comp == 32773,
      s"TIFF compression $comp not supported")
    val predictor = one(TPredictor, 1L).toInt
    require(one(TPlanarConfig, 1L) == 1L,
      "TIFF planar configuration 2 not supported")
    val tiled = vals.contains(TTileOffsets)
    def need(tag: Int, name: String): Array[Long] =
      longsOf(tag).getOrElse(throw new IllegalArgumentException(
        s"corrupt TIFF: required tag $name ($tag) missing"))
    val (offs, cnts, segW, segH) =
      if (tiled) {
        val tw = one(TTileWidth)
        val th = one(TTileLength)
        require(tw >= 16 && th >= 16 && tw % 16 == 0 && th % 16 == 0 &&
          tw <= MaxDim && th <= MaxDim, s"corrupt TIFF: tile size ${tw}x$th")
        val o = need(TTileOffsets, "TileOffsets")
        val c = need(TTileByteCounts, "TileByteCounts")
        val n = ((w + tw - 1) / tw) * ((h + th - 1) / th)
        require(o.length == n && c.length == o.length,
          s"corrupt TIFF: ${o.length} tiles, expected $n")
        (o, c, tw.toInt, th.toInt)
      } else {
        val rps = one(TRowsPerStrip, h)
        require(rps >= 1 && rps <= MaxDim, s"corrupt TIFF: RowsPerStrip $rps")
        val o = need(TStripOffsets, "StripOffsets")
        val c = need(TStripByteCounts, "StripByteCounts")
        val n = ((h + rps - 1) / rps).toInt
        require(o.length == n && c.length == n,
          s"corrupt TIFF: ${o.length} strips, expected $n")
        (o, c, w.toInt, rps.toInt)
      }
    offs.indices.foreach { s =>
      require(offs(s) >= 8 && cnts(s) >= 0 && offs(s) + cnts(s) <= fileSize,
        s"corrupt TIFF: segment $s at ${offs(s)}+${cnts(s)} runs past EOF")
    }
    var (sx, sy, tx, ty) = (Double.NaN, Double.NaN, Double.NaN, Double.NaN)
    doublesOf(TModelPixelScale).foreach { d =>
      require(d.length >= 2, "corrupt TIFF: ModelPixelScale needs 3 doubles")
      sx = d(0); sy = d(1)
    }
    doublesOf(TModelTiepoint).foreach { d =>
      require(d.length >= 6, "corrupt TIFF: ModelTiepoint needs 6 doubles")
      tx = d(3); ty = d(4)
    }
    var epsg = -1
    longsOf(TGeoKeyDirectory).foreach { ks =>
      require(ks.length >= 4 && ks(0) == 1,
        "corrupt TIFF: GeoKeyDirectory version must be 1")
      val nk = ks(3).toInt
      require(ks.length >= 4 * (1 + nk), "corrupt TIFF: GeoKeyDirectory truncated")
      var k = 0
      while (k < nk) {
        val (id, loc, v) = (ks(4 + 4 * k).toInt, ks(5 + 4 * k).toInt,
          ks(7 + 4 * k).toInt)
        if (loc == 0 && (id == 2048 || id == 3072)) epsg = v
        k += 1
      }
    }
    Layout(w.toInt, h.toInt, bits, samples, le, bigTiff, comp, predictor,
      tiled, segW, segH, offs, cnts, sx, sy, tx, ty, epsg)
  }
}
