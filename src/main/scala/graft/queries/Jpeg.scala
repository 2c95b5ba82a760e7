package graft.queries

/** Baseline AND progressive JPEG (ITU-T T.81 DCT, Huffman) — decoder
  * and deterministic fixture encoders, pure JVM.
  *
  * JPEG is the dominant still-image format of web-scale multimodal
  * corpora (the PNG/GIF/PPM/WAV/AVI family the m-queries already decode
  * covers the lossless containers; this adds the lossy-DCT one). The
  * decoder implements the full baseline path: marker walk (SOI, APPn,
  * COM, DQT, SOF0, DHT, DRI, SOS, RSTn, EOI), canonical Huffman decode
  * (MSB-first, 0xFF00 byte-unstuffing), DC prediction with restart
  * resets, zigzag de-ordering, dequantization, double-precision 2-D
  * IDCT (the spec's reference transform; integer-exact on the DC-only
  * blocks the oracle fixtures use), level shift + clamp, and component
  * reassembly for grayscale, 4:4:4 and 4:2:0 YCbCr (JFIF color
  * conversion).
  *
  * PROGRESSIVE (SOF2, T.81 Annex G) decodes through a per-component
  * coefficient store accumulated across scans: spectral selection
  * (DC scans Ss=Se=0, interleaved or not; single-component AC band
  * scans with EOB-run coding) and successive approximation (DC first
  * passes shifted by Al with one-raw-bit refinement scans; AC first
  * passes at ±(1<<Al) granularity with correction-bit refinement
  * scans, the G.1.2.3 algorithm), with restart markers inside any
  * scan; dequantization + IDCT + reassembly run once at EOI. A large
  * share of web-crawl JPEGs are progressive — this is the admission
  * path's most-hit format variant after baseline itself. Arithmetic
  * coding, 12-bit precision, hierarchical and lossless SOFn variants
  * fail by name.
  *
  * Corruption contract (CorruptionSweepSpec): every segment length,
  * count, dimension and table index is bounded at its source before any
  * allocation or loop; the marker walk makes >= 2 bytes of progress per
  * iteration; Huffman decode rejects codes longer than 16 bits; the
  * entropy reader refuses to run past the segment. A corrupt file fails
  * with a named error, never a crash-class throwable.
  *
  * The fixture encoder emits DC-ONLY grayscale baseline JPEGs (all-1s
  * quantization table, custom minimal Huffman tables, optional restart
  * intervals). A DC-only block dequantizes to coefficient 8·v and IDCTs
  * to the exact constant v + 128 in ANY conforming decoder — so fixture
  * pixel statistics are closed-form functions of doc_id that a DuckDB
  * oracle recomputes without decoding (the m11/m12 pattern), while the
  * real marker/Huffman/IDCT machinery genuinely runs. JpegSpec
  * cross-validates both directions against the JDK's ImageIO codec:
  * ImageIO reads our fixtures bit-exactly, and our decoder reads
  * ImageIO-encoded color images within IDCT rounding tolerance.
  */
object Jpeg {

  final case class JpegImage(width: Int, height: Int, nComponents: Int,
      /** gray: w·h luma bytes; color: w·h·3 interleaved RGB. */
      pixels: Array[Byte],
      nMarkers: Long, nRestarts: Long)

  // zigzag scan order: zigzag(k) = raster index of the k-th coefficient
  private val Zigzag: Array[Int] = {
    val z = new Array[Int](64)
    var k = 0
    for (s <- 0 until 15) {
      val range = math.max(0, s - 7) to math.min(7, s)
      val diag = if (s % 2 == 0) range.reverse else range
      diag.foreach { y => val x = s - y; z(k) = y * 8 + x; k += 1 }
    }
    z
  }

  private val CosTable: Array[Double] = Array.tabulate(8 * 8) { i =>
    val x = i / 8; val u = i % 8
    math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }
  private val C0 = 1.0 / math.sqrt(2.0)

  /** Canonical Huffman table: decode by walking code lengths 1..16. */
  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    // minCode(l), maxCode(l) (inclusive; -1 = none), valPtr(l)
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1); k += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def symbol(l: Int, code: Int): Int = symbols(valPtr(l) + code - minCode(l))
  }

  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** Entropy-segment bit reader with 0xFF00 unstuffing; stops AT any
    * real marker (leaving `pos` on its 0xFF). */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var hitMarker = false
    def align(): Unit = { acc = 0; nBits = 0 }
    def bit(): Int = {
      if (nBits == 0) {
        if (hitMarker) { acc = 0xff; nBits = 8 } // 1-fill past a marker
        else {
          require(pos < bytes.length, "corrupt JPEG: entropy data truncated")
          val b0 = bytes(pos) & 0xff
          if (b0 == 0xff) {
            require(pos + 1 < bytes.length,
              "corrupt JPEG: dangling 0xFF in entropy data")
            if ((bytes(pos + 1) & 0xff) == 0x00) {
              acc = 0xff; nBits = 8; pos += 2 // stuffed data byte
            } else { // a real marker: stop consuming, 1-fill
              hitMarker = true; acc = 0xff; nBits = 8
            }
          } else { acc = b0; nBits = 8; pos += 1 }
        }
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(h: Huff): Int = {
      var code = bit()
      var l = 1
      while (l <= 16 && (h.maxCode(l) < 0 || code > h.maxCode(l))) {
        code = (code << 1) | bit()
        l += 1
      }
      require(l <= 16, "corrupt JPEG: Huffman code longer than 16 bits")
      require(code >= h.minCode(l),
        s"corrupt JPEG: non-canonical Huffman code at length $l")
      h.symbol(l, code)
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Dequantized-coefficient block (raster order) → 8×8 pixels at
    * (ox, oy) in `plane`: double-precision reference IDCT, level shift,
    * clamp. Shared by the baseline inline path and the progressive
    * at-EOI pass. */
  private def idctBlock(coefs: Array[Int], plane: Array[Byte], pw: Int,
                        ox: Int, oy: Int): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          val cxu = CosTable(x * 8 + u) * (if (u == 0) C0 else 1.0)
          while (v < 8) {
            val f = coefs(v * 8 + u)
            if (f != 0)
              sum += cxu * (if (v == 0) C0 else 1.0) *
                CosTable(y * 8 + v) * f
            v += 1
          }
          u += 1
        }
        val px = math.round(sum / 4.0 + 128.0).toInt
        plane((oy + y) * pw + ox + x) =
          (if (px < 0) 0 else if (px > 255) 255 else px).toByte
        x += 1
      }
      y += 1
    }
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable = 0; var acTable = 0
  }

  def decode(bytes: Array[Byte]): JpegImage = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "not a JPEG file (no SOI)")
    val quant = new Array[Array[Int]](4)
    val dcHuff = new Array[Huff](4)
    val acHuff = new Array[Huff](4)
    var width = 0; var height = 0
    var comps: Array[Component] = null
    var restartInterval = 0
    var nMarkers = 1L // SOI
    var nRestarts = 0L
    var pos = 2
    var sawSof = false

    // decoded planes at COMPONENT resolution (one byte per sample)
    var planes: Array[Array[Byte]] = null
    var planeW: Array[Int] = null
    var planeH: Array[Int] = null

    // progressive (SOF2) state: per-component UNQUANTIZED coefficient
    // stores (raster order within each 64-coef block) accumulated
    // across scans, MCU-padded block geometry, per-component DC-scan
    // tracking (an AC scan may only follow its component's DC scan)
    var progressive = false
    var progScans = 0
    var mcusX = 0; var mcusY = 0
    var padBW: Array[Int] = null; var padBH: Array[Int] = null
    var compBW: Array[Int] = null; var compBH: Array[Int] = null
    var coefStore: Array[Array[Int]] = null
    var dcDone: Array[Boolean] = null

    def parseDqt(seg: Array[Byte]): Unit = {
      var p = 0
      while (p < seg.length) {
        require(p + 1 <= seg.length, "corrupt JPEG: truncated DQT")
        val pq = (seg(p) & 0xf0) >> 4
        val tq = seg(p) & 0x0f
        require(pq == 0, s"unsupported JPEG: ${if (pq == 1) "16-bit" else "invalid"} quantization precision")
        require(tq < 4, s"corrupt JPEG: quant table id $tq")
        require(p + 1 + 64 <= seg.length, "corrupt JPEG: short DQT table")
        val t = new Array[Int](64)
        var k = 0
        while (k < 64) { t(Zigzag(k)) = seg(p + 1 + k) & 0xff; k += 1 }
        quant(tq) = t
        p += 65
      }
    }

    def parseDht(seg: Array[Byte]): Unit = {
      var p = 0
      while (p < seg.length) {
        require(p + 17 <= seg.length, "corrupt JPEG: truncated DHT")
        val tc = (seg(p) & 0xf0) >> 4
        val th = seg(p) & 0x0f
        require(tc <= 1 && th < 4, s"corrupt JPEG: DHT class/id $tc/$th")
        val counts = Array.tabulate(16)(i => seg(p + 1 + i) & 0xff)
        val total = counts.sum
        require(total >= 1 && total <= 256 && p + 17 + total <= seg.length,
          s"corrupt JPEG: DHT symbol count $total")
        val syms = Array.tabulate(total)(i => seg(p + 17 + i) & 0xff)
        val h = new Huff(counts, syms)
        if (tc == 0) dcHuff(th) = h else acHuff(th) = h
        p += 17 + total
      }
    }

    def parseSof(seg: Array[Byte]): Unit = {
      require(!sawSof, "corrupt JPEG: multiple frame headers")
      require(seg.length >= 6, "corrupt JPEG: truncated SOF")
      require((seg(0) & 0xff) == 8, "unsupported JPEG: sample precision != 8")
      height = u16(seg, 1); width = u16(seg, 3)
      val nf = seg(5) & 0xff
      require(width > 0 && height > 0 &&
        width.toLong * height * 3 <= (1L << 28),
        s"unsupported JPEG dimensions ${width}x$height")
      require(nf == 1 || nf == 3,
        s"unsupported JPEG: $nf components (grayscale or YCbCr only)")
      require(seg.length >= 6 + nf * 3, "corrupt JPEG: short SOF")
      comps = Array.tabulate(nf) { i =>
        val id = seg(6 + i * 3) & 0xff
        val hv = seg(7 + i * 3) & 0xff
        val tq = seg(8 + i * 3) & 0xff
        val ch = (hv >> 4) & 0xf; val cv = hv & 0xf
        require(ch >= 1 && ch <= 4 && cv >= 1 && cv <= 4,
          s"illegal JPEG sampling ${ch}x$cv (T.81 allows 1..4)")
        require(tq < 4, s"corrupt JPEG: quant id $tq")
        Component(id, ch, cv, tq)
      }
      if (nf == 3) {
        // luma may subsample in either axis independently up to factor
        // 4 (1x1 = 4:4:4, 2x1 = 4:2:2, 1x2 = 4:4:0, 2x2 = 4:2:0,
        // 4x1 = 4:1:1 — the DV-video still layout — plus 1x4/4x2/2x4/
        // 3x1...); chroma must be 1x1. The MCU assembly and reassembly
        // below are generic over per-component (h, v), so this gate is
        // the only sampling-specific code.
        val ok = comps(1).h == 1 && comps(1).v == 1 &&
          comps(2).h == 1 && comps(2).v == 1
        require(ok,
          "unsupported JPEG: chroma sampling factors must be 1x1 " +
            "(luma-subsampled YCbCr only)")
        // T.81 B.2.3: an interleaved scan carries at most 10 data units
        // per MCU — with 1x1 chroma that bounds luma h*v at 8
        require(comps(0).h * comps(0).v <= 8,
          s"illegal JPEG: ${comps(0).h}x${comps(0).v} luma exceeds " +
            "T.81's 10-data-units-per-MCU interleave bound")
      }
      val hMax = comps.map(_.h).max; val vMax = comps.map(_.v).max
      mcusX = (width + 8 * hMax - 1) / (8 * hMax)
      mcusY = (height + 8 * vMax - 1) / (8 * vMax)
      padBW = comps.map(c => mcusX * c.h)
      padBH = comps.map(c => mcusY * c.v)
      compBW = comps.map(c => ((width * c.h + hMax - 1) / hMax + 7) / 8)
      compBH = comps.map(c => ((height * c.v + vMax - 1) / vMax + 7) / 8)
      if (progressive) {
        // the coefficient store costs ~4 bytes per pixel per component
        // (vs 1 for baseline planes) — bound it tighter so a corrupt or
        // hostile header cannot demand a GB-class allocation
        require(width.toLong * height * comps.length <= (1L << 26),
          s"unsupported JPEG: progressive ${width}x$height " +
            s"x${comps.length} exceeds the coefficient-store bound")
        coefStore = comps.indices.map(ci =>
          new Array[Int](padBW(ci) * padBH(ci) * 64)).toArray
        dcDone = new Array[Boolean](comps.length)
      }
      sawSof = true
    }

    def decodeScan(seg: Array[Byte], dataStart: Int): Int = {
      require(sawSof, "corrupt JPEG: SOS before SOF")
      // an SOS whose length field is 2 yields an EMPTY body — guard before
      // seg(0) so the corruption contract (named error) holds for len=2
      require(seg.length >= 6, "corrupt JPEG: short SOS")
      val ns = seg(0) & 0xff
      require(ns == comps.length, s"unsupported JPEG: partial scan ($ns of ${comps.length})")
      require(seg.length >= 1 + ns * 2 + 3, "corrupt JPEG: short SOS")
      var i = 0
      while (i < ns) {
        val cid = seg(1 + i * 2) & 0xff
        val c = comps.find(_.id == cid).getOrElse(
          throw new IllegalArgumentException(s"corrupt JPEG: scan names unknown component $cid"))
        c.dcTable = (seg(2 + i * 2) & 0xf0) >> 4
        c.acTable = seg(2 + i * 2) & 0x0f
        // bound the 4-bit table ids at their source: the spec allows
        // 0..3 only, and the dcHuff/acHuff arrays are 4 elements
        require(c.dcTable <= 3 && c.acTable <= 3,
          s"corrupt JPEG: Huffman table id ${c.dcTable}/${c.acTable}")
        i += 1
      }
      val hMax = comps.map(_.h).max
      val vMax = comps.map(_.v).max
      val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
      val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
      planeW = comps.map(c => mcusX * 8 * c.h)
      planeH = comps.map(c => mcusY * 8 * c.v)
      planes = comps.indices.map(ci =>
        new Array[Byte](planeW(ci) * planeH(ci))).toArray
      val preds = new Array[Int](comps.length)
      val coefs = new Array[Int](64)
      val br = new BitReader(bytes, dataStart)
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          // expect an RSTn marker: byte-align, consume it, reset preds
          br.align(); br.hitMarker = false
          require(br.pos + 1 < bytes.length &&
            (bytes(br.pos) & 0xff) == 0xff &&
            ((bytes(br.pos + 1) & 0xff) & 0xf8) == 0xd0,
            s"corrupt JPEG: expected RST marker at MCU $mcu")
          br.pos += 2
          nRestarts += 1
          java.util.Arrays.fill(preds, 0)
        }
        val my = mcu / mcusX; val mx = mcu % mcusX
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val dct = dcHuff(c.dcTable); val act = acHuff(c.acTable)
          require(dct != null && act != null,
            s"corrupt JPEG: scan uses undefined Huffman table")
          val qt = quant(c.tq)
          require(qt != null, "corrupt JPEG: scan uses undefined quant table")
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              java.util.Arrays.fill(coefs, 0)
              // DC
              val t = br.decode(dct)
              require(t <= 11, s"corrupt JPEG: DC category $t")
              preds(ci) += extend(br.bits(t), t)
              coefs(0) = preds(ci) * qt(0)
              // AC
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = br.decode(act)
                val r = (rs >> 4) & 0xf; val s = rs & 0xf
                if (s == 0) {
                  if (r == 15) k += 16 // ZRL
                  else eob = true
                } else {
                  k += r
                  require(k < 64, "corrupt JPEG: AC run past block end")
                  coefs(Zigzag(k)) = extend(br.bits(s), s) * qt(Zigzag(k))
                  k += 1
                }
              }
              // IDCT (double, the spec reference transform) + level shift
              idctBlock(coefs, planes(ci), planeW(ci),
                (mx * c.h + bx) * 8, (my * c.v + by) * 8)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
      }
      br.align()
      // skip any residual pad byte / stuffed bytes to the next real
      // marker (encoders may flush a final padded byte the decode never
      // needed to load)
      var p = br.pos
      while (p + 1 < bytes.length &&
        !((bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xff) != 0x00))
        p += 1
      p
    }

    /** One progressive scan (T.81 Annex G): DC scans (interleaved MCU
      * order when ns > 1, component block-raster otherwise), single-
      * component AC band scans with EOB-run coding, successive-
      * approximation first (Ah=0) and refinement (Ah=Al+1) passes,
      * restart markers inside any scan. Coefficients accumulate in
      * `coefStore` unquantized; returns the position of the marker
      * following the scan's entropy data. */
    def decodeProgScan(seg: Array[Byte], dataStart: Int): Int = {
      require(sawSof, "corrupt JPEG: SOS before SOF")
      require(seg.length >= 6, "corrupt JPEG: short SOS")
      val ns = seg(0) & 0xff
      require(ns >= 1 && ns <= comps.length,
        s"corrupt JPEG: scan component count $ns")
      require(seg.length >= 1 + ns * 2 + 3, "corrupt JPEG: short SOS")
      val scanComps = new Array[Int](ns)
      var i = 0
      while (i < ns) {
        val cid = seg(1 + i * 2) & 0xff
        val ci = comps.indexWhere(_.id == cid)
        require(ci >= 0,
          s"corrupt JPEG: scan names unknown component $cid")
        comps(ci).dcTable = (seg(2 + i * 2) & 0xf0) >> 4
        comps(ci).acTable = seg(2 + i * 2) & 0x0f
        require(comps(ci).dcTable <= 3 && comps(ci).acTable <= 3,
          s"corrupt JPEG: Huffman table id " +
            s"${comps(ci).dcTable}/${comps(ci).acTable}")
        scanComps(i) = ci
        i += 1
      }
      val ss = seg(1 + ns * 2) & 0xff
      val se = seg(2 + ns * 2) & 0xff
      val ah = (seg(3 + ns * 2) & 0xf0) >> 4
      val al = seg(3 + ns * 2) & 0x0f
      require(al <= 13 && (ah == 0 || ah == al + 1),
        s"corrupt JPEG: successive approximation Ah=$ah Al=$al")
      val br = new BitReader(bytes, dataStart)
      val preds = new Array[Int](comps.length)
      var eobrun = 0

      def expectRestart(unit: Int): Unit =
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          br.align(); br.hitMarker = false
          require(br.pos + 1 < bytes.length &&
            (bytes(br.pos) & 0xff) == 0xff &&
            ((bytes(br.pos + 1) & 0xff) & 0xf8) == 0xd0,
            s"corrupt JPEG: expected RST marker at unit $unit")
          br.pos += 2
          nRestarts += 1; nMarkers += 1
          java.util.Arrays.fill(preds, 0)
          eobrun = 0
        }

      if (ss == 0) {
        // ---- DC scan (first pass or one-raw-bit refinement) ----
        require(se == 0, "corrupt JPEG: progressive DC scan with a spectral band")
        if (ah == 0)
          scanComps.foreach(ci => require(dcHuff(comps(ci).dcTable) != null,
            "corrupt JPEG: scan uses undefined Huffman table"))
        else
          scanComps.foreach(ci => require(dcDone(ci),
            "corrupt JPEG: DC refinement before the component's first DC scan"))
        def dcOne(ci: Int, blockIdx: Int): Unit = {
          val off = blockIdx * 64
          if (ah == 0) {
            val t = br.decode(dcHuff(comps(ci).dcTable))
            require(t <= 11, s"corrupt JPEG: DC category $t")
            preds(ci) += extend(br.bits(t), t)
            coefStore(ci)(off) = preds(ci) << al
          } else if (br.bit() == 1) coefStore(ci)(off) |= (1 << al)
        }
        if (ns > 1) {
          val nMcus = mcusX * mcusY
          var mcu = 0
          while (mcu < nMcus) {
            expectRestart(mcu)
            val my = mcu / mcusX; val mx = mcu % mcusX
            var si = 0
            while (si < ns) {
              val ci = scanComps(si); val c = comps(ci)
              var by = 0
              while (by < c.v) {
                var bx = 0
                while (bx < c.h) {
                  dcOne(ci, (my * c.v + by) * padBW(ci) + mx * c.h + bx)
                  bx += 1
                }
                by += 1
              }
              si += 1
            }
            mcu += 1
          }
        } else {
          val ci = scanComps(0)
          val bw = compBW(ci); val n = bw * compBH(ci)
          var b = 0
          while (b < n) {
            expectRestart(b)
            dcOne(ci, (b / bw) * padBW(ci) + b % bw)
            b += 1
          }
        }
        scanComps.foreach(ci => dcDone(ci) = true)
      } else {
        // ---- AC band scan: single component, non-interleaved ----
        require(ns == 1, "corrupt JPEG: interleaved progressive AC scan")
        require(ss <= se && se <= 63, s"corrupt JPEG: spectral band $ss..$se")
        val ci = scanComps(0)
        require(dcDone(ci),
          "corrupt JPEG: AC scan before the component's DC scan")
        val act = acHuff(comps(ci).acTable)
        require(act != null, "corrupt JPEG: scan uses undefined Huffman table")
        val store = coefStore(ci)
        val p1 = 1 << al; val m1 = -1 << al
        val bw = compBW(ci); val n = bw * compBH(ci)
        var b = 0
        while (b < n) {
          expectRestart(b)
          val off = ((b / bw) * padBW(ci) + b % bw) * 64
          if (ah == 0) {
            // first pass: run/size coding at ±(k<<Al), EOB runs
            if (eobrun > 0) eobrun -= 1
            else {
              var k = ss
              var ended = false
              while (k <= se && !ended) {
                val rs = br.decode(act)
                val r = (rs >> 4) & 0xf; val s = rs & 0xf
                if (s == 0) {
                  if (r == 15) k += 16 // ZRL
                  else {
                    eobrun = (1 << r) - 1
                    if (r > 0) eobrun += br.bits(r)
                    ended = true
                  }
                } else {
                  k += r
                  require(k <= se, "corrupt JPEG: AC run past band end")
                  store(off + Zigzag(k)) = extend(br.bits(s), s) << al
                  k += 1
                }
              }
            }
          } else {
            // refinement pass (G.1.2.3): one correction bit per already-
            // nonzero coefficient crossed, at most one new ±(1<<Al)
            var k = ss
            if (eobrun == 0) {
              var ended = false
              while (k <= se && !ended) {
                val rs = br.decode(act)
                var r = (rs >> 4) & 0xf; val s = rs & 0xf
                var newval = 0
                if (s == 0) {
                  if (r != 15) {
                    eobrun = (1 << r) - 1
                    if (r > 0) eobrun += br.bits(r)
                    ended = true
                  }
                } else {
                  require(s == 1, s"corrupt JPEG: AC refinement amplitude $s")
                  newval = if (br.bit() == 1) p1 else m1
                }
                if (!ended) {
                  // advance over r zero-HISTORY coefficients, applying
                  // correction bits to every nonzero-history one crossed
                  var stopped = false
                  while (k <= se && !stopped) {
                    val p = off + Zigzag(k)
                    val cv = store(p)
                    if (cv != 0) {
                      if (br.bit() == 1 && (cv & p1) == 0)
                        store(p) = cv + (if (cv >= 0) p1 else m1)
                      k += 1
                    } else if (r == 0) stopped = true
                    else { r -= 1; k += 1 }
                  }
                  if (newval != 0) {
                    require(k <= se,
                      "corrupt JPEG: AC refinement run past band end")
                    store(off + Zigzag(k)) = newval
                  }
                  k += 1
                }
              }
            }
            if (eobrun > 0) {
              // EOB region: correction bits for the remaining nonzero-
              // history coefficients of this block's band
              while (k <= se) {
                val p = off + Zigzag(k)
                val cv = store(p)
                if (cv != 0 && br.bit() == 1 && (cv & p1) == 0)
                  store(p) = cv + (if (cv >= 0) p1 else m1)
                k += 1
              }
              eobrun -= 1
            }
          }
          b += 1
        }
      }
      progScans += 1
      br.align()
      var p = br.pos
      while (p + 1 < bytes.length &&
        !((bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xff) != 0x00))
        p += 1
      p
    }

    /** Progressive finish at EOI: dequantize every (MCU-padded) block
      * from the coefficient store and IDCT into component planes —
      * reassembly below is shared with the baseline path. */
    def finishProgressive(): Unit = {
      planeW = comps.indices.map(ci => padBW(ci) * 8).toArray
      planeH = comps.indices.map(ci => padBH(ci) * 8).toArray
      planes = comps.indices.map(ci =>
        new Array[Byte](planeW(ci) * planeH(ci))).toArray
      val coefs = new Array[Int](64)
      var ci = 0
      while (ci < comps.length) {
        val qt = quant(comps(ci).tq)
        require(qt != null, "corrupt JPEG: scan uses undefined quant table")
        val store = coefStore(ci)
        val bw = padBW(ci); val bh = padBH(ci)
        var by = 0
        while (by < bh) {
          var bx = 0
          while (bx < bw) {
            val off = (by * bw + bx) * 64
            var k = 0
            while (k < 64) { coefs(k) = store(off + k) * qt(k); k += 1 }
            idctBlock(coefs, planes(ci), planeW(ci), bx * 8, by * 8)
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
    }

    var scanned = false
    while (!scanned) {
      require(pos + 2 <= bytes.length, "corrupt JPEG: truncated marker stream")
      require((bytes(pos) & 0xff) == 0xff,
        s"corrupt JPEG: expected marker at $pos")
      // ITU-T T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
      // marker code — skip them so the code byte is the first non-0xFF
      while (pos + 2 < bytes.length && (bytes(pos + 1) & 0xff) == 0xff)
        pos += 1
      val m = bytes(pos + 1) & 0xff
      nMarkers += 1
      m match {
        case 0xd9 => // EOI: legal end for progressive (after >= 1 scan)
          if (progressive && progScans > 0) {
            finishProgressive()
            scanned = true
          } else throw new IllegalArgumentException(
            "corrupt JPEG: EOI before SOS")
        case 0x01 => pos += 2 // TEM: no segment
        case r if r >= 0xd0 && r <= 0xd7 => pos += 2 // stray RST: no segment
        case _ =>
          require(pos + 4 <= bytes.length, "corrupt JPEG: truncated segment length")
          val len = u16(bytes, pos + 2)
          require(len >= 2 && pos + 2 + len <= bytes.length,
            s"corrupt JPEG: segment 0x${"%02x".format(m)} length $len exceeds file")
          val seg = java.util.Arrays.copyOfRange(bytes, pos + 4, pos + 2 + len)
          var posSet = false
          m match {
            case 0xdb => parseDqt(seg)
            case 0xc4 => parseDht(seg)
            case 0xc0 => parseSof(seg)
            case 0xc2 => progressive = true; parseSof(seg)
            case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
                 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
              throw new UnsupportedOperationException(
                s"unsupported JPEG: SOF 0x${"%02x".format(m)} " +
                  "(arithmetic/hierarchical/lossless) — baseline and " +
                  "progressive only")
            case 0xdd =>
              require(seg.length >= 2, "corrupt JPEG: short DRI")
              restartInterval = u16(seg, 0)
            case 0xda if progressive =>
              pos = decodeProgScan(seg, pos + 2 + len)
              posSet = true
            case 0xda =>
              val after = decodeScan(seg, pos + 2 + len)
              // expect EOI (possibly after the final entropy bytes)
              require(after + 2 <= bytes.length &&
                (bytes(after) & 0xff) == 0xff &&
                (bytes(after + 1) & 0xff) == 0xd9,
                "corrupt JPEG: no EOI after scan")
              nMarkers += 1 + nRestarts // EOI + RSTs
              scanned = true
            case _ => // APPn / COM / DNL: length-bounded skip
          }
          if (!scanned && !posSet) pos += 2 + len
      }
    }

    // reassemble to output pixels
    if (comps.length == 1) {
      val out = new Array[Byte](width * height)
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        System.arraycopy(planes(0), y * pw, out, y * width, width)
        y += 1
      }
      JpegImage(width, height, 1, out, nMarkers, nRestarts)
    } else {
      val out = new Array[Byte](width * height * 3)
      val hMax = comps.map(_.h).max; val vMax = comps.map(_.v).max
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          def sample(ci: Int): Int = {
            val c = comps(ci)
            val sx = x * c.h / hMax; val sy = y * c.v / vMax
            planes(ci)(sy * planeW(ci) + sx) & 0xff
          }
          val yy = sample(0).toDouble
          val cb = sample(1) - 128.0
          val cr = sample(2) - 128.0
          def clamp(d: Double): Byte = {
            val v = math.round(d).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          val o = (y * width + x) * 3
          out(o) = clamp(yy + 1.402 * cr)
          out(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp(yy + 1.772 * cb)
          x += 1
        }
        y += 1
      }
      JpegImage(width, height, 3, out, nMarkers, nRestarts)
    }
  }

  // ------------------------------------------------- fixture encoder

  /** Minimal canonical Huffman spec: 12 DC size categories at 4 bits
    * each; AC table = the single EOB symbol at 1 bit. */
  private val DcCounts = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DcSyms = (0 to 11).toArray
  private val AcCounts = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcSyms = Array(0)

  private final class BitWriter(bos: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var n = 0
    def put(v: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1); n += 1
        if (n == 8) {
          bos.write(acc)
          if (acc == 0xff) bos.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = { // 1-fill to byte boundary (spec padding)
      while (n != 0) put(1, 1)
    }
  }

  /** Encode an 8×8-block-aligned GRAYSCALE baseline JPEG where block b
    * (MCU scan order) is the exact constant `blockVal(b)` ∈ [0, 255]:
    * all-1s quant table + DC-only blocks make the decode closed-form.
    * `restartInterval > 0` emits DRI + RSTn markers (DC predictor
    * resets), exercising the restart machinery. */
  def encodeGrayDcOnly(w: Int, h: Int, blockVal: Int => Int,
                       restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w % 8 == 0 && h % 8 == 0,
      s"fixture encoder wants 8-aligned dims, got ${w}x$h")
    val bos = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { bos.write(0xff); bos.write(m) }
    def segment(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      bos.write((body.length + 2) >> 8); bos.write((body.length + 2) & 0xff)
      bos.write(body)
    }
    marker(0xd8) // SOI
    // DQT: table 0, all 1s (zigzag order of 1s is 1s)
    segment(0xdb, Array[Byte](0x00) ++ Array.fill(64)(1.toByte))
    // SOF0: 8-bit, h, w, 1 component (id 1, 1x1, qt 0)
    segment(0xc0, Array[Byte](8,
      (h >> 8).toByte, (h & 0xff).toByte,
      (w >> 8).toByte, (w & 0xff).toByte,
      1, 1, 0x11, 0))
    // DHT: DC table 0 + AC table 0
    segment(0xc4,
      (Array(0x00) ++ DcCounts ++ DcSyms).map(_.toByte) ++
        (Array(0x10) ++ AcCounts ++ AcSyms).map(_.toByte))
    if (restartInterval > 0)
      segment(0xdd, Array[Byte](
        (restartInterval >> 8).toByte, (restartInterval & 0xff).toByte))
    // SOS: 1 component, DC/AC table 0, spectral 0..63, no approx
    segment(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    // entropy data: per block, DC diff (4-bit category code + value
    // bits) then the 1-bit EOB
    val bw = new BitWriter(bos)
    val blocks = (w / 8) * (h / 8)
    var pred = 0
    var b = 0
    while (b < blocks) {
      if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
        bw.flush()
        marker(0xd0 + ((b / restartInterval - 1) % 8))
        pred = 0
      }
      val c = blockVal(b)
      require(c >= 0 && c <= 255, s"block value $c out of range")
      val dc = 8 * (c - 128) // DCT DC of a constant block, quant 1
      var diff = dc - pred
      pred = dc
      var t = 0
      var mag = math.abs(diff)
      while (mag > 0) { t += 1; mag >>= 1 }
      require(t <= 11, s"DC category $t out of table")
      bw.put(t, 4) // DC huffman code: canonical 4-bit code == symbol
      if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      bw.put(0, 1) // AC EOB: the table's single canonical 1-bit code is 0
      b += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    bos.toByteArray
  }

  /** Encode a 4:2:2 (luma 2×1, chroma 1×1) YCbCr baseline JPEG with
    * DC-ONLY blocks: luma block b (component RASTER order) is the exact
    * constant `lumaVal(b)`, chroma planes are the constants `cb`/`cr`.
    * All-1s quantization keeps the decode closed-form: any conforming
    * decoder reproduces luma exactly, and a CONSTANT chroma plane is
    * invariant under every upsampling filter (box or triangle), so with
    * cb = cr = 128 the output RGB is (Y, Y, Y) bit-exactly — a DuckDB
    * oracle recomputes all pixel statistics without decoding while the
    * interleaved 2-luma-blocks-per-MCU entropy layout, the half-width
    * chroma geometry and the horizontal chroma upsampling all genuinely
    * run. Emits a JFIF APP0 so independent decoders (ImageIO) treat the
    * stream as YCbCr without Adobe-marker heuristics.
    * `restartInterval` is counted in MCUs and resets all three DC
    * predictors. */
  def encodeColor422DcOnly(w: Int, h: Int, lumaVal: Int => Int,
                           cb: Int = 128, cr: Int = 128,
                           restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w % 16 == 0 && h % 8 == 0,
      s"4:2:2 fixture encoder wants 16x8-aligned dims, got ${w}x$h")
    require(cb >= 0 && cb <= 255 && cr >= 0 && cr <= 255,
      s"chroma constants out of range: $cb/$cr")
    val bos = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { bos.write(0xff); bos.write(m) }
    def segment(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      bos.write((body.length + 2) >> 8); bos.write((body.length + 2) & 0xff)
      bos.write(body)
    }
    marker(0xd8) // SOI
    // JFIF APP0: version 1.1, no density, no thumbnail
    segment(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT: table 0, all 1s
    segment(0xdb, Array[Byte](0x00) ++ Array.fill(64)(1.toByte))
    // SOF0: 8-bit, 3 components — Y id 1 (2x1, qt 0), Cb/Cr id 2/3 (1x1)
    segment(0xc0, Array[Byte](8,
      (h >> 8).toByte, (h & 0xff).toByte,
      (w >> 8).toByte, (w & 0xff).toByte,
      3, 1, 0x21, 0, 2, 0x11, 0, 3, 0x11, 0))
    segment(0xc4,
      (Array(0x00) ++ DcCounts ++ DcSyms).map(_.toByte) ++
        (Array(0x10) ++ AcCounts ++ AcSyms).map(_.toByte))
    if (restartInterval > 0)
      segment(0xdd, Array[Byte](
        (restartInterval >> 8).toByte, (restartInterval & 0xff).toByte))
    // SOS: 3 components, all on DC/AC table 0
    segment(0xda, Array[Byte](3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))
    val bw = new BitWriter(bos)
    def putDc(diff: Int): Unit = {
      var t = 0
      var mag = math.abs(diff)
      while (mag > 0) { t += 1; mag >>= 1 }
      require(t <= 11, s"DC category $t out of table")
      bw.put(t, 4)
      if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      bw.put(0, 1) // EOB
    }
    val lumaBw = w / 8 // luma blocks per row (2 per MCU)
    val mcusX = w / 16; val mcusY = h / 8
    val preds = new Array[Int](3)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush()
        marker(0xd0 + ((mcu / restartInterval - 1) % 8))
        java.util.Arrays.fill(preds, 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      var bx = 0
      while (bx < 2) { // the MCU's two horizontal luma blocks
        val c = lumaVal(my * lumaBw + mx * 2 + bx)
        require(c >= 0 && c <= 255, s"luma value $c out of range")
        val dc = 8 * (c - 128)
        putDc(dc - preds(0)); preds(0) = dc
        bx += 1
      }
      val dcCb = 8 * (cb - 128)
      putDc(dcCb - preds(1)); preds(1) = dcCb
      val dcCr = 8 * (cr - 128)
      putDc(dcCr - preds(2)); preds(2) = dcCr
      mcu += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    bos.toByteArray
  }

  /** Progressive (SOF2) twin of [[encodeGrayDcOnly]]: the SAME
    * closed-form DC-only pixels, delivered as THREE scans so spectral
    * selection AND successive approximation both genuinely run —
    *
    *   1. DC first pass at Al=1 (coefficients arrive arithmetically
    *      shifted, predictor chain in the shifted domain);
    *   2. DC refinement at Ah=1/Al=0 (one RAW bit per block — the
    *      quantization table's DC entry is 8, so the quantized DC is
    *      c-128 and its low bit is genuinely mixed);
    *   3. AC 1..63 first pass (pure per-block EOBs for DC-only content).
    *
    * `restartInterval > 0` emits DRI once and RSTn markers inside EVERY
    * scan (predictor + EOB-run resets). ImageIO reads the output
    * bit-exactly (JpegSpec), proving the scan script is legal T.81
    * Annex G. */
  def encodeGrayDcOnlyProgressive(w: Int, h: Int, blockVal: Int => Int,
                                  restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w % 8 == 0 && h % 8 == 0,
      s"fixture encoder wants 8-aligned dims, got ${w}x$h")
    val bos = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { bos.write(0xff); bos.write(m) }
    def segment(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      bos.write((body.length + 2) >> 8); bos.write((body.length + 2) & 0xff)
      bos.write(body)
    }
    marker(0xd8) // SOI
    // DQT table 0: DC entry 8 (so quantized DC = c - 128, odd-capable
    // for the refinement bit), AC entries 1 (unused by DC-only content)
    segment(0xdb, Array[Byte](0x00, 8) ++ Array.fill(63)(1.toByte))
    // SOF2: 8-bit, 1 component (id 1, 1x1 sampling, qt 0)
    segment(0xc2, Array[Byte](8,
      (h >> 8).toByte, (h & 0xff).toByte,
      (w >> 8).toByte, (w & 0xff).toByte,
      1, 1, 0x11, 0))
    segment(0xc4,
      (Array(0x00) ++ DcCounts ++ DcSyms).map(_.toByte) ++
        (Array(0x10) ++ AcCounts ++ AcSyms).map(_.toByte))
    if (restartInterval > 0)
      segment(0xdd, Array[Byte](
        (restartInterval >> 8).toByte, (restartInterval & 0xff).toByte))
    val blocks = (w / 8) * (h / 8)
    def quantDc(b: Int): Int = {
      val c = blockVal(b)
      require(c >= 0 && c <= 255, s"block value $c out of range")
      c - 128
    }
    def scan(sosBody: Array[Byte])(perBlock: (BitWriter, Int) => Unit): Unit = {
      segment(0xda, sosBody)
      val bw = new BitWriter(bos)
      var rstIdx = 0
      var b = 0
      while (b < blocks) {
        if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
          bw.flush()
          marker(0xd0 + (rstIdx % 8)); rstIdx += 1
        }
        perBlock(bw, b)
        b += 1
      }
      bw.flush()
    }
    // scan 1: DC first, Ss=Se=0, Ah=0, Al=1 — category + value bits of
    // the diff in the (dc >> 1) arithmetic-shift domain
    locally {
      var pred = 0
      scan(Array[Byte](1, 1, 0x00, 0, 0, 0x01)) { (bw, b) =>
        // the scan() helper just emitted an RST at this boundary —
        // mirror its predictor reset
        if (restartInterval > 0 && b > 0 && b % restartInterval == 0)
          pred = 0
        val v1 = quantDc(b) >> 1
        val diff = v1 - pred
        pred = v1
        var t = 0
        var mag = math.abs(diff)
        while (mag > 0) { t += 1; mag >>= 1 }
        require(t <= 11, s"DC category $t out of table")
        bw.put(t, 4)
        if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      }
    }
    // scan 2: DC refinement, Ah=1, Al=0 — one raw bit per block (the
    // low bit of the quantized DC, OR-merged by the decoder)
    scan(Array[Byte](1, 1, 0x00, 0, 0, 0x10)) { (bw, b) =>
      bw.put(quantDc(b) & 1, 1)
    }
    // scan 3: AC 1..63 first pass — every block one EOB (the AC
    // table's single canonical 1-bit code, run length 0)
    scan(Array[Byte](1, 1, 0x00, 1, 63, 0x00)) { (bw, _) =>
      bw.put(0, 1)
    }
    marker(0xd9) // EOI
    bos.toByteArray
  }
}
