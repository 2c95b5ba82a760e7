package graft.grib

import org.scalatest.funsuite.AnyFunSuite

/** JPEG 2000 codestream codec contracts. No independent JPEG2000 codec
  * exists in this offline JVM, so the evidence is (a) lossless round
  * trips over a torture grid of geometries/depths/levels/codeblock
  * sizes, (b) byte-level marker-layout assertions against ISO 15444-1,
  * and (c) named-error corruption contracts for every bounded loop. */
class J2kSpec extends AnyFunSuite {

  /** splitmix64-style avalanche so test fields have no linear structure. */
  private def mix(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def field(w: Int, h: Int, depth: Int, seed: Long): Array[Int] = {
    val mask = (1 << depth) - 1
    Array.tabulate(w * h)(i => (mix(seed * 1315423911L + i) & mask).toInt)
  }

  private def roundTrip(w: Int, h: Int, depth: Int, seed: Long,
                        levels: Int = 5, cblkExp: Int = 6,
                        cbStyle: Int = 0): Unit = {
    val in = field(w, h, depth, seed)
    val bytes = J2K.encode(in, w, h, depth, levels, cblkExp,
      cbStyle = cbStyle)
    val img = J2K.decode(bytes)
    assert(img.width == w && img.height == h && img.depth == depth)
    assert(java.util.Arrays.equals(img.samples, in),
      s"lossless mismatch at ${w}x$h depth=$depth levels=$levels " +
        s"cblk=$cblkExp style=$cbStyle")
  }

  test("VSC context formation: only the NEXT stripe is masked (D.6)") {
    // Hand-derived known vectors from ISO 15444-1 Table D.1 (LL/LH
    // column) and Tables D.2/D.3, independent of the round trip: the
    // encoder and decoder share T1State, so a directional error in the
    // stripe masking round-trips silently — these vectors pin the
    // asymmetry itself.  Stripes are rows [0..3], [4..7]; row 3 closes
    // stripe 0, row 4 opens stripe 1.
    import J2K.{zcCtxProbe, scCtxProbe}
    // previous stripe stays VISIBLE to a stripe-opening center:
    // significant (1,3), center (1,4) -> vv=1 -> ctx 3 (not 0)
    assert(zcCtxProbe(4, 8, 0, vsc = true, Seq((1, 3)), 1, 4) == 3)
    assert(zcCtxProbe(4, 8, 0, vsc = false, Seq((1, 3)), 1, 4) == 3)
    // next stripe is MASKED for a stripe-closing center:
    // significant (1,4), center (1,3) -> vv=0 under VSC -> ctx 0
    assert(zcCtxProbe(4, 8, 0, vsc = true, Seq((1, 4)), 1, 3) == 0)
    assert(zcCtxProbe(4, 8, 0, vsc = false, Seq((1, 4)), 1, 3) == 3)
    // diagonals follow the same rule: NW from the previous stripe is
    // visible (dd=1 -> ctx 1); SW+SE from the next stripe are masked
    assert(zcCtxProbe(4, 8, 0, vsc = true, Seq((0, 3)), 1, 4) == 1)
    assert(zcCtxProbe(4, 8, 0, vsc = true, Seq((0, 4), (2, 4)), 1, 3) == 0)
    assert(zcCtxProbe(4, 8, 0, vsc = false, Seq((0, 4), (2, 4)), 1, 3) == 2)
    // interior stripe rows are unaffected by VSC
    assert(zcCtxProbe(4, 8, 0, vsc = true, Seq((1, 1)), 1, 2) == 3)
    // sign context: a negative sample ABOVE in the previous stripe
    // contributes vc=-1 -> ctx 10 with xor bit set (Table D.3)
    assert(scCtxProbe(4, 8, 0, vsc = true, Seq((1, 3, true)), 1, 4)
      == (10 | (1 << 8)))
    // a positive sample BELOW in the next stripe is masked at the
    // stripe-closing row -> vc=0 -> ctx 9
    assert(scCtxProbe(4, 8, 0, vsc = true, Seq((1, 4, false)), 1, 3) == 9)
    assert(scCtxProbe(4, 8, 0, vsc = false, Seq((1, 4, false)), 1, 3) == 10)
  }

  test("VSC codestream bytes are pinned (regression fence for the masking fix)") {
    // A fixed field whose significance pattern crosses stripe
    // boundaries in both directions; under the OLD (both-ways) masking
    // the MQ context sequence differs, so these bytes change. Pinned
    // from the fixed encoder (r13) — the contexts themselves are
    // pinned against hand-derived ISO vectors in the test above.
    val in = field(16, 16, 10, 99L)
    val bytes = J2K.encode(in, 16, 16, 10, levels = 2, cblkExp = 4,
      cbStyle = 0x08)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    assert(java.util.Arrays.equals(J2K.decode(bytes).samples, in))
    assert(hex ==
      "bc109324b280c29ae8a04719f312315222ae6e42fa26cef657205ea318f2c8a8",
      s"VSC codestream drifted: $hex")
  }

  test("lossless round trip across a torture grid of geometries") {
    // odd/even/prime sizes, 1-pixel edges, multi-codeblock bands
    for ((w, h) <- Seq((1, 1), (1, 7), (8, 1), (2, 2), (3, 5), (17, 13),
      (64, 64), (65, 33), (97, 41), (130, 3)))
      roundTrip(w, h, depth = 8, seed = w * 1000L + h)
  }

  test("lossless round trip across sample depths 1..16 and 24") {
    for (d <- (1 to 16) ++ Seq(24))
      roundTrip(37, 29, d, seed = 7L * d)
  }

  test("lossless round trip across decomposition levels 0..8") {
    for (l <- 0 to 8)
      roundTrip(50, 40, depth = 10, seed = 99L + l, levels = l)
  }

  test("lossless round trip across codeblock sizes 4..64") {
    for (e <- 2 to 6)
      roundTrip(70, 55, depth = 12, seed = 5L * e, cblkExp = e)
  }

  test("degenerate fields: constant, all-zero, single spike") {
    for (v <- Seq(0, 1, 200, 255)) {
      val in = Array.fill(33 * 21)(v)
      val out = J2K.decode(J2K.encode(in, 33, 21, 8))
      assert(java.util.Arrays.equals(out.samples, in), s"constant $v")
    }
    val spike = Array.fill(64 * 64)(0)
    spike(64 * 17 + 42) = 4095
    val out = J2K.decode(J2K.encode(spike, 64, 64, 12))
    assert(java.util.Arrays.equals(out.samples, spike))
  }

  test("a large structured+noisy field survives (the ECMWF-like shape)") {
    val (w, h) = (360, 181) // a 1-degree global grid
    val in = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      // smooth synoptic structure + avalanche noise, 14-bit range
      val smooth = (6000 + 4000 * math.sin(x * 0.05) * math.cos(y * 0.08)).toInt
      val noise = (mix(i * 31L) & 0x3FF).toInt
      math.min((1 << 14) - 1, math.max(0, smooth + noise))
    }
    val bytes = J2K.encode(in, w, h, 14)
    val img = J2K.decode(bytes)
    assert(java.util.Arrays.equals(img.samples, in))
    info(s"360x181 @14bit: ${bytes.length} bytes " +
      s"(${"%.2f".format(bytes.length * 8.0 / (w * h))} bits/sample)")
  }

  test("marker layout is the spec's: SOC, SIZ geometry, COD, QCD, SOT, EOC") {
    val bytes = J2K.encode(field(19, 11, 8, 3L), 19, 11, 8, levels = 3)
    def u16(o: Int) = ((bytes(o) & 0xFF) << 8) | (bytes(o + 1) & 0xFF)
    def u32(o: Int) = (u16(o).toLong << 16) | u16(o + 2)
    assert(u16(0) == 0xFF4F, "SOC")
    assert(u16(2) == 0xFF51 && u16(4) == 41, "SIZ with one component")
    assert(u32(8) == 19 && u32(12) == 11, "Xsiz/Ysiz")
    assert(u32(24) == 19 && u32(28) == 11, "single tile covers the image")
    assert(u16(40) == 1 && (bytes(42) & 0xFF) == 7, "Csiz=1, Ssiz=depth-1")
    assert(u16(45) == 0xFF52 && (bytes(49) & 0xFF) == 0, "COD, Scod=0")
    assert((bytes(54) & 0xFF) == 3, "decomposition levels")
    assert((bytes(58) & 0xFF) == 1, "5/3 reversible transform")
    assert(u16(59) == 0xFF5C, "QCD")
    assert(u16(61) == 3 + 3 * 3 + 1, "Lqcd: one exponent per band")
    assert(u16(bytes.length - 2) == 0xFFD9, "EOC")
  }

  test("corruption and unsupported variants fail by name") {
    val good = J2K.encode(field(33, 17, 8, 11L), 33, 17, 8)
    def failsWith(mut: Array[Byte] => Unit, needle: String): Unit = {
      val b = good.clone(); mut(b)
      val e = intercept[RuntimeException](J2K.decode(b))
      assert((e.isInstanceOf[IllegalArgumentException] ||
        e.isInstanceOf[UnsupportedOperationException]) &&
        e.getMessage.contains(needle),
        s"wanted '$needle', got ${e.getClass.getSimpleName}: ${e.getMessage}")
    }
    // not a codestream at all
    intercept[IllegalArgumentException](J2K.decode("nope".getBytes))
    // truncation mid-markers
    intercept[IllegalArgumentException](
      J2K.decode(java.util.Arrays.copyOfRange(good, 0, 30)))
    failsWith(b => b(43) = 9.toByte, "subsampling") // XRsiz != 1
    failsWith(b => b(42) = 0x87.toByte, "signed") // Ssiz sign bit
    failsWith(b => b(41) = 2.toByte, "components") // Csiz = 2
    failsWith(b => b(49) = 1.toByte, "precinct") // Scod bit 0
    failsWith(b => b(52) = 2.toByte, "layers") // layers = 2 (low byte)
    failsWith(b => b(58) = 0.toByte, "irreversible") // transform = 9/7
    failsWith(b => b(57) = 0x40.toByte, "codeblock style") // reserved bit
    // QCD: quantization style != 0 (Sqcd at QCD+4 = offset 63)
    failsWith(b => b(63) = (b(63) | 0x02).toByte, "quantization")
    // huge image dims → bounds error before allocation
    failsWith(b => { b(8) = 0x7F.toByte }, "bounds") // Xsiz ~2^31
    // JP2 signature box
    val jp2 = Array[Byte](0, 0, 0, 12, 0x6A, 0x50, 0x20, 0x20,
      0x0D, 0x0A, 0x87.toByte, 0x0A) ++ good
    val e = intercept[UnsupportedOperationException](J2K.decode(jp2))
    assert(e.getMessage.contains("JP2"))
  }

  test("codeblock style options round-trip: bypass/reset/termall/vsc/segsym") {
    // each style alone, then the jasper/Kakadu-common combinations and
    // the full mask — deep fields (depth 14-16) force 5+ bitplanes so
    // BYPASS actually enters its raw regime (k > 10), and 8x8
    // codeblocks multiply the segment count
    val styles = Seq(0x01, 0x02, 0x04, 0x08, 0x20,
      0x01 | 0x04, 0x01 | 0x02, 0x08 | 0x20, 0x01 | 0x20,
      0x01 | 0x02 | 0x04 | 0x08 | 0x20)
    for (st <- styles) {
      roundTrip(37, 29, depth = 16, seed = 31L * st, cbStyle = st)
      roundTrip(65, 33, depth = 14, seed = 77L + st, cblkExp = 3,
        cbStyle = st)
      roundTrip(17, 13, depth = 8, seed = 131L * st, cbStyle = st)
    }
    // degenerate geometries under the full mask
    for ((w, h) <- Seq((1, 1), (1, 7), (8, 1), (130, 3)))
      roundTrip(w, h, depth = 12, seed = w * 31L + h, cbStyle = 0x3F)
    // a corrupted SEGMENTATION SYMBOL is detected by name: flip a late
    // payload byte until the symbol check (not a pixel diff) fires —
    // the style's whole point is turning silent corruption into a
    // named error
    val in = field(33, 17, 14, 57L)
    val good = J2K.encode(in, 33, 17, 14, cbStyle = 0x20)
    var caught = 0
    for (pos <- good.length - 40 until good.length - 2) {
      val b = good.clone()
      b(pos) = (b(pos) ^ 0x55).toByte
      try J2K.decode(b)
      catch {
        case e: IllegalArgumentException
          if e.getMessage.contains("segmentation symbol") => caught += 1
        case _: RuntimeException => // other named failures are fine too
      }
    }
    assert(caught > 0, "no corruption tripped the segmentation symbol")
  }

  test("flipping payload bits never crashes: named error or wrong pixels") {
    flipSweep(J2K.encode(field(40, 30, 10, 21L), 40, 30, 10))
    // the styled stream shares the no-crash contract: segment lengths,
    // raw stuffing and the segsym check are all new corruption surface
    flipSweep(J2K.encode(field(40, 30, 14, 23L), 40, 30, 14,
      cbStyle = 0x3F))
  }

  private def flipSweep(good: Array[Byte]): Unit = {
    // find SOD, flip bytes after it at several offsets
    var sod = -1
    var i = 0
    while (sod < 0 && i + 1 < good.length) {
      if ((good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0x93) sod = i
      i += 1
    }
    assert(sod > 0)
    var named = 0
    var silent = 0
    for (off <- sod + 2 until math.min(sod + 60, good.length - 2);
         flip <- Seq(0x01, 0x80, 0xFF)) {
      val b = good.clone()
      b(off) = (b(off) ^ flip).toByte
      try {
        val img = J2K.decode(b)
        // decoded without error: must still be shape-correct
        assert(img.width == 40 && img.height == 30)
        silent += 1
      } catch {
        case _: IllegalArgumentException | _: UnsupportedOperationException =>
          named += 1
      }
    }
    info(s"payload sweep: $named named errors, $silent silent decodes")
    assert(named + silent > 0)
  }
}
