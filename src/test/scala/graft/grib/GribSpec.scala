package graft.grib

import org.scalatest.funsuite.AnyFunSuite
import graft.kerchunk.RefSet
import graft.zarr.ZarrGroup
import java.nio.file.{Files, Paths}

/** GRIB2 codec verified against the reference's own binary fixture
  * (tests/data/CMC_reg_DEPR_ISBL_10_ps10km_2022072000_P000.grib2, the file
  * tests/test_end_to_end.py:219-262 exercises) plus synthetic simple-packing
  * messages produced by our writer. */
class GribSpec extends AnyFunSuite {

  private val fixture =
    "/root/reference/tests/data/CMC_reg_DEPR_ISBL_10_ps10km_2022072000_P000.grib2"
  private def fixtureExists: Boolean = Files.exists(Paths.get(fixture))

  test("scan of the reference CMC fixture: sections, grid, packing") {
    assume(fixtureExists)
    val msgs = Grib2.scan(fixture)
    assert(msgs.length == 1)
    val m = msgs.head
    assert(m.discipline == 0)
    assert(Grib2.centreName(m.centre) == "cwao") // the reference's assertion
    assert(m.shortName == "DEPR") // dew-point depression (0,0,7)
    assert(m.grid.template == 20 && m.grid.nx == 935 && m.grid.ny == 824)
    assert(m.grid.laD == 60.0 && m.grid.loV == 249.0)
    assert(m.grid.dx == 10000.0 && m.grid.dy == 10000.0)
    assert(m.packing.template == 40 && m.packing.nbits == 0)
    assert(m.packing.nValues == 750157)
    assert(m.bitmapIndicator == 0)
    assert(m.product.surfaceType == 100 && m.product.surfaceValue == 1000.0)
    assert(m.refTimeEpochSec == 1658275200L) // 2022-07-20T00Z
  }

  test("decode of the constant field honors the bitmap") {
    assume(fixtureExists)
    val m = Grib2.scan(fixture).head
    val vals = Grib2.decodeValues(fixture, m)
    assert(vals.length == 935 * 824)
    val valid = vals.filterNot(_.isNaN)
    assert(valid.length == 750157)
    assert(valid.forall(_ == 30.0))
  }

  test("polar stereographic inverse reproduces the encoded first point and spacing") {
    assume(fixtureExists)
    val g = Grib2.scan(fixture).head.grid
    val (lats, lons) = Grib2.latLonArrays(g)
    // anchor: grid point (0,0) must be exactly the encoded La1/Lo1
    assert(math.abs(lats(0) - 18.145030) < 1e-6, lats(0))
    assert(math.abs(lons(0) - 217.107456) < 1e-6, lons(0))
    assert(lats.forall(l => l > -90 && l <= 90))
    // independent check of the projection math: adjacent grid points near
    // the true-scale latitude (LaD=60) must be ~Dx apart on the sphere
    val idx = lats.indices.filter(i =>
      math.abs(lats(i) - 60.0) < 0.01 && (i % g.nx) < g.nx - 1)
    assert(idx.nonEmpty)
    val i = idx.head
    val d = haversine(lats(i), lons(i), lats(i + 1), lons(i + 1), g.radius)
    assert(math.abs(d - 10000.0) < 100.0, s"spacing $d at LaD not ~10km")
  }

  private def haversine(la1: Double, lo1: Double, la2: Double, lo2: Double,
                        r: Double): Double = {
    val p1 = math.toRadians(la1); val p2 = math.toRadians(la2)
    val dp = p2 - p1; val dl = math.toRadians(lo2 - lo1)
    val a = math.sin(dp / 2) * math.sin(dp / 2) +
      math.cos(p1) * math.cos(p2) * math.sin(dl / 2) * math.sin(dl / 2)
    2 * r * math.asin(math.sqrt(a))
  }

  test("entry-point A: Grib2.read yields the cfgrib-shaped fragment") {
    assume(fixtureExists)
    val f = Grib2.read(fixture)
    assert(f.dims == Map("y" -> 824, "x" -> 935))
    assert(f.attrs("GRIB_centre") == graft.core.AttrValue("cwao"))
    assert(f.coords.keySet == Set("latitude", "longitude"))
    val v = f.dataVars("DEPR")
    assert(v.dims == Vector("y", "x"))
    val data = v.data.data.asInstanceOf[Array[Double]]
    assert(data.count(!_.isNaN) == 750157)
  }

  test("simple packing round-trips through writer and decoder") {
    val dir = Files.createTempDirectory("graft_grib").toString
    val nx = 12; val ny = 7
    val rng = new scala.util.Random(11)
    val values = Array.tabulate(nx * ny) { i =>
      if (i % 9 == 3) Double.NaN else math.rint(rng.nextDouble() * 5000) / 100.0
    }
    val path = s"$dir/synthetic.grib2"
    Grib2.writeSimple(path, values, nx, ny, la1 = 40.0, lo1 = 250.0,
      dLat = 0.5, dLon = 0.5, discipline = 0, category = 0, number = 0,
      refTimeEpochSec = 1700000000L, nbits = 12, decimalScale = 2)
    val m = Grib2.scan(path).head
    assert(m.packing.template == 0 && m.packing.nbits == 12)
    assert(m.shortName == "TMP")
    val got = Grib2.decodeValues(path, m)
    assert(got.length == values.length)
    // quantization step: one packed unit = 2^E decimal-scaled units
    val tol = 0.5 * math.pow(2, m.packing.binaryScale) /
      math.pow(10, m.packing.decimalScale) + 1e-9
    values.indices.foreach { i =>
      if (values(i).isNaN) assert(got(i).isNaN, s"point $i not masked")
      else assert(math.abs(got(i) - values(i)) <= tol,
        s"point $i: ${got(i)} vs ${values(i)} (tol $tol)")
    }
    // lat-lon raster coordinates
    val (lats, lons) = Grib2.latLonArrays(m.grid)
    assert(lats(0) == 40.0 && lons(0) == 250.0)
    assert(math.abs(lats((ny - 1) * nx) - (40.0 + 0.5 * (ny - 1))) < 1e-9)
  }

  test("complex packing (5.2) and spatial differencing (5.3) round-trip") {
    val dir = Files.createTempDirectory("graft_grib_cx").toString
    val nx = 25; val ny = 8
    val rng = new scala.util.Random(41)
    // smooth field (the case complex packing exists for) + rough noise
    val values = Array.tabulate(nx * ny) { i =>
      val x = i % nx; val y = i / nx
      math.rint((math.sin(x * 0.3) * 40 + y * 7 + rng.nextDouble()) * 100) / 100.0
    }
    Seq(0, 1, 2).foreach { order =>
      val path = s"$dir/cx_$order.grib2"
      Grib2.writeComplex(path, values, nx, ny, la1 = 30.0, lo1 = 10.0,
        dLat = 0.5, dLon = 0.5, discipline = 0, category = 0, number = 0,
        refTimeEpochSec = 1700000000L, order = order, groupSize = 17)
      val m = Grib2.scan(path).head
      assert(m.packing.template == (if (order == 0) 2 else 3), s"order $order")
      assert(m.packing.complex.get.spatialOrder == order)
      val got = Grib2.decodeValues(path, m)
      values.indices.foreach { i =>
        assert(math.abs(got(i) - values(i)) < 0.005 + 1e-9,
          s"order $order point $i: ${got(i)} vs ${values(i)}")
      }
    }
  }

  test("gaussian grid (3.40, the ERA5/IFS native layout) scans with exact quadrature latitudes") {
    // the 4-point Gauss–Legendre nodes are textbook constants: the
    // latitude generator must reproduce them to machine precision
    val g4 = Grib2.gaussianLatitudes(4)
    val nodes = Seq(0.8611363115940526, 0.3399810435848563)
    assert(math.abs(g4(0) - math.toDegrees(math.asin(nodes(0)))) < 1e-12)
    assert(math.abs(g4(1) - math.toDegrees(math.asin(nodes(1)))) < 1e-12)
    assert(g4(2) == -g4(1) && g4(3) == -g4(0), "node symmetry")
    // independent BigDecimal Legendre evaluation at every returned root
    // of a larger grid: |P_n(sin lat)| must vanish, order must descend
    val n = 64
    val lats = Grib2.gaussianLatitudes(n)
    assert(lats.length == n && lats.sliding(2).forall(p => p(0) > p(1)))
    val mc = new java.math.MathContext(50)
    def legendre(x: java.math.BigDecimal): java.math.BigDecimal = {
      var p0 = java.math.BigDecimal.ONE
      var p1 = x
      var m = 2
      while (m <= n) {
        val a = x.multiply(p1, mc)
          .multiply(new java.math.BigDecimal(2 * m - 1), mc)
        val b = p0.multiply(new java.math.BigDecimal(m - 1), mc)
        val p2 = a.subtract(b, mc)
          .divide(new java.math.BigDecimal(m), mc)
        p0 = p1; p1 = p2
        m += 1
      }
      p1
    }
    lats.take(n / 2).foreach { lat =>
      val x = new java.math.BigDecimal(math.sin(math.toRadians(lat)), mc)
      assert(legendre(x).abs.doubleValue < 1e-13,
        s"P_$n residual at latitude $lat: ${legendre(x)}")
    }

    // write → scan round trip on a full N=8 global grid (16 rows)
    val dir = Files.createTempDirectory("graft_grib_gau").toString
    val nx = 24; val gaussN = 8; val ny = 2 * gaussN
    val rng = new scala.util.Random(71)
    val values = Array.tabulate(nx * ny)(i =>
      math.rint((250 + math.cos(i * 0.17) * 20 + rng.nextDouble()) * 100) / 100.0)
    val path = s"$dir/gau.grib2"
    Grib2.writeGaussian(path, values, nx, ny, lo1 = 0.0, dLon = 15.0,
      gaussN = gaussN, discipline = 0, category = 0, number = 0,
      refTimeEpochSec = 1700000000L)
    val m = Grib2.scan(path).head
    assert(m.grid.template == 40 && m.grid.gaussN == gaussN)
    val got = Grib2.decodeValues(path, m)
    val tol = 0.5 * math.pow(2, m.packing.binaryScale) /
      math.pow(10, m.packing.decimalScale) + 1e-9
    values.indices.foreach(i =>
      assert(math.abs(got(i) - values(i)) <= tol, s"point $i"))
    val (glats, glons) = Grib2.latLonArrays(m.grid)
    val want = Grib2.gaussianLatitudes(2 * gaussN)
    (0 until ny).foreach { j =>
      assert(math.abs(glats(j * nx) - want(j)) < 1e-9,
        s"row $j latitude ${glats(j * nx)} != ${want(j)}")
    }
    assert(math.abs(glons(1) - 15.0) < 1e-9)
    // the Fragment surface carries the Gaussian latitudes too
    val frag = Grib2.read(path)
    assert(frag.dims == Map("y" -> ny, "x" -> nx))
    assert(math.abs(frag.coords("latitude").data.getDouble(0) - want(0)) < 1e-9)

    // consecutive SUBSET (a northern-hemisphere slab at rowOffset 2)
    val path2 = s"$dir/gau_sub.grib2"
    val sub = values.slice(2 * nx, 8 * nx)
    Grib2.writeGaussian(path2, sub, nx, 6, lo1 = 0.0, dLon = 15.0,
      gaussN = gaussN, discipline = 0, category = 0, number = 0,
      refTimeEpochSec = 1700000000L, rowOffset = 2)
    val m2 = Grib2.scan(path2).head
    val (slats, _) = Grib2.latLonArrays(m2.grid)
    (0 until 6).foreach(j =>
      assert(math.abs(slats(j * nx) - want(j + 2)) < 1e-9, s"subset row $j"))

    // a first latitude OFF the Gaussian set fails by name (corrupt La1)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    // find section 3 (it follows section 1: 16 bytes at offset 16+5)
    val s3at = 16 + 21
    assert(bytes(s3at + 4) == 3, "section 3 not where expected")
    // parseGrid offsets count from the section START (la1 at idx 46);
    // flip a mid-weight bit so la1 moves ~0.004 deg — past the 1e-3
    // Gaussian-latitude tolerance but still a plausible value
    val la1Off = s3at + 46
    bytes(la1Off + 2) = (bytes(la1Off + 2) ^ 0x10).toByte
    val path3 = s"$dir/gau_bad.grib2"
    Files.write(java.nio.file.Paths.get(path3), bytes)
    val e = intercept[IllegalArgumentException](Grib2.read(path3))
    assert(e.getMessage.contains("not a Gaussian"), e.getMessage)
  }

  test("lambert conformal grid (3.30, the HRRR projection) scans and inverse-projects") {
    val dir = Files.createTempDirectory("graft_grib_lcc").toString
    val nx = 40; val ny = 30
    val rng = new scala.util.Random(53)
    val values = Array.tabulate(nx * ny)(i =>
      math.rint((270 + math.sin(i * 0.21) * 15 + rng.nextDouble()) * 100) / 100.0)
    // HRRR-like parameters, grid anchored just south of the tangent
    // parallel so rows cross it
    val path = s"$dir/lcc.grib2"
    Grib2.writeLambert(path, values, nx, ny,
      la1 = 38.3, lo1 = 262.0, laD = 38.5, loV = 262.5,
      latin1 = 38.5, latin2 = 38.5, dx = 3000.0, dy = 3000.0,
      discipline = 0, category = 0, number = 0,
      refTimeEpochSec = 1700000000L)
    val m = Grib2.scan(path).head
    assert(m.grid.template == 30)
    assert(m.grid.latin1 == 38.5 && m.grid.latin2 == 38.5)
    assert(m.grid.dx == 3000.0 && m.grid.dy == 3000.0)
    // packing is grid-independent: values round-trip
    val got = Grib2.decodeValues(path, m)
    val tol = 0.5 * math.pow(2, m.packing.binaryScale) /
      math.pow(10, m.packing.decimalScale) + 1e-9
    values.indices.foreach(i =>
      assert(math.abs(got(i) - values(i)) <= tol, s"point $i"))
    // inverse projection: grid point (0,0) is exactly the encoded first
    // point, and adjacent points on the true-scale parallel are ~Dx apart
    val (lats, lons) = Grib2.latLonArrays(m.grid)
    assert(math.abs(lats(0) - 38.3) < 1e-6, lats(0))
    assert(math.abs(lons(0) - 262.0) < 1e-6, lons(0))
    assert(lats.forall(l => l > 0 && l < 90))
    // rows step ~0.027 deg; tangent-cone distortion at 0.02 deg off the
    // parallel is second-order (~1e-7), far inside the 30 m tolerance
    val idx = lats.indices.filter(i =>
      math.abs(lats(i) - 38.5) < 0.02 && (i % nx) < nx - 1)
    assert(idx.nonEmpty, "no grid row crosses the standard parallel")
    val i = idx.head
    val d = haversine(lats(i), lons(i), lats(i + 1), lons(i + 1), m.grid.radius)
    assert(math.abs(d - 3000.0) < 30.0, s"spacing $d at latin1 not ~3km")
    // away from the standard parallel the scale factor grows: spacing on
    // the first row (38.3) must still be within 1% of Dx on this span
    val d0 = haversine(lats(0), lons(0), lats(1), lons(1), m.grid.radius)
    assert(math.abs(d0 - 3000.0) < 30.0, s"row-0 spacing $d0")
  }

  test("complex packing on a lambert grid decodes (the real HRRR combination)") {
    import java.nio.{ByteBuffer, ByteOrder}
    val dir = Files.createTempDirectory("graft_grib_lcc_cx").toString
    val nx = 25; val ny = 12
    val rng = new scala.util.Random(59)
    val values = Array.tabulate(nx * ny) { i =>
      val x = i % nx; val y = i / nx
      math.rint((math.cos(x * 0.4) * 30 + y * 5 + rng.nextDouble()) * 100) / 100.0
    }
    val cx = s"$dir/cx.grib2"; val lcc = s"$dir/lcc.grib2"
    Grib2.writeComplex(cx, values, nx, ny, 30.0, 10.0, 1.0, 1.0,
      0, 0, 0, refTimeEpochSec = 1700000000L, order = 2)
    Grib2.writeLambert(lcc, values, nx, ny,
      la1 = 38.3, lo1 = 262.0, laD = 38.5, loV = 262.5,
      latin1 = 38.5, latin2 = 38.5, dx = 3000.0, dy = 3000.0,
      discipline = 0, category = 0, number = 0,
      refTimeEpochSec = 1700000000L)
    // splice the lambert section 3 into the complex-packed message
    def sections(bytes: Array[Byte]): Vector[(Int, Int, Int)] = {
      var p = 16; val out = Vector.newBuilder[(Int, Int, Int)]
      while (p < bytes.length - 4) {
        val len = ByteBuffer.wrap(bytes, p, 4).order(ByteOrder.BIG_ENDIAN).getInt
        out += ((bytes(p + 4) & 0xFF, p, len)); p += len
      }
      out.result()
    }
    val ca = Files.readAllBytes(Paths.get(cx))
    val cb = Files.readAllBytes(Paths.get(lcc))
    val (_, aOff, aLen) = sections(ca).find(_._1 == 3).get
    val (_, bOff, bLen) = sections(cb).find(_._1 == 3).get
    val out = new java.io.ByteArrayOutputStream()
    out.write(ca, 0, aOff)
    out.write(cb, bOff, bLen)
    out.write(ca, aOff + aLen, ca.length - aOff - aLen)
    val merged = out.toByteArray
    ByteBuffer.wrap(merged).order(ByteOrder.BIG_ENDIAN)
      .putLong(8, ca.length.toLong - aLen + bLen)
    val hybrid = s"$dir/hybrid.grib2"
    Files.write(Paths.get(hybrid), merged)
    val m = Grib2.scan(hybrid).head
    assert(m.grid.template == 30 && m.packing.template == 3)
    val got = Grib2.decodeValues(hybrid, m)
    values.indices.foreach(i =>
      assert(math.abs(got(i) - values(i)) < 0.005 + 1e-9, s"cell $i"))
    val (lats, lons) = Grib2.latLonArrays(m.grid)
    assert(math.abs(lats(0) - 38.3) < 1e-6 && math.abs(lons(0) - 262.0) < 1e-6)
  }

  test("png packing (5.41) round-trips at every sample depth") {
    val dir = Files.createTempDirectory("graft_grib_png").toString
    val nx = 23; val ny = 9
    val rng = new scala.util.Random(47)
    // span targets per depth: 8-bit (<2.56 units), 16-bit, 24-bit, 32-bit
    Seq(8 -> 2.0, 16 -> 500.0, 24 -> 90000.0, 32 -> 2.0e7).foreach {
      case (depth, span) =>
        val values = Array.tabulate(nx * ny)(i =>
          math.rint(rng.nextDouble() * span * 100) / 100.0)
        values(0) = 0.0 // anchor the minimum: R stays float32-exact
        val path = s"$dir/png_$depth.grib2"
        Grib2.writePng(path, values, nx, ny, la1 = 35.0, lo1 = 15.0,
          dLat = 0.5, dLon = 0.5, discipline = 0, category = 0, number = 0,
          refTimeEpochSec = 1700000000L)
        val m = Grib2.scan(path).head
        assert(m.packing.template == 41, s"depth $depth")
        assert(m.packing.nbits == depth, s"depth $depth: ${m.packing.nbits}")
        val got = Grib2.decodeValues(path, m)
        // binary scale 0 + decimal quantization: exact to the cent
        values.indices.foreach(i => assert(math.abs(got(i) - values(i)) < 1e-9,
          s"depth $depth point $i: ${got(i)} vs ${values(i)}"))
    }
    // kerchunk refs stay header-only on scan and decode via the grib codec
    val values = Array.tabulate(nx * ny)(i => math.rint(i * 37.3) / 10.0)
    val path = s"$dir/png_refs.grib2"
    Grib2.writePng(path, values, nx, ny, 35.0, 15.0, 0.5, 0.5,
      0, 0, 0, refTimeEpochSec = 1700000000L, decimalScale = 1)
    val virt = s"$dir/virt.zarr"
    RefSet.scanGrib2(path).head.materialize(virt)
    val got = ZarrGroup(virt).readFragment()
      .allVars("TMP").data.data.asInstanceOf[Array[Double]]
    values.indices.foreach(i =>
      assert(math.abs(got(i) - values(i)) < 1e-9, s"refs cell $i"))
  }

  test("jpeg2000 packing (5.40) round-trips non-constant fields") {
    val dir = Files.createTempDirectory("graft_grib_j2k").toString
    val nx = 23; val ny = 9
    val rng = new scala.util.Random(53)
    // spans chosen to land on 8-, 14- and 21-bit JPC depths
    Seq(2.0, 120.0, 17000.0).foreach { span =>
      val values = Array.tabulate(nx * ny)(i =>
        math.rint(rng.nextDouble() * span * 100) / 100.0)
      values(0) = 0.0 // anchor the minimum: R stays float32-exact
      val path = s"$dir/j2k_$span.grib2"
      Grib2.writeJpeg2000(path, values, nx, ny, la1 = 35.0, lo1 = 15.0,
        dLat = 0.5, dLon = 0.5, discipline = 0, category = 0, number = 0,
        refTimeEpochSec = 1700000000L, cblkExp = 3) // 8x8: many codeblocks
      val m = Grib2.scan(path).head
      assert(m.packing.template == 40, s"span $span")
      assert(m.packing.nbits > 0, "non-constant: real codestream depth")
      // section 7 must BE a JPC codestream (SOC marker), not raw bits
      val bytes = Files.readAllBytes(Paths.get(path))
      val soc = bytes.sliding(2).indexWhere(s =>
        (s(0) & 0xFF) == 0xFF && (s(1) & 0xFF) == 0x4F)
      assert(soc > 0, "no SOC marker in the message")
      val got = Grib2.decodeValues(path, m)
      values.indices.foreach(i => assert(math.abs(got(i) - values(i)) < 1e-9,
        s"span $span point $i: ${got(i)} vs ${values(i)}"))
    }
    // bitmap: NaN holes pack only the defined points (ndpts x 1 image)
    val holed = Array.tabulate(nx * ny)(i =>
      if (i % 7 == 3) Double.NaN else math.rint(i * 31.7) / 10.0)
    val hp = s"$dir/j2k_holes.grib2"
    Grib2.writeJpeg2000(hp, holed, nx, ny, 35.0, 15.0, 0.5, 0.5,
      0, 0, 0, refTimeEpochSec = 1700000000L, decimalScale = 1)
    val hm = Grib2.scan(hp).head
    assert(hm.bitmapIndicator == 0 && hm.packing.nValues < nx * ny)
    val hGot = Grib2.decodeValues(hp, hm)
    holed.indices.foreach { i =>
      if (holed(i).isNaN) assert(hGot(i).isNaN, s"hole $i")
      else assert(math.abs(hGot(i) - holed(i)) < 1e-9, s"cell $i")
    }
    // kerchunk refs stay header-only on scan and decode via the J2K codec
    val values = Array.tabulate(nx * ny)(i => math.rint(i * 37.3) / 10.0)
    val path = s"$dir/j2k_refs.grib2"
    Grib2.writeJpeg2000(path, values, nx, ny, 35.0, 15.0, 0.5, 0.5,
      0, 0, 0, refTimeEpochSec = 1700000000L, decimalScale = 1)
    val virt = s"$dir/virt.zarr"
    RefSet.scanGrib2(path).head.materialize(virt)
    val got = ZarrGroup(virt).readFragment()
      .allVars("TMP").data.data.asInstanceOf[Array[Double]]
    values.indices.foreach(i =>
      assert(math.abs(got(i) - values(i)) < 1e-9, s"refs cell $i"))
  }

  test("ccsds packing (5.42) round-trips at 1/2/4-byte sample depths") {
    val dir = Files.createTempDirectory("graft_grib_ccsds").toString
    val nx = 23; val ny = 9
    val rng = new scala.util.Random(59)
    // spans landing on 8-, 14- and 21-bit offsets: 1-, 2- and 4-byte
    // AEC sample containers
    Seq(2.0, 120.0, 17000.0).foreach { span =>
      val values = Array.tabulate(nx * ny)(i =>
        math.rint(rng.nextDouble() * span * 100) / 100.0)
      values(0) = 0.0
      val path = s"$dir/ccsds_$span.grib2"
      Grib2.writeCcsds(path, values, nx, ny, la1 = 35.0, lo1 = 15.0,
        dLat = 0.5, dLon = 0.5, discipline = 0, category = 0, number = 0,
        refTimeEpochSec = 1700000000L)
      val m = Grib2.scan(path).head
      assert(m.packing.template == 42, s"span $span")
      val c = m.packing.ccsds.get
      assert(c.blockSize == 32 && c.rsi == 128 && (c.flags & 8) != 0)
      val got = Grib2.decodeValues(path, m)
      values.indices.foreach(i => assert(math.abs(got(i) - values(i)) < 1e-9,
        s"span $span point $i: ${got(i)} vs ${values(i)}"))
    }
    // bitmap: NaN holes pack only the defined points
    val holed = Array.tabulate(nx * ny)(i =>
      if (i % 7 == 3) Double.NaN else math.rint(i * 31.7) / 10.0)
    val hp = s"$dir/ccsds_holes.grib2"
    Grib2.writeCcsds(hp, holed, nx, ny, 35.0, 15.0, 0.5, 0.5,
      0, 0, 0, refTimeEpochSec = 1700000000L, decimalScale = 1)
    val hm = Grib2.scan(hp).head
    assert(hm.bitmapIndicator == 0 && hm.packing.nValues < nx * ny)
    val hGot = Grib2.decodeValues(hp, hm)
    holed.indices.foreach { i =>
      if (holed(i).isNaN) assert(hGot(i).isNaN, s"hole $i")
      else assert(math.abs(hGot(i) - holed(i)) < 1e-9, s"cell $i")
    }
    // kerchunk refs stay header-only on scan and decode via the shared
    // CCSDS codec (the 5.40 parity leg)
    locally {
      val values = Array.tabulate(nx * ny)(i => math.rint(i * 37.3) / 10.0)
      val path = s"$dir/ccsds_refs.grib2"
      Grib2.writeCcsds(path, values, nx, ny, 35.0, 15.0, 0.5, 0.5,
        0, 0, 0, refTimeEpochSec = 1700000000L, decimalScale = 1)
      val virt = s"$dir/virt_ccsds.zarr"
      RefSet.scanGrib2(path).head.materialize(virt)
      val got = ZarrGroup(virt).readFragment()
        .allVars("TMP").data.data.asInstanceOf[Array[Double]]
      values.indices.foreach(i =>
        assert(math.abs(got(i) - values(i)) < 1e-9, s"refs cell $i"))
    }
    // unsupported libaec modes fail by NAME: patch the flags octet
    // (section 5 octet 22) to signed / 3-byte / restricted
    val clean = s"$dir/ccsds_2.0.grib2"
    val orig = Files.readAllBytes(Paths.get(clean))
    // find section 5: length(4) + number 5, template 42 at octets 10-11
    // (big-endian u16: high byte 0 at +9, 42 at +10)
    val s5 = (0 until orig.length - 11).find(i =>
      orig(i + 4) == 5 && orig(i + 9) == 0 && orig(i + 10) == 42).get
    for ((bit, name) <- Seq(1 -> "signed", 2 -> "3-byte", 16 -> "restricted",
      32 -> "RSI byte padding")) {
      val b = orig.clone()
      b(s5 + 21) = (b(s5 + 21) | bit).toByte
      val p = s"$dir/ccsds_mut_$bit.grib2"
      Files.write(Paths.get(p), b)
      val e = intercept[IllegalArgumentException](
        Grib2.decodeValues(p, Grib2.scan(p).head))
      assert(e.getMessage.contains(name), s"bit $bit: ${e.getMessage}")
    }
  }

  test("kerchunk refs decode complex-packed messages via the grib2 codec") {
    val dir = Files.createTempDirectory("graft_grib_cxscan").toString
    val nx = 10; val ny = 6
    val rng = new scala.util.Random(43)
    val values = Array.tabulate(nx * ny)(i =>
      math.rint((i * 3.7 + rng.nextDouble() * 5) * 100) / 100.0)
    val path = s"$dir/cx.grib2"
    Grib2.writeComplex(path, values, nx, ny, 20.0, 40.0, 1.0, 1.0,
      0, 0, 0, refTimeEpochSec = 1700000000L, order = 2)
    val virt = s"$dir/virt.zarr"
    RefSet.scanGrib2(path).head.materialize(virt)
    val f = ZarrGroup(virt).readFragment()
    val got = f.allVars("TMP").data.data.asInstanceOf[Array[Double]]
    values.indices.foreach(i =>
      assert(math.abs(got(i) - values(i)) < 0.005 + 1e-9, s"cell $i"))
  }

  test("scan resyncs past padding and handles multi-field messages") {
    import java.nio.{ByteBuffer, ByteOrder}
    val dir = Files.createTempDirectory("graft_grib_multi").toString
    val nx = 6; val ny = 4
    val va = Array.tabulate(nx * ny)(i => i * 0.25)
    val vb = Array.tabulate(nx * ny)(i => 10.0 - i * 0.125)
    val pa = s"$dir/a.grib2"; val pb = s"$dir/b.grib2"
    Grib2.writeSimple(pa, va, nx, ny, 10, 20, 1, 1, 0, 0, 0, 1700000000L)
    Grib2.writeSimple(pb, vb, nx, ny, 10, 20, 1, 1, 0, 0, 6, 1700000000L)
    val ba = Files.readAllBytes(Paths.get(pa))
    val bb = Files.readAllBytes(Paths.get(pb))
    // 1) bulletin-style padding between and around messages
    val padded = s"$dir/padded.grib2"
    val junk = "\r\r\nWMO-HEADER 123\r\r\n".getBytes("ASCII")
    val out = new java.io.ByteArrayOutputStream()
    out.write(junk); out.write(ba); out.write(junk); out.write(bb); out.write(junk)
    Files.write(Paths.get(padded), out.toByteArray)
    val msgs = Grib2.scan(padded)
    assert(msgs.length == 2)
    assert(Grib2.decodeValues(padded, msgs(0)).zip(va).forall {
      case (g, v) => math.abs(g - v) < 0.005 + 1e-9 })
    // 2) one message with two fields: splice b's sections 4..7 before the
    // end of a's message and fix the total length
    def sections(bytes: Array[Byte]): Vector[(Int, Int, Int)] = {
      var p = 16; val out = Vector.newBuilder[(Int, Int, Int)]
      while (p < bytes.length - 4) {
        val len = ByteBuffer.wrap(bytes, p, 4).order(ByteOrder.BIG_ENDIAN).getInt
        out += ((bytes(p + 4) & 0xFF, p, len)); p += len
      }
      out.result()
    }
    val bSecs = sections(bb).filter { case (num, _, _) => num >= 4 }
    val spliceLen = bSecs.map(_._3).sum
    val multi = s"$dir/multi.grib2"
    val mo = new java.io.ByteArrayOutputStream()
    mo.write(ba, 0, ba.length - 4) // everything before "7777"
    bSecs.foreach { case (_, off, len) => mo.write(bb, off, len) }
    mo.write("7777".getBytes("ASCII"))
    val mbytes = mo.toByteArray
    val tl = ByteBuffer.wrap(mbytes).order(ByteOrder.BIG_ENDIAN)
    tl.putLong(8, ba.length.toLong + spliceLen)
    Files.write(Paths.get(multi), mbytes)
    val fields = Grib2.scan(multi)
    assert(fields.length == 2, s"expected 2 fields, got ${fields.length}")
    assert(fields(0).shortName == "TMP" && fields(1).shortName == "DPT")
    assert(Grib2.decodeValues(multi, fields(1)).zip(vb).forall {
      case (g, v) => math.abs(g - v) < 0.005 + 1e-9 })
    // entry-point A exposes both fields as variables
    val frag = Grib2.read(multi)
    assert(frag.dataVars.keySet == Set("TMP", "DPT"))
    // the refs path rejects multi-field messages with a clear error
    val e = intercept[IllegalArgumentException](RefSet.scanGrib2(multi))
    assert(e.getMessage.contains("fields"))
  }

  test("kerchunk scan of the reference fixture materializes and reads back") {
    assume(fixtureExists)
    val refs = RefSet.scanGrib2(fixture)
    assert(refs.length == 1)
    val rs = refs.head
    assert(rs.keys.contains("DEPR/c/0/0/0"))
    // json artifact round-trips
    val back = RefSet.fromJson(RefSet.toJson(rs))
    assert(back.keys == rs.keys)
    val dir = Files.createTempDirectory("graft_grib_virt").toString
    back.materialize(dir)
    val f = ZarrGroup(dir).readFragment()
    assert(f.dims("time") == 1 && f.dims("y") == 824 && f.dims("x") == 935)
    val data = f.dataVars.get("DEPR").orElse(f.allVars.get("DEPR")).get
      .data.data.asInstanceOf[Array[Double]]
    assert(data.count(!_.isNaN) == 750157)
    assert(data.filterNot(_.isNaN).forall(_ == 30.0))
    assert(f.coords("time").data.getLong(0) == 1658275200L)
    assert(f.coords("isobaricInhPa").data.getDouble(0) == 10.0)
    val lat = f.allVars("latitude").data.data.asInstanceOf[Array[Double]]
    assert(math.abs(lat(0) - 18.145030) < 1e-6)
    assert(f.attrs("GRIB_centre") == graft.core.AttrValue("cwao"))
  }

  test("kerchunk refs concatenate along time across messages") {
    val dir = Files.createTempDirectory("graft_grib_cat").toString
    val nx = 6; val ny = 4
    val rng = new scala.util.Random(3)
    def mk(t: Int): (String, Array[Double]) = {
      val vals = Array.fill(nx * ny)(math.rint(rng.nextDouble() * 1000) / 100.0)
      val p = s"$dir/t$t.grib2"
      Grib2.writeSimple(p, vals, nx, ny, 10.0, 100.0, 1.0, 1.0,
        0, 0, 0, refTimeEpochSec = 1700000000L + t * 3600L)
      (p, vals)
    }
    val (pa, va) = mk(0); val (pb, vb) = mk(1)
    val refs = Vector(pa, pb).flatMap(RefSet.scanGrib2)
    val combined = RefSet.concatRefSets(refs, "time",
      identicalDims = Vector("latitude", "longitude"))
    val virt = s"$dir/virt.zarr"
    combined.materialize(virt)
    val f = ZarrGroup(virt).readFragment()
    assert(f.dims("time") == 2)
    assert(f.coords("time").data.getLong(0) == 1700000000L)
    assert(f.coords("time").data.getLong(1) == 1700003600L)
    val tmp = f.allVars("TMP").data
    assert(tmp.shape == Vector(2, ny, nx))
    val flat = tmp.data.asInstanceOf[Array[Double]]
    (va ++ vb).zipWithIndex.foreach { case (v, i) =>
      assert(math.abs(flat(i) - v) < 0.005 + 1e-9, s"cell $i")
    }
  }

  // -------------------------------------------- ensembles + Mercator (r14)

  test("ensemble template 4.1 round-trips: member triple, _mN name, number coord") {
    val dir = Files.createTempDirectory("graft_grib").toString
    val nx = 10; val ny = 6
    val values = Array.tabulate(nx * ny)(i => (i * 7 % 300) / 100.0)
    val path = s"$dir/ens.grib2"
    Grib2.writeSimple(path, values, nx, ny, la1 = 30.0, lo1 = 5.0,
      dLat = 0.5, dLon = 0.5, discipline = 0, category = 0, number = 0,
      refTimeEpochSec = 1700000000L,
      ensemble = Some((3, 17, 31))) // perturbed member 17 of 31
    val m = Grib2.scan(path).head
    assert(m.product.template == 1)
    assert(m.product.ensembleType == 3)
    assert(m.product.perturbationNumber == 17)
    assert(m.product.ensembleSize == 31)
    val got = Grib2.decodeValues(path, m)
    values.indices.foreach(i =>
      assert(math.abs(got(i) - values(i)) <= 0.005 + 1e-9, s"point $i"))
    // read(): member-suffixed variable name, scalar `number` coordinate
    // (the cfgrib convention), per-variable ensemble attrs
    val f = Grib2.read(path)
    val v = f.dataVars("TMP_m17")
    assert(v.attrs("GRIB_perturbationNumber") == graft.core.AttrValue(17))
    assert(v.attrs("GRIB_ensembleSize") == graft.core.AttrValue(31))
    assert(f.coords("number").data.getLong(0) == 17L)
    assert(f.coords("number").dims.isEmpty)
  }

  test("ensemble interval template 4.11 scans: member triple + interval tail parse") {
    val dir = Files.createTempDirectory("graft_grib").toString
    val nx = 8; val ny = 5
    val values = Array.tabulate(nx * ny)(i => i.toDouble / 4)
    val path = s"$dir/ens11.grib2"
    Grib2.writeEnsembleInterval(path, values, nx, ny, la1 = -10.0,
      lo1 = 120.0, dLat = 1.0, dLon = 1.0, discipline = 0, category = 1,
      number = 8, refTimeEpochSec = 1690000000L, ensemble = (3, 5, 21),
      statProcess = 1, rangeHours = 6, forecastTimeHours = 12)
    val m = Grib2.scan(path).head
    assert(m.product.template == 11)
    assert(m.shortName == "APCP")
    assert(m.product.perturbationNumber == 5 && m.product.ensembleSize == 21)
    assert(m.product.forecastTime == 12L)
    val got = Grib2.decodeValues(path, m)
    values.indices.foreach(i =>
      assert(math.abs(got(i) - values(i)) <= 0.005 + 1e-9, s"point $i"))
    val f = Grib2.read(path)
    assert(f.dataVars.contains("APCP_m5"))
    assert(f.coords("number").data.getLong(0) == 5L)
  }

  test("mercator grid (3.10) scans and inverse-projects (Snyder spherical)") {
    val dir = Files.createTempDirectory("graft_grib").toString
    val nx = 9; val ny = 7
    val values = Array.tabulate(nx * ny)(i => 20.0 + (i % 13) / 10.0)
    // independent forward Mercator (Snyder 1987 eq. 7-1/7-2 with the
    // true-scale latitude): compute the expected lat/lon of every grid
    // point from (la1, lo1, laD, dx, dy) OUTSIDE the library
    val (la1, lo1, laD) = (10.0, 300.0, 20.0)
    val (dx, dy) = (25000.0, 30000.0) // metres true at laD
    val radius = 6371229.0
    val rc = radius * math.cos(math.toRadians(laD))
    def latOfRow(j: Int): Double = {
      val y = rc * math.log(math.tan(math.Pi / 4 +
        math.toRadians(la1) / 2)) + j * dy
      math.toDegrees(2 * math.atan(math.exp(y / rc)) - math.Pi / 2)
    }
    def lonOfCol(i: Int): Double = lo1 + math.toDegrees(i * dx / rc)
    val path = s"$dir/merc.grib2"
    Grib2.writeMercator(path, values, nx, ny, la1 = la1, lo1 = lo1,
      laD = laD, la2 = latOfRow(ny - 1), lo2 = lonOfCol(nx - 1),
      dx = dx, dy = dy, discipline = 10, category = 3, number = 0,
      refTimeEpochSec = 1700000000L)
    val m = Grib2.scan(path).head
    assert(m.grid.template == 10)
    assert(m.grid.laD == 20.0 && m.grid.dx == dx && m.grid.dy == dy)
    assert(m.shortName == "WTMP")
    val (lats, lons) = Grib2.latLonArrays(m.grid)
    for (j <- 0 until ny; i <- 0 until nx) {
      assert(math.abs(lats(j * nx + i) - latOfRow(j)) < 1e-6,
        s"lat ($j,$i): ${lats(j * nx + i)} vs ${latOfRow(j)}")
      assert(math.abs(lons(j * nx + i) - lonOfCol(i)) < 1e-6,
        s"lon ($j,$i): ${lons(j * nx + i)} vs ${lonOfCol(i)}")
    }
    // the anchor row reproduces la1 (forward→inverse rounding only);
    // rows are strictly north of each other; and a FIXED Δy covers
    // fewer degrees of latitude poleward (dφ = dy·cosφ/(R·k) — the
    // Mercator stretch), matching the differential to first order
    assert(math.abs(lats(0) - la1) < 1e-9)
    val rowLats = (0 until ny).map(j => lats(j * nx))
    assert(rowLats.sliding(2).forall(p => p(1) > p(0)))
    val gaps = rowLats.sliding(2).map(p => p(1) - p(0)).toSeq
    assert(gaps.sliding(2).forall(p => p(1) < p(0)),
      s"Mercator latitude gaps must shrink poleward: $gaps")
    gaps.zipWithIndex.foreach { case (gap, j) =>
      val mid = math.toRadians((rowLats(j) + rowLats(j + 1)) / 2)
      val expect = math.toDegrees(dy * math.cos(mid) / rc)
      assert(math.abs(gap - expect) < 1e-4,
        s"gap $j: $gap vs differential $expect")
    }
    // encoded la2/lo2 agree with the projected last grid point
    assert(math.abs(m.grid.la2 - latOfRow(ny - 1)) < 2e-6)
    val got = Grib2.decodeValues(path, m)
    values.indices.foreach(i =>
      assert(math.abs(got(i) - values(i)) <= 0.005 + 1e-9, s"point $i"))
    // nonzero orientation fails by name
    val bytes = Files.readAllBytes(Paths.get(path))
    // section 3 starts at offset 16 (after indicator + section 1: 21
    // bytes); find it by walking: sec1 len at 16
    var off = 16
    var s3Off = -1
    while (s3Off < 0) {
      val len = java.nio.ByteBuffer.wrap(bytes, off, 4).getInt
      if (bytes(off + 4) == 3) s3Off = off else off += len
    }
    val mut = bytes.clone()
    mut(s3Off + 60 + 3) = 1 // orientation low byte (octet 61-64)
    val p2 = s"$dir/merc_orient.grib2"
    Files.write(Paths.get(p2), mut)
    val e = intercept[Exception](Grib2.read(p2))
    assert(e.getMessage.contains("orientation"), e.getMessage)
  }

  // ------------------------------- south-pole aspects + derived (r14b)

  /** Great-circle distance (haversine) on the writer's sphere. */
  private def gcDist(lat1: Double, lon1: Double, lat2: Double,
                     lon2: Double): Double = {
    val R = 6371229.0
    val p1 = math.toRadians(lat1); val p2 = math.toRadians(lat2)
    val dp = p2 - p1; val dl = math.toRadians(lon2 - lon1)
    val a = math.sin(dp / 2) * math.sin(dp / 2) +
      math.cos(p1) * math.cos(p2) * math.sin(dl / 2) * math.sin(dl / 2)
    2 * R * math.asin(math.min(1.0, math.sqrt(a)))
  }

  test("SOUTH polar stereographic (3.20 flag 0x80) inverse-projects; scale matches the differential") {
    val dir = Files.createTempDirectory("graft_grib").toString
    val nx = 8; val ny = 6
    val (la1, lo1, laD, loV) = (-65.0, 300.0, -60.0, 10.0)
    val (dx, dy) = (25000.0, 25000.0)
    val p = s"$dir/sps.grib2"
    Grib2.writePolarStereo(p, Array.tabulate(nx * ny)(i => (i % 9).toDouble),
      nx, ny, la1, lo1, laD, loV, dx, dy, discipline = 0, category = 0,
      number = 0, refTimeEpochSec = 1700000000L, southPole = true)
    val m = Grib2.scan(p).head
    assert((m.grid.projCentreFlag & 0x80) != 0)
    val (lats, lons) = Grib2.latLonArrays(m.grid)
    // anchored at the encoded first point; entire grid in the south
    assert(math.abs(lats(0) - la1) < 1e-9 && math.abs(lons(0) - lo1) < 1e-9)
    assert(lats.forall(_ < 0))
    // INDEPENDENT check: the map scale of the south stereographic at
    // latitude phi is m(phi) = 2*k0 / (1 - sin phi) with k0 =
    // (1 - sin phiD)/2 — adjacent grid points must be dx/m(phi) apart
    // on the sphere (differential geometry, not the inverse formulas)
    val k0 = (1 - math.sin(math.toRadians(laD))) / 2
    for (j <- 0 until ny; i <- 0 until nx - 1) {
      val a = j * nx + i
      val phiMid = math.toRadians((lats(a) + lats(a + 1)) / 2)
      val expect = dx / (2 * k0 / (1 - math.sin(phiMid)))
      val got = gcDist(lats(a), lons(a), lats(a + 1), lons(a + 1))
      assert(math.abs(got - expect) / expect < 2e-3,
        s"row $j col $i: $got vs $expect")
    }
    // vertical neighbors too (dy direction)
    for (j <- 0 until ny - 1; i <- 0 until nx) {
      val a = j * nx + i; val b = (j + 1) * nx + i
      val phiMid = math.toRadians((lats(a) + lats(b)) / 2)
      val expect = dy / (2 * k0 / (1 - math.sin(phiMid)))
      val got = gcDist(lats(a), lons(a), lats(b), lons(b))
      assert(math.abs(got - expect) / expect < 2e-3, s"col $i row $j")
    }
    // values round-trip through read()
    val f = Grib2.read(p)
    assert(f.dataVars("TMP").data.getDouble(3) == 3.0)
  }

  test("SOUTH-pole Lambert conformal (3.30 flag 0x80) inverse-projects; conic scale matches") {
    val dir = Files.createTempDirectory("graft_grib").toString
    val nx = 9; val ny = 7
    // Antarctic-style geometry: standard parallels -60/-70, grid at -65
    val (la1, lo1, laD, loV) = (-65.0, 290.0, -65.0, 0.0)
    val (latin1, latin2) = (-60.0, -70.0)
    val (dx, dy) = (30000.0, 30000.0)
    val p = s"$dir/slc.grib2"
    Grib2.writeLambert(p, Array.tabulate(nx * ny)(i => (i % 11).toDouble),
      nx, ny, la1, lo1, laD, loV, latin1, latin2, dx, dy,
      discipline = 0, category = 0, number = 0,
      refTimeEpochSec = 1700000000L, southPole = true)
    val m = Grib2.scan(p).head
    assert((m.grid.projCentreFlag & 0x80) != 0)
    val (lats, lons) = Grib2.latLonArrays(m.grid)
    assert(math.abs(lats(0) - la1) < 1e-9 && math.abs(lons(0) - lo1) < 1e-9)
    assert(lats.forall(_ < 0))
    // INDEPENDENT conic-scale check: m(phi) = n*rho(phi) / (R*cos phi)
    // (general conformal conic; positive for the south since n and rho
    // are both negative), computed here from Snyder's forward constants
    val R = 6371229.0
    val phi1 = math.toRadians(latin1); val phi2 = math.toRadians(latin2)
    val n = math.log(math.cos(phi1) / math.cos(phi2)) /
      math.log(math.tan(math.Pi / 4 + phi2 / 2) /
        math.tan(math.Pi / 4 + phi1 / 2))
    assert(n < 0, s"southern cone constant must be negative, got $n")
    val bigF = math.cos(phi1) *
      math.pow(math.tan(math.Pi / 4 + phi1 / 2), n) / n
    def scaleAt(phiDeg: Double): Double = {
      val phi = math.toRadians(phiDeg)
      val rho = R * bigF / math.pow(math.tan(math.Pi / 4 + phi / 2), n)
      n * rho / (R * math.cos(phi))
    }
    // the standard parallels are TRUE by construction
    assert(math.abs(scaleAt(latin1) - 1.0) < 1e-12)
    assert(math.abs(scaleAt(latin2) - 1.0) < 1e-12)
    for (j <- 0 until ny; i <- 0 until nx - 1) {
      val a = j * nx + i
      val expect = dx / scaleAt((lats(a) + lats(a + 1)) / 2)
      val got = gcDist(lats(a), lons(a), lats(a + 1), lons(a + 1))
      assert(math.abs(got - expect) / expect < 2e-3,
        s"row $j col $i: $got vs $expect")
    }
    // a projection-centre flag contradicting the parallels is corrupt
    val p2 = s"$dir/slc_bad.grib2"
    Grib2.writeLambert(p2, Array.tabulate(nx * ny)(_.toDouble), nx, ny,
      la1, lo1, laD, loV, latin1, latin2, dx, dy, 0, 0, 0,
      1700000000L, southPole = false) // north flag, southern parallels
    val e = intercept[IllegalArgumentException](Grib2.read(p2))
    assert(e.getMessage.contains("contradicts"), e.getMessage)
  }

  test("derived ensemble template 4.2: mean/spread parse, read() suffixes by table 4.7") {
    val dir = Files.createTempDirectory("graft_grib").toString
    val nx = 10; val ny = 5
    val vals = Array.tabulate(nx * ny)(i => (i % 17) / 4.0)
    for ((dt, suffix) <- Seq(0 -> "mean", 2 -> "spread")) {
      val p = s"$dir/derived_$dt.grib2"
      Grib2.writeDerivedEnsemble(p, vals, nx, ny, la1 = 20.0, lo1 = 50.0,
        dLat = 0.5, dLon = 0.5, discipline = 0, category = 0, number = 0,
        refTimeEpochSec = 1700000000L, derivedType = dt, ensembleSize = 31)
      val m = Grib2.scan(p).head
      assert(m.product.template == 2)
      assert(m.product.derivedType == dt)
      assert(m.product.ensembleSize == 31)
      assert(m.product.perturbationNumber == -1) // not a member product
      val f = Grib2.read(p)
      val v = f.dataVars(s"TMP_$suffix")
      assert(v.attrs("GRIB_derivedType") == graft.core.AttrValue(dt))
      assert(v.attrs("GRIB_ensembleSize") == graft.core.AttrValue(31))
      assert(!f.coords.contains("number")) // derived products carry none
      val got = Grib2.decodeValues(p, m)
      vals.indices.foreach(i =>
        assert(math.abs(got(i) - vals(i)) <= 0.005 + 1e-9, s"point $i"))
    }
  }

  test("probability template 4.5: type + scaled thresholds parse; read() suffixes by number") {
    val dir = Files.createTempDirectory("graft_grib").toString
    val nx = 8; val ny = 6
    val vals = Array.tabulate(nx * ny)(i => (i % 101).toDouble) // percent
    val p = s"$dir/prob.grib2"
    // P(APCP > 25.4 mm): type 3 = above lower limit, scale 1 value 254
    Grib2.writeProbability(p, vals, nx, ny, la1 = 30.0, lo1 = 260.0,
      dLat = 0.5, dLon = 0.5, discipline = 0, category = 1, number = 8,
      refTimeEpochSec = 1700000000L, probNumber = 2, probTotal = 5,
      probType = 3, lower = Some((1, 254)), upper = None)
    val m = Grib2.scan(p).head
    assert(m.product.template == 5)
    assert(m.product.probabilityType == 3)
    assert(m.product.probabilityNumber == 2)
    assert(math.abs(m.product.probLower - 25.4) < 1e-12)
    assert(m.product.probUpper.isNaN) // encoded missing
    assert(m.product.perturbationNumber == -1 && m.product.derivedType == -1)
    val f = Grib2.read(p)
    val v = f.dataVars("APCP_prob2")
    assert(v.attrs("GRIB_probabilityType") == graft.core.AttrValue(3))
    assert(v.attrs("GRIB_probLowerLimit") == graft.core.AttrValue(25.4))
    assert(!v.attrs.contains("GRIB_probUpperLimit"))
    val got = Grib2.decodeValues(p, m)
    vals.indices.foreach(i =>
      assert(math.abs(got(i) - vals(i)) <= 0.005 + 1e-9, s"point $i"))
  }

  test("multi-grid file: read() selects the primary grid, readGroups returns all") {
    val dir = Files.createTempDirectory("graft_grib").toString
    val mk = (nx: Int, ny: Int, la1: Double, seed: Int) => {
      val p = s"$dir/part_$seed.grib2"
      Grib2.writeSimple(p, Array.tabulate(nx * ny)(i => (i + seed) / 10.0),
        nx, ny, la1 = la1, lo1 = 0.0, dLat = 0.5, dLon = 0.5,
        discipline = 0, category = 0, number = 0,
        refTimeEpochSec = 1700000000L + seed * 3600L)
      Files.readAllBytes(Paths.get(p))
    }
    // two messages on grid A (12x8), one on grid B (6x4) — concatenated
    // into one file, the operational surface+pressure-level layout
    val multi = s"$dir/multi.grib2"
    Files.write(Paths.get(multi),
      mk(12, 8, 40.0, 0) ++ mk(6, 4, 10.0, 1) ++ mk(12, 8, 40.0, 2))
    val msgs = Grib2.scan(multi)
    assert(msgs.length == 3)
    // read(): primary = the 12x8 grid (2 of 3 messages)
    val f = Grib2.read(multi)
    assert(f.dims == Map("y" -> 8, "x" -> 12))
    assert(f.dataVars.size == 2 &&
      f.dataVars.keySet == Set("TMP", "TMP_1"))
    assert(f.attrs("GRIB_nGridsInFile") == graft.core.AttrValue(2L))
    assert(f.attrs("GRIB_messagesSkipped") == graft.core.AttrValue(1L))
    // readGroups: both grids, first-appearance order, full data
    val groups = Grib2.readGroups(multi)
    assert(groups.length == 2)
    assert(groups(0).dims == Map("y" -> 8, "x" -> 12))
    assert(groups(1).dims == Map("y" -> 4, "x" -> 6))
    assert(groups(1).dataVars("TMP").data.getDouble(0) == 0.1)
    // a single-grid file keeps the historical shape: no skip attrs
    val single = s"$dir/single.grib2"
    Files.write(Paths.get(single), mk(12, 8, 40.0, 5))
    assert(!Grib2.read(single).attrs.contains("GRIB_nGridsInFile"))
  }

  test("rotated lat-lon (3.1): round-trips, unrotation is the COSMO rotation") {
    val dir = Files.createTempDirectory("graft_grib").toString
    val nx = 9; val ny = 7
    val vals = Array.tabulate(nx * ny)(i => 250.0 + (i % 17) / 10.0)
    // the COSMO-EU pole: rotated south pole at geographic (-40, 10) —
    // the NEGATIVE latitude exercises the sign-magnitude wire rule
    val (spLat, spLon) = (-40.0, 10.0)
    val (la1, lo1, dLat, dLon) = (-4.5, -6.0, 1.5, 2.0) // rotated coords
    val p = s"$dir/rot.grib2"
    Grib2.writeRotated(p, vals, nx, ny, la1, lo1, dLat, dLon,
      spLat, spLon, discipline = 0, category = 0, number = 0,
      refTimeEpochSec = 1700000000L)
    val m = Grib2.scan(p).head
    assert(m.grid.template == 1)
    assert(m.grid.spLat == spLat && m.grid.spLon == spLon)
    assert(m.grid.rotAngle == 0.0)
    assert(m.grid.la1 == la1 && m.grid.lo1 == lo1)
    val got = Grib2.decodeValues(p, m)
    vals.indices.foreach(i =>
      assert(math.abs(got(i) - vals(i)) <= 0.005 + 1e-9, s"point $i"))
    val (lats, lons) = Grib2.latLonArrays(m.grid)
    // independent check 1 — FIXED-POINT identities of the rotation,
    // closed-form from the definition (not from our kernel): the rotated
    // south pole maps to exactly (spLat, spLon); the rotated origin to
    // (90 + spLat, spLon)
    def geoOf(latR: Double, lonR: Double): (Double, Double) = {
      val g1 = m.grid.copy(nx = 1, ny = 1, la1 = latR, lo1 = lonR)
      val (a, o) = Grib2.latLonArrays(g1)
      (a(0), o(0))
    }
    val (pLat, pLon) = geoOf(-90.0, 123.0) // any rotated lon at the pole
    assert(math.abs(pLat - spLat) < 1e-9 && math.abs(pLon - spLon) < 1e-9,
      s"rotated south pole -> ($pLat, $pLon), want ($spLat, $spLon)")
    val (oLat, oLon) = geoOf(0.0, 0.0)
    assert(math.abs(oLat - (90.0 + spLat)) < 1e-9 &&
      math.abs(oLon - spLon) < 1e-9,
      s"rotated origin -> ($oLat, $oLon), want (${90 + spLat}, $spLon)")
    // independent check 2 — a rotation is an ISOMETRY of the sphere: the
    // great-circle distance between any two unrotated grid points must
    // equal the distance between the same points in rotated coordinates
    // (a theorem about rotations, independent of which rotation we chose)
    def gc(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
      val (p1, l1) = (math.toRadians(lat1), math.toRadians(lon1))
      val (p2, l2) = (math.toRadians(lat2), math.toRadians(lon2))
      2 * math.asin(math.min(1.0, math.sqrt(
        math.pow(math.sin((p2 - p1) / 2), 2) +
          math.cos(p1) * math.cos(p2) *
            math.pow(math.sin((l2 - l1) / 2), 2))))
    }
    for (j <- 0 until ny; i <- 0 until nx - 1) {
      val k = j * nx + i
      val dGeo = gc(lats(k), lons(k), lats(k + 1), lons(k + 1))
      val dRot = gc(la1 + j * dLat, lo1 + i * dLon,
        la1 + j * dLat, lo1 + (i + 1) * dLon)
      assert(math.abs(dGeo - dRot) < 1e-12, s"isometry at ($j,$i)")
    }
    for (j <- 0 until ny - 1) {
      val k = j * nx
      val dGeo = gc(lats(k), lons(k), lats(k + nx), lons(k + nx))
      val dRot = gc(la1 + j * dLat, lo1, la1 + (j + 1) * dLat, lo1)
      assert(math.abs(dGeo - dRot) < 1e-12, s"isometry row $j")
    }
    // the pole parameters surface with cfgrib's attribute names
    val f = Grib2.read(p)
    assert(f.attrs("GRIB_gridType") == graft.core.AttrValue("rotated_ll"))
    assert(f.attrs("GRIB_latitudeOfSouthernPoleInDegrees") ==
      graft.core.AttrValue(spLat))
    assert(f.attrs("GRIB_longitudeOfSouthernPoleInDegrees") ==
      graft.core.AttrValue(spLon))
    assert(f.attrs("GRIB_angleOfRotationInDegrees") ==
      graft.core.AttrValue(0.0))
    // a nonzero angle of rotation fails BY NAME (no real archive sets it;
    // the convention is unverifiable offline — named error over a guess)
    val bytes = Files.readAllBytes(Paths.get(p))
    var off = 16; var s3Off = -1
    while (s3Off < 0) {
      val len = java.nio.ByteBuffer.wrap(bytes, off, 4).getInt
      if (bytes(off + 4) == 3) s3Off = off else off += len
    }
    val mut = bytes.clone()
    // octets 81-84: IEEE f32 angle — set to 15.0f (0x41700000)
    mut(s3Off + 80) = 0x41.toByte; mut(s3Off + 81) = 0x70.toByte
    val p2 = s"$dir/rot_angle.grib2"
    Files.write(Paths.get(p2), mut)
    val e = intercept[IllegalArgumentException] {
      Grib2.read(p2)
    }
    assert(e.getMessage.contains("angle of rotation"))
    // an unsupported grid template fails by NAME, not by a misread
    // Ni/Nj bound (octets 31-38 are not dimensions on other layouts;
    // 3.2 = stretched lat-lon, unsupported — 3.90 became space view
    // in r15)
    val mut2 = bytes.clone()
    mut2(s3Off + 12) = 0; mut2(s3Off + 13) = 2 // template -> 3.2
    val p3 = s"$dir/rot_t2.grib2"
    Files.write(Paths.get(p3), mut2)
    val e2 = intercept[UnsupportedOperationException] { Grib2.scan(p3) }
    assert(e2.getMessage.contains("grid template 3.2 not supported"))
  }

  test("percentile templates 4.6/4.10: value parses, read() suffixes by percentile") {
    val dir = Files.createTempDirectory("graft_grib").toString
    val nx = 8; val ny = 5
    val vals = Array.tabulate(nx * ny)(i => 280.0 + (i % 23) / 10.0)
    // 4.6: instantaneous 90th-percentile temperature
    val p6 = s"$dir/pct6.grib2"
    Grib2.writePercentile(p6, vals, nx, ny, la1 = 30.0, lo1 = 260.0,
      dLat = 0.5, dLon = 0.5, discipline = 0, category = 0, number = 0,
      refTimeEpochSec = 1700000000L, percentile = 90)
    val m6 = Grib2.scan(p6).head
    assert(m6.product.template == 6)
    assert(m6.product.percentile == 90)
    assert(m6.product.probabilityType == -1 &&
      m6.product.perturbationNumber == -1)
    val f6 = Grib2.read(p6)
    val v6 = f6.dataVars("TMP_pct90")
    assert(v6.attrs("GRIB_percentileValue") == graft.core.AttrValue(90))
    val got6 = Grib2.decodeValues(p6, m6)
    vals.indices.foreach(i =>
      assert(math.abs(got6(i) - vals(i)) <= 0.005 + 1e-9, s"point $i"))
    // 4.10: 10th percentile of a 6-hour interval (statProcess 2 = max)
    val p10 = s"$dir/pct10.grib2"
    Grib2.writePercentile(p10, vals, nx, ny, la1 = 30.0, lo1 = 260.0,
      dLat = 0.5, dLon = 0.5, discipline = 0, category = 0, number = 0,
      refTimeEpochSec = 1700000000L, percentile = 10,
      interval = Some((1700000000L + 6 * 3600L, 2, 6)),
      forecastTimeHours = 0)
    val m10 = Grib2.scan(p10).head
    assert(m10.product.template == 10)
    assert(m10.product.percentile == 10)
    assert(Grib2.read(p10).dataVars.contains("TMP_pct10"))
    val got10 = Grib2.decodeValues(p10, m10)
    vals.indices.foreach(i =>
      assert(math.abs(got10(i) - vals(i)) <= 0.005 + 1e-9, s"point $i"))
    // a >100 percentile is corrupt, by name
    val bytes = Files.readAllBytes(Paths.get(p6))
    var off = 16; var s4Off = -1
    while (s4Off < 0) {
      val len = java.nio.ByteBuffer.wrap(bytes, off, 4).getInt
      if (bytes(off + 4) == 4) s4Off = off else off += len
    }
    val mut = bytes.clone()
    mut(s4Off + 34) = 130.toByte // octet 35: percentile value
    val pBad = s"$dir/pct_bad.grib2"
    Files.write(Paths.get(pBad), mut)
    val e = intercept[IllegalArgumentException] { Grib2.scan(pBad) }
    assert(e.getMessage.contains("percentile value 130"))
  }

  test("spectral packing 5.50 on grid 3.50: closed-form spectrum round-trips") {
    val dir = Files.createTempDirectory("graft_grib").toString
    // closed-form synthesized spectrum for T21: c_k = A·cos(ω·k)·e^(−k/τ)
    // with the (0,0) imaginary part zero (a real field's constraint) —
    // every byte of the file derives from this formula, so the decode is
    // checked against values computed OUTSIDE the codec
    val trunc = 21
    val total = (trunc + 1) * (trunc + 2) // 506 reals = 253 complex
    def coeff(k: Int): Double =
      if (k == 1) 0.0 // Im c(0,0) = 0
      else 12.5 * math.cos(0.37 * k) * math.exp(-k / 150.0)
    val coeffs = Array.tabulate(total)(coeff)
    val p = s"$dir/sh.grib2"
    Grib2.writeSpectral(p, coeffs, trunc, discipline = 0, category = 2,
      number = 12, refTimeEpochSec = 1700000000L, nbits = 20,
      decimalScale = 4)
    val m = Grib2.scan(p).head
    assert(m.grid.template == 50)
    assert(m.grid.sphJ == trunc)
    assert(m.grid.nx == total && m.grid.ny == 1)
    assert(m.packing.template == 50)
    assert(m.packing.nValues == total - 1)
    // the (0,0) real is stored unpacked: exact to float32
    assert(m.packing.real00 == coeff(0).toFloat)
    val got = Grib2.decodeValues(p, m)
    assert(got.length == total)
    assert(got(0) == coeff(0).toFloat.toDouble)
    // packed tail: exact to the decimal quantization of the closed form
    (1 until total).foreach { k =>
      val want = math.rint(coeff(k) * 1e4) / 1e4
      assert(math.abs(got(k) - want) < 1e-9,
        s"coeff $k: ${got(k)} vs closed-form $want")
    }
    // negative coefficients really exercised the signed range
    assert(got.min < -1.0 && got.max > 1.0)
    // fragment surface: flat coeff dimension, truncation attrs, no latlon
    val f = Grib2.read(p)
    assert(f.dims == Map("coeff" -> total))
    assert(f.coords.isEmpty)
    assert(f.attrs("GRIB_gridType") == graft.core.AttrValue("sh"))
    assert(f.attrs("GRIB_J") == graft.core.AttrValue(trunc))
    val v = f.dataVars.values.head
    assert(v.dims == Vector("coeff") && v.data.shape == Vector(total))
    // pentagonal (non-triangular) truncation fails by name
    val bytes = Files.readAllBytes(Paths.get(p))
    var off = 16; var s3Off = -1
    while (s3Off < 0) {
      val len = java.nio.ByteBuffer.wrap(bytes, off, 4).getInt
      if (bytes(off + 4) == 3) s3Off = off else off += len
    }
    val mut = bytes.clone()
    mut(s3Off + 21) = (trunc + 1).toByte // K (octets 19-22) -> J+1
    val p2 = s"$dir/sh_pent.grib2"
    Files.write(Paths.get(p2), mut)
    val e = intercept[UnsupportedOperationException] { Grib2.scan(p2) }
    assert(e.getMessage.contains("pentagonal"))
  }

  test("statistical-interval tail (4.8-4.12): stepType + interval end surface as attrs") {
    val dir = Files.createTempDirectory("graft_grib").toString
    val nx = 6; val ny = 4
    val vals = Array.tabulate(nx * ny)(i => (i % 9).toDouble)
    val ref = 1700000000L
    // 4.8: plain 6-hour accumulation
    val p8 = s"$dir/acc.grib2"
    Grib2.writeInterval(p8, vals, nx, ny, la1 = 40.0, lo1 = 0.0,
      dLat = 0.5, dLon = 0.5, discipline = 0, category = 1, number = 8,
      refTimeEpochSec = ref, statProcess = 1, rangeHours = 6)
    val m8 = Grib2.scan(p8).head
    assert(m8.product.template == 8)
    assert(m8.product.statProcess == 1)
    assert(m8.product.intervalEndEpochSec == ref + 6 * 3600L)
    val v8 = Grib2.read(p8).dataVars("APCP")
    assert(v8.attrs("GRIB_stepType") == graft.core.AttrValue("accum"))
    assert(v8.attrs("GRIB_intervalEndEpochSec") ==
      graft.core.AttrValue(ref + 6 * 3600L))
    // 4.9: probability over an interval (P(APCP > 25.4) in 12 h)
    val p9 = s"$dir/prob9.grib2"
    Grib2.writeProbability(p9, vals, nx, ny, la1 = 40.0, lo1 = 0.0,
      dLat = 0.5, dLon = 0.5, discipline = 0, category = 1, number = 8,
      refTimeEpochSec = ref, probNumber = 1, probTotal = 4, probType = 3,
      lower = Some((1, 254)), upper = None,
      interval = Some((ref + 12 * 3600L, 1, 12)))
    val m9 = Grib2.scan(p9).head
    assert(m9.product.template == 9)
    assert(m9.product.probabilityType == 3 &&
      math.abs(m9.product.probLower - 25.4) < 1e-12)
    assert(m9.product.statProcess == 1 &&
      m9.product.intervalEndEpochSec == ref + 12 * 3600L)
    // 4.10 percentile-interval and 4.11 ensemble-interval carry it too
    val p10 = s"$dir/pct10b.grib2"
    Grib2.writePercentile(p10, vals, nx, ny, la1 = 40.0, lo1 = 0.0,
      dLat = 0.5, dLon = 0.5, discipline = 0, category = 0, number = 0,
      refTimeEpochSec = ref, percentile = 50,
      interval = Some((ref + 6 * 3600L, 2, 6)))
    val m10 = Grib2.scan(p10).head
    assert(m10.product.statProcess == 2) // max
    assert(Grib2.read(p10).dataVars("TMP_pct50")
      .attrs("GRIB_stepType") == graft.core.AttrValue("max"))
    val p11 = s"$dir/ens11b.grib2"
    Grib2.writeEnsembleInterval(p11, vals, nx, ny, la1 = 40.0, lo1 = 0.0,
      dLat = 0.5, dLon = 0.5, discipline = 0, category = 1, number = 8,
      refTimeEpochSec = ref, ensemble = (3, 2, 10),
      statProcess = 0, rangeHours = 3)
    val m11 = Grib2.scan(p11).head
    assert(m11.product.statProcess == 0 &&
      m11.product.intervalEndEpochSec == ref + 3 * 3600L)
    // instantaneous templates carry NO tail fields
    assert(Grib2.scan(s"$dir/acc.grib2").head.product.percentile == -1)
    val pInst = s"$dir/inst.grib2"
    Grib2.writeSimple(pInst, vals, nx, ny, la1 = 40.0, lo1 = 0.0,
      dLat = 0.5, dLon = 0.5, discipline = 0, category = 0, number = 0,
      refTimeEpochSec = ref)
    val mi = Grib2.scan(pInst).head
    assert(mi.product.statProcess == -1 &&
      mi.product.intervalEndEpochSec == -1L)
    assert(!Grib2.read(pInst).dataVars("TMP").attrs.contains("GRIB_stepType"))
    // a corrupt end timestamp fails by name
    val bytes = Files.readAllBytes(Paths.get(p8))
    var off = 16; var s4Off = -1
    while (s4Off < 0) {
      val len = java.nio.ByteBuffer.wrap(bytes, off, 4).getInt
      if (bytes(off + 4) == 4) s4Off = off else off += len
    }
    val mut = bytes.clone()
    mut(s4Off + 36) = 13.toByte // month octet 37 -> 13
    val pBad = s"$dir/acc_bad.grib2"
    Files.write(Paths.get(pBad), mut)
    val e = intercept[IllegalArgumentException] { Grib2.scan(pBad) }
    assert(e.getMessage.contains("interval end timestamp"), e.getMessage)
  }

  test("reduced (quasi-regular) Gaussian grid: octahedral rows round-trip as flat values") {
    val dir = Files.createTempDirectory("graft_grib").toString
    // N=8 octahedral-style rule: 20 points at the polemost rows, +4 per
    // row toward the equator — 16 rows, 416 points
    val gaussN = 8
    val ny = 2 * gaussN
    val rows = Array.tabulate(ny)(j => 20 + 4 * math.min(j, ny - 1 - j))
    val n = rows.sum
    val vals = Array.tabulate(n)(i => 250.0 + (i % 37) / 10.0)
    val p = s"$dir/redgg.grib2"
    Grib2.writeReducedGaussian(p, vals, rows, lo1 = 0.0, gaussN = gaussN,
      discipline = 0, category = 0, number = 0,
      refTimeEpochSec = 1700000000L)
    val m = Grib2.scan(p).head
    assert(m.grid.template == 40)
    assert(m.grid.rowCounts == rows.toVector)
    assert(m.grid.nPoints == n && m.grid.ny == ny)
    assert(m.grid.gaussN == gaussN)
    val got = Grib2.decodeValues(p, m)
    assert(got.length == n)
    vals.indices.foreach(i =>
      assert(math.abs(got(i) - vals(i)) <= 0.005 + 1e-9, s"point $i"))
    // geometry: row latitudes are exactly the regular-3.40 Gaussian
    // latitudes; each row's longitudes step 360/ni from lo1 — computed
    // independently here from the row rule
    val (lats, lons) = Grib2.latLonArrays(m.grid)
    val rowLats = Grib2.gaussianLatitudes(ny)
    var k = 0
    for (j <- 0 until ny) {
      val di = 360.0 / rows(j)
      for (i <- 0 until rows(j)) {
        assert(math.abs(lats(k) - rowLats(j)) < 1e-9, s"lat row $j")
        assert(math.abs(lons(k) - (i * di) % 360.0) < 1e-9, s"lon ($j,$i)")
        k += 1
      }
    }
    assert(k == n)
    // fragment surface: flat values dim, 1-D coords, reduced_gg attrs
    val f = Grib2.read(p)
    assert(f.dims == Map("values" -> n))
    assert(f.coords("latitude").dims == Vector("values"))
    assert(f.attrs("GRIB_gridType") == graft.core.AttrValue("reduced_gg"))
    assert(f.attrs("GRIB_N") == graft.core.AttrValue(gaussN))
    // kerchunk scan rejects ragged grids BY NAME (no rectangular refs)
    val eK = intercept[IllegalArgumentException] {
      graft.kerchunk.RefSet.scanGrib2(p)
    }
    assert(eK.getMessage.contains("ragged"), eK.getMessage)
    // corruption: a row-list sum that contradicts the header point
    // count fails by name
    val bytes = Files.readAllBytes(Paths.get(p))
    var off = 16; var s3Off = -1
    while (s3Off < 0) {
      val len = java.nio.ByteBuffer.wrap(bytes, off, 4).getInt
      if (bytes(off + 4) == 3) s3Off = off else off += len
    }
    val mut = bytes.clone()
    mut(s3Off + 73) = (mut(s3Off + 73) ^ 1).toByte // row 0 count low byte
    val p2 = s"$dir/redgg_bad.grib2"
    Files.write(Paths.get(p2), mut)
    val e = intercept[IllegalArgumentException] { Grib2.scan(p2) }
    assert(e.getMessage.contains("row list sums"), e.getMessage)
    // a quasi-regular form of a non-Gaussian template fails by name
    val mut2 = bytes.clone()
    mut2(s3Off + 12) = 0; mut2(s3Off + 13) = 0 // template -> 3.0
    val p3 = s"$dir/redgg_t0.grib2"
    Files.write(Paths.get(p3), mut2)
    val e2 = intercept[IllegalArgumentException] { Grib2.scan(p3) }
    assert(e2.getMessage.contains("quasi-regular"), e2.getMessage)
  }

  test("space view (3.90): full disk inverse-projects; forward identity; off-disk NaN") {
    val dir = Files.createTempDirectory("graft_grib").toString
    val nx = 33; val ny = 33
    val (lop, nr) = (140.7, 6.6187) // Himawari-8 geometry
    val (dx, dy) = (30, 30) // apparent diameter in grid lengths
    val (xp, yp) = (16.0, 16.0)
    // NaN the pixels outside the disk (ray misses the sphere) exactly
    // as a real full-disk product bitmaps them
    val app = 2.0 * math.asin(1.0 / nr)
    def onDisk(i: Int, j: Int): Boolean = {
      val a = (i - xp) * app / dx; val b = (yp - j) * app / dy
      val cosab = math.cos(a) * math.cos(b)
      nr * nr * cosab * cosab - nr * nr + 1.0 >= 0
    }
    val vals = Array.tabulate(nx * ny) { k =>
      val (i, j) = (k % nx, k / nx)
      if (onDisk(i, j)) 200.0 + (k % 41) / 10.0 else Double.NaN
    }
    val p = s"$dir/disk.grib2"
    Grib2.writeSpaceView(p, vals, nx, ny, lop = lop, nr = nr,
      dx = dx, dy = dy, xp = xp, yp = yp,
      discipline = 3, category = 0, number = 0,
      refTimeEpochSec = 1700000000L)
    val m = Grib2.scan(p).head
    assert(m.grid.template == 90)
    val sv = m.grid.spaceView.get
    assert(math.abs(sv.lop - lop) < 1e-6 && math.abs(sv.nr - nr) < 1e-6)
    assert(sv.dx == 30 && sv.xp == 16.0 && sv.xo == 0)
    val got = Grib2.decodeValues(p, m)
    vals.indices.foreach(i => assert(
      (vals(i).isNaN && got(i).isNaN) ||
        math.abs(got(i) - vals(i)) <= 0.005 + 1e-9, s"point $i"))
    val (lats, lons) = Grib2.latLonArrays(m.grid)
    // fixed point: the sub-satellite pixel maps to exactly (0, lop)
    val kSub = 16 * nx + 16
    assert(math.abs(lats(kSub)) < 1e-9 &&
      math.abs(lons(kSub) - normIn(lop)) < 1e-9)
    // independent FORWARD identity: from each output (lat, lon), build
    // the ground point on the unit sphere, aim a ray from the satellite
    // S = (nr, 0, 0) at it, and recover the scan angles — they must be
    // the grid's input angles (inverse and forward written separately)
    for (j <- 0 until ny; i <- 0 until nx) {
      val k = j * nx + i
      if (!lats(k).isNaN) {
        val phi = math.toRadians(lats(k))
        val dLam = math.toRadians(lons(k) - lop)
        val px = math.cos(phi) * math.cos(dLam)
        val py = math.cos(phi) * math.sin(dLam)
        val pz = math.sin(phi)
        val vx = px - nr; val vy = py; val vz = pz
        val aF = math.atan2(vy, -vx)
        val bF = math.asin(vz / math.sqrt(vx * vx + vy * vy + vz * vz))
        val aIn = (i - xp) * app / dx
        val bIn = (yp - j) * app / dy
        assert(math.abs(aF - aIn) < 1e-9, s"scan a at ($j,$i)")
        assert(math.abs(bF - bIn) < 1e-9, s"scan b at ($j,$i)")
      } else assert(!onDisk(i, j), s"NaN on-disk at ($j,$i)")
    }
    // local scale near nadir: one pixel step covers about
    // (H - R)·step of ground arc (the vertical-perspective limit)
    val gStep = math.toRadians(lons(kSub + 1) - lons(kSub))
    val expect = (nr - 1.0) * app / dx
    assert(math.abs(gStep - expect) / expect < 0.01,
      s"near-nadir scale $gStep vs differential $expect")
    // named errors: nonzero sub-satellite latitude, orthographic Nr
    val bytes = Files.readAllBytes(Paths.get(p))
    var off = 16; var s3Off = -1
    while (s3Off < 0) {
      val len = java.nio.ByteBuffer.wrap(bytes, off, 4).getInt
      if (bytes(off + 4) == 3) s3Off = off else off += len
    }
    val mLap = bytes.clone()
    mLap(s3Off + 41) = 1.toByte // Lap -> nonzero microdegrees
    Files.write(Paths.get(s"$dir/lap.grib2"), mLap)
    val e1 = intercept[IllegalArgumentException] {
      Grib2.scan(s"$dir/lap.grib2") }
    assert(e1.getMessage.contains("sub-satellite latitude"), e1.getMessage)
    val mNr = bytes.clone()
    (68 to 71).foreach(o => mNr(s3Off + o) = 0xFF.toByte) // Nr -> missing
    Files.write(Paths.get(s"$dir/nr.grib2"), mNr)
    val e2 = intercept[IllegalArgumentException] {
      Grib2.scan(s"$dir/nr.grib2") }
    assert(e2.getMessage.contains("orthographic"), e2.getMessage)
  }

  private def normIn(l: Double): Double = {
    var v = l % 360.0; if (v < 0) v += 360.0; v
  }

  test("probability limits are sign-magnitude: negative threshold round-trips") {
    val dir = Files.createTempDirectory("graft_grib").toString
    val nx = 4; val ny = 3
    val vals = Array.tabulate(nx * ny)(i => (i * 7 % 101).toDouble)
    val p = s"$dir/prob_neg.grib2"
    // P(TMP below -5 degC): type 0 = below lower limit, scale 0 value -5
    Grib2.writeProbability(p, vals, nx, ny, la1 = 55.0, lo1 = 10.0,
      dLat = 0.5, dLon = 0.5, discipline = 0, category = 0, number = 0,
      refTimeEpochSec = 1700000000L, probNumber = 0, probTotal = 10,
      probType = 0, lower = Some((0, -5)), upper = None)
    val m = Grib2.scan(p).head
    assert(m.product.probLower == -5.0,
      s"negative limit decoded as ${m.product.probLower}")
    // and the WIRE carries sign-magnitude (0x80000005), not two's
    // complement — octet 39 of section 4 is the value's high byte
    val bytes = Files.readAllBytes(Paths.get(p))
    var off = 16; var s4Off = -1
    while (s4Off < 0) {
      val len = java.nio.ByteBuffer.wrap(bytes, off, 4).getInt
      if (bytes(off + 4) == 4) s4Off = off else off += len
    }
    assert((bytes(s4Off + 38) & 0xFF) == 0x80 &&
      (bytes(s4Off + 41) & 0xFF) == 5,
      "wire limit must be sign-magnitude 0x80000005")
  }
}
