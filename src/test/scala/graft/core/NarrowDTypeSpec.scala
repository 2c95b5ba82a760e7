package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.zarr.{ZarrGroup, ZarrStore}
import graft.netcdf.NetCDF3
import graft.hdf5.{HDF5, HDF5Writer}
import graft.kerchunk.RefSet

/** The narrow integer dtypes (int8/int16/uint8/uint16) across the whole
  * surface: core NDArray semantics, zarr v3 + v2 stores, NetCDF3 classic
  * external types NC_BYTE/NC_SHORT, HDF5 1/2-byte fixed-point (signed and
  * unsigned), DAP2 Byte/Int16/UInt16, and the kerchunk scanners' raw-byte
  * refs. Real climate archives are predominantly narrow-typed (NOAA OISST
  * ships int16 + scale_factor, QC flags ship uint8), so the reference's
  * numpy-backed stack handles these everywhere; promotion oracles below are
  * np.promote_types outputs. */
class NarrowDTypeSpec extends AnyFunSuite {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"narrow_$tag").toString

  // ------------------------------------------------------------- core

  test("promotion lattice matches np.promote_types") {
    import DType._
    val oracle = Seq(
      (I1, I1) -> I1, (U1, U1) -> U1, (I2, U2) -> I4, (U1, I1) -> I2,
      (U1, I2) -> I2, (U1, U2) -> U2, (U2, I2) -> I4, (U2, I4) -> I4,
      (U2, I8) -> I8, (I1, I2) -> I2, (I1, I4) -> I4, (I2, I8) -> I8,
      (I1, F4) -> F4, (I2, F4) -> F4, (U1, F4) -> F4, (U2, F4) -> F4,
      (I1, F8) -> F8, (U2, F8) -> F8,
      // the pre-existing wide rules must be unchanged
      (I4, F4) -> F8, (I8, F4) -> F8, (I4, I8) -> I8, (F4, F8) -> F8)
    oracle.foreach { case ((a, b), want) =>
      assert(DType.promote(a, b) == want, s"promote($a, $b)")
      assert(DType.promote(b, a) == want, s"promote($b, $a)")
    }
    // the wide unsigned corner: u4 + signed -> i8; u8 + signed -> f8 (numpy)
    val wide = Seq(
      (U4, U1) -> U4, (U4, U2) -> U4, (U4, U4) -> U4, (U8, U4) -> U8,
      (U4, I1) -> I8, (U4, I4) -> I8, (U4, I8) -> I8,
      (U8, I1) -> F8, (U8, I8) -> F8,
      (U4, F4) -> F8, (U8, F4) -> F8, (U8, F8) -> F8)
    wide.foreach { case ((a, b), want) =>
      assert(DType.promote(a, b) == want, s"promote($a, $b)")
      assert(DType.promote(b, a) == want, s"promote($b, $a)")
    }
  }

  test("uint32/uint64 mask and round-trip through zarr and HDF5") {
    val u4 = NDArray(DType.U4, Vector(2), Array(-1, 7)) // 4294967295, 7
    assert(u4.getLong(0) == 4294967295L)
    assert(u4.getDouble(0) == 4294967295.0)
    val u8 = NDArray(DType.U8, Vector(1), Array(-1L)) // 2^64 - 1
    assert(u8.getDouble(0) == 1.8446744073709552E19)
    // zarr v2 spellings + store round trip
    val root = tmp("u4")
    val g = ZarrGroup(root, format = 2)
    g.initGroup(Map.empty)
    g.createArray("c", Vector(2), Vector(2), DType.U4, Attrs.empty)
    g.writeRegion("c", Vector(0), u4)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "c", ".zarray"))).contains("\"<u4\""))
    val back = ZarrGroup(root).readArray("c")
    assert(back.dtype == DType.U4 && back.getLong(0) == 4294967295L)
    // HDF5 unsigned 4/8-byte fixed-point keeps width and sign (the old
    // path widened uint32 to int64, breaking raw-byte kerchunk refs)
    val f = Fragment(
      dims = Map("t" -> 2),
      coords = Map("t" -> Variable(Vector("t"),
        NDArray(DType.I4, Vector(2), Array(0, 1)), Map.empty)),
      dataVars = Map(
        "n4" -> Variable(Vector("t"), u4, Map.empty),
        "n8" -> Variable(Vector("t"),
          NDArray(DType.U8, Vector(2), Array(-1L, 3L)), Map.empty)),
      attrs = Map.empty)
    val p = tmp("h5u") + "/u.nc4"
    HDF5Writer.write(p, f)
    val h = HDF5.read(p)
    assert(h.dataVars("n4").dtype == DType.U4)
    assert(h.dataVars("n4").data.getLong(0) == 4294967295L)
    assert(h.dataVars("n8").dtype == DType.U8)
    assert(h.sameAs(f))
    // and the kerchunk scanner can raw-ref the uint32 dataset now
    val mat = tmp("h5umat")
    RefSet.scanHdf5(p).materialize(mat)
    assert(ZarrGroup(mat).readArray("n4").sameElements(u4))
  }

  test("unsigned reads mask; signed reads sign-extend; astype wraps") {
    val u1 = NDArray(DType.U1, Vector(2), Array[Byte](-1, 5)) // 255, 5
    assert(u1.getLong(0) == 255L && u1.getDouble(0) == 255.0)
    val i1 = NDArray(DType.I1, Vector(2), Array[Byte](-1, 5))
    assert(i1.getLong(0) == -1L)
    val u2 = NDArray(DType.U2, Vector(1), Array[Short](-2)) // 65534
    assert(u2.getLong(0) == 65534L && u2.getDouble(0) == 65534.0)
    val i2 = NDArray(DType.I2, Vector(1), Array[Short](-2))
    assert(i2.getLong(0) == -2L)
    // widening casts are value-preserving (unsigned included)
    assert(u2.astype(DType.I4).data.asInstanceOf[Array[Int]].head == 65534)
    assert(u1.astype(DType.F8).data.asInstanceOf[Array[Double]].head == 255.0)
    // narrowing casts wrap (numpy astype)
    val big = NDArray(DType.I4, Vector(2), Array(300, -1))
    assert(big.astype(DType.U1).data.asInstanceOf[Array[Byte]]
      .sameElements(Array[Byte](44, -1)))
    assert(big.astype(DType.I2).data.asInstanceOf[Array[Short]]
      .sameElements(Array[Short](300, -1)))
  }

  // ------------------------------------------------------------- zarr

  test("zarr v3 store round-trips every narrow dtype (compressed)") {
    val g = ZarrGroup(tmp("v3"))
    g.initGroup(Map.empty)
    val cases: Seq[(String, DType, AnyRef)] = Seq(
      ("a_i1", DType.I1, Array[Byte](-128, -1, 0, 1, 127, 4)),
      ("a_u1", DType.U1, Array[Byte](0, 1, -1, -128, 7, 9)), // 255, 128 ...
      ("a_i2", DType.I2, Array[Short](-32768, -1, 0, 1, 32767, 6)),
      ("a_u2", DType.U2, Array[Short](0, -1, 1, -32768, 2, 3)))
    cases.foreach { case (name, dt, data) =>
      g.createArray(name, Vector(6), Vector(4), dt, Attrs.empty,
        gzipLevel = Some(5))
      g.writeRegion(name, Vector(0), NDArray(dt, Vector(6), data))
      val back = g.readArray(name)
      assert(back.dtype == dt, name)
      assert(back.sameElements(NDArray(dt, Vector(6), data)), name)
    }
    // metadata carries the numpy names
    val doc = new String(Files.readAllBytes(
      java.nio.file.Paths.get(g.root, "a_u2", "zarr.json")))
    assert(doc.contains("\"uint16\""))
  }

  test("zarr v2 store round-trips narrow dtypes with numpy spellings") {
    val root = tmp("v2")
    val g = ZarrGroup(root, format = 2)
    g.initGroup(Map.empty)
    g.createArray("f", Vector(4), Vector(4), DType.U1, Attrs.empty)
    g.writeRegion("f", Vector(0),
      NDArray(DType.U1, Vector(4), Array[Byte](0, -1, 2, -128)))
    g.createArray("s", Vector(4), Vector(4), DType.I2, Attrs.empty,
      gzipLevel = Some(6))
    g.writeRegion("s", Vector(0),
      NDArray(DType.I2, Vector(4), Array[Short](-5, 0, 5, 32767)))
    val fDoc = new String(Files.readAllBytes(
      java.nio.file.Paths.get(root, "f", ".zarray")))
    assert(fDoc.contains("\"|u1\""), fDoc)
    val sDoc = new String(Files.readAllBytes(
      java.nio.file.Paths.get(root, "s", ".zarray")))
    assert(sDoc.contains("\"<i2\""), sDoc)
    // fresh open auto-detects v2 and preserves the dtypes
    val back = ZarrGroup(root)
    assert(back.readArray("f").dtype == DType.U1)
    assert(back.readArray("f").getLong(3) == 128L)
    assert(back.readArray("s").dtype == DType.I2)
    assert(back.readArray("s").getLong(0) == -5L)
    // the v2 kerchunk scanner serves them in place too
    val rs = RefSet.scanZarrV2Group(root)
    assert(rs.asZarrGroup(root).readArray("s")
      .sameElements(back.readArray("s")))
  }

  // ---------------------------------------------------------- netcdf3

  private def narrowCube(nt: Int): Fragment = Fragment(
    dims = Map("time" -> nt, "x" -> 5),
    coords = Map(
      "time" -> Variable(Vector("time"),
        NDArray(DType.I4, Vector(nt), (0 until nt).toArray),
        Map("units" -> AttrValue("days since 2020-01-01"))),
      "x" -> Variable(Vector("x"),
        NDArray(DType.F8, Vector(5), (0 until 5).map(_ * 0.5).toArray))),
    dataVars = Map(
      "sst" -> Variable(Vector("time", "x"), // the OISST shape: i2 + scale
        NDArray(DType.I2, Vector(nt, 5),
          Array.tabulate[Short](nt * 5)(i => (i * 37 - 500).toShort)),
        Map("scale_factor" -> AttrValue(0.01),
          "add_offset" -> AttrValue(0.0))),
      "qc" -> Variable(Vector("time", "x"), // QC flags: NC_BYTE
        NDArray(DType.I1, Vector(nt, 5),
          Array.tabulate[Byte](nt * 5)(i => (i % 5).toByte)), Map.empty)),
    attrs = Map("title" -> AttrValue("narrow")))

  test("NetCDF3 writes and reads NC_BYTE/NC_SHORT width-preserving") {
    val f = narrowCube(4)
    val p = tmp("nc") + "/narrow.nc"
    NetCDF3.write(p, f)
    val back = NetCDF3.read(p)
    assert(back.dataVars("sst").data.dtype == DType.I2)
    assert(back.dataVars("qc").data.dtype == DType.I1)
    assert(back.sameAs(f))
    // record layout interleaves padded byte/short record slabs
    val pr = tmp("ncrec") + "/narrow_rec.nc"
    NetCDF3.write(pr, f, recordDim = Some("time"))
    assert(NetCDF3.read(pr).sameAs(f))
  }

  test("scanNetCDF3 emits raw-byte refs for narrow variables") {
    val f = narrowCube(3)
    val dir = tmp("ncscan")
    val p = s"$dir/narrow.nc"
    NetCDF3.write(p, f)
    val rs = RefSet.scanNetCDF3(p, inlineThreshold = 0)
    val mat = s"$dir/mat.zarr"
    rs.materialize(mat)
    val g = ZarrGroup(mat)
    assert(g.readArray("sst").sameElements(f.dataVars("sst").data))
    assert(g.readArray("qc").sameElements(f.dataVars("qc").data))
  }

  // ------------------------------------------------------------- hdf5

  test("HDF5 writes and reads narrow fixed-point, signed and unsigned") {
    val nt = 3
    val f = Fragment(
      dims = Map("t" -> nt),
      coords = Map("t" -> Variable(Vector("t"),
        NDArray(DType.I4, Vector(nt), (0 until nt).toArray), Map.empty)),
      dataVars = Map(
        "flags" -> Variable(Vector("t"),
          NDArray(DType.U1, Vector(nt), Array[Byte](0, -1, 17)), Map.empty),
        "anom" -> Variable(Vector("t"),
          NDArray(DType.I2, Vector(nt), Array[Short](-300, 0, 300)), Map.empty),
        "cnt" -> Variable(Vector("t"),
          NDArray(DType.U2, Vector(nt), Array[Short](-1, 1, 2)), Map.empty)),
      attrs = Map.empty)
    val p = tmp("h5") + "/narrow.nc4"
    HDF5Writer.write(p, f, chunks = Map("anom" -> Vector(2)),
      deflateLevel = Some(4), shuffle = true)
    val back = HDF5.read(p)
    assert(back.dataVars("flags").data.dtype == DType.U1)
    assert(back.dataVars("flags").data.getLong(1) == 255L)
    assert(back.dataVars("anom").data.dtype == DType.I2)
    assert(back.dataVars("cnt").data.dtype == DType.U2)
    assert(back.dataVars("cnt").data.getLong(0) == 65535L)
    assert(back.sameAs(f))
    // the kerchunk scanner refs the raw (deflated+shuffled) narrow chunks
    val rs = RefSet.scanHdf5(p)
    val mat = tmp("h5mat")
    rs.materialize(mat)
    assert(ZarrGroup(mat).readArray("anom")
      .sameElements(f.dataVars("anom").data))
  }

  // -------------------------------------------------------------- dap2

  test("DAP2 round-trips Byte/Int16/UInt16 through the XDR encoding") {
    val nt = 5 // odd count exercises the XDR byte-padding path
    val f = Fragment(
      dims = Map("t" -> nt),
      coords = Map("t" -> Variable(Vector("t"),
        NDArray(DType.I4, Vector(nt), (0 until nt).toArray), Map.empty)),
      dataVars = Map(
        "b" -> Variable(Vector("t"),
          NDArray(DType.U1, Vector(nt), Array[Byte](0, 1, -1, -128, 7)),
          Map.empty),
        "s" -> Variable(Vector("t"),
          NDArray(DType.I2, Vector(nt), Array[Short](-3, -1, 0, 1, 3)),
          Map.empty),
        "u" -> Variable(Vector("t"),
          NDArray(DType.U2, Vector(nt), Array[Short](0, -1, 1, 2, 3)),
          Map.empty)),
      attrs = Map.empty)
    val (_, _, dods) = graft.dap.Dap2.encode(f, "narrow.nc")
    val (_, arrays) = graft.dap.Dap2.parseDods(dods)
    assert(arrays("b")._1 == DType.U1)
    assert(arrays("b")._2.asInstanceOf[Array[Byte]]
      .sameElements(Array[Byte](0, 1, -1, -128, 7)))
    assert(arrays("s")._1 == DType.I2)
    assert(arrays("s")._2.asInstanceOf[Array[Short]]
      .sameElements(Array[Short](-3, -1, 0, 1, 3)))
    assert(arrays("u")._1 == DType.U2)
    assert(arrays("u")._2.asInstanceOf[Array[Short]]
      .sameElements(Array[Short](0, -1, 1, 2, 3)))
  }
}
