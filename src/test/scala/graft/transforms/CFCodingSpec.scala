package graft.transforms

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.netcdf.NetCDF3
import graft.patterns.FileType

/** CF mask-and-scale coding (the xr.open_dataset `mask_and_scale=True`
  * default the reference's OpenWithXarray stage inherits,
  * openers.py:62-88): packed narrow ints + scale_factor/add_offset/
  * _FillValue decode to floats with NaN holes; cfEncode is the write-time
  * inverse. */
class CFCodingSpec extends AnyFunSuite {

  private def packedFragment: Fragment = Fragment(
    dims = Map("x" -> 4),
    coords = Map("x" -> Variable(Vector("x"),
      NDArray(DType.I4, Vector(4), (0 until 4).toArray), Map.empty)),
    dataVars = Map(
      "sst" -> Variable(Vector("x"), // OISST-shaped: i2 + scale + fill
        NDArray(DType.I2, Vector(4), Array[Short](1234, -999, 0, -1234)),
        Map("scale_factor" -> AttrValue(0.01),
          "add_offset" -> AttrValue(5.0),
          "_FillValue" -> AttrValue(-999L),
          "units" -> AttrValue("degC"))),
      "flags" -> Variable(Vector("x"), // _Unsigned convention, no scaling
        NDArray(DType.I1, Vector(4), Array[Byte](0, -1, 3, -128)),
        Map("_Unsigned" -> AttrValue("true"))),
      "plain" -> Variable(Vector("x"), // untouched passthrough
        NDArray(DType.I4, Vector(4), Array(1, 2, 3, 4)),
        Map("long_name" -> AttrValue("unpacked")))),
    attrs = Map.empty)

  test("cfDecode unpacks scale/offset, masks fills, honors _Unsigned") {
    val d = Preprocess.cfDecode(packedFragment)
    val sst = d.dataVars("sst")
    assert(sst.dtype == DType.F8)
    val vals = sst.data.data.asInstanceOf[Array[Double]]
    assert(vals(0) == 1234 * 0.01 + 5.0)
    assert(vals(1).isNaN) // _FillValue hole
    assert(vals(2) == 5.0)
    assert(vals(3) == -1234 * 0.01 + 5.0)
    // consumed attrs dropped, user attrs kept
    assert(!sst.attrs.contains("scale_factor") && !sst.attrs.contains("_FillValue"))
    assert(sst.attrs("units") == AttrValue("degC"))
    // unsigned reinterpretation without scaling stays integral
    val flags = d.dataVars("flags")
    assert(flags.dtype == DType.U1)
    assert(flags.data.getLong(1) == 255L && flags.data.getLong(3) == 128L)
    assert(!flags.attrs.contains("_Unsigned"))
    // untouched variable is bit-identical
    assert(d.dataVars("plain").data.sameElements(
      packedFragment.dataVars("plain").data))
  }

  test("cfEncode round-trips through cfDecode (NaN -> fill -> NaN)") {
    val decoded = Preprocess.cfDecode(packedFragment)
    val re = Preprocess.cfEncode(decoded, "sst", scaleFactor = 0.01,
      addOffset = 5.0, fillValue = -999L, astype = DType.I2)
    assert(re.dataVars("sst").data.data.asInstanceOf[Array[Short]]
      .sameElements(Array[Short](1234, -999, 0, -1234)))
    // and decoding the re-encoded fragment reproduces the floats
    val d2 = Preprocess.cfDecode(re)
    val a = d2.dataVars("sst").data.data.asInstanceOf[Array[Double]]
    val b = decoded.dataVars("sst").data.data.asInstanceOf[Array[Double]]
    assert(a.indices.forall(i =>
      (a(i).isNaN && b(i).isNaN) || a(i) == b(i)))
  }

  test("Openers.open applies mask-and-scale by default, raw on opt-out") {
    val p = java.nio.file.Files.createTempDirectory("cf").toString + "/p.nc"
    NetCDF3.write(p, packedFragment)
    val opened = Openers.open(FileType.Netcdf3, p)
    assert(opened.dataVars("sst").dtype == DType.F8)
    assert(opened.dataVars("sst").data.data.asInstanceOf[Array[Double]](1).isNaN)
    val raw = Openers.open(FileType.Netcdf3, p, maskAndScale = false)
    assert(raw.dataVars("sst").dtype == DType.I2)
    assert(raw.dataVars("sst").attrs.contains("scale_factor"))
  }
}
