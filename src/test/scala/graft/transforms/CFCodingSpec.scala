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

  // ------------------------------------------------- CF calendar decode

  private def cal360Fragment: Fragment = {
    // a 360_day monthly cube: time encoded as "days since 2000-01-01" in
    // 30-day steps — exactly the CMIP-style axis cftime decodes
    val enc = Array.tabulate(14)(i => i.toLong * 30)
    Fragment(
      dims = Map("time" -> 14),
      coords = Map("time" -> Variable(Vector("time"),
        NDArray(DType.I8, Vector(14), enc),
        Map("units" -> AttrValue("days since 2000-01-01"),
          "calendar" -> AttrValue("360_day")))),
      dataVars = Map("tas" -> Variable(Vector("time"),
        NDArray(DType.F8, Vector(14), Array.tabulate(14)(_.toDouble)),
        Map("units" -> AttrValue("K")))),
      attrs = Map.empty)
  }

  test("decodeTimes on a 360_day cube: months advance by exactly one") {
    val d = Preprocess.decodeTimes(cal360Fragment)
    val y = d.coords("time_year").data
    val m = d.coords("time_month").data
    val dd = d.coords("time_day").data
    // 14 steps of 30 days: months 1..12 of year 2000, then 1..2 of 2001
    (0 until 14).foreach { i =>
      assert(y.getLong(i) == 2000 + i / 12, s"step $i year")
      assert(m.getLong(i) == i % 12 + 1, s"step $i month")
      assert(dd.getLong(i) == 1, s"step $i day")
    }
    // data vars untouched, companions carry provenance
    assert(d.dataVars("tas").data.sameElements(
      cal360Fragment.dataVars("tas").data))
    assert(d.coords("time_year").attrs("cf_decoded_from") ==
      AttrValue("time"))
    // non-time variables get no companions
    assert(!d.dataVars.contains("tas_year"))
  }

  test("encodeTimes round-trips decodeTimes exactly (360_day and noleap)") {
    for (cal <- Seq("360_day", "noleap", "all_leap", "proleptic_gregorian",
      "standard", "julian")) {
      val f0 = cal360Fragment
      val f = f0.copy(coords = f0.coords.updated("time",
        f0.coords("time").copy(attrs = f0.coords("time").attrs
          .updated("calendar", AttrValue(cal)))))
      val rt = Preprocess.encodeTimes(Preprocess.decodeTimes(f), "time")
      assert(rt.coords("time").data.sameElements(f.coords("time").data),
        s"calendar $cal")
      assert(!rt.coords.contains("time_year"), s"calendar $cal companions")
    }
  }

  test("noleap/all_leap: Feb 29 exists only in all_leap; 2000 is leap in gregorian") {
    import graft.core.CfCalendar._
    val u = parseUnits("days since 2000-02-28")
    assert(num2date(1, u, "noleap") == DateTime(2000, 3, 1))
    assert(num2date(1, u, "all_leap") == DateTime(2000, 2, 29))
    assert(num2date(1, u, "proleptic_gregorian") == DateTime(2000, 2, 29))
    assert(num2date(1, u, "standard") == DateTime(2000, 2, 29))
    // 1900: Gregorian century non-leap, Julian leap — the calendars split
    val u1900 = parseUnits("days since 1900-02-28")
    assert(num2date(1, u1900, "proleptic_gregorian") == DateTime(1900, 3, 1))
    assert(num2date(1, u1900, "standard") == DateTime(1900, 3, 1))
    assert(num2date(1, u1900, "julian") == DateTime(1900, 2, 29))
  }

  test("standard calendar: the 1582 Gregorian reform gap is exact") {
    import graft.core.CfCalendar._
    val u = parseUnits("days since 1582-10-04")
    // the day after Julian 1582-10-04 is Gregorian 1582-10-15
    assert(num2date(0, u, "standard") == DateTime(1582, 10, 4))
    assert(num2date(1, u, "standard") == DateTime(1582, 10, 15))
    assert(num2date(2, u, "standard") == DateTime(1582, 10, 16))
    // the dropped dates fail by name
    val e = intercept[IllegalArgumentException] {
      date2num(DateTime(1582, 10, 9), u, "standard")
    }
    assert(e.getMessage.contains("does not exist"))
    // proleptic_gregorian has no gap: Oct 5..14 exist there
    assert(date2num(DateTime(1582, 10, 14), u, "proleptic_gregorian") -
      date2num(DateTime(1582, 10, 5), u, "proleptic_gregorian") == 9)
  }

  test("proleptic_gregorian matches java.time over a 3000-year sweep") {
    import graft.core.CfCalendar._
    val u = parseUnits("days since 1970-01-01")
    // prime stride so month/era boundaries land on many offsets
    var n = -500000L // ~600 CE
    while (n < 600000L) { // ~3600 CE
      val dt = num2date(n, u, "proleptic_gregorian")
      val jd = java.time.LocalDate.ofEpochDay(n)
      assert(dt.year == jd.getYear && dt.month == jd.getMonthValue &&
        dt.day == jd.getDayOfMonth, s"epoch day $n: $dt vs $jd")
      assert(date2num(dt, u, "proleptic_gregorian") == n)
      n += 1709
    }
  }

  test("num2date honors sub-day units and time-of-day epochs") {
    import graft.core.CfCalendar._
    // epoch valid in BOTH calendars (360_day has no Dec 31 — decoding
    // an epoch that names one fails by name, also asserted below)
    val u = parseUnits("hours since 1999-12-30 18:30:00")
    assert(num2date(0, u, "360_day") == DateTime(1999, 12, 30, 18, 30))
    assert(num2date(6, u, "360_day") == DateTime(2000, 1, 1, 0, 30))
    assert(num2date(6, u, "proleptic_gregorian") ==
      DateTime(1999, 12, 31, 0, 30))
    assert(num2date(36, u, "proleptic_gregorian") ==
      DateTime(2000, 1, 1, 6, 30))
    intercept[IllegalArgumentException](num2date(0,
      parseUnits("days since 1999-12-31"), "360_day"))
    val secs = parseUnits("seconds since 1970-01-01")
    assert(num2date(86399, secs, "standard") ==
      DateTime(1970, 1, 1, 23, 59, 59))
    assert(num2date(-1, secs, "standard") ==
      DateTime(1969, 12, 31, 23, 59, 59))
    // named failures: fractional float time, bad unit, bad calendar
    intercept[IllegalArgumentException](parseUnits("fortnights since 2000-01-01"))
    intercept[IllegalArgumentException](num2date(0,
      parseUnits("days since 2000-01-01"), "martian"))
  }

  test("decodeTimes carries sub-second instants in the _microsecond companion (r13)") {
    // millisecond units with instants OFF the whole-second grid — the
    // cftime-representable case that was a named error before r13
    val f0 = cal360Fragment
    val f = f0.copy(coords = f0.coords.updated("time",
      f0.coords("time").copy(
        data = NDArray(DType.I8, Vector(14),
          Array.tabulate(14)(i => i.toLong * 1000 + (if (i == 3) 1 else 0))),
        attrs = f0.coords("time").attrs
          .updated("units", AttrValue("milliseconds since 2000-01-01")))))
    val d = Preprocess.decodeTimes(f)
    val micro = d.coords("time_microsecond").data
    assert((0 until 14).forall(i =>
      micro.getLong(i) == (if (i == 3) 1000L else 0L)),
      "microsecond companion values")
    assert(d.coords("time_second").data.getLong(13) == 13L)
    // bit-exact inverse: encodeTimes re-derives the ms encoding from
    // the seven companions and verifies equality
    val rt = Preprocess.encodeTimes(d, "time")
    assert(rt.coords.keySet == f.coords.keySet)
    assert(rt.coords("time").data.sameElements(f.coords("time").data))
    // sub-second EPOCHS parse too ("since ...58.500"), and microsecond
    // units decode exactly
    val f2 = f0.copy(coords = f0.coords.updated("time",
      f0.coords("time").copy(
        data = NDArray(DType.I8, Vector(14),
          Array.tabulate(14)(i => i.toLong * 250000)),
        attrs = f0.coords("time").attrs.updated("units",
          AttrValue("microseconds since 1999-12-31 23:59:58.500"))
          .updated("calendar", AttrValue("proleptic_gregorian")))))
    val d2 = Preprocess.decodeTimes(f2)
    // epoch 58.5s + i*0.25s: element 6 = 1h30m... element 6 -> 58.5+1.5
    // = 60.0s -> 1999-12-31 23:59:60 -> 2000-01-01 00:00:00.0
    assert(d2.coords("time_year").data.getLong(6) == 2000L)
    assert(d2.coords("time_microsecond").data.getLong(6) == 0L)
    assert(d2.coords("time_microsecond").data.getLong(1) == 750000L)
    assert(Preprocess.encodeTimes(d2, "time")
      .coords("time").data.sameElements(f2.coords("time").data))
  }

  test("decodeTimes: float fractions on the µs grid decode; off-grid fail by name") {
    // 0.25-day steps (the 6-hourly reanalysis axis cftime also decodes):
    // x·stepMicros is an exact integer, so the companions are exact and
    // encodeTimes reproduces the doubles bit-for-bit
    val f0 = cal360Fragment
    val quarters = f0.copy(coords = f0.coords.updated("time",
      f0.coords("time").copy(data =
        NDArray(DType.F8, Vector(14), Array.tabulate(14)(_ * 0.25)))))
    val d = Preprocess.decodeTimes(quarters)
    assert((0 until 14).forall(i =>
      d.coords("time_hour").data.getLong(i) == (i % 4) * 6 &&
        d.coords("time_day").data.getLong(i) == 1 + i / 4))
    val rt = Preprocess.encodeTimes(d, "time")
    assert(rt.coords("time").data.sameElements(
      quarters.coords("time").data))
    // An instant genuinely OFF the microsecond grid (a half-microsecond
    // step — finer than CF's finest unit) is a named error, never a
    // rounded decode. Coarser-unit fractions (0.1 days etc.) round to
    // integral µs IN DOUBLE ARITHMETIC (the stored value is exactly
    // on-grid: residue < double spacing), so they decode exactly — the
    // same values cftime yields for them.
    val f = f0.copy(coords = f0.coords.updated("time",
      f0.coords("time").copy(data =
        NDArray(DType.F8, Vector(14),
          Array.tabulate(14)(i => if (i == 7) 0.5 else i.toDouble)),
        attrs = f0.coords("time").attrs.updated("units",
          AttrValue("microseconds since 2000-01-01")))))
    val e = intercept[IllegalArgumentException](Preprocess.decodeTimes(f))
    assert(e.getMessage.contains("microsecond instant"), e.getMessage)
    // Products in (2^53, Long.MaxValue) are rejected too (r14): above
    // 2^53 every double is integral so the exactness check is vacuous —
    // m.toLong could silently deviate from the exact product. 200000
    // days = 1.728e16 µs > 2^53.
    val big = f0.copy(coords = f0.coords.updated("time",
      f0.coords("time").copy(data =
        NDArray(DType.F8, Vector(14),
          Array.tabulate(14)(i => if (i == 3) 200000.0 else i.toDouble)))))
    val e2 = intercept[IllegalArgumentException](Preprocess.decodeTimes(big))
    assert(e2.getMessage.contains("microsecond instant"), e2.getMessage)
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
