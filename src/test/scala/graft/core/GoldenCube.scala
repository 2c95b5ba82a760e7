package graft.core

import graft.core.Attrs.Attrs

/** Synthetic golden dataset — make_ds analog (tests/data_generation.py:6-45):
  * seeded nt×18×36 time/lat/lon cube, float64 `foo` + int64 `bar`, CF attrs,
  * time carried CF-encoded (days-since int64 + units/calendar attrs). The
  * round-trip assertion is exact equality against this in-memory cube.
  */
object GoldenCube {

  val NY = 18
  val NX = 36

  def attrsOf(pairs: (String, AttrValue)*): Attrs = pairs.toMap

  def makeDs(nt: Int = 10, nonDimCoords: Boolean = false, startDay: Int = 0): Fragment = {
    val rng = new scala.util.Random(2)
    val time = NDArray(DType.I8, Vector(nt),
      (startDay until startDay + nt).map(_.toLong).toArray)
    val lat = NDArray(DType.F8, Vector(NY),
      (0 until NY).map(i => -85.0 + i * 10.0).toArray)
    val lon = NDArray(DType.F8, Vector(NX),
      (0 until NX).map(i => 5.0 + i * 10.0).toArray)
    val foo = NDArray(DType.F8, Vector(nt, NY, NX),
      Array.fill(nt * NY * NX)(rng.nextDouble()))
    val bar = NDArray(DType.I8, Vector(nt, NY, NX),
      Array.fill(nt * NY * NX)(rng.nextInt(10).toLong))

    var coords = Map(
      "time" -> Variable(Vector("time"), time,
        attrsOf("units" -> AttrValue("days since 2010-01-01"),
          "calendar" -> AttrValue("proleptic_gregorian"))),
      "lat" -> Variable(Vector("lat"), lat,
        attrsOf("units" -> AttrValue("degrees_north"), "long_name" -> AttrValue("latitude"))),
      "lon" -> Variable(Vector("lon"), lon,
        attrsOf("units" -> AttrValue("degrees_east"), "long_name" -> AttrValue("longitude"))))
    if (nonDimCoords) {
      coords += "timestep" -> Variable(Vector("time"),
        NDArray(DType.I8, Vector(nt), (startDay until startDay + nt).map(_.toLong).toArray))
      coords += "baz" -> Variable(Vector("lat", "lon"),
        NDArray(DType.F8, Vector(NY, NX), Array.fill(NY * NX)(rng.nextDouble())))
    }
    Fragment(
      dims = Map("time" -> nt, "lat" -> NY, "lon" -> NX),
      coords = coords,
      dataVars = Map(
        "foo" -> Variable(Vector("time", "lat", "lon"), foo,
          attrsOf("long_name" -> AttrValue("Fantastic Foo"))),
        "bar" -> Variable(Vector("time", "lat", "lon"), bar,
          attrsOf("long_name" -> AttrValue("Beautiful Bar")))),
      attrs = attrsOf("conventions" -> AttrValue("CF 1.6")))
  }

  /** Split the cube into daily (or n-day) slices along time —
    * the sequential_1d / sequential_2d fixture layouts (conftest.py:60-146). */
  def splitByTime(ds: Fragment, daysPerFile: Int): Vector[Fragment] = {
    val nt = ds.dims("time")
    (0 until nt by daysPerFile).map { t0 =>
      ds.isel(Map("time" -> Slc(t0, math.min(t0 + daysPerFile, nt))))
    }.toVector
  }

  /** Additionally split by variable — the multivariable fixture layout. */
  def splitByVariable(ds: Fragment): Map[String, Fragment] =
    ds.dataVars.keys.map { v =>
      v -> ds.copy(dataVars = Map(v -> ds.dataVars(v)))
    }.toMap
}
