package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core._
import graft.kerchunk.RefSet
import graft.netcdf.NetCDF3
import graft.patterns.{FilePattern, FileType}
import graft.transforms.Pipelines
import graft.zarr.ZarrGroup
import java.nio.file.Files

/** NetCDF3 end-to-end through BOTH reference entry points
  * (tests/test_end_to_end.py:37-60 shape, netcdf3 fixtures as in
  * tests/conftest.py:60-146):
  *
  *   A. decoder pipeline — .nc files → OpenWithXarray(scipy analog) →
  *      DetermineSchema → Rechunk → Zarr store → reopen → exact equality
  *   B. kerchunk pipeline — header-only scan → concat refs along time →
  *      materialize → Zarr read → exact equality
  *
  * Not SQL-expressible (binary format + typed cube pipeline), so like the
  * cube e2e entries it is a rows-only driver check with in-query exact
  * assertions: ok=true only on xr.testing.assert_equal-style equality.
  */
object NetcdfOps {

  private val NY = 18; private val NX = 36
  private val FooSeed = 7; private val BarSeed = 41

  /** Golden cube restricted to NetCDF-classic-representable dtypes
    * (int32/float32/float64 — classic has no 64-bit ints). Data values are
    * CubeOracle's closed-form so the driver's DuckDB oracle regenerates
    * them (see CubeOracle). */
  private def makeCube(nt: Int): Fragment = {
    Fragment(
      dims = Map("time" -> nt, "lat" -> NY, "lon" -> NX),
      coords = Map(
        "time" -> Variable(Vector("time"),
          NDArray(DType.I4, Vector(nt), (0 until nt).toArray),
          Map("units" -> AttrValue("days since 2010-01-01"),
            "calendar" -> AttrValue("proleptic_gregorian"))),
        "lat" -> Variable(Vector("lat"),
          NDArray(DType.F8, Vector(NY), (0 until NY).map(i => -85.0 + i * 10).toArray)),
        "lon" -> Variable(Vector("lon"),
          NDArray(DType.F8, Vector(NX), (0 until NX).map(i => 5.0 + i * 10).toArray))),
      dataVars = Map(
        "foo" -> Variable(Vector("time", "lat", "lon"),
          NDArray(DType.F8, Vector(nt, NY, NX), CubeOracle.fillF8(FooSeed, 1000, nt, NY, NX)),
          Map("long_name" -> AttrValue("Fantastic Foo"))),
        "bar" -> Variable(Vector("time", "lat", "lon"),
          NDArray(DType.I4, Vector(nt, NY, NX), CubeOracle.fillI(BarSeed, 1000, nt, NY, NX).map(_.toInt)),
          Map("long_name" -> AttrValue("Beautiful Bar")))),
      attrs = Map("conventions" -> AttrValue("CF 1.6")))
  }

  def netcdf3Roundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nt = 10
    val cube = makeCube(nt)
    val dir = Files.createTempDirectory("graft_nc3").toString
    // fixture files: time as the UNLIMITED dim exercises the interleaved
    // record layout; every other slab written CDF-2 to cover 64-bit offsets
    val files = (0 until nt by 2).map { t0 =>
      val path = s"$dir/slab_$t0.nc"
      NetCDF3.write(path, cube.isel(Map("time" -> Slc(t0, t0 + 2))),
        recordDim = Some("time"), version = if (t0 % 4 == 0) 1 else 2)
      path
    }.toVector

    // ---- Entry-point A: decode → schema → rechunk → zarr → reopen ----
    val pattern = FilePattern.fromFileSequence(files, "time",
      nitemsPerFile = Some(2), fileType = FileType.Netcdf3)
    val items = Pipelines.createItems(spark, pattern)
    val frags = Pipelines.openWithFragments(items, FileType.Netcdf3)
    val storePath = s"$dir/store.zarr"
    Pipelines.storeToZarr(frags, pattern.combineDimKeys, storePath,
      Map("time" -> 3))
    val rebuilt = ZarrGroup(storePath).readFragment()
    require(rebuilt.sameAs(cube), "netcdf3: decode pipeline round-trip failed")

    // ---- Entry-point B: header-only scan → concat refs → materialize ----
    val refs = files.map(RefSet.scanNetCDF3(_))
    val combined = RefSet.concatRefSets(refs, "time",
      identicalDims = Vector("lat", "lon"))
    val virtDir = s"$dir/virt.zarr"
    combined.materialize(virtDir)
    val viaRefs = ZarrGroup(virtDir).readFragment()
    // scanned ints stay at the file's width: int32 time widens the engine's
    // I4 exactly; values must match the golden cube cell-for-cell
    require(viaRefs.sameAs(cube), "netcdf3: kerchunk scan/concat differs")
    // the kerchunk JSON artifact round-trips losslessly
    require(RefSet.fromJson(RefSet.toJson(combined)).keys == combined.keys,
      "netcdf3: kerchunk JSON artifact not lossless")

    CubeOracle.quantized(spark, rebuilt, Seq("time", "lat", "lon"),
      CubeOracle.f8ElseIntVq("foo"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e2e_netcdf3_roundtrip" -> netcdf3Roundtrip _,
  )

  val oracles: Map[String, String] = Map(
    "e2e_netcdf3_roundtrip" -> CubeOracle.rangeSql(
      Seq("time" -> 10, "lat" -> NY, "lon" -> NX),
      Seq(
        "bar" -> (CubeOracle.viSql(BarSeed, 1000, "time", "lat", "lon") + " % 10"),
        "foo" -> CubeOracle.viSql(FooSeed, 1000, "time", "lat", "lon"))),
  )
}
