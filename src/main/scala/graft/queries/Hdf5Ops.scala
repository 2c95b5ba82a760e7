package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core._
import graft.hdf5.{HDF5, HDF5Writer}
import graft.kerchunk.RefSet
import graft.patterns.{FilePattern, FileType}
import graft.transforms.Pipelines
import graft.zarr.ZarrGroup
import java.nio.file.Files

/** NetCDF-4 (HDF5) end-to-end through BOTH reference entry points — the
  * reference's PRIMARY input format (openers.py:40-47 h5netcdf engine;
  * sequential_1d/2d netcdf4 fixtures in tests/conftest.py:60-146):
  *
  *   A. decoder pipeline — .nc files → OpenWithXarray(h5netcdf analog) →
  *      DetermineSchema → Rechunk → Zarr store → reopen → exact equality
  *   B. kerchunk pipeline — header-only scan (chunk B-tree byte ranges) →
  *      concat refs along time → materialize → Zarr read → exact equality
  *
  * Fixture files are written by our own netCDF-4-layout HDF5 writer
  * (superblock v0, symbol tables, dimension scales, DIMENSION_LIST global
  * heap, chunked B-tree storage, deflate) — no HDF5 library exists in
  * this offline JVM build. Rows-only driver check with in-query exact
  * assertions, like the other e2e entries.
  */
object Hdf5Ops {

  private val NY = 18; private val NX = 36
  private val FooSeed = 13; private val BarSeed = 59

  /** Golden cube with netCDF-4-typical dtypes (int64 time, f8/i4 vars);
    * data values from CubeOracle's closed-form (driver DuckDB oracle). */
  private def makeCube(nt: Int): Fragment = {
    Fragment(
      dims = Map("time" -> nt, "lat" -> NY, "lon" -> NX),
      coords = Map(
        "time" -> Variable(Vector("time"),
          NDArray(DType.I8, Vector(nt), (0 until nt).map(_.toLong * 86400).toArray),
          Map("units" -> AttrValue("seconds since 2010-01-01"),
            "calendar" -> AttrValue("proleptic_gregorian"))),
        "lat" -> Variable(Vector("lat"),
          NDArray(DType.F8, Vector(NY), (0 until NY).map(i => -85.0 + i * 10).toArray)),
        "lon" -> Variable(Vector("lon"),
          NDArray(DType.F8, Vector(NX), (0 until NX).map(i => 5.0 + i * 10).toArray))),
      dataVars = Map(
        "foo" -> Variable(Vector("time", "lat", "lon"),
          NDArray(DType.F8, Vector(nt, NY, NX), CubeOracle.fillF8(FooSeed, 1000, nt, NY, NX)),
          // a CF-compliant 10-attr set: past libhdf5's 8-compact-attr
          // threshold, so the dense-attr slabs below are the layout a
          // real CF NetCDF-4 file would carry
          Map("long_name" -> AttrValue("Fantastic Foo"),
            "units" -> AttrValue("K"),
            "standard_name" -> AttrValue("surface_temperature"),
            "cell_methods" -> AttrValue("time: mean"),
            "comment" -> AttrValue("synthetic"),
            "references" -> AttrValue("CF-1.8"),
            "institution" -> AttrValue("graft"),
            "source" -> AttrValue("model"),
            "valid_min" -> AttrValue(0.0),
            "valid_max" -> AttrValue(1000.0))),
        "bar" -> Variable(Vector("time", "lat", "lon"),
          NDArray(DType.I4, Vector(nt, NY, NX), CubeOracle.fillI(BarSeed, 1000, nt, NY, NX).map(_.toInt)),
          Map("long_name" -> AttrValue("Beautiful Bar")))),
      attrs = Map("conventions" -> AttrValue("CF 1.6")))
  }

  /** bar's enum members (r14): its values are vi % 10 ∈ [0, 9], each
    * named — the ICESat-2-style flag-variable layout. */
  private val BarEnum: Vector[(String, Long)] =
    (0 until 10).map(i => s"level_$i" -> i.toLong).toVector

  def hdf5Roundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nt = 10
    // slabs are WRITTEN from cubeStored; readers synthesize bar's
    // enum_names attr from the class-8 datatype, so the GOLDEN cube
    // carries it — the round-trip equality proves the enum decode ran
    // in both entry points
    val cubeStored = makeCube(nt)
    val cube = cubeStored.copy(dataVars = cubeStored.dataVars.updatedWith(
      "bar")(_.map(v => v.copy(attrs = v.attrs +
        ("enum_names" -> AttrValue(BarEnum
          .map { case (s, x) => s"$s=$x" }.mkString(";")))))))
    val dir = Files.createTempDirectory("graft_h5_e2e").toString
    // 2 days per file; data vars chunked 1 day per chunk, deflated — the
    // shape libnetcdf writes for chunked+zlib variables. Alternate slabs
    // store their root links DENSELY (fractal heap + v2 btree — the
    // netCDF-4 layout past the compact threshold, r9), others store
    // foo's 10 CF attrs DENSELY (type-8 name index — the layout past 8
    // compact attrs, r10), and slab 4 carries BOTH, so every group/attr
    // storage combination flows through both entry points every round
    val files = (0 until nt by 2).map { t0 =>
      val path = s"$dir/slab_$t0.nc"
      if (t0 == 6) {
        // slab 6 rotates through SCALE-OFFSET (filter 6, the NASA/NOAA
        // archive packing): bar (integer) is chunked+packed, foo rides
        // contiguous — the shape nccopy SOFF=0,2 produces on int vars
        HDF5Writer.write(path, cubeStored.isel(Map("time" -> Slc(t0, t0 + 2))),
          chunks = Map("bar" -> Vector(2, 18, 36)), scaleOffset = true,
          enumVars = Map("bar" -> BarEnum))
      } else HDF5Writer.write(path, cubeStored.isel(Map("time" -> Slc(t0, t0 + 2))),
        chunks = Map("foo" -> Vector(1, 18, 36), "bar" -> Vector(2, 18, 36)),
        deflateLevel = Some(4), denseRootLinks = t0 % 4 == 0,
        denseAttrObjects =
          if (t0 % 4 == 2 || t0 == 4) Set("foo") else Set.empty,
        enumVars = Map("bar" -> BarEnum),
        // slab 8 stores its chunks through the libhdf5-1.10+ v4 layout
        // (r14): foo via a filtered FIXED-ARRAY index, bar via a
        // filtered v2-BTREE index — composed with the dense root links
        // this slab already carries, so both entry points walk the
        // modern chunk indexes every round. Slab 2 (r15) routes foo
        // through the EXTENSIBLE-ARRAY index — the 1.10+ layout for a
        // time-appendable (one unlimited dim) variable — with small
        // creation parameters so its two chunks hit the inline-element
        // AND data-block paths
        chunkIndexV4 =
          if (t0 == 8) Map("foo" -> 3, "bar" -> 5)
          else if (t0 == 2) Map("foo" -> 4)
          else Map.empty,
        eaParams = HDF5Writer.EaParams(maxBits = 16, idxBlkElmts = 1,
          minPtrs = 2, minElmts = 2, pageBits = 3))
      path
    }.toVector

    // ---- Entry-point A: decode → schema → rechunk → zarr → reopen ----
    val pattern = FilePattern.fromFileSequence(files, "time",
      nitemsPerFile = Some(2), fileType = FileType.Netcdf4)
    val items = Pipelines.createItems(spark, pattern)
    val frags = Pipelines.openWithFragments(items, FileType.Netcdf4)
    val storePath = s"$dir/store.zarr"
    Pipelines.storeToZarr(frags, pattern.combineDimKeys, storePath,
      Map("time" -> 3))
    val rebuilt = ZarrGroup(storePath).readFragment()
    require(rebuilt.sameAs(cube), "hdf5: decode pipeline round-trip failed")

    // ---- Entry-point B: header-only scan → concat refs → materialize ----
    // Scale-offset refs are NOT representable as kerchunk byte ranges
    // (no numcodecs equivalent — kerchunk's hdf5 backend errors the same
    // way): the scan of slab 6 must fail by NAME, and the ref fleet
    // scans a deflate twin of it instead. The decode pipeline above read
    // the genuinely scale-offset-packed file.
    try {
      RefSet.scanHdf5(files(3))
      require(false, "hdf5: scale-offset scan unexpectedly succeeded")
    } catch {
      case e: IllegalArgumentException =>
        require(e.getMessage.contains("filter 6"),
          s"hdf5: wrong scale-offset scan error: ${e.getMessage}")
    }
    val slab6Twin = s"$dir/slab_6_deflate.nc"
    HDF5Writer.write(slab6Twin, cubeStored.isel(Map("time" -> Slc(6, 8))),
      chunks = Map("foo" -> Vector(1, 18, 36), "bar" -> Vector(2, 18, 36)),
      deflateLevel = Some(4), enumVars = Map("bar" -> BarEnum))
    val refFiles = files.updated(3, slab6Twin)
    val refs = refFiles.map(RefSet.scanHdf5(_))
    val combined = RefSet.concatRefSets(refs, "time",
      identicalDims = Vector("lat", "lon"))
    val virtDir = s"$dir/virt.zarr"
    combined.materialize(virtDir)
    val viaRefs = ZarrGroup(virtDir).readFragment()
    require(viaRefs.sameAs(cube), "hdf5: kerchunk scan/concat differs")
    require(RefSet.fromJson(RefSet.toJson(combined)).keys == combined.keys,
      "hdf5: kerchunk JSON artifact not lossless")
    // direct decoder parity: HDF5.read of file 0 equals the first slab
    require(HDF5.read(files.head).sameAs(cube.isel(Map("time" -> Slc(0, 2)))),
      "hdf5: direct decoder parity failed")

    CubeOracle.quantized(spark, rebuilt, Seq("time", "lat", "lon"),
      CubeOracle.f8ElseIntVq("foo"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e2e_hdf5_roundtrip" -> hdf5Roundtrip _,
  )

  val oracles: Map[String, String] = Map(
    "e2e_hdf5_roundtrip" -> CubeOracle.rangeSql(
      Seq("time" -> 10, "lat" -> NY, "lon" -> NX),
      Seq(
        "bar" -> (CubeOracle.viSql(BarSeed, 1000, "time", "lat", "lon") + " % 10"),
        "foo" -> CubeOracle.viSql(FooSeed, 1000, "time", "lat", "lon"))),
  )
}
