package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core._
import graft.zarr.ZarrGroup
import java.nio.file.{Files, Paths}

/** The deployed-bake surface (SURVEY §3.3 entry point C) exposed through
  * the driver contract: the FULL `graft.Bake` CLI path — argv parsing,
  * runner-JSON config load, RuntimeConfig injection, feedstock-registry
  * dispatch — executed for five registered recipes against generated
  * fixtures. Not SQL-expressible, so no DuckDB oracle: like the other
  * `e2e_*` entries a row carries ok=true only when the reopened artifact
  * matches the golden expectation exactly (the reference's
  * tests/test_integration.py:105-140 bake-and-verify loop).
  */
object BakeOps {

  import graft.examples.RecipeFixtures.{writeZarrFragment, writeConfig}

  private val NY = 6; private val NX = 8
  private val SstSeed = 3

  /** Small golden cube (one day per input file); sst values from
    * CubeOracle's closed-form (driver DuckDB oracle). */
  private def dailyCube(nt: Int): Fragment = {
    Fragment(
      dims = Map("time" -> nt, "lat" -> NY, "lon" -> NX),
      coords = Map(
        "time" -> Variable(Vector("time"),
          NDArray(DType.I8, Vector(nt), (0 until nt).map(_.toLong).toArray)),
        "lat" -> Variable(Vector("lat"),
          NDArray(DType.F8, Vector(NY), (0 until NY).map(_ * 1.0).toArray)),
        "lon" -> Variable(Vector("lon"),
          NDArray(DType.F8, Vector(NX), (0 until NX).map(_ * 2.0).toArray))),
      dataVars = Map(
        "sst" -> Variable(Vector("time", "lat", "lon"),
          NDArray(DType.F8, Vector(nt, NY, NX),
            CubeOracle.fillF8(SstSeed, 1000, nt, NY, NX)))))
  }

  def bakeCli(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_bake_e2e").toString
    try {

    // --- daily-cube: golden round-trip through the CLI
    val nt = 4
    val cube = dailyCube(nt)
    (0 until nt).foreach { t =>
      writeZarrFragment(cube.isel(Map("time" -> Slc(t, t + 1))),
        s"$dir/in/day_$t.zarr")
    }
    val conf1 = writeConfig(s"$dir/daily.json",
      "TargetStorage" -> Seq("root_path" -> s"$dir/target"),
      "DailyCube" -> Seq("input_root" -> s"$dir/in",
        "days" -> (0 until nt).mkString(","), "target_chunks" -> "time=2"))
    val out1 = graft.Bake.run(spark, Array(
      "--recipe-id=daily-cube", s"-f=$conf1", "--job-name=e2e-daily"), quiet = true)
    val got1 = ZarrGroup(out1).readFragment()
    val ok1 = got1.dims == cube.dims &&
      got1.allVars("sst").data.sameElements(cube.allVars("sst").data) &&
      ZarrGroup(out1).arrayMeta("sst").chunks.head == 2

    // --- terraclimate: Munge preprocessor through the CLI
    val (tn, ty, tx) = (12, 3, 4)
    val terra = Fragment(
      dims = Map("day" -> tn, "lat" -> ty, "lon" -> tx),
      coords = Map(
        "day" -> Variable(Vector("day"),
          NDArray(DType.I8, Vector(tn), (0 until tn).map(_.toLong).toArray)),
        "lat" -> Variable(Vector("lat"),
          NDArray(DType.F8, Vector(ty), Array(0.0, 1.0, 2.0))),
        "lon" -> Variable(Vector("lon"),
          NDArray(DType.F8, Vector(tx), Array(0.0, 1.0, 2.0, 3.0)))),
      dataVars = Map("soil" -> Variable(Vector("day", "lat", "lon"),
        NDArray(DType.F8, Vector(tn, ty, tx),
          Array.tabulate(tn * ty * tx)(i => if (i % 4 == 0) 40000.0 else i.toDouble)))),
      attrs = Map("title" -> AttrValue("broken source attrs")))
    writeZarrFragment(terra, s"$dir/terra/TerraClimate_soil_2000.zarr")
    val conf2 = writeConfig(s"$dir/terra.json",
      "TargetStorage" -> Seq("root_path" -> s"$dir/target"),
      "Terraclimate" -> Seq("input_root" -> s"$dir/terra",
        "years" -> "2000", "variables" -> "soil", "target_chunks" -> "time=12"))
    val out2 = graft.Bake.run(spark, Array(
      "--recipe-id=terraclimate", s"-f=$conf2", "--job-name=e2e-terra"), quiet = true)
    val got2 = ZarrGroup(out2).readFragment()
    val soil = got2.dataVars("soil").data.data.asInstanceOf[Array[Double]]
    val ok2 = got2.dims.get("time").contains(tn) && !got2.dims.contains("day") &&
      got2.attrs("title") == graft.examples.TerraclimateRecipe.fixedAttrs("title") &&
      soil.indices.forall(i =>
        if (i % 4 == 0) soil(i).isNaN else soil(i) == i.toDouble)

    // --- hrrr-kerchunk-concat-step: combined reference through the CLI
    val (nx, ny) = (7, 4)
    val base = 1658527200L
    (0 until 2).foreach { s =>
      graft.grib.Grib2.writeSimple(
        f"$dir/grib/hrrr.t22z.wrfsfcf$s%02d.grib2",
        Array.fill(nx * ny)(15.0 + s), nx, ny,
        la1 = 30.0, lo1 = 250.0, dLat = 0.5, dLon = 0.5,
        discipline = 0, category = 0, number = 0,
        refTimeEpochSec = base + s * 3600L)
    }
    val conf3 = writeConfig(s"$dir/hrrr.json",
      "TargetStorage" -> Seq("root_path" -> s"$dir/target"),
      "HrrrKerchunk" -> Seq("input_root" -> s"$dir/grib", "steps" -> "0,1"))
    val out3 = graft.Bake.run(spark, Array(
      "--recipe-id=hrrr-kerchunk-concat-step", s"-f=$conf3", "--job-name=e2e-hrrr"), quiet = true)
    val back = graft.kerchunk.RefSet.fromKerchunkV2Json(
      Files.readString(Paths.get(out3)))
    val virt = s"$dir/virt.zarr"
    back.materialize(virt)
    val got3 = ZarrGroup(virt).readFragment()
    val tmp3 = got3.dataVars("TMP").data.data.asInstanceOf[Array[Double]]
    val ok3 = got3.dims("time") == 2 &&
      (0 until 2).forall(s => (0 until nx * ny).forall(i =>
        tmp3(s * nx * ny + i) == 15.0 + s)) &&
      got3.coords("time").data.getLong(1) == base + 3600L

    // --- hrrr-kerchunk-concat-valid-time: per-file multi-message merge +
    // drop_unknown preprocess + valid-time concat (the recipe the
    // reference xfails only for Beam-pickling reasons)
    (0 until 2).foreach { c =>
      val keep = s"$dir/gribvt/keep_$c.grib2"
      val unk = s"$dir/gribvt/unk_$c.grib2"
      graft.grib.Grib2.writeSimple(keep, Array.fill(nx * ny)(25.0 + c),
        nx, ny, la1 = 30.0, lo1 = 250.0, dLat = 0.5, dLon = 0.5,
        discipline = 0, category = 0, number = 0,
        refTimeEpochSec = base + c * 3600L, forecastTimeHours = 1,
        surfaceType = 103, surfaceValue = 2)
      graft.grib.Grib2.writeSimple(unk, Array.fill(nx * ny)(77.0),
        nx, ny, la1 = 30.0, lo1 = 250.0, dLat = 0.5, dLon = 0.5,
        discipline = 0, category = 200, number = 200,
        refTimeEpochSec = base + c * 3600L, forecastTimeHours = 1,
        surfaceType = 103, surfaceValue = 2)
      Files.write(Paths.get(f"$dir/gribvt/hrrr.t$c%02dz.wrfsfcf01.grib2"),
        Files.readAllBytes(Paths.get(keep)) ++
          Files.readAllBytes(Paths.get(unk)))
    }
    val conf3b = writeConfig(s"$dir/hrrr_vt.json",
      "TargetStorage" -> Seq("root_path" -> s"$dir/target"),
      "HrrrValidTime" -> Seq("input_root" -> s"$dir/gribvt", "cycles" -> "0,1"))
    val out3b = graft.Bake.run(spark, Array(
      "--recipe-id=hrrr-kerchunk-concat-valid-time", s"-f=$conf3b",
      "--job-name=e2e-hrrr-vt"), quiet = true)
    val backVt = graft.kerchunk.RefSet.fromKerchunkV2Json(
      Files.readString(Paths.get(out3b)))
    val virtVt = s"$dir/virt_vt.zarr"
    backVt.materialize(virtVt)
    val got3b = ZarrGroup(virtVt).readFragment()
    val tmpVt = got3b.dataVars("TMP").data.data.asInstanceOf[Array[Double]]
    val ok3b = got3b.dims("time") == 2 &&
      !got3b.dataVars.contains("d0c200p200") &&
      (0 until 2).forall(c => (0 until nx * ny).forall(i =>
        tmpVt(c * nx * ny + i) == 25.0 + c)) &&
      // VALID time: reference time + the 1 h forecast step
      got3b.coords("time").data.getLong(0) == base + 3600L &&
      got3b.coords("time").data.getLong(1) == base + 7200L

    // --- noaa-oisst: strftime URL pattern + HTTP fetch + cache + consolidate
    val (on, oy, ox) = (3, 4, 5)
    val oisst = Fragment(
      dims = Map("time" -> on, "lat" -> oy, "lon" -> ox),
      coords = Map(
        "time" -> Variable(Vector("time"),
          NDArray(DType.I8, Vector(on), (0 until on).map(_.toLong).toArray)),
        "lat" -> Variable(Vector("lat"),
          NDArray(DType.F8, Vector(oy), (0 until oy).map(_ * 1.0).toArray)),
        "lon" -> Variable(Vector("lon"),
          NDArray(DType.F8, Vector(ox), (0 until ox).map(_ * 2.0).toArray))),
      dataVars = Map("sst" -> Variable(Vector("time", "lat", "lon"),
        NDArray(DType.F8, Vector(on, oy, ox),
          Array.tabulate(on * oy * ox)(i => i * 0.25)))))
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val ok4 = try {
      val dates = (0 until on).map(i =>
        java.time.LocalDate.parse("1981-09-01").plusDays(i.toLong))
      (0 until on).zip(dates).foreach { case (t, date) =>
        val nc = s"$dir/oisst_$t.nc"
        graft.hdf5.HDF5Writer.write(nc,
          oisst.isel(Map("time" -> Slc(t, t + 1))))
        val bytes = Files.readAllBytes(Paths.get(nc))
        val ym = f"${date.getYear}%04d${date.getMonthValue}%02d"
        val ymd = ym + f"${date.getDayOfMonth}%02d"
        server.createContext(s"/avhrr/$ym/oisst-avhrr-v02r01.$ymd.nc",
          (ex: com.sun.net.httpserver.HttpExchange) => {
            ex.sendResponseHeaders(200, bytes.length.toLong)
            ex.getResponseBody.write(bytes)
            ex.close()
          })
      }
      server.start()
      val baseUrl = s"http://127.0.0.1:${server.getAddress.getPort}"
      val conf4 = writeConfig(s"$dir/oisst.json",
        "TargetStorage" -> Seq("root_path" -> s"$dir/target"),
        "InputCacheStorage" -> Seq("root_path" -> s"$dir/cache"),
        "NoaaOisst" -> Seq(
          "url_format" -> (s"$baseUrl/avhrr/{time:%Y%m}/" +
            "oisst-avhrr-v02r01.{time:%Y%m%d}.nc"),
          "dates" -> dates.mkString(",")))
      val out4 = graft.Bake.run(spark, Array(
        "--recipe-id=noaa-oisst", s"-f=$conf4", "--job-name=e2e-oisst"),
        quiet = true)
      val got4 = ZarrGroup(out4).readFragment()
      got4.dims("time") == on &&
        got4.allVars("sst").data.sameElements(oisst.allVars("sst").data) &&
        Option(new java.io.File(s"$dir/cache").listFiles())
          .exists(_.length == on) &&
        Files.readString(Paths.get(s"$out4/zarr.json"))
          .contains("consolidated_metadata")
    } finally server.stop(0)

    require(ok1, "bake_cli: daily-cube recipe failed")
    require(ok2, "bake_cli: terraclimate recipe failed")
    require(ok3, "bake_cli: hrrr-kerchunk-concat-step recipe failed")
    require(ok3b, "bake_cli: hrrr-kerchunk-concat-valid-time recipe failed")
    require(ok4, "bake_cli: noaa-oisst recipe failed")
    // everything above evaluated eagerly (stores read back, requires
    // passed) and the daily-cube long view below reads the already
    // in-memory got1 fragment, so the fixture tree can go before the
    // return — the bench invokes this entry three times per run and must
    // not accumulate temp trees
    CubeOracle.quantized(spark, got1, Seq("time", "lat", "lon"),
      CubeOracle.f8ElseIntVq("sst"))
    } finally graft.examples.RecipeFixtures.deleteRecursively(dir)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e2e_bake_cli" -> bakeCli _,
  )

  val oracles: Map[String, String] = Map(
    "e2e_bake_cli" -> CubeOracle.rangeSql(
      Seq("time" -> 4, "lat" -> NY, "lon" -> NX),
      Seq("sst" -> CubeOracle.viSql(SstSeed, 1000, "time", "lat", "lon"))),
  )
}
