package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.grib.Grib2
import graft.kerchunk.RefSet
import graft.patterns.FileType
import graft.transforms.Openers
import graft.zarr.ZarrGroup
import java.nio.file.{Files, Paths}

/** GRIB2 end-to-end (tests/test_end_to_end.py:219-262 shape — the
  * reference's GRIB path is kerchunk-based: scan_grib → combine refs →
  * reference artifact → open as zarr):
  *
  *   A. decoder — synthetic simple-packing .grib2 files → Openers
  *      (cfgrib-engine analog) → values equal the written field
  *   B. kerchunk — header-only scan → concat refs along time → JSON
  *      artifact round-trip → materialize → Zarr read → equality
  *   C. reference fixture — the CMC polar-stereographic constant field
  *      the reference's own test uses, when present on this machine
  *
  * Not SQL-expressible (binary format), so like the other e2e entries it
  * is a rows-only driver check with in-query exact assertions.
  */
object GribOps {

  private val RefFixture =
    "/root/reference/tests/data/CMC_reg_DEPR_ISBL_10_ps10km_2022072000_P000.grib2"

  def gribRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_grib_e2e").toString
    val nx = 18; val ny = 12
    // centi-unit formula values (CubeOracle closed-form over (t, flat i))
    // survive simple packing at decimalScale=2 losslessly, so the driver's
    // DuckDB oracle regenerates them; every 11th cell is a bitmap NaN
    def mk(t: Int): (String, Array[Double]) = {
      val vals = Array.tabulate(nx * ny) { i =>
        if ((i + t) % 11 == 5) Double.NaN
        else CubeOracle.vi(17, 2000, t.toLong, i.toLong) / 100.0
      }
      val p = s"$dir/msg_$t.grib2"
      // t=1 packs via JPEG2000 (template 5.40), t=2 via CCSDS (5.42) —
      // both lossless at the same centi-quantization, so the oracle is
      // packing-independent; t=0 via simple packing. Exercises the real
      // ECMWF and NCEP decode paths through ALL three entry points
      // every round.
      if (t == 1)
        Grib2.writeJpeg2000(p, vals, nx, ny, la1 = 35.0, lo1 = 10.0,
          dLat = 0.25, dLon = 0.25, discipline = 0, category = 0, number = 0,
          refTimeEpochSec = 1700000000L + t * 3600L)
      else if (t == 2)
        Grib2.writeCcsds(p, vals, nx, ny, la1 = 35.0, lo1 = 10.0,
          dLat = 0.25, dLon = 0.25, discipline = 0, category = 0, number = 0,
          refTimeEpochSec = 1700000000L + t * 3600L)
      else
        // t=0 is an ENSEMBLE message (r14 — product template 4.1, member
        // 4 of 30, the GEFS layout): identical values, so the oracle is
        // template-independent; the kerchunk leg concatenates it with
        // the deterministic messages under the shared short name while
        // the member triple rides along in the variable attrs
        Grib2.writeSimple(p, vals, nx, ny, la1 = 35.0, lo1 = 10.0,
          dLat = 0.25, dLon = 0.25, discipline = 0, category = 0, number = 0,
          refTimeEpochSec = 1700000000L + t * 3600L,
          ensemble = if (t == 0) Some((3, 4, 30)) else None)
      (p, vals)
    }
    val files = Vector(mk(0), mk(1), mk(2))
    def closeEnough(a: Double, b: Double): Boolean =
      (a.isNaN && b.isNaN) || math.abs(a - b) <= 0.005 + 1e-9

    // ---- r15: a ROTATED lat-lon (3.1) message rides through entry A ----
    // same closed-form values at t=3, but on the COSMO-style rotated grid
    // (south pole at (-40, 10)); kept out of the kerchunk concat leg so
    // the shared-grid cube (and its DuckDB oracle) is unchanged
    val rotVals = Array.tabulate(nx * ny) { i =>
      if ((i + 3) % 11 == 5) Double.NaN
      else CubeOracle.vi(17, 2000, 3L, i.toLong) / 100.0
    }
    val rotPath = s"$dir/msg_rot.grib2"
    Grib2.writeRotated(rotPath, rotVals, nx, ny, la1 = -3.0, lo1 = -4.0,
      dLat = 0.5, dLon = 0.5, spLat = -40.0, spLon = 10.0,
      discipline = 0, category = 0, number = 0,
      refTimeEpochSec = 1700000000L + 3 * 3600L)
    locally {
      val f = Openers.open(FileType.Grib, rotPath)
      val got = f.dataVars("TMP").data.data.asInstanceOf[Array[Double]]
      require(got.length == rotVals.length &&
        got.indices.forall(i => closeEnough(got(i), rotVals(i))) &&
        f.attrs("GRIB_gridType") == graft.core.AttrValue("rotated_ll") &&
        f.attrs("GRIB_latitudeOfSouthernPoleInDegrees") ==
          graft.core.AttrValue(-40.0) &&
        // unrotated coordinates land near the pole's antipodal cap:
        // the rotated origin maps to 90 + spLat = 50 degrees north
        f.coords("latitude").data.data.asInstanceOf[Array[Double]]
          .forall(v => v > 40.0 && v < 60.0),
        "grib: rotated lat-lon (entry A) parity failed")
    }

    // ---- r15: a REDUCED-Gaussian (ERA5-native) message too ----
    // octahedral-style N=6 rows; same closed-form values over the flat
    // ragged point list — entry A only, like the rotated message
    locally {
      val gaussN = 6
      val rows = Array.tabulate(2 * gaussN)(j =>
        20 + 4 * math.min(j, 2 * gaussN - 1 - j))
      val n = rows.sum
      val redVals = Array.tabulate(n) { i =>
        if ((i + 4) % 11 == 5) Double.NaN
        else CubeOracle.vi(17, 2000, 4L, i.toLong) / 100.0
      }
      val redPath = s"$dir/msg_red.grib2"
      Grib2.writeReducedGaussian(redPath, redVals, rows, lo1 = 0.0,
        gaussN = gaussN, discipline = 0, category = 0, number = 0,
        refTimeEpochSec = 1700000000L + 4 * 3600L)
      val f = Openers.open(FileType.Grib, redPath)
      val got = f.dataVars("TMP").data.data.asInstanceOf[Array[Double]]
      require(f.dims == Map("values" -> n) &&
        got.length == n &&
        got.indices.forall(i => closeEnough(got(i), redVals(i))) &&
        f.attrs("GRIB_gridType") == graft.core.AttrValue("reduced_gg") &&
        f.coords("latitude").dims == Vector("values"),
        "grib: reduced Gaussian (entry A) parity failed")
    }

    // ---- Entry-point A: engine-registry decode (cfgrib analog) ----
    require(files.zipWithIndex.forall { case ((p, vals), t) =>
      val f = Openers.open(FileType.Grib, p)
      // the t=0 ensemble member surfaces as TMP_m4 with the scalar
      // `number` coordinate (cfgrib convention)
      val name = if (t == 0) "TMP_m4" else "TMP"
      val got = f.dataVars(name).data.data.asInstanceOf[Array[Double]]
      got.length == vals.length &&
        got.indices.forall(i => closeEnough(got(i), vals(i))) &&
        f.coords("latitude").data.getDouble(0) == 35.0 &&
        (t != 0 || (f.coords("number").data.getLong(0) == 4L &&
          f.dataVars(name).attrs("GRIB_ensembleSize") ==
            graft.core.AttrValue(30)))
    }, "grib: decoder (entry A) parity failed")

    // ---- Entry-point B: scan → concat → artifact → materialize → read ----
    val refs = files.flatMap { case (p, _) => RefSet.scanGrib2(p) }
    val combined = RefSet.concatRefSets(refs, "time",
      identicalDims = Vector("latitude", "longitude"))
    val artifact = RefSet.fromJson(RefSet.toJson(combined)) // JSON round-trip
    val virt = s"$dir/virt.zarr"
    artifact.materialize(virt)
    val viaRefs = ZarrGroup(virt).readFragment()
    val flat = viaRefs.allVars("TMP").data.data.asInstanceOf[Array[Double]]
    val expect = files.flatMap(_._2).toArray
    require(viaRefs.dims("time") == files.length &&
      flat.length == expect.length &&
      flat.indices.forall(i => closeEnough(flat(i), expect(i))) &&
      (0 until files.length).forall(t =>
        viaRefs.coords("time").data.getLong(t) == 1700000000L + t * 3600L),
      "grib: kerchunk scan/concat (entry B) parity failed")

    // ---- Reference fixture (the reference's own GRIB test input) ----
    if (Files.exists(Paths.get(RefFixture))) {
      val m = Grib2.scan(RefFixture).head
      val vals = Grib2.decodeValues(RefFixture, m)
      val valid = vals.filterNot(_.isNaN)
      require(Grib2.centreName(m.centre) == "cwao" && m.shortName == "DEPR" &&
        valid.length == 750157 && valid.forall(_ == 30.0),
        "grib: reference CMC fixture decode failed")
    }

    // long view of the combined kerchunk fragment, centi-quantized;
    // bitmap-NaN cells emit the -1 sentinel (formula values are >= 0).
    // GRIB grid dims are (time, y, x); latitude/longitude are coords.
    import org.apache.spark.sql.functions._
    CubeOracle.quantized(spark, viaRefs,
      Seq("time", "y", "x"),
      when(isnan(col("value")), lit(-1L))
        .otherwise(round(col("value") * 100).cast("long")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e2e_grib_roundtrip" -> gribRoundtrip _,
  )

  val oracles: Map[String, String] = {
    // TMP over the full (time, y, x) grid; the scanned 2-D latitude/
    // longitude arrays surface as (y, x) data vars pinned at time=0 in the
    // long view — their centi-degree formulas come from the fixture's
    // la1=35/lo1=10 origin and 0.25-degree spacing
    val flatIdx = "(y*18 + x)"
    val grid = "range(0, 12) ry(y), range(0, 18) rx(x)"
    Map("e2e_grib_roundtrip" -> (
      s"SELECT 'TMP' AS var_name, time, y, x, " +
        s"CAST(CASE WHEN ($flatIdx + time) % 11 = 5 THEN -1 " +
        s"ELSE ((17 + time*7919 + $flatIdx*911) % 2000) END AS BIGINT) AS value_q " +
        s"FROM range(0, 3) rt(time), $grid " +
        s"UNION ALL SELECT 'latitude', 0, y, x, 3500 + 25*y FROM $grid " +
        s"UNION ALL SELECT 'longitude', 0, y, x, 1000 + 25*x FROM $grid " +
        s"ORDER BY var_name, time, y, x"))
  }
}
