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
    val rng = new scala.util.Random(17)
    def mk(t: Int): (String, Array[Double]) = {
      val vals = Array.tabulate(nx * ny) { i =>
        if ((i + t) % 11 == 5) Double.NaN
        else math.rint(rng.nextDouble() * 2000) / 100.0
      }
      val p = s"$dir/msg_$t.grib2"
      Grib2.writeSimple(p, vals, nx, ny, la1 = 35.0, lo1 = 10.0,
        dLat = 0.25, dLon = 0.25, discipline = 0, category = 0, number = 0,
        refTimeEpochSec = 1700000000L + t * 3600L)
      (p, vals)
    }
    val files = Vector(mk(0), mk(1), mk(2))
    def closeEnough(a: Double, b: Double): Boolean =
      (a.isNaN && b.isNaN) || math.abs(a - b) <= 0.005 + 1e-9

    // ---- Entry-point A: engine-registry decode (cfgrib analog) ----
    val okA = files.forall { case (p, vals) =>
      val f = Openers.open(FileType.Grib, p)
      val got = f.dataVars("TMP").data.data.asInstanceOf[Array[Double]]
      got.length == vals.length &&
        got.indices.forall(i => closeEnough(got(i), vals(i))) &&
        f.coords("latitude").data.getDouble(0) == 35.0
    }

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
    val okB = viaRefs.dims("time") == files.length &&
      flat.length == expect.length &&
      flat.indices.forall(i => closeEnough(flat(i), expect(i))) &&
      (0 until files.length).forall(t =>
        viaRefs.coords("time").data.getLong(t) == 1700000000L + t * 3600L)

    // ---- Reference fixture (the reference's own GRIB test input) ----
    val (okC, nC) =
      if (!Files.exists(Paths.get(RefFixture))) (true, -1)
      else {
        val m = Grib2.scan(RefFixture).head
        val vals = Grib2.decodeValues(RefFixture, m)
        val valid = vals.filterNot(_.isNaN)
        (Grib2.centreName(m.centre) == "cwao" && m.shortName == "DEPR" &&
          valid.length == 750157 && valid.forall(_ == 30.0), valid.length)
      }

    Seq(
      ("decode_pipeline", files.length, okA),
      ("kerchunk_scan_concat", refs.map(_.keys.size).sum, okB),
      ("reference_fixture", nC, okC))
      .toDF("stage", "n_inputs", "ok")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e2e_grib_roundtrip" -> gribRoundtrip _,
  )
}
