package graft.examples

import graft.Bake.BakeConfig
import graft.core.{CombineOp, Dimension, Index, Pos}
import graft.kerchunk.{CombineReferences, RefSet}
import graft.patterns.{FilePattern, FileType}
import graft.transforms.Pipelines
import org.apache.spark.sql.{Encoders, SparkSession}

/** `hrrr-kerchunk-concat-valid-time`: the reference-file feedstock
  * (examples/feedstock/hrrr_kerchunk_concat_valid_time.py) — successive
  * forecast-cycle outputs at ONE step (`*wrfsfcf01.grib2`, via
  * `pattern_from_file_sequence`), each scanned to byte-range references
  * with `grib_filter = {typeOfLevel: heightAboveGround, level: [2, 10]}`
  * (several kept messages per file — the 2 m and 10 m fields), the
  * per-message reference sets MERGED into one dataset per file, the
  * `drop_unknown` preprocess removing unmapped parameters
  * (hrrr_kerchunk_concat_valid_time.py:23-27), then concatenated along
  * valid time into one combined kerchunk artifact.
  *
  * The reference xfails this recipe only because Beam cannot PICKLE the
  * `drop_unknown` closure (tests/test_integration.py:116-123) — a
  * serialization accident, not a semantic limit; the Spark closure
  * serializer ships it fine, so this port runs it for real.
  *
  * Representation notes: cfgrib's `valid_time` axis is this scanner's
  * `time` axis (each message's time coordinate already holds reference
  * time + forecast step — see [[HrrrKerchunkRecipe]]); the reference's
  * `identical_dims` list `heightAboveGround`/`step` names cfgrib
  * per-level scalar coords which this scanner encodes as variable attrs
  * (`GRIB_surfaceValue`/`GRIB_forecastTime`), so the shared grid
  * (`latitude`, `longitude`) is the identical set here.
  *
  * Config section `HrrrValidTime`: `input_root` (file URLs are
  * `input_root/hrrr.t<HH>z.wrfsfcf01.grib2`), `cycles` (comma list of
  * cycle hours, default `0,1` — the reference's `files[0:2]`), `levels`
  * (kept heightAboveGround levels, default `2,10`), `store_name`
  * (default `hrrr-concat-valid-time`), and `artifact` (`json` |
  * `parquet`, as in [[HrrrKerchunkRecipe]]). */
object HrrrValidTimeRecipe extends Recipe {
  val id = "hrrr-kerchunk-concat-valid-time"

  /** heightAboveGround is GRIB2 fixed-surface type 103. */
  private val HeightAboveGround = 103

  /** cfgrib "unknown*" analog: parameters outside the WMO 4.2 table get
    * the scanner's systematic d<D>c<C>p<N> fallback name. */
  private[examples] def isUnknownVar(name: String): Boolean =
    name.matches("d\\d+c\\d+p\\d+")

  def bake(spark: SparkSession, config: BakeConfig, prune: Boolean): String = {
    val sec = config.section("HrrrValidTime")
    val inputRoot = sec.getOrElse("input_root",
      throw new IllegalArgumentException("HrrrValidTime.input_root is required"))
    val cycles = sec.getOrElse("cycles", "0,1").split(",").toVector
    val levels = sec.getOrElse("levels", "2,10")
      .split(",").map(_.trim.toDouble).toSet
    val storeName = sec.getOrElse("store_name", "hrrr-concat-valid-time")

    // pattern_from_file_sequence over the sorted cycle outputs
    val files = cycles.map(c =>
      f"$inputRoot/hrrr.t${c.trim.toInt}%02dz.wrfsfcf01.grib2")
    val pattern0 = FilePattern.fromFileSequence(files, "time",
      fileType = FileType.Grib)
    val pattern = if (prune) pattern0.prune() else pattern0

    val timeDim = Dimension("time", CombineOp.Concat)
    // OpenWithKerchunk with the height-above-ground level filter keeps
    // SEVERAL messages per file; merge them into one per-file reference
    // set (cfgrib's sibling-variables dataset), then drop unknown params
    val items = Pipelines.createItems(spark, pattern)
    val refs = Pipelines.openWithKerchunk(items, pattern.fileType,
        gribFilter = m =>
          m.product.surfaceType == HeightAboveGround &&
            levels.contains(m.product.surfaceValue))
      .map { case (idx, kept) =>
        require(kept.nonEmpty,
          s"no heightAboveGround level-${levels.mkString("/")} messages " +
            s"in input ${idx.findPosition("time")}")
        val merged = RefSet.mergeRefSets(kept)
        (Index.of(timeDim -> Pos(idx.findPosition("time"))),
          RefSet.dropVars(merged, isUnknownVar))
      }(Encoders.kryo[(Index, RefSet)])

    val targetRoot = config.runtime.targetRoot.resolve
    val outPath = sec.getOrElse("artifact", "json") match {
      case "json"    => s"$targetRoot/$storeName/reference.json"
      case "parquet" => s"$targetRoot/$storeName/reference.parquet"
      case other => throw new IllegalArgumentException(
        s"HrrrValidTime.artifact must be json or parquet, got '$other'")
    }
    CombineReferences.writeCombinedReference(refs, Vector("time"),
      identicalDims = Vector("latitude", "longitude"), outPath, v2Keys = true)
    outPath
  }
}
