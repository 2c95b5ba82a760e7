package graft.examples

import graft.Bake.BakeConfig
import graft.core.Attrs.Attrs
import graft.core.{AttrValue, Fragment}
import graft.patterns.{ConcatDim, FilePattern, FileType, MergeDim}
import graft.transforms.{Pipelines, Preprocess}
import org.apache.spark.sql.{Encoders, SparkSession}

/** `terraclimate`: the preprocessor-heavy feedstock
  * (examples/feedstock/terraclimate.py:59-215) — a variable × year file
  * matrix (MergeDim × ConcatDim, one year of monthly steps per file) pushed
  * through the Munge cleaning stage before StoreToZarr:
  *
  *  - global attrs replaced wholesale with the corrected set (the source
  *    files carry invalid unicode; terraclimate.py:103-194),
  *  - `station_influence` pulled aside and re-added as
  *    `<var>_station_influence` (terraclimate.py:196-215),
  *  - per-variable threshold masking (`da.where(da < val)`,
  *    terraclimate.py:64-93),
  *  - renames applied last: `PDSI` → `pdsi`, `day` dim → `time`
  *    (terraclimate.py:203-210).
  *
  * Config section `Terraclimate`: `input_root` (file URLs are
  * `input_root/TerraClimate_<variable>_<year>.zarr`), `years` (comma list),
  * `variables` (comma list, default the example's pared-down `soil,srad`),
  * `store_name`, `target_chunks` (the reference recipe pins
  * `{lat: 1024, lon: 1024, time: 12}`; the default here keeps `time=12`
  * so pruned/smoke fixtures smaller than 1024 cells stay valid). */
object TerraclimateRecipe extends Recipe {
  val id = "terraclimate"

  /** terraclimate.py:66-87 `mask_opts` — all active entries are `("lt", v)`:
    * keep values strictly below the threshold, NaN otherwise. */
  val maskOpts: Map[String, Double] = Map(
    "PDSI" -> 10d, "aet" -> 32767d, "def" -> 32767d, "pet" -> 32767d,
    "ppt" -> 32767d, "q" -> 2147483647d, "soil" -> 32767d, "srad" -> 32767d,
    "swe" -> 10000d, "tmax" -> 200d, "tmin" -> 200d, "vap" -> 300d,
    "vpd" -> 300d, "ws" -> 200d)

  /** terraclimate.py:203-205. */
  val renameVars: Map[String, String] = Map("PDSI" -> "pdsi")

  /** Representative slice of the corrected attr set the preprocessor
    * installs wholesale (terraclimate.py:103-194). */
  val fixedAttrs: Attrs = Map(
    "title" -> AttrValue(
      "TerraClimate: monthly climate and climatic water balance for global land surfaces"),
    "id" -> AttrValue("Blank"),
    "naming_authority" -> AttrValue("edu.uidaho.nkn"),
    "cdm_data_type" -> AttrValue("GRID"),
    "creator_name" -> AttrValue("John Abatzoglou"),
    "institution" -> AttrValue("University of California Merced"),
    "processing_level" -> AttrValue("Gridded Climate Projections"),
    "time_coverage_resolution" -> AttrValue("P1M"),
    "license" -> AttrValue("No restrictions"),
    "version" -> AttrValue("v1.0"),
    "Conventions" -> AttrValue("CF-1.6"))

  /** The Munge stage (terraclimate.py:59-215) in Fragment algebra. */
  def munge(f: Fragment): Fragment = {
    // 1. attrs replaced wholesale, not merged (ds.attrs = fixed_attrs)
    var out = f.copy(attrs = fixedAttrs)
    // 2. station_influence pulled aside
    val station = out.dataVars.get("station_influence")
    if (station.isDefined) out = Preprocess.dropVars(out, Set("station_influence"))
    // 3. the (single) payload variable of this file
    val payload = out.dataVars.keys.toVector match {
      case Vector(one) => one
      case other => throw new IllegalArgumentException(
        s"terraclimate files carry one data variable (+ optional " +
          s"station_influence); got ${other.sorted.mkString(", ")}")
    }
    // 4. re-add the station mask under its per-variable name
    station.foreach { v =>
      out = out.copy(dataVars =
        out.dataVars.updated(s"${payload}_station_influence", v))
    }
    // 5. threshold mask with the ORIGINAL variable key (apply_mask runs
    //    before the rename dict is applied)
    maskOpts.get(payload).foreach { th =>
      out = Preprocess.maskWhere(out, payload, _ < th)
    }
    // 6. renames last: the payload variable, then the day->time dim
    renameVars.get(payload).foreach { to =>
      out = Preprocess.renameVar(out, payload, to)
    }
    if (out.dims.contains("day")) out = Preprocess.renameDim(out, "day", "time")
    out
  }

  def bake(spark: SparkSession, config: BakeConfig, prune: Boolean): String = {
    val sec = config.section("Terraclimate")
    val inputRoot = sec.getOrElse("input_root",
      throw new IllegalArgumentException("Terraclimate.input_root is required"))
    val years = sec.getOrElse("years",
      throw new IllegalArgumentException("Terraclimate.years is required"))
      .split(",").toVector
    val variables = sec.getOrElse("variables", "soil,srad").split(",").toVector
    val storeName = sec.getOrElse("store_name", "terraclimate.zarr")
    val chunks = Recipes.parseChunks(sec.getOrElse("target_chunks", "time=12"))
    val monthsPerFile = sec.getOrElse("months_per_file", "12").toInt

    val pattern0 = FilePattern(
      kw => s"$inputRoot/TerraClimate_${kw("variable")}_${kw("time")}.zarr",
      Vector(MergeDim("variable", variables),
        ConcatDim("time", years, nitemsPerFile = Some(monthsPerFile))),
      fileType = FileType.Zarr)
    val pattern = if (prune) pattern0.prune() else pattern0

    val targetRoot = config.runtime.targetRoot.resolve
    val items = Pipelines.createItems(spark, pattern)
    val opened = Pipelines.openWithFragments(items, pattern.fileType)
    val munged = opened.map { case (idx, f) => (idx, munge(f)) }(
      Encoders.kryo[(graft.core.Index, Fragment)])
    val storePath = s"$targetRoot/$storeName"
    Pipelines.storeToZarr(munged, pattern.combineDimKeys, storePath, chunks,
      attrs = fixedAttrs)
    storePath
  }
}
