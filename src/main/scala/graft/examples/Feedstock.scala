package graft.examples

import graft.Bake.BakeConfig
import org.apache.spark.sql.SparkSession

/** A bake-able recipe: the Scala analog of one `meta.yaml` entry
  * (examples/feedstock/meta.yaml: `recipes: - id / object`). Reference
  * recipes hardcode remote URLs; these read their input root and matrix
  * keys from the recipe's own config section (the runner's per-class
  * traitlets config), which is also what lets the integration spec point
  * them at generated fixtures in a zero-egress environment. */
trait Recipe {
  def id: String
  /** Execute against injected deploy-time config; returns the output
    * artifact path (store or reference file) under the target root. */
  def bake(spark: SparkSession, config: BakeConfig, prune: Boolean): String
}

/** The feedstock registry — meta.yaml's `recipes:` list. */
object Feedstock {
  val recipes: Map[String, Recipe] = Seq(
    DailyCubeFeedstock,
    DailyCubeDynamicChunksFeedstock,
    GpcpRechunkFeedstock,
    NarrOpendapFeedstock,
    NoaaOisstFeedstock,
    TerraclimateRecipe,
    HrrrKerchunkRecipe,
    HrrrValidTimeRecipe,
  ).map(r => r.id -> r).toMap
}

/** `narr-opendap`: open data DIRECTLY from an OPeNDAP server — no input
  * files downloaded or cached — promote the CF grid-mapping variable to a
  * coordinate, and store to Zarr (examples/feedstock/narr_opendap.py:27-72,
  * the SetProjectionAsCoord preprocessor at :39-51). Config section
  * `NarrOpendap`: `url_template` (`{time}` substituted per key),
  * `times` (comma list), `projection_var` (default `Lambert_Conformal`),
  * `store_name`, `target_chunks` (reference pins `time=1`). */
object NarrOpendapFeedstock extends Recipe {
  val id = "narr-opendap"

  def bake(spark: SparkSession, config: BakeConfig, prune: Boolean): String = {
    import graft.transforms.{Pipelines, Preprocess}
    val sec = config.section("NarrOpendap")
    val template = sec.getOrElse("url_template",
      throw new IllegalArgumentException("NarrOpendap.url_template is required"))
    val times = sec.getOrElse("times",
      throw new IllegalArgumentException("NarrOpendap.times is required"))
      .split(",").toVector
    val projVar = sec.getOrElse("projection_var", "Lambert_Conformal")
    val storeName = sec.getOrElse("store_name", "narr.zarr")
    val chunks = Recipes.parseChunks(sec.getOrElse("target_chunks", "time=1"))
    val pattern0 = graft.patterns.FilePattern(
      kw => template.replace("{time}", kw("time")),
      Vector(graft.patterns.ConcatDim("time", times)),
      fileType = graft.patterns.FileType.Opendap)
    val pattern = if (prune) pattern0.prune() else pattern0
    val targetRoot = config.runtime.targetRoot.resolve
    val items = Pipelines.createItems(spark, pattern)
    val opened = Pipelines.openWithFragments(items, pattern.fileType)
    val projected = opened.map { case (idx, f) =>
      (idx, if (f.dataVars.contains(projVar)) Preprocess.setCoord(f, projVar) else f)
    }(org.apache.spark.sql.Encoders.kryo[(graft.core.Index, graft.core.Fragment)])
    val storePath = s"$targetRoot/$storeName"
    Pipelines.storeToZarr(projected, pattern.combineDimKeys, storePath, chunks)
    storePath
  }
}

/** `daily-cube`: the noaa_oisst-shaped flagship (one file per day →
  * rechunked cube; examples/feedstock/noaa_oisst.py:41-52) wired through
  * [[DailyCubeRecipe]]. Config section `DailyCube`:
  * `input_root` (file URLs are `input_root/day_<key>.zarr`),
  * `days` (comma list), `store_name`, `target_chunks` ("time=2,..."),
  * `zarr_format` (3, or 2 for a zarr-python-classic `.zgroup`/`.zarray`
  * output store that downstream zarr 2.x / xarray consumers read). */
object DailyCubeFeedstock extends Recipe {
  val id = "daily-cube"

  def bake(spark: SparkSession, config: BakeConfig, prune: Boolean): String = {
    val sec = config.section("DailyCube")
    val inputRoot = sec.getOrElse("input_root",
      throw new IllegalArgumentException("DailyCube.input_root is required"))
    val days = sec.getOrElse("days",
      throw new IllegalArgumentException("DailyCube.days is required"))
      .split(",").toVector
    val storeName = sec.getOrElse("store_name", "daily-cube.zarr")
    val chunks = Recipes.parseChunks(sec.getOrElse("target_chunks", "time=2"))
    val zarrFormat = sec.getOrElse("zarr_format", "3").toInt
    val pattern0 = DailyCubeRecipe.pattern(
      day => s"$inputRoot/day_$day.zarr", days)
    val pattern = if (prune) pattern0.prune() else pattern0
    val g = DailyCubeRecipe.run(spark, pattern, config.runtime, storeName,
      chunks, zarrFormat = zarrFormat)
    g.root
  }
}

/** `daily-cube-dynamic-chunks`: the gpcp_from_gcs_dynamic_chunks recipe
  * (examples/feedstock/gpcp_from_gcs_dynamic_chunks.py:40-55) — identical
  * pipeline to `daily-cube` except chunking is decided at runtime by a
  * `dynamic_chunking_fn` over the combined schema's template dataset
  * (`chunk_func` returns `{"time": 2}` in the reference; the fn here is the
  * same constant-fn shape, with the chunk size configurable). Section
  * `DailyCube` is shared with the base recipe (minus `target_chunks`). */
object DailyCubeDynamicChunksFeedstock extends Recipe {
  val id = "daily-cube-dynamic-chunks"

  def bake(spark: SparkSession, config: BakeConfig, prune: Boolean): String = {
    val sec = config.section("DailyCube")
    val inputRoot = sec.getOrElse("input_root",
      throw new IllegalArgumentException("DailyCube.input_root is required"))
    val days = sec.getOrElse("days",
      throw new IllegalArgumentException("DailyCube.days is required"))
      .split(",").toVector
    val storeName = sec.getOrElse("store_name", "daily-cube-dynamic.zarr")
    val timeChunk = sec.getOrElse("dynamic_time_chunk", "2").toInt
    val pattern0 = DailyCubeRecipe.pattern(
      day => s"$inputRoot/day_$day.zarr", days)
    val pattern = if (prune) pattern0.prune() else pattern0
    val targetRoot = config.runtime.targetRoot.resolve
    val items = graft.transforms.Pipelines.createItems(spark, pattern)
    val opened = graft.transforms.Pipelines.openWithFragments(items, pattern.fileType)
    val storePath = s"$targetRoot/$storeName"
    graft.transforms.Pipelines.storeToZarr(opened, pattern.combineDimKeys,
      storePath, dynamicChunkingFn = Some(_ => Map("time" -> timeChunk)))
    storePath
  }
}

/** `gpcp-rechunk`: read an EXISTING Zarr store and write it back with a
  * different chunk structure (examples/feedstock/gpcp_rechunk.py:16-39) —
  * the distributed store scan plans slabs from metadata only and each task
  * range-reads its own slab, so a 100 TB store rechunks with zero driver
  * data movement. Config section `GpcpRechunk`: `input_store` (path of the
  * source store), `concat_dim` (default `time`), `items_per_fragment`
  * (scan slab size, default 4), `store_name`, `target_chunks`. */
object GpcpRechunkFeedstock extends Recipe {
  val id = "gpcp-rechunk"

  def bake(spark: SparkSession, config: BakeConfig, prune: Boolean): String = {
    val sec = config.section("GpcpRechunk")
    val inputStore = sec.getOrElse("input_store",
      throw new IllegalArgumentException("GpcpRechunk.input_store is required"))
    val dim = sec.getOrElse("concat_dim", "time")
    val slab = sec.getOrElse("items_per_fragment", "4").toInt
    val storeName = sec.getOrElse("store_name", "gpcp_rechunked.zarr")
    val chunks = Recipes.parseChunks(sec.getOrElse("target_chunks",
      throw new IllegalArgumentException("GpcpRechunk.target_chunks is required")))
    // --prune on a single-store pattern is a no-op in the reference too
    // (pattern_from_file_sequence with ONE url; patterns.py:235-260 keeps
    // the first two items of a concat dim that only has one)
    val targetRoot = config.runtime.targetRoot.resolve
    val scanned = graft.transforms.Pipelines.scanZarrStore(spark, inputStore, dim, slab)
    val storePath = s"$targetRoot/$storeName"
    graft.transforms.Pipelines.storeToZarr(scanned,
      Vector(graft.core.Dimension(dim, graft.core.CombineOp.Concat)),
      storePath, chunks)
    storePath
  }
}

private[examples] object Recipes {
  /** "time=12,lat=1024" → Map(time -> 12, lat -> 1024). */
  def parseChunks(s: String): Map[String, Int] =
    s.split(",").filter(_.nonEmpty).map { kv =>
      kv.split("=") match {
        case Array(k, v) if v.trim.matches("-?\\d+") => k.trim -> v.trim.toInt
        case _ => throw new IllegalArgumentException(
          s"malformed target_chunks entry '$kv' in '$s' — expected dim=int")
      }
    }.toMap
}
