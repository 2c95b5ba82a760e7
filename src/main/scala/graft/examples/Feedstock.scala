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
    TerraclimateRecipe,
    HrrrKerchunkRecipe,
  ).map(r => r.id -> r).toMap
}

/** `daily-cube`: the noaa_oisst-shaped flagship (one file per day →
  * rechunked cube; examples/feedstock/noaa_oisst.py:41-52) wired through
  * [[DailyCubeRecipe]]. Config section `DailyCube`:
  * `input_root` (file URLs are `input_root/day_<key>.zarr`),
  * `days` (comma list), `store_name`, `target_chunks` ("time=2,..."). */
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
    val pattern0 = DailyCubeRecipe.pattern(
      day => s"$inputRoot/day_$day.zarr", days)
    val pattern = if (prune) pattern0.prune() else pattern0
    val g = DailyCubeRecipe.run(spark, pattern, config.runtime, storeName, chunks)
    g.root
  }
}

private[examples] object Recipes {
  /** "time=12,lat=1024" → Map(time -> 12, lat -> 1024). */
  def parseChunks(s: String): Map[String, Int] =
    s.split(",").filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split("=")
      k.trim -> v.trim.toInt
    }.toMap
}
