package graft.examples

import graft.core.Attrs.Attrs
import graft.core.{AttrValue, Fragment}
import graft.patterns.{ConcatDim, FilePattern, FileType, MergeDim}
import graft.transforms.{Pipelines, Preprocess, RuntimeConfig}
import graft.zarr.ZarrGroup
import org.apache.spark.sql.SparkSession

/** Example recipe — the Scala twin of the reference's flagship feedstock
  * (examples/feedstock/noaa_oisst.py:41-52):
  *
  *   pattern | open | preprocess | StoreToZarr
  *
  * A user of the reference writes the same four stages here: declare the
  * URL matrix, open each file to an indexed fragment, optionally clean it,
  * and store to a rechunked Zarr cube. Deploy-time configuration (where the
  * store lands) is injected through RuntimeConfig, mirroring the runner's
  * TARGET_STORAGE injection (SURVEY §3.3).
  */
object DailyCubeRecipe {

  /** One day per file, URLs formatted from the time key. */
  def pattern(urlForDay: String => String, days: Vector[String]): FilePattern =
    FilePattern(
      kw => urlForDay(kw("time")),
      Vector(ConcatDim("time", days, nitemsPerFile = Some(1))),
      fileType = FileType.Zarr)

  /** Multi-variable variant: variable × time matrix (terraclimate-style). */
  def multiVarPattern(urlFor: (String, String) => String,
                      variables: Vector[String],
                      days: Vector[String]): FilePattern =
    FilePattern(
      kw => urlFor(kw("variable"), kw("time")),
      Vector(MergeDim("variable", variables),
        ConcatDim("time", days, nitemsPerFile = Some(1))),
      fileType = FileType.Zarr)

  /** The recipe body. `mask` mirrors the terraclimate preprocessor's
    * threshold masking (examples/feedstock/terraclimate.py:64-93). */
  def run(spark: SparkSession,
          pattern: FilePattern,
          config: RuntimeConfig.Config,
          storeName: String,
          targetChunks: Map[String, Int],
          maskVar: Option[(String, Double => Boolean)] = None,
          extraAttrs: Attrs = Map("produced_by" -> AttrValue("graft")),
          zarrFormat: Int = 3): ZarrGroup = {
    val targetRoot = config.targetRoot.resolve
    val items = Pipelines.createItems(spark, pattern)
    val opened = Pipelines.openWithFragments(items, pattern.fileType)
    val preprocessed = maskVar match {
      case Some((name, pred)) =>
        opened.map { case (idx, f) => (idx, Preprocess.maskWhere(f, name, pred)) }(
          org.apache.spark.sql.Encoders.kryo[(graft.core.Index, Fragment)])
      case None => opened
    }
    Pipelines.storeToZarr(preprocessed, pattern.combineDimKeys,
      s"$targetRoot/$storeName", targetChunks, attrs = extraAttrs,
      zarrFormat = zarrFormat)
  }
}
