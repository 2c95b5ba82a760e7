package graft.examples

import graft.Bake.BakeConfig
import graft.core.{CombineOp, Dimension, Index, Pos}
import graft.kerchunk.{CombineReferences, RefSet}
import graft.patterns.{ConcatDim, FilePattern, FileType}
import graft.transforms.Pipelines
import org.apache.spark.sql.{Encoders, SparkSession}

/** `hrrr-kerchunk-concat-step`: the reference-file feedstock
  * (examples/feedstock/hrrr_kerchunk_concat_step.py:43-57) — one GRIB2
  * file per forecast step, each scanned to byte-range references
  * (OpenWithKerchunk analog, no data copied), messages filtered to the
  * surface temperature field (the `grib_filters =
  * {"typeOfLevel": "surface", "shortName": "t"}` analog), then combined
  * into ONE kerchunk artifact (`WriteCombinedReference`) a zarr reader
  * opens as a single dataset.
  *
  * Representation note: cfgrib materializes the step axis as a `step`
  * hypercube dimension; this scanner exposes each message's valid time
  * (reference time + forecast step) as the `time` axis, so the step
  * concat surfaces as the time concat of the same ordered slabs — one
  * message per step, identical grid, monotonically increasing valid time.
  *
  * Config section `HrrrKerchunk`: `input_root` (file URLs are
  * `input_root/hrrr.t22z.wrfsfcf<NN>.grib2`), `steps` (comma list,
  * default `0,1,2,3` as in the reference), `short_name` (message filter,
  * default `TMP`), `store_name` (default `hrrr-concat-step`), and
  * `artifact` — `json` (default, kerchunk reference.json) or `parquet`
  * (the fsspec LazyReferenceMapper record layout), the same
  * extension-driven choice writers.py:132-195 makes. */
object HrrrKerchunkRecipe extends Recipe {
  val id = "hrrr-kerchunk-concat-step"

  /** identical_dims (hrrr_kerchunk_concat_step.py:26): grid coordinates
    * shared by every step — kept once in the combined artifact. */
  val identicalDims: Vector[String] = Vector("latitude", "longitude")

  def bake(spark: SparkSession, config: BakeConfig, prune: Boolean): String = {
    val sec = config.section("HrrrKerchunk")
    val inputRoot = sec.getOrElse("input_root",
      throw new IllegalArgumentException("HrrrKerchunk.input_root is required"))
    val steps = sec.getOrElse("steps", "0,1,2,3").split(",").toVector
    val shortName = sec.getOrElse("short_name", "TMP")
    val storeName = sec.getOrElse("store_name", "hrrr-concat-step")

    val pattern0 = FilePattern(
      kw => f"$inputRoot/hrrr.t22z.wrfsfcf${kw("step").trim.toInt}%02d.grib2",
      Vector(ConcatDim("step", steps)),
      fileType = FileType.Grib)
    val pattern = if (prune) pattern0.prune() else pattern0

    val timeDim = Dimension("time", CombineOp.Concat)
    // executor-side scan via the OpenWithKerchunk stage (metadata-only —
    // the GRIB payload is never read), messages filtered to the requested
    // field AT GROUND SURFACE (both halves of the reference's grib_filters:
    // typeOfLevel=surface is GRIB2 fixed-surface type 1), step position
    // re-keyed onto the valid-time concat axis
    val items = Pipelines.createItems(spark, pattern)
    val refs = Pipelines.openWithKerchunk(items, pattern.fileType,
        gribFilter = m =>
          m.shortName == shortName && m.product.surfaceType == 1)
      .map { case (idx, kept) =>
        require(kept.length == 1,
          s"expected exactly one '$shortName' message per step file, " +
            s"got ${kept.length}")
        (Index.of(timeDim -> Pos(idx.findPosition("step"))), kept.head)
      }(Encoders.kryo[(Index, RefSet)])

    val targetRoot = config.runtime.targetRoot.resolve
    val outPath = sec.getOrElse("artifact", "json") match {
      case "json"    => s"$targetRoot/$storeName/reference.json"
      case "parquet" => s"$targetRoot/$storeName/reference.parquet"
      case other => throw new IllegalArgumentException(
        s"HrrrKerchunk.artifact must be json or parquet, got '$other'")
    }
    CombineReferences.writeCombinedReference(refs, Vector("time"),
      identicalDims, outPath, v2Keys = true)
    outPath
  }
}
