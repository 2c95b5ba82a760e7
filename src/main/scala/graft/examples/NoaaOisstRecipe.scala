package graft.examples

import graft.Bake.BakeConfig
import graft.core.{Fragment, Index}
import graft.patterns.{ConcatDim, FilePattern, FileType}
import graft.transforms.{Openers, Pipelines}
import org.apache.spark.sql.{Encoders, SparkSession}

/** `noaa-oisst`: the reference's FLAGSHIP feedstock
  * (examples/feedstock/noaa_oisst.py:14-52) — one netCDF-4 file per day,
  * URLs produced by strftime-formatting the date into a template
  * (`URL_FORMAT.format(time=time)` with `{time:%Y%m}` / `{time:%Y%m%d}`
  * fields), fetched through the input cache (OpenURLWithFSSpec), decoded
  * (OpenWithXarray), written to one Zarr store (StoreToZarr), then
  * coordinate- and metadata-consolidated (ConsolidateDimensionCoordinates |
  * ConsolidateMetadata).
  *
  * Config section `NoaaOisst`:
  *   - `url_format` — template with `{time:%...}` strftime fields, e.g.
  *     `https://.../avhrr/{time:%Y%m}/oisst-avhrr-v02r01.{time:%Y%m%d}.nc`
  *   - `dates` — comma list of ISO dates (the reference enumerates
  *     `pd.date_range("1981-09-01", "2022-02-01", freq="D")` on the
  *     driver; a date list is metadata-sized at any scale)
  *   - `store_name` (default `noaa-oisst.zarr`), `target_chunks` (optional)
  *   - `file_type` (default `netcdf4` — what NOAA publishes; the
  *     integration fixture serves the same files over HTTP)
  * Downloads cache under `InputCacheStorage.root_path` when configured,
  * else spool to executor-local tmp (openers.py:240-247). */
object NoaaOisstFeedstock extends Recipe {
  val id = "noaa-oisst"

  /** `"{time:%Y%m%d}".format(time=date)` analog: substitute every
    * `{time:...}` field with the date rendered through the %-codes the
    * reference template uses (%Y four-digit year, %m month, %d day,
    * %j day-of-year). Unknown %-codes are rejected loudly. */
  private[examples] def formatUrl(template: String,
                                  date: java.time.LocalDate): String = {
    val field = raw"\{time:([^}]*)\}".r
    field.replaceAllIn(template, m => {
      val spec = m.group(1)
      val out = new StringBuilder
      var i = 0
      while (i < spec.length) {
        val c = spec.charAt(i)
        if (c == '%' && i + 1 < spec.length) {
          spec.charAt(i + 1) match {
            case 'Y' => out.append(f"${date.getYear}%04d")
            case 'm' => out.append(f"${date.getMonthValue}%02d")
            case 'd' => out.append(f"${date.getDayOfMonth}%02d")
            case 'j' => out.append(f"${date.getDayOfYear}%03d")
            case '%' => out.append('%')
            case other => throw new IllegalArgumentException(
              s"Unsupported strftime code %$other in url_format field " +
                s"{time:$spec}")
          }
          i += 2
        } else { out.append(c); i += 1 }
      }
      java.util.regex.Matcher.quoteReplacement(out.toString)
    })
  }

  def bake(spark: SparkSession, config: BakeConfig, prune: Boolean): String = {
    val sec = config.section("NoaaOisst")
    val urlFormat = sec.getOrElse("url_format",
      throw new IllegalArgumentException("NoaaOisst.url_format is required"))
    val dates = sec.getOrElse("dates",
      throw new IllegalArgumentException("NoaaOisst.dates is required"))
      .split(",").map(_.trim).toVector
    val storeName = sec.getOrElse("store_name", "noaa-oisst.zarr")
    val chunks = Recipes.parseChunks(sec.getOrElse("target_chunks", ""))
    val fileType = sec.getOrElse("file_type", "netcdf4").toLowerCase match {
      case "netcdf4" => FileType.Netcdf4
      case "netcdf3" => FileType.Netcdf3
      case "zarr"    => FileType.Zarr
      case other => throw new IllegalArgumentException(
        s"NoaaOisst.file_type '$other' (expected netcdf4, netcdf3, or zarr)")
    }

    // time ConcatDim with nitems_per_file=1 (noaa_oisst.py:26)
    val pattern0 = FilePattern(
      kw => formatUrl(urlFormat, java.time.LocalDate.parse(kw("time"))),
      Vector(ConcatDim("time", dates, nitemsPerFile = Some(1))),
      fileType = fileType)
    val pattern = if (prune) pattern0.prune() else pattern0

    // OpenURLWithFSSpec: cache-through when InputCacheStorage is injected
    val cacheDir =
      if (config.runtime.inputCacheRoot.isProvided)
        Some(config.runtime.inputCacheRoot.resolve)
      else None
    val items = Pipelines.createItems(spark, pattern)
    val ft = pattern.fileType
    val opened = items.map { case (idx, url) =>
      (idx, Openers.open(ft, url, cacheDir = cacheDir))
    }(Encoders.kryo[(Index, Fragment)])

    val storePath = s"${config.runtime.targetRoot.resolve}/$storeName"
    val g = Pipelines.storeToZarr(opened, pattern.combineDimKeys, storePath,
      chunks)
    // ConsolidateDimensionCoordinates | ConsolidateMetadata
    // (noaa_oisst.py:49-50)
    g.consolidateDimensionCoordinates()
    g.consolidateMetadata()
    storePath
  }
}
