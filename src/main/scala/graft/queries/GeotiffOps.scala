package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.core._
import graft.kerchunk.RefSet
import graft.patterns.{FilePattern, FileType}
import graft.tiff.Tiff
import graft.transforms.Pipelines
import graft.zarr.ZarrGroup
import java.nio.file.{Files, Paths}

/** GeoTIFF end-to-end through BOTH reference entry points — the
  * rasterio input family (docs/composition/styles.md:8-9) riding the
  * same pipeline as tests/test_end_to_end.py:37-60:
  *
  *   A. decoder pipeline — a y-MOSAIC of GeoTIFF latitude bands (the
  *      tile-mosaicking workflow: each file covers 8 rows of one
  *      48×40 EPSG:4326 raster, every slab a different container
  *      shape: classic/BigTIFF, II/MM, strips incl. a short last
  *      strip/16×16 tiles, None/LZW/Deflate/PackBits/LZW+predictor)
  *      → FilePattern(concat "y") → OpenWithXarray(rasterio analog) →
  *      DetermineSchema → Zarr store → reopen → exact equality
  *   B. kerchunk pipeline — header-only scanTiff over the
  *      representable slabs (uncompressed tiles, Deflate strips,
  *      BigTIFF Deflate tiles) → virtual store reads equal Tiff.read,
  *      materialized store too, JSON artifact lossless
  *
  * The golden raster's pixels are a closed-form integer formula, so the
  * driver's DuckDB oracle regenerates them (CubeOracle pattern) — the
  * hash gate proves every codec leg (one wrong LZW width bump or
  * predictor pass in ANY slab splits the hash).
  */
object GeotiffOps {

  private val W = 40; private val H = 48; private val SlabRows = 8
  private val Sx = 0.25 // exact dyadic: coord arithmetic is bit-exact
  private val X0 = -20.0; private val Top = 60.0

  private def px(x: Int, y: Int): Int = (x * 7 + y * 13 + 3) % 251

  /** Slab i's container shape — every axis of the codec matrix shows up
    * in the mosaic. (compression, predictor, tiled, rowsPerStrip,
    * littleEndian, bigTiff) */
  private def slabShape(i: Int): (Int, Int, Boolean, Int, Boolean, Boolean) =
    i match {
      case 0 => (1, 1, true, 0, true, false)      // uncompressed tiles, II
      case 1 => (5, 1, false, 3, false, false)    // LZW strips, short last, MM
      case 2 => (8, 1, false, 4, true, false)     // Deflate strips, II
      case 3 => (32773, 1, true, 0, false, false) // PackBits tiles, MM
      case 4 => (5, 2, false, 8, true, false)     // LZW + predictor 2, II
      case _ => (8, 1, true, 0, true, true)       // BigTIFF Deflate tiles, II
    }

  private[graft] def writeSlab(dir: String, i: Int): String = {
    val y0 = i * SlabRows
    val (comp, pred, tiled, rps, le, big) = slabShape(i)
    val bytes = Tiff.encode(W, SlabRows, 8, 1, le, comp, pred,
      if (tiled) Some((16, 16)) else None, rowsPerStrip = rps, bigTiff = big,
      px = (x, y, _) => px(x, y0 + y),
      geo = Some(Tiff.Geo(Sx, Sx, X0, Top - Sx * y0, 4326,
        geographic = true)))
    val path = s"$dir/slab_$i.tif"
    Files.write(Paths.get(path), bytes)
    path
  }

  /** The golden mosaic: what the assembled store must equal, with the
    * identical pixel-center coord arithmetic as Tiff.readFragment
    * (exact dyadic doubles, so per-slab and whole-raster association
    * agree bitwise). */
  private def golden(): Fragment = Fragment(
    dims = Map("y" -> H, "x" -> W),
    coords = Map(
      "x" -> Variable(Vector("x"), NDArray(DType.F8, Vector(W),
        Array.tabulate(W)(i => X0 + (i + 0.5) * Sx))),
      "y" -> Variable(Vector("y"), NDArray(DType.F8, Vector(H),
        Array.tabulate(H)(j => Top - (j + 0.5) * Sx)))),
    dataVars = Map("band_data" -> Variable(Vector("y", "x"),
      NDArray(DType.U1, Vector(H, W),
        Array.tabulate[Byte](H * W)(i => px(i % W, i / W).toByte)))),
    attrs = Map("crs" -> AttrValue("EPSG:4326")))

  def geotiffRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = Files.createTempDirectory("graft_gtiff").toString
    val files = (0 until H / SlabRows).map(writeSlab(dir, _)).toVector

    // ---- Entry-point A: rasterio open → schema → zarr → reopen ----
    val pattern = FilePattern.fromFileSequence(files, "y",
      nitemsPerFile = Some(SlabRows), fileType = FileType.Tiff)
    val items = Pipelines.createItems(spark, pattern)
    val frags = Pipelines.openWithFragments(items, FileType.Tiff)
    val storePath = s"$dir/store.zarr"
    Pipelines.storeToZarr(frags, pattern.combineDimKeys, storePath,
      Map("y" -> 16))
    val rebuilt = ZarrGroup(storePath).readFragment()
    val gold = golden()
    require(rebuilt.sameAs(gold), "geotiff: mosaic pipeline round-trip failed")
    require(rebuilt.attrs.get("crs").contains(AttrValue("EPSG:4326")),
      "geotiff: crs attr lost in the pipeline")

    // ---- Entry-point B: header-only scan → virtual + materialized ----
    // the representable slabs: uncompressed tiles (0), Deflate strips
    // (2), BigTIFF Deflate tiles (5)
    Seq(0, 2, 5).foreach { i =>
      val refs = RefSet.scanTiff(files(i))
      val direct = Tiff.read(files(i))
      require(refs.asZarrGroup(s"refs://slab_$i").readFragment()
        .sameAs(direct), s"geotiff: virtual store differs for slab $i")
      require(RefSet.fromJson(RefSet.toJson(refs)).keys == refs.keys,
        s"geotiff: kerchunk JSON artifact not lossless for slab $i")
    }
    val virtDir = s"$dir/virt.zarr"
    RefSet.scanTiff(files(0)).materialize(virtDir)
    require(ZarrGroup(virtDir).readFragment()
      .sameAs(gold.isel(Map("y" -> Slc(0, SlabRows)))),
      "geotiff: materialized refs differ from the golden slab")
    // the non-representable slabs fail the scan BY NAME (the decode
    // path, not a crash, is the fallback)
    Seq(1 -> "no zarr codec", 4 -> "predictor").foreach { case (i, what) =>
      val e = scala.util.Try(RefSet.scanTiff(files(i)))
      require(e.isFailure &&
        e.failed.get.getMessage.contains("decode via Tiff.read"),
        s"geotiff: slab $i ($what) must be rejected by name")
    }

    CubeOracle.quantized(spark, rebuilt, Seq("y", "x"),
      col("value").cast("long"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e2e_geotiff_roundtrip" -> geotiffRoundtrip _,
  )

  val oracles: Map[String, String] = Map(
    "e2e_geotiff_roundtrip" -> CubeOracle.rangeSql(
      Seq("y" -> H, "x" -> W),
      Seq("band_data" -> "((3 + y*13 + x*7) % 251)")),
  )
}
