package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core._
import graft.patterns.{FilePattern, FileType}
import graft.transforms.Pipelines
import graft.zarr.ZarrGroup
import java.nio.file.Files

/** The cube-engine surface exposed through the driver contract. The
  * pipelines themselves are not SQL-expressible (typed Dataset pipeline +
  * the Zarr store), so every golden equality runs as a hard in-query
  * `require` (the reference's xr.testing.assert_equal round-trip,
  * tests/test_end_to_end.py:37-60); since round 8 each entry ALSO returns
  * the rebuilt store's long view with formula-generated values so the
  * driver hash-compares it against DuckDB (see CubeOracle). */
object CubeOps {

  private val NY = 18; private val NX = 36
  private val FooSeed = 5; private val BarSeed = 23

  /** Deterministic golden cube; data values from CubeOracle's closed-form
    * so the DuckDB oracle can regenerate them. */
  private def makeCube(nt: Int): Fragment = {
    Fragment(
      dims = Map("time" -> nt, "lat" -> NY, "lon" -> NX),
      coords = Map(
        "time" -> Variable(Vector("time"),
          NDArray(DType.I8, Vector(nt), (0 until nt).map(_.toLong).toArray),
          Map("units" -> AttrValue("days since 2010-01-01"),
            "calendar" -> AttrValue("proleptic_gregorian"))),
        "lat" -> Variable(Vector("lat"),
          NDArray(DType.F8, Vector(NY), (0 until NY).map(i => -85.0 + i * 10).toArray)),
        "lon" -> Variable(Vector("lon"),
          NDArray(DType.F8, Vector(NX), (0 until NX).map(i => 5.0 + i * 10).toArray))),
      dataVars = Map(
        "foo" -> Variable(Vector("time", "lat", "lon"),
          NDArray(DType.F8, Vector(nt, NY, NX), CubeOracle.fillF8(FooSeed, 1000, nt, NY, NX))),
        "bar" -> Variable(Vector("time", "lat", "lon"),
          NDArray(DType.I8, Vector(nt, NY, NX), CubeOracle.fillI(BarSeed, 1000, nt, NY, NX)))),
      attrs = Map("conventions" -> AttrValue("CF 1.6")))
  }

  private val dims = Seq("time", "lat", "lon")

  /** value_q: foo back to its generating integer, bar already integral. */
  private def vq = CubeOracle.f8ElseIntVq("foo")

  private def oracle(nt: Int): String = CubeOracle.rangeSql(
    Seq("time" -> nt, "lat" -> NY, "lon" -> NX),
    Seq(
      "bar" -> (CubeOracle.viSql(BarSeed, 1000, "time", "lat", "lon") + " % 10"),
      "foo" -> CubeOracle.viSql(FooSeed, 1000, "time", "lat", "lon")))

  private def writeFragmentFiles(frags: Vector[Fragment], dir: String): Vector[String] =
    frags.zipWithIndex.map { case (f, i) =>
      val path = s"$dir/frag_$i.zarr"
      val g = ZarrGroup(path)
      g.initGroup(f.attrs)
      f.allVars.foreach { case (name, v) =>
        g.createArray(name, v.shape, v.shape, v.dtype, v.attrs,
          dimensionNames = Some(v.dims))
        g.writeRegion(name, Vector.fill(v.data.ndim)(0), v.data)
      }
      path
    }

  /** pattern → open → DetermineSchema → IndexItems → Rechunk → Zarr store →
    * reopen → exact-equality verdict, one row per variable. */
  def cubeRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nt = 10
    val cube = makeCube(nt)
    val dir = Files.createTempDirectory("graft_cube").toString
    val slabs = (0 until nt by 2).map(t0 =>
      cube.isel(Map("time" -> Slc(t0, t0 + 2)))).toVector
    val files = writeFragmentFiles(slabs, dir)
    val pattern = FilePattern.fromFileSequence(files, "time",
      nitemsPerFile = Some(2), fileType = FileType.Zarr)
    val items = Pipelines.createItems(spark, pattern)
    val frags = Pipelines.openWithFragments(items, FileType.Zarr)
    val storePath = s"$dir/store.zarr"
    Pipelines.storeToZarr(frags, pattern.combineDimKeys, storePath,
      Map("time" -> 3))
    val store = ZarrGroup(storePath)
    val result = store.readFragment()
    cube.allVars.toSeq.sortBy(_._1).foreach { case (name, v) =>
      val got = result.allVars.get(name)
      require(got.exists(g => g.dims == v.dims && g.data.sameElements(v.data)),
        s"cube_roundtrip: variable $name differs after round-trip")
    }
    require(store.arrayMeta("foo").chunks.head == 3,
      "cube_roundtrip: target chunking not applied")
    require(result.sameAs(cube), "cube_roundtrip: rebuilt cube != source")
    CubeOracle.quantized(spark, result, dims, vq)
  }

  /** The object-store scale path end-to-end: files → sharded+gzip Zarr
    * store (2 inner chunks per shard object) → distributed slab scan →
    * rechunk into a second store → exact golden equality at every hop. */
  def cubeSharded(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nt = 12
    val cube = makeCube(nt)
    val dir = Files.createTempDirectory("graft_cube_sh").toString
    val slabs = (0 until nt by 2).map(t0 =>
      cube.isel(Map("time" -> Slc(t0, t0 + 2)))).toVector
    val files = writeFragmentFiles(slabs, dir)
    val pattern = FilePattern.fromFileSequence(files, "time",
      nitemsPerFile = Some(2), fileType = FileType.Zarr)
    val frags = Pipelines.openWithFragments(
      Pipelines.createItems(spark, pattern), FileType.Zarr)
    val store1Path = s"$dir/store_sharded.zarr"
    Pipelines.storeToZarr(frags, pattern.combineDimKeys, store1Path,
      Map("time" -> 2), targetShards = Map("time" -> 4), gzipLevel = Some(4))
    val store1 = ZarrGroup(store1Path)
    val meta1 = store1.arrayMeta("foo")
    val ok1 = store1.readFragment().sameAs(cube) &&
      meta1.chunks.head == 2 && meta1.shardShape.map(_.head).contains(4) &&
      meta1.gzipLevel.contains(4)
    // distributed scan of the sharded store, rechunk 2 -> 6 into a new store
    val scanned = Pipelines.scanZarrStore(spark, store1Path, "time", 6)
    val store2Path = s"$dir/store_rechunked.zarr"
    Pipelines.storeToZarr(scanned,
      Vector(Dimension("time", CombineOp.Concat)), store2Path, Map("time" -> 6))
    val store2 = ZarrGroup(store2Path)
    val result2 = store2.readFragment()
    require(ok1, "cube_sharded: sharded+gzip store stage failed")
    require(result2.sameAs(cube) && store2.arrayMeta("foo").chunks.head == 6,
      "cube_sharded: scan+rechunk stage failed")
    CubeOracle.quantized(spark, result2, dims, vq)
  }

  /** The reference's explicitly NON-idempotent append path
    * (transforms.py:679-693: `append_dim=` extends an existing store; a
    * replayed batch appends again): build a 10-step store, then run a
    * SECOND pipeline appending 2 more files along time, and golden-compare
    * the result against the full 12-step cube — the dims check, the
    * per-variable data equality, and the coordinate extension each get a
    * verdict row. */
  def cubeAppend(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nt = 12
    val cube = makeCube(nt)
    val first = cube.isel(Map("time" -> Slc(0, 10)))
    val second = cube.isel(Map("time" -> Slc(10, 12)))
    val dir = Files.createTempDirectory("graft_cube_append").toString
    val storePath = s"$dir/store.zarr"

    def run(frag: Fragment, tag: String, append: Boolean): Unit = {
      val nf = frag.dims("time")
      val slabs = (0 until nf by 2).map(t0 =>
        frag.isel(Map("time" -> Slc(t0, t0 + 2)))).toVector
      val files = writeFragmentFiles(slabs, s"$dir/in_$tag")
      val pattern = FilePattern.fromFileSequence(files, "time",
        nitemsPerFile = Some(2), fileType = FileType.Zarr)
      val frags = Pipelines.openWithFragments(
        Pipelines.createItems(spark, pattern), FileType.Zarr)
      // chunk 2 divides the 10-step initial store, so the append offset
      // lands on a chunk boundary (the same alignment zarr itself requires)
      Pipelines.storeToZarr(frags, pattern.combineDimKeys, storePath,
        Map("time" -> 2), appendDim = if (append) Some("time") else None)
    }
    run(first, "initial", append = false)
    val preAppendLen = ZarrGroup(storePath).arrayMeta("foo").shape.head
    run(second, "append", append = true)

    val store = ZarrGroup(storePath)
    val result = store.readFragment()
    cube.allVars.toSeq.sortBy(_._1).foreach { case (name, v) =>
      val got = result.allVars.get(name)
      require(got.exists(g => g.dims == v.dims && g.data.sameElements(v.data)),
        s"cube_append: variable $name differs after append")
    }
    require(preAppendLen == 10 && result.dims("time") == nt,
      "cube_append: append did not extend the time dim 10 -> 12")
    require(result.sameAs(cube), "cube_append: appended cube != 12-step golden")
    CubeOracle.quantized(spark, result, dims, vq)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e2e_cube_roundtrip" -> cubeRoundtrip _,
    "e2e_cube_sharded" -> cubeSharded _,
    "e2e_append" -> cubeAppend _,
  )

  val oracles: Map[String, String] = Map(
    "e2e_cube_roundtrip" -> oracle(10),
    "e2e_cube_sharded" -> oracle(12),
    "e2e_append" -> oracle(12),
  )
}
