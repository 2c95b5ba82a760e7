package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core._
import graft.dap.Dap2
import graft.patterns.{FilePattern, FileType}
import graft.transforms.Pipelines
import graft.zarr.ZarrGroup
import java.nio.file.Files

/** OPeNDAP end-to-end (openers.py:83-86: file_type="opendap" opens a DAP
  * URL directly, never cached to local files; http fixture shape as in
  * tests/conftest.py:158-206): a local OPeNDAP-shaped server serves the
  * golden cube's .dds/.das/.dods documents; the recipe pipeline opens the
  * URL through the engine registry, stores to Zarr, and the store must
  * equal the served cube exactly. Rows-only driver check, like the other
  * binary-format e2e entries. */
object DapOps {

  private val NY = 18; private val NX = 36
  private val FooSeed = 29

  private def makeCube(nt: Int): Fragment = {
    Fragment(
      dims = Map("time" -> nt, "lat" -> NY, "lon" -> NX),
      coords = Map(
        "time" -> Variable(Vector("time"),
          NDArray(DType.I4, Vector(nt), (0 until nt).toArray),
          Map("units" -> AttrValue("days since 2010-01-01"))),
        "lat" -> Variable(Vector("lat"),
          NDArray(DType.F8, Vector(NY), (0 until NY).map(i => -85.0 + i * 10).toArray)),
        "lon" -> Variable(Vector("lon"),
          NDArray(DType.F8, Vector(NX), (0 until NX).map(i => 5.0 + i * 10).toArray))),
      dataVars = Map(
        "foo" -> Variable(Vector("time", "lat", "lon"),
          NDArray(DType.F8, Vector(nt, NY, NX), CubeOracle.fillF8(FooSeed, 1000, nt, NY, NX)),
          Map("long_name" -> AttrValue("Fantastic Foo")))),
      attrs = Map("conventions" -> AttrValue("CF 1.6")))
  }

  def opendapRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nt = 6
    val cube = makeCube(nt)
    // serve 2-day slabs as three DAP datasets (sequential_1d http fixture
    // shape); local[*] executors share the driver host, like the
    // reference's fixture server
    val slabs = (0 until nt by 2).map(t0 =>
      t0 -> cube.isel(Map("time" -> Slc(t0, t0 + 2)))).toVector
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val seenCes = new java.util.concurrent.atomic.AtomicInteger(0)
    slabs.foreach { case (t0, slab) =>
      def serve(suffix: String, bytes: Array[Byte]): Unit =
        server.createContext(s"/slab_$t0$suffix",
          (ex: com.sun.net.httpserver.HttpExchange) => {
            ex.sendResponseHeaders(200, bytes.length.toLong)
            ex.getResponseBody.write(bytes)
            ex.close()
          })
      /** Data endpoint honoring hyperslab projections (what a real
        * Hyrax/TDS does server-side): `ceOf` extracts the CE from the
        * decoded query, `encode` re-renders the sliced fragment. */
      def serveData(suffix: String, sep: Char,
                    ceOf: String => Option[String],
                    encode: Fragment => Array[Byte]): Unit =
        server.createContext(s"/slab_$t0$suffix",
          (ex: com.sun.net.httpserver.HttpExchange) => {
            val ce = ceOf(Option(ex.getRequestURI.getQuery).getOrElse(""))
            val served = ce match {
              case Some(c) if c.nonEmpty =>
                seenCes.incrementAndGet()
                graft.dap.Constraint.applyProjections(slab,
                  graft.dap.Constraint.parseProjections(c, sep))
              case _ => slab
            }
            val bytes = encode(served)
            ex.sendResponseHeaders(200, bytes.length.toLong)
            ex.getResponseBody.write(bytes)
            ex.close()
          })
      // the middle slab is served over DAP4 (dmr + chunked dap), the
      // others over DAP2 — the mixed-protocol fleet a migration-era
      // ingest actually faces; the opener registry dispatches per URL
      if (t0 == 2) {
        val (dmr, _) = graft.dap.Dap4.encode(slab, s"slab_$t0.nc")
        serve(".dmr", dmr.getBytes("UTF-8"))
        serveData(".dap", ';',
          q => q.split('&').find(_.startsWith("dap4.ce="))
            .map(_.stripPrefix("dap4.ce=")),
          f => graft.dap.Dap4.encode(f, s"slab_$t0.nc")._2)
      } else {
        val (dds, das, _) = Dap2.encode(slab, s"slab_$t0.nc")
        serve(".dds", dds.getBytes("UTF-8"))
        serve(".das", das.getBytes("UTF-8"))
        serveData(".dods", ',', q => Some(q),
          f => Dap2.encode(f, s"slab_$t0.nc")._3)
      }
    }
    server.start()
    try {
      val hostPort = s"127.0.0.1:${server.getAddress.getPort}"
      val urls = slabs.map { case (t0, _) =>
        if (t0 == 2) s"dap4://$hostPort/slab_$t0"
        else s"http://$hostPort/slab_$t0" }
      val pattern = FilePattern.fromFileSequence(urls, "time",
        nitemsPerFile = Some(2), fileType = FileType.Opendap)
      val items = Pipelines.createItems(spark, pattern)
      val frags = Pipelines.openWithFragments(items, FileType.Opendap)
      val dir = Files.createTempDirectory("graft_dap_e2e").toString
      val storePath = s"$dir/store.zarr"
      Pipelines.storeToZarr(frags, pattern.combineDimKeys, storePath,
        Map("time" -> 3))
      val rebuilt = ZarrGroup(storePath).readFragment()
      require(rebuilt.sameAs(cube), "opendap: pipeline round-trip failed")
      // direct client parity on one slab
      require(Dap2.read(urls.head).sameAs(slabs.head._2),
        "opendap: dap2 client parity failed")
      // constrained legs on BOTH protocols: a hyperslab region read
      // fetches only the requested slices (the openers.py:40-47 lazy
      // subsetting the reference inherits from xarray/netCDF4), and the
      // server genuinely saw the constraint on the wire
      val region = Map("lat" -> graft.dap.Hyperslab(2, 7),
        "lon" -> graft.dap.Hyperslab(4, 9))
      val want = Map("lat" -> Slc(2, 8), "lon" -> Slc(4, 10))
      require(Dap2.read(urls.head, region)
        .sameAs(slabs.head._2.isel(want)),
        "opendap: constrained dap2 leg mismatch")
      require(graft.dap.Dap4.read(s"http://$hostPort/slab_2", region)
        .sameAs(slabs(1)._2.isel(want)),
        "opendap: constrained dap4 leg mismatch")
      require(seenCes.get() >= 2,
        "opendap: hyperslab constraint never reached the server")
      CubeOracle.quantized(spark, rebuilt, Seq("time", "lat", "lon"),
        CubeOracle.f8ElseIntVq("foo"))
    } finally server.stop(0)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e2e_opendap_roundtrip" -> opendapRoundtrip _,
  )

  val oracles: Map[String, String] = Map(
    "e2e_opendap_roundtrip" -> CubeOracle.rangeSql(
      Seq("time" -> 6, "lat" -> NY, "lon" -> NX),
      Seq("foo" -> CubeOracle.viSql(FooSeed, 1000, "time", "lat", "lon"))),
  )
}
