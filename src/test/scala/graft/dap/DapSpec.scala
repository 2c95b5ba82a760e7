package graft.dap

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.patterns.FileType
import graft.transforms.Openers

/** DAP2 client round trip against a local OPeNDAP-shaped HTTP server
  * (the reference's opendap path, openers.py:83-86; http fixture shape
  * as in tests/conftest.py:158-206). */
class DapSpec extends AnyFunSuite {

  private def cube(nt: Int = 4): Fragment = {
    val NY = 3; val NX = 5
    val rng = new scala.util.Random(23)
    Fragment(
      dims = Map("time" -> nt, "lat" -> NY, "lon" -> NX),
      coords = Map(
        "time" -> Variable(Vector("time"),
          NDArray(DType.I4, Vector(nt), (0 until nt).toArray),
          Map("units" -> AttrValue("days since 2010-01-01"))),
        "lat" -> Variable(Vector("lat"),
          NDArray(DType.F8, Vector(NY), Array(-10.0, 0.0, 10.0))),
        "lon" -> Variable(Vector("lon"),
          NDArray(DType.F8, Vector(NX), (0 until NX).map(_ * 2.0).toArray))),
      dataVars = Map(
        "foo" -> Variable(Vector("time", "lat", "lon"),
          NDArray(DType.F8, Vector(nt, NY, NX), Array.fill(nt * NY * NX)(rng.nextDouble())),
          Map("long_name" -> AttrValue("Fantastic Foo"))),
        "bar" -> Variable(Vector("time", "lat", "lon"),
          NDArray(DType.I4, Vector(nt, NY, NX), Array.fill(nt * NY * NX)(rng.nextInt(50))),
          Map("long_name" -> AttrValue("Beautiful Bar")))),
      attrs = Map("conventions" -> AttrValue("CF 1.6")))
  }

  /** Constraint-aware DAP2 fixture server: a `.dods?<ce>` request is
    * answered with the SLICED fragment re-encoded (what Hyrax/TDS do
    * server-side); every CE seen and every `.dods` body size is
    * recorded so tests can assert the constraint genuinely reached the
    * server and shrank the transfer. */
  private def withServer(f: Fragment,
                         seenCes: scala.collection.mutable.Buffer[String] = null,
                         dodsBytes: scala.collection.mutable.Buffer[Int] = null)
                        (body: String => Unit): Unit = {
    val (dds, das, _) = Dap2.encode(f, "test.nc")
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def serve(path: String, bytes: Array[Byte], ctype: String): Unit =
      server.createContext(path, (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.getResponseHeaders.add("Content-Type", ctype)
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    serve("/ds.dds", dds.getBytes("UTF-8"), "text/plain")
    serve("/ds.das", das.getBytes("UTF-8"), "text/plain")
    server.createContext("/ds.dods", (ex: com.sun.net.httpserver.HttpExchange) => {
      val ce = ex.getRequestURI.getQuery // URI#getQuery percent-decodes
      val served =
        if (ce == null || ce.isEmpty) f
        else Constraint.applyProjections(f,
          Constraint.parseProjections(ce, ','))
      if (seenCes != null && ce != null) seenCes += ce
      val bytes = Dap2.encode(served, "test.nc")._3
      if (dodsBytes != null) dodsBytes += bytes.length
      ex.getResponseHeaders.add("Content-Type", "application/octet-stream")
      ex.sendResponseHeaders(200, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/ds")
    finally server.stop(0)
  }

  test("DDS parse: atomic arrays and grids") {
    val (dds, _, _) = Dap2.encode(cube(), "test.nc")
    val parsed = Dap2.parseDds(dds)
    assert(parsed.vars.count(_.isGrid) == 2)
    val foo = parsed.vars.find(_.array.name == "foo").get
    assert(foo.array.dims == Vector(("time", 4), ("lat", 3), ("lon", 5)))
    assert(foo.maps.map(_.name) == Vector("time", "lat", "lon"))
  }

  test("DAS parse: global and per-variable attrs") {
    val (_, das, _) = Dap2.encode(cube(), "test.nc")
    val parsed = Dap2.parseDas(das)
    assert(parsed("NC_GLOBAL")("conventions") == AttrValue.AStr("CF 1.6"))
    assert(parsed("foo")("long_name") == AttrValue.AStr("Fantastic Foo"))
    assert(parsed("time")("units") == AttrValue.AStr("days since 2010-01-01"))
  }

  test("full DAP2 round trip over HTTP") {
    val f = cube()
    withServer(f) { url =>
      val got = Dap2.read(url)
      assert(got.sameAs(f), "fragment mismatch")
      assert(got.attrs == f.attrs)
      assert(got.dataVars("foo").attrs == f.dataVars("foo").attrs)
    }
  }

  test("opendap FileType dispatches through the opener registry") {
    val f = cube(nt = 2)
    withServer(f) { url =>
      val got = Openers.open(FileType.Opendap, url)
      assert(got.sameAs(f))
    }
  }

  test("int64 is rejected with the protocol-limitation message") {
    val f0 = cube(nt = 2)
    val f = f0.copy(dataVars = f0.dataVars + ("big" -> Variable(
      Vector("time"), NDArray(DType.I8, Vector(2), Array(1L, 2L)))))
    val e = intercept[IllegalArgumentException](Dap2.encode(f, "x"))
    assert(e.getMessage.contains("64-bit"))
  }

  // ----------------------------------------------------------------- DAP4

  /** Constraint-aware DAP4 fixture server: a `dap4.ce=` query on the
    * `.dap` request is answered with the SLICED fragment re-encoded;
    * CEs seen and `.dap` body sizes are recorded for assertions. */
  private def withDap4Server(f: Fragment, withChecksums: Boolean = true,
                             chunkSize: Int = 4096,
                             seenCes: scala.collection.mutable.Buffer[String] = null,
                             dapBytes: scala.collection.mutable.Buffer[Int] = null)
                            (body: String => Unit): Unit = {
    val (dmr, _) = Dap4.encode(f, "test.nc", withChecksums, chunkSize)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def serve(path: String, bytes: Array[Byte], ctype: String): Unit =
      server.createContext(path, (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.getResponseHeaders.add("Content-Type", ctype)
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    serve("/ds.dmr", dmr.getBytes("UTF-8"), "application/vnd.opendap.dap4.dataset-metadata+xml")
    server.createContext("/ds.dap", (ex: com.sun.net.httpserver.HttpExchange) => {
      val q = ex.getRequestURI.getQuery // percent-decoded
      val ce = Option(q).toSeq.flatMap(_.split('&'))
        .find(_.startsWith("dap4.ce=")).map(_.stripPrefix("dap4.ce="))
      val served = ce match {
        case Some(c) if c.nonEmpty =>
          if (seenCes != null) seenCes += c
          Constraint.applyProjections(f, Constraint.parseProjections(c, ';'))
        case _ => f
      }
      val bytes = Dap4.encode(served, "test.nc", withChecksums, chunkSize)._2
      if (dapBytes != null) dapBytes += bytes.length
      ex.getResponseHeaders.add("Content-Type", "application/vnd.opendap.dap4.data")
      ex.sendResponseHeaders(200, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/ds")
    finally server.stop(0)
  }

  test("DMR parse: dimensions, typed vars, attributes") {
    val (dmr, _) = Dap4.encode(cube(), "test.nc")
    val parsed = Dap4.parseDmr(dmr)
    assert(parsed.dims.toMap == Map("time" -> 4, "lat" -> 3, "lon" -> 5))
    val foo = parsed.vars.find(_.name == "foo").get
    assert(foo.dapType == "Float64")
    assert(foo.dims == Vector(("time", 4), ("lat", 3), ("lon", 5)))
    assert(foo.attrs("long_name") == AttrValue("Fantastic Foo"))
    assert(parsed.attrs("conventions") == AttrValue("CF 1.6"))
    // int64 RIDES natively in DAP4 (the DAP2 rejection above is the
    // protocol gap DAP4 closed)
    val f64 = cube(nt = 2)
    val withI64 = f64.copy(dataVars = f64.dataVars + ("big" -> Variable(
      Vector("time"), NDArray(DType.I8, Vector(2), Array(1L, 1L << 40)))))
    val (dmr2, _) = Dap4.encode(withI64, "x")
    assert(Dap4.parseDmr(dmr2).vars.exists(v =>
      v.name == "big" && v.dapType == "Int64"))
  }

  test("full DAP4 round trip over HTTP, multi-chunk framing + checksums") {
    val f = cube()
    // 64-byte chunks force many chunks through the reassembly path
    withDap4Server(f, chunkSize = 64) { url =>
      val got = Dap4.read(url)
      assert(got.sameAs(f), "dap4 fragment mismatch")
      assert(got.dataVars("foo").attrs == f.dataVars("foo").attrs)
      assert(got.coords("time").attrs("units") ==
        AttrValue("days since 2010-01-01"))
    }
    // an int64 variable round-trips (DAP4-only capability)
    val f2 = cube(nt = 2)
    val withI64 = f2.copy(dataVars = f2.dataVars + ("big" -> Variable(
      Vector("time"), NDArray(DType.I8, Vector(2), Array(7L, 1L << 40)),
      Map("long_name" -> AttrValue("wide")))))
    withDap4Server(withI64) { url =>
      val got = Dap4.read(url)
      assert(got.sameAs(withI64), "dap4 int64 mismatch")
    }
  }

  test("dap4:// scheme dispatches the DAP4 client through the opener registry") {
    val f = cube(nt = 3)
    withDap4Server(f) { url =>
      val got = Openers.open(FileType.Opendap,
        "dap4://" + url.stripPrefix("http://"))
      assert(got.sameAs(f))
    }
  }

  test("DAP4 corruption surfaces by name: bad checksum, error chunk, truncation") {
    val f = cube(nt = 2)
    val (_, dap) = Dap4.encode(f, "test.nc")
    // flip one payload byte INSIDE the last variable's data -> the CRC
    // verification must catch it
    val mut = dap.clone()
    mut(mut.length - 9) = (mut(mut.length - 9) ^ 0x40).toByte
    val dmrText = Dap4.encode(f, "test.nc")._1
    val eCrc = intercept[IllegalArgumentException] {
      val (t, d, o) = Dap4.deframe(mut)
      Dap4.decodeData(Dap4.parseDmr(t), d, o, checksums = true)
    }
    assert(eCrc.getMessage.contains("checksum mismatch"), eCrc.getMessage)
    // an ERROR chunk raises with the server's message
    val errBody = "No such dataset".getBytes("UTF-8")
    val err = new java.io.ByteArrayOutputStream()
    err.write(0x03); err.write(0); err.write(0); err.write(errBody.length)
    err.write(errBody)
    val eErr = intercept[java.io.IOException](Dap4.deframe(err.toByteArray))
    assert(eErr.getMessage.contains("No such dataset"))
    // a truncated chunk fails by name, never a silent partial decode
    val eTrunc = intercept[IllegalArgumentException](
      Dap4.deframe(java.util.Arrays.copyOfRange(dap, 0, dap.length / 2)))
    assert(eTrunc.getMessage.contains("chunk"), eTrunc.getMessage)
    assert(dmrText.contains("<Dimension name=\"time\" size=\"2\"/>"))
  }

  // ------------------------------------------- hyperslab constraints

  test("DAP2 hyperslab constraints: server sees the CE, transfer shrinks, slices match") {
    val f = cube(nt = 6)
    val ces = scala.collection.mutable.Buffer.empty[String]
    val sizes = scala.collection.mutable.Buffer.empty[Int]
    withServer(f, ces, sizes) { url =>
      val full = Dap2.read(url)
      assert(full.sameAs(f))
      val got = Dap2.read(url,
        Map("time" -> Hyperslab(1, 3), "lon" -> Hyperslab(0, 4, 2)))
      assert(got.dims == Map("time" -> 3, "lat" -> 3, "lon" -> 3))
      // coord values are exactly the requested slices (incl. stride 2)
      assert((0 until 3).forall(i => got.coords("time").data.getLong(i) == i + 1))
      assert((0 until 3).forall(i =>
        got.coords("lon").data.getDouble(i) == 2.0 * (2 * i)))
      // data values: got.foo[t][y][x] == f.foo[t+1][y][2x]
      val src = f.dataVars("foo").data
      val dst = got.dataVars("foo").data
      for (t <- 0 until 3; y <- 0 until 3; x <- 0 until 3)
        assert(dst.getDouble((t * 3 + y) * 3 + x) ==
          src.getDouble(((t + 1) * 3 + y) * 5 + 2 * x),
          s"foo[$t][$y][$x]")
      // attrs still ride along from the .das
      assert(got.dataVars("foo").attrs("long_name") ==
        AttrValue("Fantastic Foo"))
      // the server genuinely SAW a hyperslab projection on the wire...
      assert(ces.exists(_.contains("foo[1:3][0:2][0:2:4]")),
        s"CEs seen: ${ces.mkString(" | ")}")
      // ...and the constrained transfer is smaller than the full one
      assert(sizes.length == 2 && sizes(1) < sizes(0),
        s"constrained .dods (${sizes.last} B) not smaller than full " +
          s"(${sizes.head} B)")
    }
    // named errors: unknown dimension, out-of-range slab — both fail
    // CLIENT-side before any .dods request
    withServer(cube(nt = 2)) { url =>
      val e = intercept[IllegalArgumentException](
        Dap2.read(url, Map("tiem" -> Hyperslab(0, 0))))
      assert(e.getMessage.contains("unknown dimension"), e.getMessage)
      val e2 = intercept[IllegalArgumentException](
        Dap2.read(url, Map("time" -> Hyperslab(0, 5))))
      assert(e2.getMessage.contains("exceeds dimension size"), e2.getMessage)
    }
  }

  test("DAP4 dap4.ce constraints: server sees the CE, transfer shrinks, slices match") {
    val f = cube(nt = 6)
    val ces = scala.collection.mutable.Buffer.empty[String]
    val sizes = scala.collection.mutable.Buffer.empty[Int]
    // small chunks so the constrained response still exercises
    // multi-chunk reassembly
    withDap4Server(f, chunkSize = 128, seenCes = ces, dapBytes = sizes) { url =>
      val full = Dap4.read(url)
      assert(full.sameAs(f))
      val got = Dap4.read(url,
        Map("time" -> Hyperslab(2, 4), "lat" -> Hyperslab(1, 2)))
      assert(got.dims == Map("time" -> 3, "lat" -> 2, "lon" -> 5))
      assert((0 until 3).forall(i => got.coords("time").data.getLong(i) == i + 2))
      val src = f.dataVars("bar").data
      val dst = got.dataVars("bar").data
      for (t <- 0 until 3; y <- 0 until 2; x <- 0 until 5)
        assert(dst.getLong((t * 2 + y) * 5 + x) ==
          src.getLong(((t + 2) * 3 + (y + 1)) * 5 + x),
          s"bar[$t][$y][$x]")
      // rooted DAP4 projections reached the server, incl. the sliced
      // coordinate, and the per-variable CRC32s all verified
      assert(ces.exists(c =>
        c.contains("/bar[2:4][1:2][0:4]") && c.contains("/time[2:4]")),
        s"CEs seen: ${ces.mkString(" | ")}")
      assert(sizes.length == 2 && sizes(1) < sizes(0),
        s"constrained .dap (${sizes.last} B) not smaller than full " +
          s"(${sizes.head} B)")
    }
  }

  test("constraint machinery: CE parse round-trips and strided slicing is exact") {
    // parse the exact syntax the clients emit
    val projs = Constraint.parseProjections(
      "foo[1:3][0:2][0:2:4],lat,time[1:3]", ',')
    assert(projs == Vector(
      "foo" -> Vector(Hyperslab(1, 3), Hyperslab(0, 2), Hyperslab(0, 4, 2)),
      "lat" -> Vector.empty,
      "time" -> Vector(Hyperslab(1, 3))))
    // DAP4 rooted names + single-index form
    val p4 = Constraint.parseProjections("/foo[2];/bar[0:1:5]", ';')
    assert(p4 == Vector("foo" -> Vector(Hyperslab(2, 2)),
      "bar" -> Vector(Hyperslab(0, 5))))
    // selection clauses are a named error, not a silent ignore
    val eSel = intercept[IllegalArgumentException](
      Constraint.parseProjections("foo&bar<3", ','))
    assert(eSel.getMessage.contains("projections only"), eSel.getMessage)
    // strided 2-D slice against a hand-computed expectation
    val nd = NDArray(DType.I4, Vector(4, 6), Array.tabulate(24)(identity))
    val out = Constraint.sliceNd(nd,
      Vector(Hyperslab(1, 3, 2), Hyperslab(1, 5, 3)))
    assert(out.shape == Vector(2, 2))
    assert((0 until 4).map(out.getLong) ==
      Vector(1 * 6 + 1, 1 * 6 + 4, 3 * 6 + 1, 3 * 6 + 4).map(_.toLong))
  }
}
