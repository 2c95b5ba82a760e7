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

  private def withServer(f: Fragment)(body: String => Unit): Unit = {
    val (dds, das, dods) = Dap2.encode(f, "test.nc")
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
    serve("/ds.dods", dods, "application/octet-stream")
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

  private def withDap4Server(f: Fragment, withChecksums: Boolean = true,
                             chunkSize: Int = 4096)(body: String => Unit): Unit = {
    val (dmr, dap) = Dap4.encode(f, "test.nc", withChecksums, chunkSize)
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
    serve("/ds.dap", dap, "application/vnd.opendap.dap4.data")
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
}
