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
}
