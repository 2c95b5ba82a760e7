package graft.storage

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** storage.py helper semantics (tests/test_storage.py analogs). */
class StorageSpec extends AnyFunSuite {

  test("slugify strips specials, collapses spaces/dashes, keeps .-_") {
    assert(Storage.slugify("https://foo.com/bar baz.nc") ==
      "httpsfoo.combar-baz.nc")
    assert(Storage.slugify("weird  --  name!!.grib2") == "weird-name.grib2")
  }

  test("hashPath is md5-prefixed and capped at 255") {
    val p = Storage.hashPath("http://example.com/" + "x" * 500)
    assert(p.length == 255)
    assert(p.matches("^[0-9a-f]{32}-.*"))
    // deterministic
    assert(Storage.hashPath("abc") == Storage.hashPath("abc"))
  }

  test("query-string secret injection") {
    assert(Storage.injectQueryStringSecrets("http://x/y", Map("token" -> "s3cr3t")) ==
      "http://x/y?token=s3cr3t")
    assert(Storage.injectQueryStringSecrets("http://x/y?a=1", Map("b" -> "2")) ==
      "http://x/y?a=1&b=2")
    assert(Storage.injectQueryStringSecrets("http://x/y", Map.empty) == "http://x/y")
  }

  test("cacheFile copies once and skips on size match") {
    val dir = Files.createTempDirectory("cache_spec")
    val src = dir.resolve("src.bin")
    Files.write(src, Array.fill[Byte](1000)(7))
    val cacheDir = dir.resolve("cache").toString
    val c1 = Storage.cacheFile(src.toString, cacheDir)
    assert(Files.exists(Paths.get(c1)))
    val mtime1 = Files.getLastModifiedTime(Paths.get(c1))
    val c2 = Storage.cacheFile(src.toString, cacheDir)
    assert(c1 == c2)
    assert(Files.getLastModifiedTime(Paths.get(c2)) == mtime1) // skipped
    assert(Files.readAllBytes(Paths.get(c1)).forall(_ == 7))
  }

  test("cacheFile over HTTP with query-secret auth: fetch, skip, reject") {
    // local HTTP fixture with token auth (tests/http_auth_server.py analog)
    val payload = Array.tabulate[Byte](4096)(i => (i % 91).toByte)
    var gets = 0
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data.bin", (ex: com.sun.net.httpserver.HttpExchange) => {
      val authed = Option(ex.getRequestURI.getQuery).exists(_.contains("token=s3cr3t"))
      if (!authed) {
        ex.sendResponseHeaders(403, -1)
      } else if (ex.getRequestMethod == "HEAD") {
        ex.getResponseHeaders.add("Content-Length", payload.length.toString)
        ex.sendResponseHeaders(200, -1)
      } else {
        gets += 1
        ex.sendResponseHeaders(200, payload.length.toLong)
        ex.getResponseBody.write(payload)
      }
      ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/data.bin"
      val cacheDir = Files.createTempDirectory("http_cache").toString
      // without the secret the server rejects
      intercept[java.io.IOException] { Storage.cacheFile(url, cacheDir) }
      val c1 = Storage.cacheFile(url, cacheDir, Map("token" -> "s3cr3t"))
      assert(Files.readAllBytes(Paths.get(c1)).sameElements(payload))
      assert(gets == 1)
      // second call: HEAD size matches -> no new GET
      val c2 = Storage.cacheFile(url, cacheDir, Map("token" -> "s3cr3t"))
      assert(c1 == c2 && gets == 1)
    } finally server.stop(0)
  }

  test("copyStream moves all bytes in blocks") {
    val data = Array.tabulate[Byte](25_000)(i => (i % 127).toByte)
    val in = new java.io.ByteArrayInputStream(data)
    val out = new java.io.ByteArrayOutputStream()
    val n = Storage.copyStream(in, out, blockSize = 1024)
    assert(n == data.length)
    assert(out.toByteArray.sameElements(data))
  }
}
