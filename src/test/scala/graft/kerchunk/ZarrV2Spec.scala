package graft.kerchunk

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Reading REAL zarr v2 directory stores (the zarr-python on-disk layout,
  * built here byte-for-byte from the v2 spec): `.zgroup`/`.zattrs`/
  * `.zarray` documents, dot-separated chunk files, the default blosc
  * compressor, and the consolidated `.zmetadata` single-GET path.
  */
class ZarrV2Spec extends AnyFunSuite {

  /** Write a v2 store the way zarr-python does: one array `v` (2x3 chunks
    * of a 4x6 float64 C-order grid) compressed with the given numcodecs
    * compressor json + encoder, plus coords-style int64 array `t`. */
  private def buildStore(dir: String, consolidated: Boolean,
                         compressorJson: String,
                         encode: Array[Byte] => Array[Byte]): Array[Double] = {
    def put(key: String, bytes: Array[Byte]): Unit = {
      val p = Paths.get(dir, key.split('/'): _*)
      Files.createDirectories(p.getParent)
      Files.write(p, bytes)
    }
    val zgroup = """{"zarr_format": 2}"""
    val zattrs = """{"title": "v2 fixture"}"""
    val vZarray =
      s"""{"zarr_format": 2, "shape": [4, 6], "chunks": [2, 3],
         |"dtype": "<f8", "order": "C", "fill_value": 0,
         |"compressor": $compressorJson, "filters": null}""".stripMargin
    val vZattrs = """{"_ARRAY_DIMENSIONS": ["t", "x"], "long_name": "vee"}"""
    val tZarray =
      """{"zarr_format": 2, "shape": [4], "chunks": [4], "dtype": "<i8",
        |"order": "C", "fill_value": 0, "compressor": null,
        |"filters": null}""".stripMargin
    val tZattrs = """{"_ARRAY_DIMENSIONS": ["t"]}"""
    put(".zgroup", zgroup.getBytes); put(".zattrs", zattrs.getBytes)
    put("v/.zarray", vZarray.getBytes); put("v/.zattrs", vZattrs.getBytes)
    put("t/.zarray", tZarray.getBytes); put("t/.zattrs", tZattrs.getBytes)
    val data = Array.tabulate(24)(i => i * 1.5)
    // chunk (ci, cj) holds rows [2ci,2ci+2) x cols [3cj,3cj+3)
    for (ci <- 0 until 2; cj <- 0 until 2) {
      val bb = ByteBuffer.allocate(2 * 3 * 8).order(ByteOrder.LITTLE_ENDIAN)
      for (r <- 0 until 2; c <- 0 until 3)
        bb.putDouble(data((2 * ci + r) * 6 + (3 * cj + c)))
      put(s"v/$ci.$cj", encode(bb.array()))
    }
    val tb = ByteBuffer.allocate(4 * 8).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 4).foreach(i => tb.putLong(i * 10L))
    put("t/0", tb.array())
    if (consolidated) {
      val docs = Seq(
        ".zgroup" -> zgroup, ".zattrs" -> zattrs,
        "v/.zarray" -> vZarray, "v/.zattrs" -> vZattrs,
        "t/.zarray" -> tZarray, "t/.zattrs" -> tZattrs)
        .map { case (k, v) => s""""$k": $v""" }.mkString(",\n")
      put(".zmetadata",
        s"""{"zarr_consolidated_format": 1, "metadata": {$docs}}""".getBytes)
    }
    data
  }

  /** read IN PLACE through the refs-backed virtual group (no materialize) */
  private def readBack(dir: String): (Fragment, RefSet) = {
    val rs = RefSet.scanZarrV2Group(dir)
    (rs.asZarrGroup(dir).readFragment(), rs)
  }

  test("zarr-python default layout (blosc-lz4 + shuffle) round-trips") {
    val dir = Files.createTempDirectory("v2_blosc").toString
    val p = graft.zarr.Blosc.Params("lz4", 5, shuffle = true)
    val data = buildStore(dir, consolidated = false,
      """{"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1, "blocksize": 0}""",
      b => graft.zarr.Blosc.compress(b, 8, p))
    val (f, _) = readBack(dir)
    assert(f.dataVars("v").dims == Vector("t", "x"))
    assert(f.dataVars("v").data.data.asInstanceOf[Array[Double]].sameElements(data))
    assert(f.coords("t").data.data.asInstanceOf[Array[Long]]
      .sameElements(Array(0L, 10L, 20L, 30L)))
    assert(f.attrs("title") == AttrValue.AStr("v2 fixture"))
    assert(f.dataVars("v").attrs("long_name") == AttrValue.AStr("vee"))
  }

  test("consolidated .zmetadata serves all docs; chunks stay pointers") {
    val dir = Files.createTempDirectory("v2_consol").toString
    val data = buildStore(dir, consolidated = true,
      """{"id": "zlib", "level": 5}""",
      b => {
        val d = new java.util.zip.Deflater(5)
        d.setInput(b); d.finish()
        val bos = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](65536)
        while (!d.finished()) bos.write(tmp, 0, d.deflate(tmp))
        d.end(); bos.toByteArray
      })
    // poison the non-consolidated doc: the scan must NOT read it
    Files.write(Paths.get(dir, "v", ".zarray"), "NOT JSON".getBytes)
    val (f, rs) = readBack(dir)
    assert(f.dataVars("v").data.data.asInstanceOf[Array[Double]].sameElements(data))
    assert(rs.refs.contains("v/c/0/0") && rs.refs.contains("t/c/0"))
    // with inlining off, chunk refs must point at the original files in place
    val ptrs = RefSet.scanZarrV2Group(dir, inlineThreshold = 0)
    assert(ptrs("v/c/0/0").url.exists(_.startsWith(dir)))
    assert(ptrs("t/c/0").url.exists(_.startsWith(dir)))
  }

  test("the zarr opener auto-detects v2 stores; materialize still works") {
    val dir = Files.createTempDirectory("v2_open").toString
    val p = graft.zarr.Blosc.Params("zstd", 5, shuffle = true)
    val data = buildStore(dir, consolidated = false,
      """{"id": "blosc", "cname": "zstd", "clevel": 5, "shuffle": 1, "blocksize": 0}""",
      b => graft.zarr.Blosc.compress(b, 8, p))
    val f = graft.transforms.Openers.open(graft.patterns.FileType.Zarr, dir)
    assert(f.dataVars("v").data.data.asInstanceOf[Array[Double]].sameElements(data))
    val virt = Files.createTempDirectory("v2_mat").toString
    RefSet.scanZarrV2Group(dir).materialize(virt)
    assert(graft.zarr.ZarrGroup(virt).readFragment().sameAs(f))
  }

  test("virtual groups are read-only") {
    val dir = Files.createTempDirectory("v2_ro").toString
    buildStore(dir, consolidated = false, "null", identity)
    val g = RefSet.scanZarrV2Group(dir).asZarrGroup(dir)
    intercept[UnsupportedOperationException] {
      g.writeRegion("v", Vector(0, 0),
        NDArray.zeros(DType.F8, Vector(2, 3)))
    }
  }

  test("fortran-order v2 arrays are rejected with a clear error") {
    val dir = Files.createTempDirectory("v2_forder").toString
    buildStore(dir, consolidated = false, "null", identity)
    val za = new String(Files.readAllBytes(Paths.get(dir, "v", ".zarray")))
      .replace("\"C\"", "\"F\"")
    Files.write(Paths.get(dir, "v", ".zarray"), za.getBytes)
    val e = intercept[IllegalArgumentException] { RefSet.scanZarrV2Group(dir) }
    assert(e.getMessage.contains("order"))
  }

  /** Hand-build a v2 store whose chunks are numcodecs-Delta encoded: the
    * bytes are derived from the numcodecs spec by hand (first value, then
    * consecutive differences, cast to `astype`, cumsum restarting per
    * chunk), so a successful read IS the interop proof. */
  private def buildDeltaStore(dir: String): Unit = {
    def put(key: String, bytes: Array[Byte]): Unit = {
      val p = Paths.get(dir, key.split('/'): _*)
      Files.createDirectories(p.getParent)
      Files.write(p, bytes)
    }
    put(".zgroup", """{"zarr_format": 2}""".getBytes)
    // t: int64 "time" coord 1000,1010,..., diffs narrowed to astype <i4
    put("t/.zarray",
      """{"zarr_format": 2, "shape": [6], "chunks": [3], "dtype": "<i8",
        |"order": "C", "fill_value": 0, "compressor": null,
        |"filters": [{"id": "delta", "dtype": "<i8", "astype": "<i4"}]}"""
        .stripMargin.getBytes)
    put("t/.zattrs", """{"_ARRAY_DIMENSIONS": ["t"]}""".getBytes)
    def i32s(vs: Int*): Array[Byte] = {
      val bb = ByteBuffer.allocate(vs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(bb.putInt); bb.array()
    }
    put("t/0", i32s(1000, 10, 10)) // -> 1000, 1010, 1020
    put("t/1", i32s(1030, 10, 10)) // cumsum restarts per chunk
    // v: float64 data, delta with identity astype, zlib-compressed
    put("v/.zarray",
      """{"zarr_format": 2, "shape": [4], "chunks": [4], "dtype": "<f8",
        |"order": "C", "fill_value": 0,
        |"compressor": {"id": "zlib", "level": 6},
        |"filters": [{"id": "delta", "dtype": "<f8"}]}""".stripMargin.getBytes)
    put("v/.zattrs", """{"_ARRAY_DIMENSIONS": ["t"]}""".getBytes)
    val diffs = Array(1.5, 0.75, 1.75, 4.0) // -> 1.5, 2.25, 4.0, 8.0
    val bb = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
    diffs.foreach(bb.putDouble)
    val d = new java.util.zip.Deflater(6)
    d.setInput(bb.array()); d.finish()
    val out = new Array[Byte](128)
    put("v/0", java.util.Arrays.copyOf(out, d.deflate(out)))
  }

  test("numcodecs delta-filtered v2 stores decode on both read paths") {
    val dir = Files.createTempDirectory("v2_delta").toString
    buildDeltaStore(dir)
    val tExp = Array(1000L, 1010L, 1020L, 1030L, 1040L, 1050L)
    val vExp = Array(1.5, 2.25, 4.0, 8.0)
    // native v2 reader
    val g = graft.zarr.ZarrGroup(dir)
    assert(g.readArray("t").data.asInstanceOf[Array[Long]].sameElements(tExp))
    assert(g.readArray("v").data.asInstanceOf[Array[Double]].sameElements(vExp))
    // kerchunk scanner + in-place virtual group
    val rs = RefSet.scanZarrV2Group(dir)
    val virt = rs.asZarrGroup(dir)
    assert(virt.readArray("t").data.asInstanceOf[Array[Long]].sameElements(tExp))
    assert(virt.readArray("v").data.asInstanceOf[Array[Double]].sameElements(vExp))
    // v2-keyed kerchunk artifact keeps the filter; re-import agrees
    val json = RefSet.toKerchunkV2Json(rs)
    val za = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(json).get("refs").get("t/.zarray").asText()
    assert(za.replace(" ", "").contains("\"id\":\"delta\""), za)
    assert(za.replace(" ", "").contains("\"astype\":\"<i4\""), za)
    val mat = s"$dir/materialized.zarr"
    RefSet.fromKerchunkV2Json(json).materialize(mat)
    assert(graft.zarr.ZarrGroup(mat).readArray("t")
      .data.asInstanceOf[Array[Long]].sameElements(tExp))
  }

  test("writes into a delta-filtered v2 array emit numcodecs delta bytes") {
    val dir = Files.createTempDirectory("v2_delta_w").toString
    buildDeltaStore(dir)
    val g = graft.zarr.ZarrGroup(dir)
    // overwrite chunk 1 of t with 2000,2007,2016 -> diffs 2000,7,9 as <i4
    g.writeRegion("t", Vector(3),
      NDArray(DType.I8, Vector(3), Array(2000L, 2007L, 2016L)))
    val raw = Files.readAllBytes(Paths.get(dir, "t", "1"))
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    assert(raw.length == 12)
    assert(Seq(bb.getInt(0), bb.getInt(4), bb.getInt(8)) == Seq(2000, 7, 9))
    assert(g.readArray("t").data.asInstanceOf[Array[Long]]
      .sameElements(Array(1000L, 1010L, 1020L, 2000L, 2007L, 2016L)))
  }

  /** numcodecs-derived FixedScaleOffset fixture: the docs example
    * (offset=1000, scale=10, dtype <f8, astype |u1) — stored bytes are the
    * hand-computed `around((x-1000)*10)` values, expected reads are the
    * exact doubles `b/10.0 + 1000.0` numcodecs decode produces. */
  test("fixedscaleoffset v2 arrays decode and re-encode per numcodecs") {
    val dir = Files.createTempDirectory("v2_fso").toString
    def put(key: String, bytes: Array[Byte]): Unit = {
      val p = Paths.get(dir, key.split('/'): _*)
      Files.createDirectories(p.getParent)
      Files.write(p, bytes)
    }
    put(".zgroup", """{"zarr_format": 2}""".getBytes)
    put("x/.zarray",
      """{"zarr_format": 2, "shape": [4], "chunks": [4], "dtype": "<f8",
        |"order": "C", "fill_value": 0, "compressor": null,
        |"filters": [{"id": "fixedscaleoffset", "offset": 1000, "scale": 10,
        |"dtype": "<f8", "astype": "|u1"}]}""".stripMargin.getBytes)
    put("x/.zattrs", """{"_ARRAY_DIMENSIONS": ["x"]}""".getBytes)
    put("x/0", Array[Byte](0, 3, 6, 10))
    val exp = Array(0, 3, 6, 10).map(_ / 10.0 + 1000.0)
    val g = graft.zarr.ZarrGroup(dir)
    assert(g.readArray("x").data.asInstanceOf[Array[Double]].sameElements(exp))
    // the kerchunk scanner serves the same values in place and keeps the
    // filter through the v2 json artifact round trip
    val rs = RefSet.scanZarrV2Group(dir)
    assert(rs.asZarrGroup(dir).readArray("x")
      .data.asInstanceOf[Array[Double]].sameElements(exp))
    val reread = RefSet.fromKerchunkV2Json(RefSet.toKerchunkV2Json(rs))
    assert(reread.asZarrGroup(dir).readArray("x")
      .data.asInstanceOf[Array[Double]].sameElements(exp))
    // write path: around() is numpy's round-half-to-even
    g.writeRegion("x", Vector(0), graft.core.NDArray(
      graft.core.DType.F8, Vector(4),
      Array(1000.25, 1000.35, 1000.0, 1001.0)))
    val raw = Files.readAllBytes(Paths.get(dir, "x", "0"))
    assert(raw.toSeq == Seq[Byte](2, 4, 0, 10)) // 2.5 -> 2, 3.5 -> 4
  }

  test("quantize v2 arrays round the mantissa on write, pass through on read") {
    val dir = Files.createTempDirectory("v2_quant").toString
    val g = graft.zarr.ZarrGroup(dir, format = 2)
    g.initGroup(Map.empty)
    g.createArray("q", Vector(3), Vector(3), graft.core.DType.F8,
      graft.core.Attrs.empty, gzipLevel = Some(5),
      numFilter = Some(graft.zarr.ZarrStore.QuantizeParams(
        1, "<f8", "<f8")))
    // digits=1 -> binary scale 16: 0.123456789 quantizes to 2/16 = 0.125
    g.writeRegion("q", Vector(0), graft.core.NDArray(
      graft.core.DType.F8, Vector(3), Array(0.123456789, 1.0, -0.0625)))
    val back = g.readArray("q").data.asInstanceOf[Array[Double]]
    assert(back.sameElements(Array(0.125, 1.0, -0.0625)))
    val za = new String(Files.readAllBytes(Paths.get(dir, "q", ".zarray")))
    assert(za.contains("\"quantize\"") && za.contains("\"digits\" : 1"), za)
    // scanner + v3 metadata keep the filter
    val rs = RefSet.scanZarrV2Group(dir)
    assert(rs.asZarrGroup(dir).readArray("q")
      .data.asInstanceOf[Array[Double]].sameElements(Array(0.125, 1.0, -0.0625)))
  }

  test("v3 stores carry fixedscaleoffset through their codec chain") {
    val dir = Files.createTempDirectory("v3_fso").toString
    val g = graft.zarr.ZarrGroup(dir)
    g.initGroup(Map.empty)
    g.createArray("p", Vector(4), Vector(2), graft.core.DType.F4,
      graft.core.Attrs.empty, zstdLevel = Some(3),
      numFilter = Some(graft.zarr.ZarrStore.ScaleOffsetParams(
        20.0, 100.0, "<f4", "<i2")))
    val vals = Array(20.01f, 19.5f, 20.0f, 21.25f)
    g.writeRegion("p", Vector(0),
      graft.core.NDArray(graft.core.DType.F4, Vector(4), vals))
    val back = g.readArray("p").data.asInstanceOf[Array[Float]]
    // enc = around((x-20)*100) as i2; dec = enc/100 + 20 cast to f4
    val expected = vals.map(v =>
      (math.rint((v.toDouble - 20.0) * 100.0) / 100.0 + 20.0).toFloat)
    assert(back.sameElements(expected))
    // fresh open reads the filter from zarr.json
    assert(graft.zarr.ZarrGroup(dir).readArray("p")
      .data.asInstanceOf[Array[Float]].sameElements(expected))
  }

  test("unknown v2 filters are rejected with a clear error") {
    val dir = Files.createTempDirectory("v2_badfilter").toString
    buildDeltaStore(dir)
    val za = new String(Files.readAllBytes(Paths.get(dir, "t", ".zarray")))
      .replace("\"id\": \"delta\"", "\"id\": \"packbits\"")
    Files.write(Paths.get(dir, "t", ".zarray"), za.getBytes)
    val e = intercept[IllegalArgumentException] { RefSet.scanZarrV2Group(dir) }
    assert(e.getMessage.contains("packbits"))
    val e2 = intercept[Exception] {
      graft.zarr.ZarrGroup(dir).readArray("t") }
    assert(e2.getMessage.contains("packbits"))
  }
}
