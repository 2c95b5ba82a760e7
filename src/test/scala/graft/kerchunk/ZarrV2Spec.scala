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
}
