package graft.zarr

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import java.nio.{ByteBuffer, ByteOrder}

/** Blosc1 container codec: header layout, all supported inner compressors,
  * split/non-split stream inference, memcpy mode, zarr store round-trip,
  * and kerchunk v2 artifact interop (blosc is the zarr v2 default
  * compressor, so this is the compatibility path for real v2 stores). */
class BloscSpec extends AnyFunSuite {

  private def i32le(a: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(a, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt

  private val rng = new scala.util.Random(1234)
  private def rampBytes(n: Int): Array[Byte] = {
    // compressible: int ramps
    val bb = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    (0 until n / 4).foreach(i => bb.putInt(i % 1000))
    bb.array()
  }

  test("header fields match the documented c-blosc layout") {
    val data = rampBytes(40000)
    val enc = Blosc.compress(data, 4, Blosc.Params("lz4", 5, shuffle = true))
    assert(enc(0) == 2) // format version
    assert((enc(2) & 1) == 1, "byte-shuffle flag")
    assert((enc(2) & 2) == 0, "not memcpy")
    assert(((enc(2) >> 5) & 7) == 1, "lz4 compressor code")
    assert((enc(3) & 0xff) == 4, "typesize")
    assert(i32le(enc, 4) == 40000, "nbytes")
    assert(i32le(enc, 12) == enc.length, "cbytes == buffer length")
    assert(i32le(enc, 8) % 4 == 0, "blocksize aligned to typesize")
    assert(enc.length < data.length / 2, "compressible data shrank")
    assert(Blosc.decompress(enc).sameElements(data))
  }

  test("every supported cname round-trips, shuffle on and off") {
    for (cname <- Seq("lz4", "lz4hc", "zlib", "zstd", "snappy");
         shuffle <- Seq(true, false);
         n <- Seq(64, 4096, 100000)) {
      val data = rampBytes(n)
      val enc = Blosc.compress(data, 8, Blosc.Params(cname, 5, shuffle))
      val dec = Blosc.decompress(enc)
      assert(dec.sameElements(data), s"$cname shuffle=$shuffle n=$n")
    }
  }

  test("multi-block buffers with a partial last block round-trip") {
    // blocksize 4 KiB -> 6 full blocks + 1 partial (25000*4 = 100000 bytes)
    val data = rampBytes(100000)
    for (cname <- Seq("lz4", "zstd")) {
      val enc = Blosc.compress(data, 4,
        Blosc.Params(cname, 5, shuffle = true, blocksize = 4096))
      assert(i32le(enc, 8) == 4096)
      assert(Blosc.decompress(enc).sameElements(data))
    }
  }

  test("incompressible data falls back to memcpy mode") {
    val data = new Array[Byte](8192); rng.nextBytes(data)
    val enc = Blosc.compress(data, 8, Blosc.Params("lz4", 5, shuffle = true))
    assert((enc(2) & 2) == 2, "memcpy flag set")
    assert(enc.length == data.length + 16)
    assert(Blosc.decompress(enc).sameElements(data))
  }

  test("split-stream layout: lz4 blocks carry typesize streams, zstd one") {
    // typesize 4, blocksize/typesize >= 128 -> lz4 splits into 4 streams
    val data = rampBytes(8192)
    val lz4 = Blosc.compress(data, 4, Blosc.Params("lz4", 5, shuffle = true))
    val zstd = Blosc.compress(data, 4, Blosc.Params("zstd", 5, shuffle = true))
    def firstStreamSize(enc: Array[Byte]): Int = {
      val nblocks = (i32le(enc, 4) + i32le(enc, 8) - 1) / i32le(enc, 8)
      i32le(enc, i32le(enc, 16)) // csize of block 0's first stream
    }
    // split: first stream decompresses to blocksize/4; non-split to blocksize
    assert(firstStreamSize(lz4) <= i32le(lz4, 8) / 4)
    assert(Blosc.decompress(lz4).sameElements(data))
    assert(Blosc.decompress(zstd).sameElements(data))
  }

  test("tiny typesize-1 payloads round-trip (no shuffle, no split)") {
    val data = "abcabcabcabc".getBytes("UTF-8")
    val enc = Blosc.compress(data, 1, Blosc.Params("zlib", 9, shuffle = true))
    assert(Blosc.decompress(enc).sameElements(data))
  }

  test("blosclz and bit-shuffle payloads fail with clear errors") {
    val data = rampBytes(4096)
    intercept[UnsupportedOperationException] {
      Blosc.compress(data, 4, Blosc.Params("blosclz", 5, shuffle = true))
    }
    // synthesize a header claiming blosclz (code 0) over a fake block
    val fake = new Array[Byte](64)
    fake(0) = 2; fake(2) = (0 << 5 | 1).toByte; fake(3) = 4
    val bb = ByteBuffer.wrap(fake).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, 40); bb.putInt(8, 40); bb.putInt(12, 64)
    bb.putInt(16, 20); bb.putInt(20, 10)
    val e = intercept[Exception] { Blosc.decompress(fake) }
    assert(e.getMessage != null)
    val bitshuf = fake.clone(); bitshuf(2) = 4
    val e2 = intercept[IllegalArgumentException] { Blosc.decompress(bitshuf) }
    assert(e2.getMessage.contains("bit-shuffle"))
  }

  test("zarr v3 store round-trips with the blosc codec and shrinks chunks") {
    val dir = java.nio.file.Files.createTempDirectory("zarr_blosc").toString
    val g = ZarrGroup(dir)
    g.initGroup(Map.empty)
    val data = Array.tabulate(4 * 300)(i => (i % 300).toDouble)
    g.createArray("a", Vector(4, 300), Vector(2, 300), DType.F8, Map.empty,
      blosc = Some(Blosc.Params("lz4", 5, shuffle = true)))
    g.writeRegion("a", Vector(0, 0), NDArray.ofDoubles(Vector(4, 300), data))
    val meta = g.arrayMeta("a")
    assert(meta.blosc.contains(Blosc.Params("lz4", 5, shuffle = true, 0)))
    assert(g.readArray("a").data.asInstanceOf[Array[Double]].sameElements(data))
    val chunkBytes = java.nio.file.Files.size(
      java.nio.file.Paths.get(dir, "a", "c", "0", "0"))
    assert(chunkBytes < 2 * 300 * 8, s"chunk not compressed: $chunkBytes")
  }

  test("kerchunk v2 artifact round-trips the blosc compressor (zarr v2 default)") {
    val dir = java.nio.file.Files.createTempDirectory("zarr_blosc_v2").toString
    val g = ZarrGroup(dir)
    g.initGroup(Map.empty)
    val data = Array.tabulate(200)(i => (i % 50).toDouble)
    g.createArray("v", Vector(200), Vector(100), DType.F8, Map.empty,
      dimensionNames = Some(Vector("x")),
      blosc = Some(graft.zarr.Blosc.Params("zstd", 5, shuffle = true)))
    g.writeRegion("v", Vector(0), NDArray.ofDoubles(Vector(200), data))
    val rs = graft.kerchunk.RefSet.scanZarrGroup(dir)
    val json = graft.kerchunk.RefSet.toKerchunkV2Json(rs)
    // v2 document advertises the numcodecs blosc compressor
    val za = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(json).get("refs").get("v/.zarray").asText()
    assert(za.replace(" ", "").contains("\"id\":\"blosc\""), za)
    assert(za.contains("zstd"))
    // import back and materialize to an equal store
    val back = graft.kerchunk.RefSet.fromKerchunkV2Json(json)
    val virt = s"$dir/virt.zarr"
    back.materialize(virt)
    assert(ZarrGroup(virt).readArray("v")
      .data.asInstanceOf[Array[Double]].sameElements(data))
  }
}
