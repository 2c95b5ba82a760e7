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

  test("blosclz payloads fail with clear errors") {
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
    // a header with BOTH shuffle flags set is corrupt, not decodable
    val both = fake.clone(); both(2) = (1 | 4).toByte
    val e2 = intercept[IllegalArgumentException] { Blosc.decompress(both) }
    assert(e2.getMessage.contains("both set"))
  }

  // ------------------------------------------------------------ bit-shuffle

  /** Bit-addressed reference for the bitshuffle layout (the public
    * bitshuffle/c-blosc contract): plane p = 8*byteIdx + bitIdx, each
    * nElem/8 bytes; byte q of plane p packs bit bitIdx of byte byteIdx of
    * elements 8q..8q+7, element 8q+m at bit m. Only the leading
    * multiple-of-8 element count transforms; the tail is copied raw. */
  private def naiveBitShuffle(t: Int, data: Array[Byte]): Array[Byte] = {
    val out = data.clone()
    val nElem = (data.length / t) & ~7
    val planeLen = nElem / 8
    java.util.Arrays.fill(out, 0, nElem * t, 0.toByte)
    for (e <- 0 until nElem; j <- 0 until t; bit <- 0 until 8) {
      if (((data(e * t + j) >> bit) & 1) == 1) {
        val p = j * 8 + bit
        out(p * planeLen + e / 8) =
          (out(p * planeLen + e / 8) | (1 << (e % 8))).toByte
      }
    }
    out
  }

  test("bit-shuffle kernel matches the bit-plane spec, and inverts") {
    for (t <- Seq(1, 2, 3, 4, 8, 12); extra <- Seq(0, 1, t * 3 + 1)) {
      // 40 whole elements (5 groups of 8) + `extra` raw tail bytes,
      // plus a non-multiple-of-8 element count case
      for (nElem <- Seq(40, 19)) {
        val data = new Array[Byte](nElem * t + extra)
        rng.nextBytes(data)
        val fast = Blosc.bitShuffleBytes(t, data, 0, data.length)
        assert(fast.sameElements(naiveBitShuffle(t, data)),
          s"shuffle layout t=$t nElem=$nElem extra=$extra")
        val back = new Array[Byte](data.length)
        Blosc.bitUnshuffleBytes(t, fast, 0, fast.length, back, 0)
        assert(back.sameElements(data), s"inverse t=$t nElem=$nElem extra=$extra")
      }
    }
  }

  test("bit-shuffle hand vectors: bit planes land where the spec says") {
    // one element with all bits set -> bit 0 of every plane byte
    val in1 = Array[Byte](0xff.toByte, 0, 0, 0, 0, 0, 0, 0)
    val out1 = Blosc.bitShuffleBytes(1, in1, 0, 8)
    assert(out1.forall(_ == 0x01.toByte), out1.toVector)
    // element m = 1 << m is the identity bit matrix: shuffle fixes it
    val in2 = Array.tabulate[Byte](8)(m => (1 << m).toByte)
    assert(Blosc.bitShuffleBytes(1, in2, 0, 8).sameElements(in2))
    // typesize 2: low byte of element m = 1<<m, high byte 0xFF ->
    // planes 0-7 are the identity (from byte 0), planes 8-15 all-ones bytes
    val in3 = new Array[Byte](16)
    (0 until 8).foreach { m =>
      in3(2 * m) = (1 << m).toByte; in3(2 * m + 1) = 0xff.toByte }
    val out3 = Blosc.bitShuffleBytes(2, in3, 0, 16)
    (0 until 8).foreach(p => assert(out3(p) == (1 << p).toByte, s"plane $p"))
    (8 until 16).foreach(p => assert(out3(p) == 0xff.toByte, s"plane $p"))
  }

  test("bit-shuffled containers round-trip across cnames, blocks, typesizes") {
    for (cname <- Seq("lz4", "lz4hc", "zlib", "zstd", "snappy");
         t <- Seq(1, 2, 4, 8);
         n <- Seq(64, 4096, 100003)) { // 100003: partial block + raw tail
      val data = rampBytes(n)
      val enc = Blosc.compress(data, t,
        Blosc.Params(cname, 5, shuffle = false, bitShuffle = true))
      if ((enc(2) & 2) == 0) // not memcpy'ed
        assert((enc(2) & 4) == 4, s"bit-shuffle flag $cname t=$t n=$n")
      assert((enc(2) & 1) == 0, "byte-shuffle flag clear")
      assert(Blosc.decompress(enc).sameElements(data), s"$cname t=$t n=$n")
    }
    // multi-block with a forced small blocksize
    val data = rampBytes(100000)
    val enc = Blosc.compress(data, 4,
      Blosc.Params("lz4", 5, shuffle = false, blocksize = 4096, bitShuffle = true))
    assert(Blosc.decompress(enc).sameElements(data))
  }

  test("bit-shuffle beats no-shuffle on low-entropy fixed-point data") {
    // 12-bit sensor values in int32 lanes: bit planes 12-31 are constant
    val bb = ByteBuffer.allocate(65536).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 16384).foreach(i => bb.putInt((math.sin(i / 50.0) * 2047).toInt + 2048))
    val data = bb.array()
    val plain = Blosc.compress(data, 4,
      Blosc.Params("lz4", 5, shuffle = false))
    val bits = Blosc.compress(data, 4,
      Blosc.Params("lz4", 5, shuffle = false, bitShuffle = true))
    assert(bits.length < plain.length,
      s"bitshuffle ${bits.length} !< plain ${plain.length}")
    assert(Blosc.decompress(bits).sameElements(data))
  }

  test("zarr v3 + v2 metadata carry the bitshuffle mode round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("zarr_bitshuf").toString
    val g = ZarrGroup(dir)
    g.initGroup(Map.empty)
    val p = Blosc.Params("zstd", 5, shuffle = false, bitShuffle = true)
    val data = Array.tabulate(200)(i => (i % 50).toDouble)
    g.createArray("v", Vector(200), Vector(100), DType.F8, Map.empty,
      dimensionNames = Some(Vector("x")), blosc = Some(p))
    g.writeRegion("v", Vector(0), NDArray.ofDoubles(Vector(200), data))
    // v3 metadata advertises shuffle="bitshuffle" and reads back
    assert(g.arrayMeta("v").blosc.contains(p))
    assert(g.readArray("v").data.asInstanceOf[Array[Double]].sameElements(data))
    // kerchunk v2 artifact: numcodecs shuffle=2, and the re-import agrees
    val rs = graft.kerchunk.RefSet.scanZarrGroup(dir)
    val json = graft.kerchunk.RefSet.toKerchunkV2Json(rs)
    val za = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(json).get("refs").get("v/.zarray").asText()
    assert(za.replace(" ", "").contains("\"shuffle\":2"), za)
    val back = graft.kerchunk.RefSet.fromKerchunkV2Json(json)
    val virt = s"$dir/virt.zarr"
    back.materialize(virt)
    assert(ZarrGroup(virt).readArray("v")
      .data.asInstanceOf[Array[Double]].sameElements(data))
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
