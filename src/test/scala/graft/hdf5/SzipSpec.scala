package graft.hdf5

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import java.nio.file.Files

/** szip (HDF5 filter 4 / CCSDS 121 extended Rice) codec contracts: exact
  * round trips across options and depths, hand-derived bitstream pins
  * (the layout evidence — no independent szip codec exists in this
  * offline JVM), an HDF5 writer-emitted file read back through the real
  * chunk pipeline, and corruption behavior. */
class SzipSpec extends AnyFunSuite {

  private val NN = Szip.MaskNN | Szip.MaskEC | Szip.MaskMSB | Szip.MaskRaw
  private val EC = Szip.MaskEC | Szip.MaskMSB | Szip.MaskRaw

  private def mix(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def bytesOf(samples: Array[Long], sb: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(samples.length * sb)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach { s =>
      sb match {
        case 1 => b.put(s.toByte)
        case 2 => b.putShort(s.toShort)
        case _ => b.putInt(s.toInt)
      }
    }
    b.array()
  }

  private def roundTrip(samples: Array[Long], mask: Int, n: Int,
                        ppb: Int, pps: Int): Int = {
    val sb = if (n <= 8) 1 else if (n <= 16) 2 else 4
    val raw = bytesOf(samples, sb)
    val enc = Szip.compress(raw, mask, n, ppb, pps)
    val dec = Szip.decompress(enc, mask, n, ppb, pps, raw.length)
    assert(java.util.Arrays.equals(dec, raw),
      s"lossless mismatch n=$n ppb=$ppb pps=$pps mask=$mask")
    enc.length
  }

  test("lossless round trips: smooth / noisy / constant / spiky fields") {
    for ((n, mask) <- Seq((8, NN), (8, EC), (16, NN), (32, NN));
         ppb <- Seq(8, 16, 32)) {
      val maxv = if (n == 32) 0xFFFFFFFFL else (1L << n) - 1
      val pps = ppb * 8
      val total = pps * 5
      // smooth ramp (k-split small k), avalanche noise (uncompressed),
      // constant (zero blocks + ROS), sparse spikes (SE / zero runs)
      val smooth = Array.tabulate(total)(i => (i / 3).toLong % (maxv + 1))
      val noise = Array.tabulate(total)(i => mix(i * 7L + n) & maxv)
      val const = Array.fill(total)(maxv / 2)
      val spiky = Array.tabulate(total)(i =>
        if (i % 37 == 5) math.min(maxv, 9L) else 0L)
      val sm = roundTrip(smooth, mask, n, ppb, pps)
      val nz = roundTrip(noise, mask, n, ppb, pps)
      val ct = roundTrip(const, mask, n, ppb, pps)
      roundTrip(spiky, mask, n, ppb, pps)
      val sb = if (n <= 8) 1 else if (n <= 16) 2 else 4
      if ((mask & Szip.MaskNN) != 0)
        assert(ct < total * sb / 8,
          s"constant field should collapse to zero runs ($ct bytes)")
      assert(sm < nz, "smooth must compress better than noise")
    }
  }

  test("every option id round-trips: forced zero/SE/split/uncomp blocks") {
    // one scanline per regime, NN on: ref + mapped deltas
    val ppb = 8; val pps = 64; val n = 8
    val zero = Array.fill(pps)(100L) // all deltas 0 -> zero blocks
    val tiny = Array.tabulate(pps)(i => 100L + (i % 2)) // deltas 0/1 -> SE
    val mid = Array.tabulate(pps)(i => (i * 5L) % 200) // k-split
    val wild = Array.tabulate(pps)(i => mix(i.toLong) & 0xFFL) // uncomp-ish
    for (s <- Seq(zero, tiny, mid, wild)) roundTrip(s, NN, n, ppb, pps)
    // and all four regimes concatenated as one 4-scanline chunk
    roundTrip(zero ++ tiny ++ mid ++ wild, NN, n, ppb, pps)
  }

  test("hand-derived bitstreams pin the CCSDS layout byte-for-byte") {
    // EC (no preprocessing), n=8 -> id_len 3, J=8, one block per scanline.
    // All-zero block at segment end -> id '000', se-bit 0, FS(4) = ROS:
    // 000 0 00001 -> 0000 0000 1 -> 0x00 0x80
    val z = Szip.compress(bytesOf(Array.fill(8)(0L), 1), EC, 8, 8, 8)
    assert(z.toVector.map(_ & 0xFF) == Vector(0x00, 0x80),
      z.toVector.map(b => f"${b & 0xFF}%02x"))
    // alternating [1,0]*4 -> second extension wins: pairs (1,0) have
    // gamma = (1+0)(1+0+1)/2 + 0 = 1 -> FS '01' each:
    // 000 1 01 01 01 01 -> 0001 0101 0101(pad 0) -> 0x15 0x50
    val se = Szip.compress(bytesOf(Array.tabulate(8)(i => (1 - i % 2).toLong), 1),
      EC, 8, 8, 8)
    assert(se.toVector.map(_ & 0xFF) == Vector(0x15, 0x50),
      se.toVector.map(b => f"${b & 0xFF}%02x"))
    // both decode back exactly
    assert(Szip.decompress(z, EC, 8, 8, 8, 8).forall(_ == 0))
    assert(Szip.decompress(se, EC, 8, 8, 8, 8).toVector ==
      Vector[Byte](1, 0, 1, 0, 1, 0, 1, 0))
  }

  test("writer-emitted szip HDF5 file reads back through the chunk pipeline") {
    val nt = 8; val ny = 4; val nx = 8
    val f = Fragment(
      dims = Map("time" -> nt, "lat" -> ny, "lon" -> nx),
      coords = Map(
        "time" -> Variable(Vector("time"),
          NDArray(DType.I8, Vector(nt), (0 until nt).map(_.toLong).toArray)),
        "lat" -> Variable(Vector("lat"),
          NDArray(DType.F8, Vector(ny), (0 until ny).map(_.toDouble).toArray)),
        "lon" -> Variable(Vector("lon"),
          NDArray(DType.F8, Vector(nx), (0 until nx).map(_.toDouble).toArray))),
      dataVars = Map(
        "t2m" -> Variable(Vector("time", "lat", "lon"),
          NDArray(DType.I2, Vector(nt, ny, nx),
            Array.tabulate(nt * ny * nx)(i => ((i * 13) % 500 - 100).toShort))),
        "mask" -> Variable(Vector("time", "lat", "lon"),
          NDArray(DType.I4, Vector(nt, ny, nx),
            Array.tabulate(nt * ny * nx)(i => (mix(i.toLong) % 1000).toInt)))),
      attrs = Map("src" -> AttrValue("szip fixture")))
    val d0 = Files.createTempDirectory("graft_szip").toString
    val p = s"$d0/szip.nc"
    // chunks of 2x4x8 = 64 samples: blocks of 8, scanline 64
    HDF5Writer.write(p, f, chunks = Map(
      "t2m" -> Vector(2, 4, 8), "mask" -> Vector(2, 4, 8)), szip = Some(8))
    assert(HDF5.read(p).sameAs(f), "szip HDF5 round trip")
    // the filter genuinely engaged: the same fragment written without it
    // yields different chunk bytes (smaller file: these fields compress),
    // and both read back to the same data
    val plain = s"$d0/plain.nc"
    HDF5Writer.write(plain, f, chunks = Map(
      "t2m" -> Vector(2, 4, 8), "mask" -> Vector(2, 4, 8)))
    assert(Files.size(java.nio.file.Paths.get(p)) <
      Files.size(java.nio.file.Paths.get(plain)),
      "szip fixture did not shrink the file — filter may not have run")
    assert(HDF5.read(plain).sameAs(f))
    // engine-registry path (the reference's h5netcdf engine analog)
    val viaOpeners = graft.transforms.Openers.open(
      graft.patterns.FileType.Netcdf4, p)
    assert(viaOpeners.dataVars.contains("t2m"))
  }

  test("writer handles ragged chunk geometries (fastest dim not a block multiple)") {
    // nx=10 with ppb=8: scanline 10, rsi 2, 6 pad samples per scanline;
    // and a narrow var whose fastest dim (3) is under the block size, so
    // H5Z widens the scanline to the whole 24-sample chunk
    val nt = 4; val ny = 2; val nx = 10
    val f = Fragment(
      dims = Map("time" -> nt, "lat" -> ny, "lon" -> nx, "lvl" -> 3),
      coords = Map(
        "time" -> Variable(Vector("time"),
          NDArray(DType.I8, Vector(nt), (0 until nt).map(_.toLong).toArray)),
        "lat" -> Variable(Vector("lat"),
          NDArray(DType.F8, Vector(ny), (0 until ny).map(_.toDouble).toArray)),
        "lon" -> Variable(Vector("lon"),
          NDArray(DType.F8, Vector(nx), (0 until nx).map(_.toDouble).toArray)),
        "lvl" -> Variable(Vector("lvl"),
          NDArray(DType.F8, Vector(3), Array(1.0, 2.0, 3.0)))),
      dataVars = Map(
        "sst" -> Variable(Vector("time", "lat", "lon"),
          NDArray(DType.I2, Vector(nt, ny, nx),
            Array.tabulate(nt * ny * nx)(i => ((i * 11) % 400).toShort))),
        "narrow" -> Variable(Vector("time", "lat", "lvl"),
          NDArray(DType.I4, Vector(nt, ny, 3),
            Array.tabulate(nt * ny * 3)(i => (mix(i.toLong) % 50).toInt)))),
      attrs = Map.empty)
    val d0 = Files.createTempDirectory("graft_szip_ragged").toString
    val p = s"$d0/ragged.nc"
    HDF5Writer.write(p, f, chunks = Map(
      "sst" -> Vector(2, 2, 10), "narrow" -> Vector(2, 2, 3)), szip = Some(8))
    assert(HDF5.read(p).sameAs(f), "ragged szip HDF5 round trip")
  }

  test("ragged geometries: scanlines need not divide blocks or the chunk") {
    // pps=10 with J=8: rsi=2, 6 pad samples per scanline (the MODIS-style
    // fastest-dim-not-a-block-multiple case)
    for (mask <- Seq(NN, EC); n <- Seq(8, 16)) {
      val maxv = (1L << n) - 1
      roundTrip(Array.tabulate(80)(i => (i * 7L) % (maxv + 1)), mask, n, 8, 10)
    }
    // pps wider than the data: one 5-sample chunk at pps=24 (the
    // H5Z scanline-widening case, npoints < ppb*128)
    roundTrip(Array[Long](3, 1, 4, 1, 5), NN, 8, 8, 24)
    // ragged FINAL scanline: total=50 at pps=24 -> 3 scanlines, last has 2
    roundTrip(Array.tabulate(50)(i => 40L + (i % 3)), NN, 8, 8, 24)
    roundTrip(Array.tabulate(50)(i => 40L + (i % 3)), EC, 8, 8, 24)
    // pps < J: a 2-wide scanline padded to one 8-sample block
    roundTrip(Array.tabulate(6)(_.toLong), NN, 8, 8, 2)
  }

  test("LSB/MSB masks carry the decoded sample byte order") {
    // the same logical 16-bit samples round-trip under both orders, and
    // the two decoded layouts are byte-swaps of each other
    val samples = Array.tabulate(32)(i => (i * 321L) % 65536)
    val le = bytesOf(samples, 2)
    val be = {
      val b = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      samples.foreach(s => b.putShort(s.toShort))
      b.array()
    }
    val lsbMask = Szip.MaskNN | Szip.MaskEC | Szip.MaskLSB | Szip.MaskRaw
    val encLe = Szip.compress(le, lsbMask, 16, 8, 16)
    val encBe = Szip.compress(be, NN, 16, 8, 16)
    assert(java.util.Arrays.equals(encLe, encBe),
      "same logical samples must produce the same bitstream either order")
    assert(java.util.Arrays.equals(Szip.decompress(encLe, lsbMask, 16, 8, 16, 64), le))
    assert(java.util.Arrays.equals(Szip.decompress(encBe, NN, 16, 8, 16, 64), be))
  }

  test("named errors: conflicting byte order, bad geometry, truncation; nbit still named") {
    val raw = bytesOf(Array.tabulate(64)(_.toLong), 1)
    val enc = Szip.compress(raw, NN, 8, 8, 64)
    val e1 = intercept[IllegalArgumentException](
      Szip.decompress(enc, NN | Szip.MaskLSB, 8, 8, 64, 64))
    assert(e1.getMessage.contains("LSB"))
    val e2 = intercept[IllegalArgumentException](
      Szip.decompress(enc, NN, 8, 8, 64 * 129, 64)) // > 128 blocks/scanline
    assert(e2.getMessage.contains("scanline"))
    intercept[IllegalArgumentException](
      Szip.decompress(enc, NN, 8, 34, 64, 64)) // J past szlib's 32
    intercept[IllegalArgumentException](
      Szip.decompress(java.util.Arrays.copyOf(enc, 2), NN, 8, 8, 64, 64))
    // corruption sweep over the compressed stream: named error or
    // wrong-but-bounded output, never a crash/OOM
    var named = 0
    for (off <- enc.indices; flip <- Seq(0x01, 0x80)) {
      val b = enc.clone()
      b(off) = (b(off) ^ flip).toByte
      try {
        val out = Szip.decompress(b, NN, 8, 8, 64, 64)
        assert(out.length == 64)
      } catch {
        case _: IllegalArgumentException => named += 1
      }
    }
    info(s"szip corruption sweep: $named named failures of ${enc.length * 2}")
    // nbit (5) and scale-offset (6) stay named-unsupported
    assert(new UnsupportedFilterException(5).getMessage.contains("nbit"))
    assert(new UnsupportedFilterException(6).getMessage.contains("scale-offset"))
  }
}
