package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** WAV decoder contracts across the r13 format matrix: integer PCM
  * 8/16/24/32, IEEE float32, multi-channel downmix, and
  * WAVE_FORMAT_EXTENSIBLE headers. The 16-bit stereo layout is
  * cross-validated against the JDK's own javax.sound WAV writer; the
  * other layouts are hand-built (full control over every field) and
  * checked against the documented normalization: mono 16-bit via
  * truncating channel average, 8-bit recentering, 24/32-bit top-16,
  * float clamp × 32767. */
class WavSpec extends AnyFunSuite {

  private def chunkHeader(id: String, sz: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(id.getBytes("ASCII")); b.putInt(sz)
    b.array()
  }

  /** Hand-build a WAV: format code, bits, channels, raw data bytes. */
  private def wav(fmt: Int, bits: Int, channels: Int, rate: Int,
                  data: Array[Byte], extensible: Boolean = false): Array[Byte] = {
    val fmtSz = if (extensible) 40 else 16
    val b = java.nio.ByteBuffer.allocate(12 + 8 + fmtSz + 8 + data.length +
      (data.length & 1)).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("ASCII"))
    b.putInt(4 + 8 + fmtSz + 8 + data.length + (data.length & 1))
    b.put("WAVE".getBytes("ASCII"))
    b.put(chunkHeader("fmt ", fmtSz))
    b.putShort((if (extensible) 0xFFFE else fmt).toShort)
    b.putShort(channels.toShort); b.putInt(rate)
    b.putInt(rate * channels * bits / 8)
    b.putShort((channels * bits / 8).toShort); b.putShort(bits.toShort)
    if (extensible) {
      b.putShort(22); b.putShort(bits.toShort); b.putInt(0)
      b.putShort(fmt.toShort) // SubFormat GUID starts with the format code
      b.put(Array[Byte](0x00, 0x00, 0x00, 0x00, 0x10, 0x00,
        0x80.toByte, 0x00, 0x00, 0xAA.toByte, 0x00, 0x38,
        0x9B.toByte, 0x71))
    }
    b.put(chunkHeader("data", data.length))
    b.put(data)
    if ((data.length & 1) == 1) b.put(0.toByte)
    b.array()
  }

  test("16-bit STEREO downmixes to the truncating channel average (javax.sound layout)") {
    val n = 200
    val left = Array.tabulate(n)(i => ((i * 173) % 20001 - 10000).toShort)
    val right = Array.tabulate(n)(i => ((i * 91) % 14001 - 7000).toShort)
    // the JDK's own writer produces the container
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val raw = java.nio.ByteBuffer.allocate(n * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until n) { raw.putShort(left(i)); raw.putShort(right(i)) }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw.array()), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val (rate, s) = MultiModalOps.wavSamples(bos.toByteArray)
    assert(rate == 8000 && s.length == n)
    for (i <- 0 until n)
      assert(s(i) == ((left(i).toLong + right(i)) / 2).toShort, s"frame $i")
  }

  test("8-bit unsigned recenters; 24-bit and 32-bit keep their top 16 bits") {
    val v8 = Array[Int](0, 64, 128, 200, 255)
    val w8 = wav(1, 8, 1, 4000, v8.map(_.toByte))
    val (_, s8) = MultiModalOps.wavSamples(w8)
    assert(s8.toSeq == v8.map(v => ((v - 128) << 8).toShort).toSeq)

    val v24 = Array[Int](0x123456, -0x123456, 0x7FFFFF, -0x800000, 0x000080)
    val d24 = new java.io.ByteArrayOutputStream()
    v24.foreach { v =>
      d24.write(v & 0xff); d24.write((v >> 8) & 0xff); d24.write((v >> 16) & 0xff)
    }
    val (_, s24) = MultiModalOps.wavSamples(wav(1, 24, 1, 4000, d24.toByteArray))
    assert(s24.toSeq == v24.map(v => (v >> 8).toShort).toSeq)

    val v32 = Array[Int](0x12345678, Int.MinValue, Int.MaxValue, -1000000)
    val b32 = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    v32.foreach(b32.putInt)
    val (_, s32) = MultiModalOps.wavSamples(wav(1, 32, 1, 4000, b32.array()))
    assert(s32.toSeq == v32.map(v => (v >> 16).toShort).toSeq)
  }

  test("IEEE float32 clamps to [-1,1] and scales by 32767; NaN mutes") {
    val vf = Array[Float](0f, 0.5f, -0.5f, 1.0f, -1.0f, 2.5f, -3f,
      Float.NaN, 1e-4f)
    val bf = java.nio.ByteBuffer.allocate(vf.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vf.foreach(bf.putFloat)
    val (_, sf) = MultiModalOps.wavSamples(wav(3, 32, 1, 16000, bf.array()))
    val want = vf.map { x =>
      val cl = if (x.isNaN) 0f else math.max(-1f, math.min(1f, x))
      math.round(cl * 32767f).toShort
    }
    assert(sf.toSeq == want.toSeq)
  }

  test("WAVE_FORMAT_EXTENSIBLE resolves the SubFormat code") {
    val n = 64
    val vs = Array.tabulate(n)(i => (i * 517 - 16000).toShort)
    val b = java.nio.ByteBuffer.allocate(n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putShort)
    val (_, s) = MultiModalOps.wavSamples(
      wav(1, 16, 1, 44100, b.array(), extensible = true))
    assert(s.toSeq == vs.toSeq)
    // an extensible header claiming an unknown subformat fails by name
    // (2 = ADPCM; 7 became a KNOWN code in r14)
    val bad = wav(2, 16, 1, 44100, b.array(), extensible = true)
    val e = intercept[IllegalArgumentException](MultiModalOps.wavSamples(bad))
    assert(e.getMessage.contains("format code"), e.getMessage)
  }

  test("unsupported layouts fail by name (PCM float at 16 bits, format 2)") {
    val d = new Array[Byte](8)
    val e1 = intercept[IllegalArgumentException](
      MultiModalOps.wavSamples(wav(3, 16, 1, 8000, d)))
    assert(e1.getMessage.contains("sample layout"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      MultiModalOps.wavSamples(wav(2, 16, 1, 8000, d)))
    assert(e2.getMessage.contains("format code"), e2.getMessage)
    // G.711 is 8-bit only: format 7 at 16 bits is a named error
    val e3 = intercept[IllegalArgumentException](
      MultiModalOps.wavSamples(wav(7, 16, 1, 8000, d)))
    assert(e3.getMessage.contains("sample layout"), e3.getMessage)
  }

  // ----------------------------------------------------- G.711 (r14)

  test("G.711 mu-law and A-law: ALL 256 codes decode bit-exactly as javax.sound") {
    import javax.sound.sampled._
    val codes = Array.tabulate(256)(_.toByte)
    for ((fmt, name) <- Seq((7, "ulaw"), (6, "alaw"))) {
      val bytes = wav(fmt, 8, 1, 8000, codes)
      // ours
      val (rate, ours) = MultiModalOps.wavSamples(bytes)
      assert(rate == 8000 && ours.length == 256)
      // the JDK's independent G.711 codec: read the same WAV, convert
      // to signed PCM16
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      assert(ais.getFormat.getEncoding.toString.toLowerCase.contains(
        if (fmt == 7) "ulaw" else "alaw"), s"$name: ${ais.getFormat}")
      val pcm = AudioSystem.getAudioInputStream(
        new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          8000f, 16, 1, 2, 8000f, false), ais)
      val buf = pcm.readAllBytes()
      assert(buf.length == 512, s"$name: ${buf.length} PCM bytes")
      for (i <- 0 until 256) {
        val ref = ((buf(2 * i) & 0xff) | (buf(2 * i + 1) << 8)).toShort
        assert(ours(i) == ref, s"$name code $i: ours=${ours(i)} jdk=$ref")
      }
    }
  }

  test("G.711 fixture WAVs decode through the full container walk (fact chunk skipped)") {
    for (id <- Seq(2L, 6L, 10L, 14L)) {
      val bytes = MultiModalOps.wavBytesG711(id)
      val (rate, samples) = MultiModalOps.wavSamples(bytes)
      assert(rate == MultiModalOps.WavRate)
      val n = (256 + id % 64).toInt
      assert(samples.length == n)
      val f = (3 + id % 13).toInt
      val table =
        if (id % 8 == 2) MultiModalOps.UlawTable else MultiModalOps.AlawTable
      for (k <- 0 until n)
        assert(samples(k) == table(((k * f + id) % 256).toInt).toShort,
          s"id=$id sample $k")
    }
  }

  test("G.711 stereo downmixes like PCM (truncating channel average)") {
    // two channels with different codes: the downmix path is shared
    val codes = Array.tabulate(64)(i => Seq((i * 3) % 256, (i * 5) % 256))
      .flatten.map(_.toByte).toArray
    val (_, got) = MultiModalOps.wavSamples(wav(7, 8, 2, 8000, codes))
    assert(got.length == 64)
    for (i <- 0 until 64) {
      val l = MultiModalOps.UlawTable((i * 3) % 256).toLong
      val r = MultiModalOps.UlawTable((i * 5) % 256).toLong
      assert(got(i) == ((l + r) / 2).toShort, s"frame $i")
    }
  }
}
