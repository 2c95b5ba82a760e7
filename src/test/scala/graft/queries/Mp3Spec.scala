package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** MP3 frame-indexer contracts: header arithmetic against hand-computed
  * frame geometry from the published MPEG-1/2 audio tables, tag skips,
  * CBR/VBR detection, and the named-error matrix. */
class Mp3Spec extends AnyFunSuite {

  test("CBR MPEG1 Layer III: frame count, duration, byte total match hand arithmetic") {
    // 44.1 kHz, bitrate index 9 = 128 kbps: frame = 144*128000/44100 =
    // 417 (+1 on padded frames); 1152 samples per frame
    val bytes = Mp3.encode(40, mpeg1 = true, srIdx = 0, _ => 9)
    val v = Mp3.index(bytes)
    assert(v.nFrames == 40 && v.mpegVersion == 1 && v.layer == 3)
    assert(v.sampleRate == 44100 && v.bitrateKbps == 128)
    assert(v.durationMs == 40L * 1152 * 1000 / 44100)
    // frames alternate padding 0/1 starting unpadded: 20×417 + 20×418
    assert(v.nBytes == 20L * 417 + 20L * 418)
    assert(!v.hasId3v2 && !v.hasId3v1)
    assert(bytes.length == v.nBytes)
  }

  test("MPEG2 Layer III halves the frame geometry (72·br/sr, 576 samples)") {
    // 24 kHz, index 9 = 80 kbps: frame = 72*80000/24000 = 240 (+pad)
    val v = Mp3.index(Mp3.encode(30, mpeg1 = false, srIdx = 1, _ => 9))
    assert(v.mpegVersion == 2 && v.sampleRate == 24000 && v.bitrateKbps == 80)
    assert(v.durationMs == 30L * 576 * 1000 / 24000)
    assert(v.nBytes == 15L * 240 + 15L * 241)
  }

  test("VBR streams report bitrate -1; duration still exact") {
    val v = Mp3.index(Mp3.encode(33, mpeg1 = true, srIdx = 2,
      k => 1 + (k % 3)))
    assert(v.bitrateKbps == -1)
    assert(v.sampleRate == 32000)
    assert(v.durationMs == 33L * 1152 * 1000 / 32000)
  }

  test("ID3v2 prefix and ID3v1 trailer are skipped, flagged, and excluded from n_bytes") {
    val plain = Mp3.index(Mp3.encode(12, mpeg1 = true, srIdx = 0, _ => 9))
    val tagged = Mp3.index(Mp3.encode(12, mpeg1 = true, srIdx = 0, _ => 9,
      id3v2Size = 300, id3v1 = true))
    assert(tagged.hasId3v2 && tagged.hasId3v1)
    assert(tagged.nFrames == plain.nFrames)
    assert(tagged.nBytes == plain.nBytes) // tags excluded from the payload
    assert(tagged.durationMs == plain.durationMs)
  }

  test("named errors: lost sync, free-format bitrate, mid-stream rate change, truncation") {
    val good = Mp3.encode(8, mpeg1 = true, srIdx = 0, _ => 9)
    // lost sync: corrupt the second frame's first byte
    val frame0 = 144 * 128000 / 44100
    val bad = good.clone(); bad(frame0) = 0x00
    val e1 = intercept[IllegalArgumentException](Mp3.index(bad))
    assert(e1.getMessage.contains("sync"), e1.getMessage)
    // free-format bitrate index 0
    val free = good.clone(); free(2) = (0 << 4 | 0 << 2).toByte
    val e2 = intercept[IllegalArgumentException](Mp3.index(free))
    assert(e2.getMessage.contains("bitrate index"), e2.getMessage)
    // sample-rate change mid-stream: rewrite frame 2's sr index
    val mixed = good.clone()
    mixed(frame0 + 2) = ((9 << 4) | (1 << 2)).toByte
    val e3 = intercept[IllegalArgumentException](Mp3.index(mixed))
    assert(e3.getMessage.contains("mid-stream"), e3.getMessage)
    // truncation: drop the last 10 bytes
    val trunc = java.util.Arrays.copyOf(good, good.length - 10)
    val e4 = intercept[IllegalArgumentException](Mp3.index(trunc))
    assert(e4.getMessage.contains("exceeds the stream"), e4.getMessage)
  }

  test("m15 fixtures index to their closed forms across the id space") {
    for (id <- 0L to 24L) {
      val v = Mp3.index(MultiModalOps.mp3Bytes(id))
      assert(v.nFrames == 30 + id % 20, s"id=$id")
      val mpeg1 = id % 3 != 1
      assert(v.mpegVersion == (if (mpeg1) 1 else 2), s"id=$id")
      val sr = if (mpeg1) Array(44100, 48000, 32000)((id % 3).toInt) else 24000
      assert(v.sampleRate == sr, s"id=$id")
      if (id % 2 == 0) assert(v.bitrateKbps == (if (mpeg1) 128 else 80))
      else assert(v.bitrateKbps == -1, s"id=$id")
      assert(v.hasId3v2 == (id % 4 == 1) && v.hasId3v1 == (id % 5 == 2))
      val spf = if (mpeg1) 1152 else 576
      assert(v.durationMs == v.nFrames.toLong * spf * 1000 / sr, s"id=$id")
      // r15 VBR headers follow the synthesis rule and agree with the walk
      val wantTag =
        if (id % 2 == 1 && id % 3 != 1) (if (id % 5 == 0) "vbri" else "xing")
        else if (id % 2 == 0 && id % 6 == 0) "info"
        else "none"
      assert(v.vbrTag == wantTag, s"id=$id")
      if (wantTag == "none")
        assert(v.vbrFrames == -1 && v.vbrBytes == -1L, s"id=$id")
      else
        assert(v.vbrFrames == v.nFrames && v.vbrBytes == v.nBytes, s"id=$id")
    }
  }

  test("Layer I and Layer II frame geometry (r15 fixtures for the existing decode paths)") {
    // Layer II, MPEG1 at 48 kHz, index 9 = 160 kbps (Table B.1):
    // frame = 144*160000/48000 = 480 (+pad); 1152 samples
    val v2 = Mp3.index(Mp3.encode(20, mpeg1 = true, srIdx = 1, _ => 9,
      layer = 2))
    assert(v2.layer == 2 && v2.bitrateKbps == 160 && v2.sampleRate == 48000)
    assert(v2.nBytes == 10L * 480 + 10L * 481)
    assert(v2.durationMs == 20L * 1152 * 1000 / 48000)
    // Layer I, MPEG1 at 44.1 kHz, index 9 = 288 kbps:
    // frame = (12*288000/44100 + pad)*4 = 78*4 / 79*4; 384 samples
    val v1 = Mp3.index(Mp3.encode(16, mpeg1 = true, srIdx = 0, _ => 9,
      layer = 1))
    assert(v1.layer == 1 && v1.bitrateKbps == 288)
    assert(v1.nBytes == 8L * 312 + 8L * 316)
    assert(v1.durationMs == 16L * 384 * 1000 / 44100)
    // Layer II MPEG2 at 24 kHz shares the V2 L2/L3 table (index 9 = 80)
    val v22 = Mp3.index(Mp3.encode(12, mpeg1 = false, srIdx = 1, _ => 9,
      layer = 2))
    assert(v22.layer == 2 && v22.bitrateKbps == 80 &&
      v22.sampleRate == 24000)
    assert(v22.nBytes == 6L * 480 + 6L * 481)
  }

  test("Xing/Info/VBRI headers parse and their totals are ENFORCED against the walk") {
    // Xing on a VBR stream
    val xing = Mp3.encode(25, mpeg1 = true, srIdx = 0, k => 1 + (k % 3),
      vbrTag = "xing")
    val vx = Mp3.index(xing)
    assert(vx.vbrTag == "xing" && vx.vbrFrames == 25 && vx.vbrBytes == vx.nBytes)
    // Info on a CBR stream (the LAME convention)
    val info = Mp3.index(Mp3.encode(25, mpeg1 = true, srIdx = 0, _ => 9,
      vbrTag = "info"))
    assert(info.vbrTag == "info" && info.bitrateKbps == 128)
    // VBRI at its fixed offset, behind an ID3v2 prefix
    val vbri = Mp3.index(Mp3.encode(25, mpeg1 = true, srIdx = 0,
      k => 1 + (k % 3), id3v2Size = 40, vbrTag = "vbri"))
    assert(vbri.vbrTag == "vbri" && vbri.vbrFrames == 25 && vbri.hasId3v2)
    // a LYING frame count is a named error, not a silently wrong estimate
    val f0 = 144 * 32000 / 44100 // frame 0: bitrate index 1 at 44.1 kHz
    val lie = xing.clone()
    // Xing frames field = offset 4+32 (side info) + 8 (tag+flags)
    val framesOff = 4 + 32 + 8
    assert(lie(framesOff + 3) == 25.toByte)
    lie(framesOff + 3) = 26.toByte
    val e = intercept[IllegalArgumentException](Mp3.index(lie))
    assert(e.getMessage.contains("claims 26 frames"), e.getMessage)
    // a lying byte total likewise
    val lie2 = xing.clone()
    lie2(framesOff + 7) = (lie2(framesOff + 7) ^ 1).toByte
    val e2 = intercept[IllegalArgumentException](Mp3.index(lie2))
    assert(e2.getMessage.contains("bytes"), e2.getMessage)
    assert(f0 > framesOff + 8, "fixture sanity: header fits frame 0")
    // an MPEG2 stream whose first frame is too small simply has no tag
    val bare = Mp3.index(Mp3.encode(20, mpeg1 = false, srIdx = 1,
      k => 1 + (k % 3)))
    assert(bare.vbrTag == "none")
  }

  test("the unified probe dispatches MP3 next to the seven other containers") {
    val p = MultiModalOps.probeOf(MultiModalOps.mp3Bytes(6L))
    assert(p.container == "mp3" && p.width == -1 && p.nUnits == 36L)
    // ID3v2-prefixed streams sniff as MP3 too
    val p2 = MultiModalOps.probeOf(MultiModalOps.mp3Bytes(5L))
    assert(p2.container == "mp3")
  }
}
