package graft.queries

/** MPEG audio (MP3) frame INDEXER — the audio twin of m10's AVI
  * demuxer: web-scale audio corpora are dominated by MP3, and the
  * first triage stage of any ingest is a frame walk (count, sample
  * rate, CBR/VBR, duration), not a full decode. Implemented from the
  * public MPEG-1/MPEG-2 audio frame-header layout (ISO/IEC 11172-3 /
  * 13818-3):
  *
  *   - optional leading ID3v2 tag (10-byte header, syncsafe 28-bit
  *     size) skipped; optional trailing 128-byte ID3v1 "TAG" skipped
  *   - per frame: 11-bit sync, version (MPEG1/2/2.5), layer (I/II/III),
  *     bitrate index, sample-rate index, padding bit, channel mode
  *   - frame length: Layer I (12·br/sr + pad)·4; Layer II 144·br/sr +
  *     pad; Layer III 144·br/sr + pad (MPEG1) or 72·br/sr + pad
  *     (MPEG2/2.5); samples per frame 384 / 1152 / 1152|576
  *   - duration from the exact integer sample count; CBR iff every
  *     frame shares one bitrate index (VBR reports bitrate −1)
  *
  * Corruption contract: every header field is bounded before use (free-
  * format and reserved codes fail by name), the walk makes ≥ 4 bytes of
  * progress per frame, and a frame length running past EOF is a named
  * error — never a crash-class throwable.
  *
  * The fixture encoder emits real headers with dummy payloads, so the
  * DuckDB oracle recomputes every statistic (including the TOTAL BYTE
  * count — the sum of per-frame lengths, proving the per-frame bitrate/
  * padding arithmetic) from the synthesis formulas without parsing.
  */
object Mp3 {

  final case class Mp3Index(nFrames: Int, mpegVersion: Int, layer: Int,
                            sampleRate: Int,
                            /** kbps when CBR; −1 when VBR. */
                            bitrateKbps: Int,
                            durationMs: Long, nBytes: Long,
                            hasId3v2: Boolean, hasId3v1: Boolean,
                            /** "xing"/"info"/"vbri" when the first frame
                              * carries a VBR header, else "none". */
                            vbrTag: String = "none",
                            /** the header's O(1) frame/byte totals
                              * (−1 without a header) — enforced equal
                              * to the walk's totals. */
                            vbrFrames: Int = -1, vbrBytes: Long = -1L)

  // bitrate tables, kbps (ISO 11172-3 Table B.1 / 13818-3): index 1..14
  private val BrV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val BrV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val BrV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BrV2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val BrV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  private val SrV1 = Array(44100, 48000, 32000)
  private val SrV2 = Array(22050, 24000, 16000)
  private val SrV25 = Array(11025, 12000, 8000)

  def index(bytes: Array[Byte]): Mp3Index = {
    require(bytes.length >= 4, "not an MP3 stream (too short)")
    var pos = 0
    var hasId3v2 = false
    // ID3v2: "ID3" + version(2) + flags(1) + syncsafe size(4)
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      val sz = ((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
        ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F)
      require(10L + sz <= bytes.length,
        s"corrupt MP3: ID3v2 tag of $sz bytes exceeds the file")
      pos = 10 + sz
      hasId3v2 = true
    }
    // ID3v1: trailing 128-byte "TAG"
    var end = bytes.length
    val hasId3v1 = end - pos >= 128 && bytes(end - 128) == 'T' &&
      bytes(end - 127) == 'A' && bytes(end - 126) == 'G'
    if (hasId3v1) end -= 128

    var nFrames = 0
    var version = -1; var layer = -1; var sampleRate = -1
    var firstBr = -1; var cbr = true
    var totalSamples = 0L
    var firstLen = 0; var firstMode = 0; var firstCrc = 0
    val payloadStart = pos
    while (pos < end) {
      require(pos + 4 <= end, s"corrupt MP3: truncated frame header at $pos")
      val b0 = bytes(pos) & 0xFF; val b1 = bytes(pos + 1) & 0xFF
      val b2 = bytes(pos + 2) & 0xFF
      require(b0 == 0xFF && (b1 & 0xE0) == 0xE0,
        s"corrupt MP3: lost frame sync at $pos")
      val verBits = (b1 >> 3) & 3 // 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
      require(verBits != 1, "corrupt MP3: reserved version code")
      val layerBits = (b1 >> 1) & 3 // 0=reserved, 1=III, 2=II, 3=I
      require(layerBits != 0, "corrupt MP3: reserved layer code")
      val lyr = 4 - layerBits // 1=I, 2=II, 3=III
      val brIdx = (b2 >> 4) & 0xF
      require(brIdx >= 1 && brIdx <= 14,
        s"unsupported MP3: bitrate index $brIdx (free-format/bad)")
      val srIdx = (b2 >> 2) & 3
      require(srIdx != 3, "corrupt MP3: reserved sample-rate code")
      val pad = (b2 >> 1) & 1
      val isV1 = verBits == 3
      val br = 1000 * (if (isV1) lyr match {
        case 1 => BrV1L1(brIdx); case 2 => BrV1L2(brIdx); case _ => BrV1L3(brIdx)
      } else lyr match {
        case 1 => BrV2L1(brIdx); case _ => BrV2L23(brIdx)
      })
      val sr = verBits match {
        case 3 => SrV1(srIdx); case 2 => SrV2(srIdx); case _ => SrV25(srIdx)
      }
      val frameLen = lyr match {
        case 1 => (12 * br / sr + pad) * 4
        case 2 => 144 * br / sr + pad
        case _ => if (isV1) 144 * br / sr + pad else 72 * br / sr + pad
      }
      require(frameLen >= 4, s"corrupt MP3: frame length $frameLen")
      require(pos + frameLen <= end,
        s"corrupt MP3: frame of $frameLen bytes at $pos exceeds the stream")
      val spf = lyr match {
        case 1 => 384
        case 2 => 1152
        case _ => if (isV1) 1152 else 576
      }
      // the stream must be homogeneous in version/layer/rate (a real
      // decoder resynchronizes; an indexer flags the file instead)
      if (nFrames == 0) {
        version = verBits; layer = lyr; sampleRate = sr; firstBr = br
        firstLen = frameLen
        firstMode = (bytes(pos + 3) & 0xFF) >> 6
        firstCrc = if ((b1 & 1) == 0) 2 else 0 // protection bit 0 = CRC-16
      } else {
        require(verBits == version && lyr == layer && sr == sampleRate,
          "corrupt MP3: version/layer/sample-rate changed mid-stream")
        if (br != firstBr) cbr = false
      }
      totalSamples += spf
      nFrames += 1
      pos += frameLen
    }
    require(nFrames >= 1, "not an MP3 stream (no frames)")

    // ---- VBR header (Xing/Info/VBRI) in the FIRST frame (r15) ----
    // Real ingest triage reads these for an O(1) duration estimate; the
    // indexer parses them AND cross-checks against the walk — a header
    // whose totals contradict the frames on disk is a named error.
    // Xing/Info sits after the side info (MPEG1: 17 mono / 32 otherwise;
    // MPEG2/2.5: 9 / 17), VBRI at the fixed offset 32 — both after the
    // 4-byte header and optional CRC-16. The frames field counts ALL
    // frames (the tag frame rides in frame 0's payload, as LAME emits
    // it), so it must equal the walk's count and the bytes field the
    // walked stream length.
    def be32(o: Int): Long =
      ((bytes(o) & 0xFFL) << 24) | ((bytes(o + 1) & 0xFFL) << 16) |
        ((bytes(o + 2) & 0xFFL) << 8) | (bytes(o + 3) & 0xFFL)
    def tagAt(o: Int, t: String): Boolean =
      o >= 0 && o + 4 <= end &&
        (0 until 4).forall(i => (bytes(o + i) & 0xFF) == t.charAt(i))
    var vbrTag = "none"; var vbrFrames = -1; var vbrBytes = -1L
    val frame0End = payloadStart + firstLen
    val sideInfo =
      if (version == 3) { if (firstMode == 3) 17 else 32 }
      else { if (firstMode == 3) 9 else 17 }
    val xOff = payloadStart + 4 + firstCrc + sideInfo
    val vOff = payloadStart + 4 + 32
    if (xOff + 8 <= frame0End && (tagAt(xOff, "Xing") || tagAt(xOff, "Info"))) {
      val isInfo = (bytes(xOff) & 0xFF) == 'I'
      val flags = be32(xOff + 4)
      require((flags & ~0xFL) == 0, s"corrupt MP3: Xing flags $flags")
      var p2 = xOff + 8
      val need = (if ((flags & 1) != 0) 4 else 0) +
        (if ((flags & 2) != 0) 4 else 0) +
        (if ((flags & 4) != 0) 100 else 0) +
        (if ((flags & 8) != 0) 4 else 0)
      require(p2 + need <= frame0End,
        "corrupt MP3: Xing header exceeds its frame")
      if ((flags & 1) != 0) {
        val vf = be32(p2)
        require(vf >= 1 && vf <= Int.MaxValue,
          s"corrupt MP3: Xing frame count $vf")
        vbrFrames = vf.toInt; p2 += 4
      }
      if ((flags & 2) != 0) { vbrBytes = be32(p2); p2 += 4 }
      vbrTag = if (isInfo) "info" else "xing"
    } else if (vOff + 26 <= frame0End && tagAt(vOff, "VBRI")) {
      vbrBytes = be32(vOff + 10)
      val vf = be32(vOff + 14)
      require(vf >= 1 && vf <= Int.MaxValue,
        s"corrupt MP3: VBRI frame count $vf")
      vbrFrames = vf.toInt
      vbrTag = "vbri"
    }
    if (vbrFrames >= 0) require(vbrFrames == nFrames,
      s"corrupt MP3: $vbrTag header claims $vbrFrames frames; " +
        s"the walk found $nFrames")
    if (vbrBytes >= 0) require(vbrBytes == (end - payloadStart).toLong,
      s"corrupt MP3: $vbrTag header claims $vbrBytes bytes; " +
        s"the stream has ${end - payloadStart}")

    Mp3Index(
      nFrames = nFrames,
      mpegVersion = version match { case 3 => 1; case 2 => 2; case _ => 25 },
      layer = layer,
      sampleRate = sampleRate,
      bitrateKbps = if (cbr) firstBr / 1000 else -1,
      durationMs = totalSamples * 1000L / sampleRate,
      nBytes = (end - payloadStart).toLong,
      hasId3v2 = hasId3v2, hasId3v1 = hasId3v1,
      vbrTag = vbrTag, vbrFrames = vbrFrames, vbrBytes = vbrBytes)
  }

  /** Fixture encoder: `frames` Layer-III headers (real header
    * arithmetic, dummy payload bytes). `brIdxOf(k)` picks each frame's
    * bitrate index (constant → CBR; varying → VBR); `mpeg1` selects the
    * version; `srIdx` ∈ 0..2. Optional ID3v2 prefix and ID3v1 trailer
    * exercise the tag skips. */
  def encode(frames: Int, mpeg1: Boolean, srIdx: Int, brIdxOf: Int => Int,
             id3v2Size: Int = -1, id3v1: Boolean = false,
             /** "xing"/"info"/"vbri": embed the VBR header in frame 0's
               * payload (frames/bytes fields = the stream's totals). */
             vbrTag: String = "none",
             /** 1 = Layer I (384 samples, 4-byte slots), 2 = Layer II,
               * 3 = Layer III (the default web-corpus case). */
             layer: Int = 3): Array[Byte] = {
    require(frames >= 1 && srIdx >= 0 && srIdx <= 2)
    require(layer >= 1 && layer <= 3, s"layer $layer")
    require(vbrTag == "none" || layer == 3,
      "VBR headers are a Layer III convention in this encoder")
    require(vbrTag == "none" || vbrTag == "xing" || vbrTag == "info" ||
      vbrTag == "vbri", s"vbrTag $vbrTag")
    val bos = new java.io.ByteArrayOutputStream()
    if (id3v2Size >= 0) {
      bos.write('I'); bos.write('D'); bos.write('3')
      bos.write(3); bos.write(0); bos.write(0) // v2.3, no flags
      bos.write((id3v2Size >> 21) & 0x7F); bos.write((id3v2Size >> 14) & 0x7F)
      bos.write((id3v2Size >> 7) & 0x7F); bos.write(id3v2Size & 0x7F)
      (0 until id3v2Size).foreach(i => bos.write(i % 251))
    }
    val sr = if (mpeg1) SrV1(srIdx) else SrV2(srIdx)
    def brOf(brIdx: Int): Int = 1000 * (layer match {
      case 1 => if (mpeg1) BrV1L1(brIdx) else BrV2L1(brIdx)
      case 2 => if (mpeg1) BrV1L2(brIdx) else BrV2L23(brIdx)
      case _ => if (mpeg1) BrV1L3(brIdx) else BrV2L23(brIdx)
    })
    def lenOf(br: Int, pad: Int): Int = layer match {
      case 1 => (12 * br / sr + pad) * 4 // Layer I: 4-byte slots
      case 2 => 144 * br / sr + pad
      case _ => (if (mpeg1) 144 * br / sr else 72 * br / sr) + pad
    }
    var k = 0
    while (k < frames) {
      val brIdx = brIdxOf(k)
      require(brIdx >= 1 && brIdx <= 14, s"bitrate index $brIdx")
      val br = brOf(brIdx)
      val pad = k % 2
      val len = lenOf(br, pad)
      bos.write(0xFF)
      // sync(3) + version + layer bits (4 - layer) + protection(1 = none)
      bos.write(0xE0 | (if (mpeg1) 3 << 3 else 2 << 3) |
        ((4 - layer) << 1) | 1)
      bos.write((brIdx << 4) | (srIdx << 2) | (pad << 1))
      bos.write(0x40) // joint stereo
      (4 until len).foreach(i => bos.write((k * 31 + i) % 253))
      k += 1
    }
    if (id3v1) {
      bos.write('T'); bos.write('A'); bos.write('G')
      (3 until 128).foreach(i => bos.write(i % 127))
    }
    val arr = bos.toByteArray
    if (vbrTag != "none") {
      // patch the tag into frame 0's payload (lengths unchanged)
      val f0 = if (id3v2Size >= 0) 10 + id3v2Size else 0
      val audioBytes = arr.length - f0 - (if (id3v1) 128 else 0)
      val len0 = {
        val br = 1000 * (if (mpeg1) BrV1L3(brIdxOf(0)) else BrV2L23(brIdxOf(0)))
        (if (mpeg1) 144 * br / sr else 72 * br / sr) + 0 // k=0: no padding
      }
      def putBe32(o: Int, v: Long): Unit = {
        arr(o) = ((v >> 24) & 0xFF).toByte; arr(o + 1) = ((v >> 16) & 0xFF).toByte
        arr(o + 2) = ((v >> 8) & 0xFF).toByte; arr(o + 3) = (v & 0xFF).toByte
      }
      if (vbrTag == "vbri") {
        val off = f0 + 4 + 32
        require(off + 26 <= f0 + len0,
          s"VBRI header needs a ${off + 26 - f0}-byte first frame, got $len0")
        "VBRI".getBytes("ASCII").copyToArray(arr, off)
        arr(off + 4) = 0; arr(off + 5) = 1 // version 1
        // delay + quality zero (already), then bytes + frames
        putBe32(off + 10, audioBytes.toLong)
        putBe32(off + 14, frames.toLong)
        // TOC table: 0 entries, scale 1, entry size 2, frames/entry 0
        arr(off + 18) = 0; arr(off + 19) = 0
        arr(off + 20) = 0; arr(off + 21) = 1
        arr(off + 22) = 0; arr(off + 23) = 2
        arr(off + 24) = 0; arr(off + 25) = 0
      } else {
        val off = f0 + 4 + (if (mpeg1) 32 else 17) // joint stereo side info
        require(off + 16 <= f0 + len0,
          s"Xing header needs a ${off + 16 - f0}-byte first frame, got $len0")
        (if (vbrTag == "info") "Info" else "Xing")
          .getBytes("ASCII").copyToArray(arr, off)
        putBe32(off + 4, 0x3L) // flags: frames + bytes
        putBe32(off + 8, frames.toLong)
        putBe32(off + 12, audioBytes.toLong)
      }
    }
    arr
  }
}
