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
                            hasId3v2: Boolean, hasId3v1: Boolean)

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
    Mp3Index(
      nFrames = nFrames,
      mpegVersion = version match { case 3 => 1; case 2 => 2; case _ => 25 },
      layer = layer,
      sampleRate = sampleRate,
      bitrateKbps = if (cbr) firstBr / 1000 else -1,
      durationMs = totalSamples * 1000L / sampleRate,
      nBytes = (end - payloadStart).toLong,
      hasId3v2 = hasId3v2, hasId3v1 = hasId3v1)
  }

  /** Fixture encoder: `frames` Layer-III headers (real header
    * arithmetic, dummy payload bytes). `brIdxOf(k)` picks each frame's
    * bitrate index (constant → CBR; varying → VBR); `mpeg1` selects the
    * version; `srIdx` ∈ 0..2. Optional ID3v2 prefix and ID3v1 trailer
    * exercise the tag skips. */
  def encode(frames: Int, mpeg1: Boolean, srIdx: Int, brIdxOf: Int => Int,
             id3v2Size: Int = -1, id3v1: Boolean = false): Array[Byte] = {
    require(frames >= 1 && srIdx >= 0 && srIdx <= 2)
    val bos = new java.io.ByteArrayOutputStream()
    if (id3v2Size >= 0) {
      bos.write('I'); bos.write('D'); bos.write('3')
      bos.write(3); bos.write(0); bos.write(0) // v2.3, no flags
      bos.write((id3v2Size >> 21) & 0x7F); bos.write((id3v2Size >> 14) & 0x7F)
      bos.write((id3v2Size >> 7) & 0x7F); bos.write(id3v2Size & 0x7F)
      (0 until id3v2Size).foreach(i => bos.write(i % 251))
    }
    val sr = if (mpeg1) SrV1(srIdx) else SrV2(srIdx)
    var k = 0
    while (k < frames) {
      val brIdx = brIdxOf(k)
      require(brIdx >= 1 && brIdx <= 14, s"bitrate index $brIdx")
      val br = 1000 * (if (mpeg1) BrV1L3(brIdx) else BrV2L23(brIdx))
      val pad = k % 2
      val len = (if (mpeg1) 144 * br / sr else 72 * br / sr) + pad
      bos.write(0xFF)
      // sync(3) + version + layer(01 = III) + protection(1 = none)
      bos.write(0xE0 | (if (mpeg1) 3 << 3 else 2 << 3) | (1 << 1) | 1)
      bos.write((brIdx << 4) | (srIdx << 2) | (pad << 1))
      bos.write(0x40) // joint stereo
      (4 until len).foreach(i => bos.write((k * 31 + i) % 253))
      k += 1
    }
    if (id3v1) {
      bos.write('T'); bos.write('A'); bos.write('G')
      (3 until 128).foreach(i => bos.write(i % 127))
    }
    bos.toByteArray
  }
}
