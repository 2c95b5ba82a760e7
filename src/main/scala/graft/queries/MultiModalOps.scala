package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.tiff.Tiff

/** Multimodal-column operators: binary payloads + typed metadata, decode /
  * resize / frame-sample / feature-extract stages over batched
  * mapPartitions (the JVM twin of mapInPandas).
  *
  * The decode kernels are REAL container parsers where a pure-JVM format
  * exists — PPM/P6 images (m01), raw-raster box resampling (m03), RIFF/WAV
  * PCM audio (m05) — over deterministically synthesized media, with oracles
  * that recompute features from the synthesis formulas WITHOUT parsing
  * bytes (a hash match proves the decoders decode). Only the embedding
  * extractor (m04) remains a clearly-marked stub: a learned model has no
  * JVM-replicable twin, so its contract — binary in, dense vector out — is
  * exercised with an md5-derived fake. */
object MultiModalOps {
  import Tables._

  /** REAL image decode (no stub): each doc carries a synthesized PPM (P6)
    * image — a real binary raster container — and the kernel PARSES it:
    * magic + ASCII header (dimensions, maxval) + RGB24 pixel plane, then
    * per-channel integer means. The payload pixels are an integer pattern
    * of doc_id, so the oracle recomputes the features from the synthesis
    * formula WITHOUT seeing the bytes — a hash match proves the container
    * was genuinely decoded. Batched mapPartitions, binary in, typed rows
    * out (the mapInPandas twin). */
  private[graft] def ppmBytes(docId: Long): Array[Byte] = {
    val w = (8 + docId % 5).toInt; val h = (6 + docId % 4).toInt
    val header = s"P6\n$w $h\n255\n".getBytes("ASCII")
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      px(i * 3) = ((docId + i) % 256).toByte
      px(i * 3 + 1) = ((docId * 3 + i * 7) % 256).toByte
      px(i * 3 + 2) = ((docId * 5 + i * 11) % 256).toByte
      i += 1
    }
    header ++ px
  }

  /** Parse a binary PPM (P6): returns (width, height, rMean, gMean, bMean)
    * with integer-floor channel means. Throws on malformed input. */
  private[graft] def decodePpm(bytes: Array[Byte]): (Int, Int, Long, Long, Long) = {
    require(bytes.length > 2 && bytes(0) == 'P' &&
      (bytes(1) == '6' || bytes(1) == '5'), "not a P6/P5 PNM")
    val gray = bytes(1) == '5' // P5: single-channel PGM (r13)
    var p = 2
    def token(): String = {
      while (p < bytes.length && bytes(p).toChar.isWhitespace) p += 1
      val start = p
      while (p < bytes.length && !bytes(p).toChar.isWhitespace) p += 1
      new String(bytes, start, p - start, "ASCII")
    }
    val w = token().toInt; val h = token().toInt; val maxval = token().toInt
    require(maxval == 255, s"unsupported maxval $maxval")
    p += 1 // single whitespace after maxval, then the pixel plane
    val ch = if (gray) 1 else 3
    require(bytes.length - p == w * h * ch, "truncated pixel plane")
    var r = 0L; var g = 0L; var b = 0L; var i = 0
    while (i < w * h) {
      if (gray) { val v = (bytes(p + i) & 0xFF).toLong; r += v; g += v; b += v }
      else {
        r += bytes(p + i * 3) & 0xFF
        g += bytes(p + i * 3 + 1) & 0xFF
        b += bytes(p + i * 3 + 2) & 0xFF
      }
      i += 1
    }
    (w, h, r / (w * h), g / (w * h), b / (w * h))
  }

  def m01ImageDecode(s: SparkSession, d: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("r_mean", LongType, nullable = false),
      StructField("g_mean", LongType, nullable = false),
      StructField("b_mean", LongType, nullable = false)))
    // Presentation sort BELOW the decode (r15 optimization, guide §1.4/
    // §2.4): a global orderBy above the decode plans a range Exchange
    // whose boundary-sampling pass executes the whole child — the decode
    // ran TWICE (and, pre-shuffle, in as few tasks as the scan has
    // splits). Sorting the doc_id input first makes the sampling pass
    // scan-cheap, runs the decode ONCE, post-shuffle (scan splits no
    // longer bound its parallelism), and mapPartitions preserves the
    // range-partitioned per-partition order, so the output row order is
    // unchanged. Applied to every map-only media decoder below.
    documentsUnspread(s, d).select(col("doc_id")).orderBy("doc_id")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (w, h, rm, gm, bm) = decodePpm(ppmBytes(id))
          Row(id, w, h, rm, gm, bm)
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** Oracle from the synthesis formula only — no byte parsing. */
  val m01Sql: String =
    """WITH p AS (
      |  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 4 AS h FROM documents
      |), px AS (
      |  SELECT doc_id, w, h, unnest(range(0, w * h)) AS i FROM p)
      |SELECT doc_id,
      |  CAST(max(w) AS INTEGER) AS width, CAST(max(h) AS INTEGER) AS height,
      |  CAST(SUM((doc_id + i) % 256) // (max(w) * max(h)) AS BIGINT) AS r_mean,
      |  CAST(SUM((doc_id * 3 + i * 7) % 256) // (max(w) * max(h)) AS BIGINT) AS g_mean,
      |  CAST(SUM((doc_id * 5 + i * 11) % 256) // (max(w) * max(h)) AS BIGINT) AS b_mean
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Frame sampling: each payload expands to n_bytes/64 virtual frames;
    * every 4th frame is kept with a deterministic per-frame fingerprint —
    * the explode + downsample shape of video preprocessing. */
  def m02FrameSample(s: SparkSession, d: String): DataFrame =
    // sort below the expensive work (see m01): docs sorted by the unique
    // doc_id, then the ascending-sequence explode + filter + md5
    // projection preserve order, so the rows come out (doc_id, frame_id)-
    // sorted without a post-explode range exchange whose sampling pass
    // would run the explode+md5 twice
    documentsUnspread(s, d)
      .withColumn("n_frames", expr("cast(length(text) as bigint) div 64"))
      .filter(col("n_frames") > 0)
      .orderBy("doc_id")
      .withColumn("frame_id", explode(expr("sequence(0, n_frames - 1)")))
      .filter(col("frame_id") % 4 === 0)
      .select(col("doc_id"), col("frame_id"),
        expr("cast(conv(substring(md5(concat(cast(doc_id as string), ':', " +
          "cast(frame_id as string))), 1, 15), 16, 10) as bigint)").as("frame_fp"))

  val m02Sql: String =
    """WITH f AS (
      |  SELECT doc_id, length(text) // 64 AS n_frames FROM documents
      |  WHERE length(text) // 64 > 0
      |), frames AS (
      |  SELECT doc_id, unnest(range(0, n_frames)) AS frame_id FROM f)
      |SELECT doc_id, frame_id,
      |  ('0x' || substr(md5(doc_id::VARCHAR || ':' || frame_id::VARCHAR), 1, 15))::BIGINT AS frame_fp
      |FROM frames WHERE frame_id % 4 = 0
      |ORDER BY doc_id, frame_id""".stripMargin

  /** REAL resample kernel (no stub): the payload is viewed as a grayscale
    * image — a 32-pixel-wide raster of the raw bytes, height = n/32 — and
    * box-filtered down to 8×8 with exact integer area averaging. Each
    * output pixel (y,x) owns the partition cell {(yy,xx) : yy*8/h0 == y,
    * xx/4 == x} and takes floor(sum/count) of its box. Long-form output
    * (one row per output pixel) keeps the oracle comparable per VALUE.
    *
    * The batch shape is production-real: binary in, primitive-array kernel
    * inside mapPartitions (the JVM twin of mapInPandas), typed rows out,
    * a single scan with no shuffle before the final presentation sort. */
  private val OutDim = 8
  private val RasterW = 32

  def m03Resize(s: SparkSession, d: String): DataFrame =
    // sort below the decode (see m01): the kernel emits each doc's pixels
    // in ascending (y, x) order, so a doc_id-sorted input yields exactly
    // the (doc_id, y, x) presentation order with no post-decode sort
    resizeOf(documentsUnspread(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .orderBy("doc_id"),
      OutDim, RasterW)

  /** Box-resample kernel over an arbitrary (doc_id, payload) frame; shared
    * by m03 and the [[graft.ops.Media]] facade. Rows whose payload cannot
    * fill one full box partition (length < rasterW*outDim) — or with a null
    * id/payload — produce no pixels: a partial raster has no well-defined
    * 8×8 box average, and a malformed row must not kill the pass. */
  private[graft] def resizeOf(docs: DataFrame, outDim: Int,
                              rasterW: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("y", IntegerType, nullable = false),
      StructField("x", IntegerType, nullable = false),
      StructField("px", LongType, nullable = false)))
    docs
      .filter(col("doc_id").isNotNull &&
        length(col("payload")) >= rasterW * outDim)
      .mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]]("payload")
        val h0 = bytes.length / rasterW
        val sums = Array.ofDim[Long](outDim * outDim)
        val counts = Array.ofDim[Long](outDim * outDim)
        var yy = 0
        while (yy < h0) {
          val y = yy * outDim / h0
          var xx = 0
          while (xx < rasterW) {
            val x = xx * outDim / rasterW
            val v = bytes(yy * rasterW + xx) & 0xFF
            sums(y * outDim + x) += v
            counts(y * outDim + x) += 1
            xx += 1
          }
          yy += 1
        }
        (0 until outDim * outDim).iterator.map { k =>
          Row(id, k / outDim, k % outDim, sums(k) / counts(k))
        }
      }
    }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** The oracle recomputes the identical integer box filter from character
    * codes (the corpus is ASCII, so byte == code point). */
  val m03Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text, length(text) // $RasterW AS h0 FROM documents
       |  WHERE length(text) >= ${RasterW * OutDim}
       |), px AS (
       |  SELECT doc_id, h0, unnest(range(0, h0 * $RasterW)) AS i, text FROM d
       |), vals AS (
       |  SELECT doc_id, h0, i // $RasterW AS yy, i % $RasterW AS xx,
       |    unicode(substr(text, (i + 1)::INT, 1)) AS v
       |  FROM px)
       |SELECT doc_id,
       |  ((yy * $OutDim) // h0)::INT AS y, (xx // 4)::INT AS x,
       |  (SUM(v) // COUNT(*))::BIGINT AS px
       |FROM vals GROUP BY 1, 2, 3
       |ORDER BY doc_id, y, x""".stripMargin

  /** Feature-extraction stage: payload → fixed-width feature vector
    * (array<bigint>, 8 dims). The extractor is a deterministic md5-derived
    * stub; the contract — binary in, dense vector column out, ready for the
    * s0x similarity operators — is the real plumbing. */
  def m04EmbedStub(s: SparkSession, d: String): DataFrame = {
    val withVec = documentsUnspread(s, d)
      .orderBy("doc_id") // sort below the md5 feature extraction (see m01)
      .select(col("doc_id"), expr(
        "transform(sequence(0, 7), k -> " +
          "cast(conv(substring(md5(text), k * 4 + 1, 4), 16, 10) as bigint))")
        .as("feature"))
    // project the vector to scalar columns for the oracle compare; the
    // array<bigint> `feature` column is the actual pipeline product
    val flat = (0 until 8).map(k => col("feature").getItem(k).as(s"f$k"))
    withVec.select((col("doc_id") +: flat): _*)
  }

  val m04Sql: String = {
    val cols = (0 until 8).map(k =>
      s"('0x' || substr(md5(text), ${k * 4 + 1}, 4))::BIGINT AS f$k").mkString(",\n  ")
    s"""SELECT doc_id,
       |  $cols
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** REAL audio decode (no stub): each doc carries a synthesized WAV
    * payload (RIFF/PCM-16, integer sawtooth so every engine reproduces the
    * samples exactly); the kernel PARSES the RIFF container — chunk walk,
    * fmt validation, PCM extraction — and computes real audio features
    * (sample rate, duration, integer RMS, zero crossings). The oracle
    * recomputes the features from the synthesis parameters WITHOUT seeing
    * the bytes, so a hash match proves the decode actually decoded. */
  private[graft] val WavRate = 8000

  private[graft] def wavBytes(docId: Long): Array[Byte] = {
    val n = (256 + docId % 64).toInt
    val f = (3 + docId % 13).toInt
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")); bb.putInt(36 + n * 2)
    bb.put("WAVE".getBytes("ASCII"))
    bb.put("fmt ".getBytes("ASCII")); bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(WavRate)
    bb.putInt(WavRate * 2); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes("ASCII")); bb.putInt(n * 2)
    var k = 0
    while (k < n) {
      bb.putShort((((k * f) % 200) * 100 - 9950).toShort)
      k += 1
    }
    bb.array()
  }

  /** Parse a RIFF/WAVE container: chunk walk to fmt + data, then features
    * from the PCM samples. Throws on malformed containers. */
  private[graft] def decodeWav(bytes: Array[Byte]): (Int, Long, Long, Long) = {
    val (rate, samples) = wavSamples(bytes)
    var sumSq = 0L; var zc = 0L; var i = 0
    while (i < samples.length) {
      sumSq += samples(i).toLong * samples(i)
      if (i > 0 && samples(i - 1).toLong * samples(i) < 0) zc += 1
      i += 1
    }
    val rms = math.sqrt(sumSq.toDouble / samples.length).toLong
    (rate, samples.length.toLong, rms, zc)
  }

  /** G.711 µ-law expansion (CCITT / Sun reference): complement, then
    * mantissa·8 + 0x84 shifted by the 3-bit segment, re-biased. Range
    * ±32124. All 256 codes cross-validated bit-exactly against the
    * JDK's javax.sound ULAW codec (WavSpec). */
  private[graft] val UlawTable: Array[Int] = Array.tabulate(256) { c =>
    val u = (~c) & 0xff
    val t = (((u & 0xf) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** G.711 A-law expansion (CCITT / Sun reference): XOR 0x55, then the
    * per-segment piecewise table (seg 0/1 linear, higher segments
    * shifted). Range ±32256; sign bit SET means positive in A-law. */
  private[graft] val AlawTable: Array[Int] = Array.tabulate(256) { c =>
    val a = c ^ 0x55
    val seg = (a & 0x70) >> 4
    var t = (a & 0xf) << 4
    if (seg == 0) t += 8
    else if (seg == 1) t += 0x108
    else t = (t + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) t else -t
  }

  /** G.711 WAV fixture (r14): format code 7 (µ-law, ids ≡ 2 mod 8) or
    * 6 (A-law, ids ≡ 6 mod 8), mono 8-bit at [[WavRate]], the spec's
    * 18-byte fmt chunk (cbSize = 0 — required for non-PCM codes) plus a
    * `fact` chunk. Code byte k is the full-range formula
    * (k·f + docId) % 256, so the m05 oracle recomputes the DECODED
    * samples with the published expansion formulas in SQL — a hash
    * match proves the table decode genuinely ran. */
  private[graft] def wavBytesG711(docId: Long): Array[Byte] = {
    val n = (256 + docId % 64).toInt
    val f = (3 + docId % 13).toInt
    val fmt = if (docId % 8 == 2) 7 else 6
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + 18 + 8 + 4 + 8 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII"))
    bb.putInt(4 + 8 + 18 + 8 + 4 + 8 + n)
    bb.put("WAVE".getBytes("ASCII"))
    bb.put("fmt ".getBytes("ASCII")); bb.putInt(18)
    bb.putShort(fmt.toShort); bb.putShort(1); bb.putInt(WavRate)
    bb.putInt(WavRate); bb.putShort(1); bb.putShort(8); bb.putShort(0)
    bb.put("fact".getBytes("ASCII")); bb.putInt(4); bb.putInt(n)
    bb.put("data".getBytes("ASCII")); bb.putInt(n)
    var k = 0
    while (k < n) {
      bb.put(((k * f + docId) % 256).toByte)
      k += 1
    }
    bb.array()
  }

  /** The shared container walk behind [[decodeWav]] and m07: RIFF parse
    * returning the raw PCM samples. Every payload-supplied chunk size is
    * bounded by the file size BEFORE use (the corruption-hardening
    * contract, CorruptionSweepSpec) — a negative size would otherwise spin
    * the chunk walk forever, a huge one would allocate gigabytes. */
  private[graft] def wavSamples(bytes: Array[Byte]): (Int, Array[Short]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(off: Int): String = new String(bytes, off, 4, "ASCII")
    require(bytes.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "WAVE",
      "not a WAV file")
    var off = 12
    var rate = -1; var bits = -1; var channels = -1
    var isFloat = false
    var g711 = 0 // 0 = none, 6 = A-law, 7 = µ-law
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length) {
      val id = fourcc(off); val sz = bb.getInt(off + 4)
      // bound arithmetic in Long: off + 8 + Int.MaxValue overflows Int and
      // would wrap PAST the <= check, defeating the guard
      require(sz >= 0 && off + 8L + sz <= bytes.length,
        s"corrupt RIFF chunk '$id': size $sz exceeds file bounds at $off")
      id match {
        case "fmt " =>
          require(sz >= 16, s"fmt chunk too short ($sz)")
          var fmt = bb.getShort(off + 8).toInt & 0xFFFF
          channels = bb.getShort(off + 10).toInt
          rate = bb.getInt(off + 12)
          bits = bb.getShort(off + 22).toInt
          // WAVE_FORMAT_EXTENSIBLE: the real format is the first u16 of
          // the SubFormat GUID at offset 24 of the extension
          if (fmt == 0xFFFE) {
            require(sz >= 40, s"extensible fmt chunk too short ($sz)")
            fmt = bb.getShort(off + 8 + 24).toInt & 0xFFFF
          }
          // r13: the real-corpus matrix — integer PCM 8/16/24/32 and
          // IEEE float32, any channel count (downmixed); previously
          // mono PCM-16 only. r14: G.711 A-law (6) and µ-law (7), the
          // telephony-corpus compressed codes, decoded to PCM16 via the
          // published CCITT expansion (WavSpec cross-validates all 256
          // codes of both laws bit-exactly against javax.sound).
          require(fmt == 1 || fmt == 3 || fmt == 6 || fmt == 7,
            s"unsupported WAV format code $fmt (PCM, IEEE float, " +
              "A-law and mu-law are)")
          require((fmt == 1 && (bits == 8 || bits == 16 || bits == 24 ||
              bits == 32)) || (fmt == 3 && bits == 32) ||
              ((fmt == 6 || fmt == 7) && bits == 8),
            s"unsupported WAV sample layout: format $fmt at $bits bits")
          require(channels >= 1 && channels <= 64,
            s"unsupported WAV channel count $channels")
          isFloat = fmt == 3
          g711 = if (fmt == 6 || fmt == 7) fmt else 0
        case "data" =>
          require(bits > 0 && channels > 0, "data chunk before fmt")
          val bytesPer = bits / 8
          val frame = bytesPer * channels
          val nFrames = sz / frame
          // normalize to MONO 16-bit: channels average (truncating), 8-bit
          // unsigned recenters, 24/32-bit keep their top 16 bits, float
          // clamps to [-1, 1] and scales by 32767 (round half away from 0)
          samples = new Array[Short](nFrames)
          var f = 0
          while (f < nFrames) {
            var acc = 0L
            var c = 0
            while (c < channels) {
              val p = off + 8 + f * frame + c * bytesPer
              val v: Int =
                if (g711 != 0) {
                  val t = if (g711 == 7) UlawTable else AlawTable
                  t(bytes(p) & 0xff)
                } else if (isFloat) {
                  val x = java.lang.Float.intBitsToFloat(bb.getInt(p))
                  val cl = if (x.isNaN) 0f else math.max(-1f, math.min(1f, x))
                  math.round(cl * 32767f)
                } else bits match {
                  case 8 => ((bytes(p) & 0xff) - 128) << 8
                  case 16 => bb.getShort(p).toInt
                  case 24 => (((bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
                    (bytes(p + 2) << 16)) >> 8)
                  case 32 => bb.getInt(p) >> 16
                }
              acc += v
              c += 1
            }
            samples(f) = (acc / channels).toShort
            f += 1
          }
        case _ => // skip unknown chunks
      }
      off += 8 + sz + (sz & 1)
    }
    require(samples != null, "no data chunk")
    (rate, samples)
  }

  /** The m07 frame-energy/run kernel over decoded PCM samples, shared by
    * the gated query and [[graft.ops.Media.energySegments]]:
    * (n_frames, n_active, n_segments, longest_run). */
  private[graft] def segmentsOf(samples: Array[Short]): (Long, Long, Long, Long) = {
    val nFrames = (samples.length + VadFrame - 1) / VadFrame
    var nActive = 0L; var nSeg = 0L; var longest = 0L; var run = 0L
    var j = 0
    while (j < nFrames) {
      var e = 0L; var i = j * VadFrame
      val end = math.min(i + VadFrame, samples.length)
      while (i < end) { e += samples(i).toLong * samples(i); i += 1 }
      if (e > 0) {
        nActive += 1; run += 1
        if (run == 1) nSeg += 1
        if (run > longest) longest = run
      } else run = 0
      j += 1
    }
    (nFrames.toLong, nActive, nSeg, longest)
  }

  def m05WavDecode(s: SparkSession, d: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("duration_ms", LongType, nullable = false),
      StructField("rms", LongType, nullable = false),
      StructField("zero_crossings", LongType, nullable = false)))
    documentsUnspread(s, d).select(col("doc_id")).orderBy("doc_id") // sort below the decode (see m01)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          // payload synthesized then GENUINELY re-parsed from bytes;
          // ids = 2 mod 4 rotate the G.711 compressed codes (r14):
          // µ-law at 2 mod 8, A-law at 6 mod 8
          val (rate, n, rms, zc) = decodeWav(
            if (id % 4 == 2) wavBytesG711(id) else wavBytes(id))
          Row(id, rate, n, n * 1000L / rate, rms, zc)
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** Oracle: features from the synthesis formula only — no byte parsing. */
  val m05Sql: String =
    s"""WITH p AS (
       |  SELECT doc_id, 256 + doc_id % 64 AS n, 3 + doc_id % 13 AS f
       |  FROM documents
       |), raw AS (
       |  SELECT doc_id, n, f, unnest(range(0, n)) AS k FROM p
       |), cod AS (
       |  SELECT doc_id, n, k,
       |    (k * f + doc_id) % 256 AS c,
       |    ((k * f) % 200) * 100 - 9950 AS saw
       |  FROM raw
       |), g AS (
       |  SELECT doc_id, n, k, saw,
       |    255 - c AS u, xor(c, 85) AS a
       |  FROM cod
       |), mag AS (
       |  SELECT doc_id, n, k, saw, u, a,
       |    ((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)) AS umag,
       |    CASE WHEN (a // 16) % 8 = 0 THEN (a % 16) * 16 + 8
       |         WHEN (a // 16) % 8 = 1 THEN (a % 16) * 16 + 264
       |         ELSE ((a % 16) * 16 + 264) * (1 << ((a // 16) % 8 - 1))
       |    END AS amag
       |  FROM g
       |), smp AS (
       |  SELECT doc_id, n, k,
       |    CASE WHEN doc_id % 8 = 2 THEN
       |           CASE WHEN u >= 128 THEN 132 - umag ELSE umag - 132 END
       |         WHEN doc_id % 8 = 6 THEN
       |           CASE WHEN a >= 128 THEN amag ELSE -amag END
       |         ELSE saw END AS v
       |  FROM mag
       |), w AS (
       |  SELECT doc_id, n, v,
       |    lag(v) OVER (PARTITION BY doc_id ORDER BY k) AS prev
       |  FROM smp)
       |SELECT doc_id,
       |  $WavRate AS sample_rate,
       |  CAST(max(n) AS BIGINT) AS n_samples,
       |  CAST(max(n) * 1000 // $WavRate AS BIGINT) AS duration_ms,
       |  CAST(FLOOR(SQRT(SUM(v * v)::DOUBLE / max(n))) AS BIGINT) AS rms,
       |  CAST(SUM(CASE WHEN prev IS NOT NULL AND prev * v < 0
       |    THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
       |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** m06: perceptual-hash image dedup — the multimodal twin of d01. Each
    * payload raster is box-resampled to 8×8 (the EXACT m03 kernel
    * arithmetic), transformed with a 64-point Walsh–Hadamard transform
    * (the classic pHash recipe with WHT standing in for DCT: same
    * frequency-decomposition role, but ±1 integer weights keep every
    * coefficient EXACT across engines — no irrational cosine constants to
    * diverge on), and hashed by the signs of coefficients 1..60 (DC
    * skipped; 60 bits keeps the hash a positive BIGINT in both engines).
    * Perceptually-identical images collide; docs sharing a hash form a
    * duplicate group with the min doc_id canonical.
    *
    * Physical shape: ONE scan computes (doc_id, phash) inside the same
    * mapPartitions kernel as the resample — no 64-coefficient explode, no
    * pixel shuffle; the only shuffle is the group-by-hash window, which
    * partitions by the 60-bit hash. At 100 TB this is resample cost + one
    * metadata-thin shuffle. */
  private val PhashBits = 60

  /** The ±1 Walsh–Hadamard sign matrix H(k,i) = (−1)^popcount(k&i) for
    * coefficients 1..[[PhashBits]] as a VALUES literal — SHARED by every
    * oracle that replays `wht_phash` (m06/p03/p05 via [[phashSqlCtes]],
    * p11 over its formula raster). */
  private[graft] def whtHadValuesSql: String =
    (1 to PhashBits).flatMap { k =>
      (0 until OutDim * OutDim).map { i =>
        val s = if (java.lang.Long.bitCount((k & i).toLong) % 2 == 0) 1 else -1
        s"($k, $i, $s)"
      }
    }.mkString(",\n    ")

  private[graft] def phashOf(docs: DataFrame, outDim: Int,
                             rasterW: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // the codegen'd wht_phash expression keeps scan -> hash in ONE
    // whole-stage-codegen span (the prior mapPartitions kernel was a
    // codegen barrier); the length filter makes the NULL defensive arm
    // unreachable here, so phash is non-null downstream
    docs
      .filter(col("doc_id").isNotNull &&
        length(col("payload")) >= rasterW * outDim)
      .select(col("doc_id"),
        call_function("wht_phash", col("payload"),
          lit(outDim), lit(rasterW)).as("phash"))
  }

  def m06PhashDedup(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("phash")
    phashOf(documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload")),
      OutDim, RasterW)
      .withColumn("canon_id", min("doc_id").over(w))
      .withColumn("is_dup", col("doc_id") =!= col("canon_id"))
      .orderBy("doc_id")
  }

  /** The pHash derivation as prefixed CTE text ending in `<p>hashes`
    * (doc_id, phash): identical pixels (m03's box filter), then the WHT
    * as a join against the ±1 sign matrix H(k,i) = (-1)^popcount(k&i)
    * emitted as literals. SHARED by m06Sql, p03Sql and p05Sql — a fix to
    * the chain can never desynchronize one of the composed oracles (the
    * r8 review found three hand-copies drifting on hardcoded 60/64). */
  private[graft] def phashSqlCtes(p: String): String = {
    val hadRows = whtHadValuesSql
    s"""${p}d AS (
       |  SELECT doc_id, text, length(text) // $RasterW AS h0 FROM documents
       |  WHERE length(text) >= ${RasterW * OutDim}
       |), ${p}px AS (
       |  SELECT doc_id, h0, unnest(range(0, h0 * $RasterW)) AS i, text FROM ${p}d
       |), ${p}vals AS (
       |  SELECT doc_id, h0, i // $RasterW AS yy, i % $RasterW AS xx,
       |    unicode(substr(text, (i + 1)::INT, 1)) AS v
       |  FROM ${p}px
       |), ${p}pixels AS (
       |  SELECT doc_id,
       |    ((yy * $OutDim) // h0) * $OutDim + (xx // ${RasterW / OutDim}) AS i,
       |    SUM(v) // COUNT(*) AS px
       |  FROM ${p}vals GROUP BY 1, 2
       |), ${p}had(k, i, s) AS (
       |  VALUES $hadRows
       |), ${p}coefs AS (
       |  SELECT p.doc_id, h.k, SUM(h.s * p.px) AS c
       |  FROM ${p}pixels p JOIN ${p}had h ON p.i = h.i GROUP BY 1, 2
       |), ${p}hashes AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN c > 0 THEN (1::BIGINT << (k - 1)) ELSE 0 END) AS BIGINT) AS phash
       |  FROM ${p}coefs GROUP BY doc_id)""".stripMargin
  }

  val m06Sql: String =
    s"""WITH ${phashSqlCtes("")}
       |SELECT doc_id, phash,
       |  MIN(doc_id) OVER (PARTITION BY phash) AS canon_id,
       |  doc_id <> MIN(doc_id) OVER (PARTITION BY phash) AS is_dup
       |FROM hashes ORDER BY doc_id""".stripMargin

  /** m07: VAD-style energy segmentation — the audio-pipeline step that
    * carves a recording into speech-like segments before transcription:
    * frame the PCM stream into fixed 32-sample frames, mark frames with
    * nonzero energy active, and report the active-run structure (frame
    * counts, segment count, longest segment).
    *
    * Each doc's payload is a synthesized RIFF/WAV where every third
    * 32-sample block (phase = doc_id mod 3) is silent and the rest carry
    * the integer sawtooth — so the decoded energy profile has real
    * silence gaps and the segmentation is non-vacuous. The kernel parses
    * the container and measures energy from the DECODED bytes; the oracle
    * recomputes the segment structure from the synthesis formula alone
    * (the m-block proof pattern: agreement proves the decode decodes).
    * One map pass, no shuffle before the final sort. */
  private[graft] val VadFrame = 32

  private[graft] def vadBytes(docId: Long): Array[Byte] = {
    val n = (512 + docId % 128).toInt
    val f = (3 + docId % 13).toInt
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")); bb.putInt(36 + n * 2)
    bb.put("WAVE".getBytes("ASCII"))
    bb.put("fmt ".getBytes("ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1)
    bb.putInt(WavRate)
    bb.putInt(WavRate * 2); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes("ASCII")); bb.putInt(n * 2)
    var k = 0
    while (k < n) {
      val silent = (k / VadFrame) % 3 == docId % 3
      bb.putShort(if (silent) 0 else (((k * f) % 200) * 100 - 9950).toShort)
      k += 1
    }
    bb.array()
  }

  /** Minimum-voiced-mass admission gate over the m07 kernel (the audio
    * stage of p05): decode each doc's WAV container for real and keep it
    * only when at least `minActive` frames carry energy — the "too little
    * speech" drop rule of a transcription pipeline. One map pass. */
  private[graft] def vadGateOf(ids: DataFrame, minActive: Long): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("vad_ok", BooleanType, nullable = false)))
    ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (_, samples) = wavSamples(vadBytes(id))
        val (_, nActive, _, _) = segmentsOf(samples)
        Row(id, nActive >= minActive)
      }
    }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  def m07EnergySegments(s: SparkSession, d: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("n_active", LongType, nullable = false),
      StructField("n_segments", LongType, nullable = false),
      StructField("longest_run", LongType, nullable = false)))
    documentsUnspread(s, d).select(col("doc_id")).orderBy("doc_id") // sort below the decode (see m01)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (_, samples) = wavSamples(vadBytes(id))
          val (nFrames, nActive, nSeg, longest) = segmentsOf(samples)
          Row(id, nFrames, nActive, nSeg, longest)
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** Oracle: segment structure from the synthesis formula only — frames
    * j of 32 samples, active iff j mod 3 != doc_id mod 3. */
  val m07Sql: String =
    """WITH p AS (
      |  SELECT doc_id, 512 + doc_id % 128 AS n FROM documents
      |), fr AS (
      |  SELECT doc_id, n, unnest(range(0, (n + 31) // 32)) AS j FROM p
      |), act AS (
      |  SELECT doc_id, n, j,
      |    CASE WHEN j % 3 <> doc_id % 3 THEN 1 ELSE 0 END AS active
      |  FROM fr
      |), grp AS (
      |  SELECT doc_id, j, active,
      |    j - ROW_NUMBER() OVER (PARTITION BY doc_id, active ORDER BY j) AS g
      |  FROM act
      |), seg AS (
      |  SELECT doc_id, g, COUNT(*) AS len FROM grp WHERE active = 1
      |  GROUP BY doc_id, g
      |), base AS (
      |  SELECT doc_id, CAST((max(n) + 31) // 32 AS BIGINT) AS n_frames,
      |    CAST(SUM(active) AS BIGINT) AS n_active
      |  FROM act GROUP BY doc_id
      |), segs AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
      |    CAST(MAX(len) AS BIGINT) AS longest_run
      |  FROM seg GROUP BY doc_id)
      |SELECT doc_id, n_frames, n_active, n_segments, longest_run
      |FROM base JOIN segs USING (doc_id) ORDER BY doc_id""".stripMargin

  /** m08: scene-cut detection — the video-curation step that segments a
    * clip into shots before frame sampling / captioning: view the payload
    * as a stream of 64-byte frames (m02's frame unit), compute each
    * frame's mean intensity (integer floor of the byte-value mean), and
    * declare a cut wherever consecutive frame means jump by more than
    * [[CutThresh]]. Output per doc: frame count, cut count, scene count
    * (cuts + 1) and the longest scene in frames — the shot structure a
    * sampler consumes ([[CutThresh]] = 3 makes 128 of 486 eligible
    * bench docs multi-scene, so the detector discriminates).
    *
    * One map pass over (doc_id, payload) in a plain-Scala kernel (the
    * m07 shape: no shuffle, no explode — frame means, cut flags and
    * scene runs all materialize inside the partition iterator); the
    * oracle recomputes the identical structure from unicode(substr)
    * arithmetic without seeing the kernel. */
  private[graft] val SceneFrame = 64
  private[graft] val CutThresh = 3L

  def m08SceneCuts(s: SparkSession, d: String): DataFrame =
    sceneCutsOf(documentsUnspread(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .orderBy("doc_id")) // sort below the decode (see m01)

  /** The m08 kernel over any (doc_id, payload) frame (graft.ops.Media
    * API). Payloads shorter than one frame are skipped (no scene exists),
    * mirroring phashOf's skip-the-stage semantics. */
  private[graft] def sceneCutsOf(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("n_cuts", LongType, nullable = false),
      StructField("n_scenes", LongType, nullable = false),
      StructField("longest_scene", LongType, nullable = false)))
    docs
      .filter(col("doc_id").isNotNull && length(col("payload")) >= SceneFrame)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val nf = bytes.length / SceneFrame
          val means = Array.tabulate(nf) { f =>
            var sum = 0L
            var i = 0
            while (i < SceneFrame) {
              sum += (bytes(f * SceneFrame + i) & 0xff); i += 1
            }
            sum / SceneFrame
          }
          var cuts = 0L
          var longest = 0L
          var run = 1L
          var f = 1
          while (f < nf) {
            if (math.abs(means(f) - means(f - 1)) > CutThresh) {
              cuts += 1
              if (run > longest) longest = run
              run = 1L
            } else run += 1
            f += 1
          }
          if (run > longest) longest = run
          Row(id, nf.toLong, cuts, cuts + 1, longest)
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  val m08Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text, length(text) // $SceneFrame AS nf
       |  FROM documents WHERE length(text) >= $SceneFrame
       |), fr AS (
       |  SELECT doc_id, nf, unnest(range(0, nf)) AS f, text FROM d
       |), ch AS (
       |  SELECT doc_id, nf, f, unnest(range(0, $SceneFrame)) AS i, text FROM fr
       |), means AS (
       |  SELECT doc_id, nf, f,
       |    SUM(unicode(substr(text, (f * $SceneFrame + i + 1)::INT, 1)))
       |      // $SceneFrame AS m
       |  FROM ch GROUP BY 1, 2, 3
       |), flags AS (
       |  SELECT doc_id, nf, f,
       |    CASE WHEN ABS(m - LAG(m) OVER (PARTITION BY doc_id ORDER BY f))
       |         > $CutThresh THEN 1 ELSE 0 END AS cut
       |  FROM means
       |), scenes AS (
       |  SELECT doc_id, nf, f, cut,
       |    SUM(cut) OVER (PARTITION BY doc_id ORDER BY f) AS scene
       |  FROM flags
       |), slen AS (
       |  SELECT doc_id, scene, COUNT(*) AS len FROM scenes GROUP BY 1, 2
       |), per AS (
       |  SELECT doc_id, CAST(MAX(nf) AS BIGINT) AS n_frames,
       |    CAST(SUM(cut) AS BIGINT) AS n_cuts
       |  FROM scenes GROUP BY doc_id
       |), best AS (
       |  SELECT doc_id, CAST(MAX(len) AS BIGINT) AS longest_scene
       |  FROM slen GROUP BY doc_id)
       |SELECT p.doc_id, p.n_frames, p.n_cuts,
       |  p.n_cuts + 1 AS n_scenes, b.longest_scene
       |FROM per p JOIN best b ON p.doc_id = b.doc_id
       |ORDER BY p.doc_id""".stripMargin

  /** Energy frames hashed into the m09 fingerprint: E_0..E_7 give 7 sign
    * bits. Every synthesized payload carries ≥ 256 samples = exactly
    * [[FpFrames]] complete [[VadFrame]]-sample frames, so the prefix
    * fingerprint is total (no ragged-tail arm to diverge on). */
  private[graft] val FpFrames = 8

  /** m09: audio fingerprinting + family grouping — the Haitsma–Kalker
    * (2002) robust-hash shape reduced to its deterministic core: frame
    * the REAL RIFF-parsed PCM into [[VadFrame]]-sample frames, take the
    * SIGN of each consecutive frame-energy delta as one bit, and pack
    * the first [[FpFrames]]−1 bits into an integer fingerprint (the
    * full algorithm band-filters a spectrogram; energy deltas are the
    * time-domain analog that stays libm-free and engine-exact). Equal
    * fingerprints group into families with a min-id canonical — the
    * audio twin of m06's pHash image dedup. The oracle recomputes the
    * energies from the synthesis formula WITHOUT seeing the bytes, so a
    * hash match proves the container walk + PCM extraction + framing
    * actually ran.
    *
    * Scale shape: one map-only decode scan (fingerprint = 8 longs of
    * state per row), then a fingerprint-partitioned window — the d01
    * grouping shape; no join, no global sort. */
  def m09AudioFingerprint(s: SparkSession, d: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("fp", LongType, nullable = false)))
    val fps = documents(s, d).select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          // payload synthesized then GENUINELY re-parsed from bytes
          Row(id, fingerprintOf(wavSamples(wavBytes(id))._2))
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fp")
    fps
      .withColumn("family_size", count(lit(1)).over(w).cast("long"))
      .withColumn("canonical_id", min("doc_id").over(w))
      .select("doc_id", "fp", "family_size", "canonical_id")
      .orderBy("doc_id")
  }

  /** The m09 fingerprint kernel over decoded PCM, shared by the gated
    * query and [[graft.ops.Media.audioFingerprints]]. Requires
    * [[FpFrames]] complete frames — shorter audio has no total prefix
    * fingerprint and fails by name (the facade maps that to ok=false). */
  private[graft] def fingerprintOf(samples: Array[Short]): Long = {
    require(samples.length >= FpFrames * VadFrame,
      s"audioFingerprint: need ${FpFrames * VadFrame} samples for " +
        s"$FpFrames frames, got ${samples.length}")
    val e = Array.tabulate(FpFrames) { j =>
      var acc = 0L; var i = j * VadFrame
      val end = i + VadFrame
      while (i < end) { acc += samples(i).toLong * samples(i); i += 1 }
      acc
    }
    var fp = 0L
    var j = 1
    while (j < FpFrames) {
      if (e(j) > e(j - 1)) fp |= 1L << (j - 1)
      j += 1
    }
    fp
  }

  /** Oracle: fingerprint from the synthesis formula only — no bytes. */
  val m09Sql: String =
    s"""WITH p AS (
       |  SELECT doc_id, 3 + doc_id % 13 AS f FROM documents
       |), smp AS (
       |  SELECT doc_id, f, unnest(range(0, ${FpFrames * VadFrame})) AS k
       |  FROM p
       |), e AS (
       |  SELECT doc_id, k // $VadFrame AS j,
       |    SUM((((k * f) % 200) * 100 - 9950)
       |      * (((k * f) % 200) * 100 - 9950)) AS e
       |  FROM smp GROUP BY 1, 2
       |), b AS (
       |  SELECT doc_id, j,
       |    CASE WHEN e > LAG(e) OVER (PARTITION BY doc_id ORDER BY j)
       |      THEN 1 ELSE 0 END AS bit
       |  FROM e
       |), fp AS (
       |  SELECT doc_id,
       |    CAST(SUM(bit << (j - 1)) AS BIGINT) AS fp
       |  FROM b WHERE j >= 1 GROUP BY 1)
       |SELECT doc_id, fp,
       |  COUNT(*) OVER (PARTITION BY fp) AS family_size,
       |  MIN(doc_id) OVER (PARTITION BY fp) AS canonical_id
       |FROM fp ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m10

  /** REAL video container parse (no stub): each doc carries a synthesized
    * AVI — the RIFF video container (hdrl/avih + strl/strh'vids'+strf
    * BITMAPINFOHEADER, movi with uncompressed '00dc' DIB frames, and the
    * idx1 index) — and the kernel PARSES it: nested LIST walk, header
    * decode, frame-chunk count, idx1 keyframe flags, and every
    * cross-container consistency contract checked as a require
    * (avih.dwTotalFrames ≡ strh.dwLength ≡ counted '00dc' chunks ≡ idx1
    * entries; every idx1 offset must land on a '00dc' fourcc with the
    * recorded size). The frame pixels are an integer pattern of doc_id,
    * so the oracle recomputes every output from the synthesis formula
    * WITHOUT seeing bytes — a hash match proves the container walk,
    * header arithmetic and index validation all genuinely ran. This is
    * the video-side sibling of m01 (PPM) and m05 (WAV): the m02/m08
    * frame ops sample SYNTHETIC frame streams; m10 is where a real
    * video CONTAINER enters the engine.
    *
    * Corruption contract: every payload-supplied size/count/offset is
    * bounded by the file length in Long arithmetic BEFORE use
    * (CorruptionSweepSpec sweeps this parser like WAV/PPM/GRIB) — the
    * walk is iterative with an explicit chunk budget, so a corrupt size
    * can never loop, recurse deep, or allocate past the payload.
    *
    * Scale shape: map-only (one scan, a per-row kernel, no shuffle
    * before the presentation sort) — decode-bound at 100 TB like every
    * production demux stage. */
  def m10AviIndex(s: SparkSession, d: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("n_keyframes", LongType, nullable = false),
      StructField("fps_milli", LongType, nullable = false),
      StructField("frame_bytes", LongType, nullable = false),
      StructField("first_frame_mean", LongType, nullable = false)))
    documentsUnspread(s, d).select(col("doc_id")).orderBy("doc_id") // sort below the decode (see m01)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          // payload synthesized then GENUINELY re-parsed from bytes
          val v = aviIndexOf(aviBytes(id))
          Row(id, v.width, v.height, v.nFrames, v.nKeyframes, v.fpsMilli,
            v.frameBytes, v.firstFrameMean)
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** Synthesized AVI parameters (all pure functions of doc_id — the
    * oracle's closed form): w = 8 + id%5, h = 6 + id%4, frames =
    * 3 + id%6 at rate = (10 + id%20) fps, 24-bit DIB frames whose byte j
    * of frame i is (id*7 + i*31 + j*13) % 256; every 4th frame is an
    * idx1 keyframe. */
  private[graft] def aviBytes(docId: Long): Array[Byte] = {
    val w = (8 + docId % 5).toInt
    val h = (6 + docId % 4).toInt
    val nf = (3 + docId % 6).toInt
    val rate = (10 + docId % 20).toInt
    val fsz = w * h * 3
    val pad = fsz & 1
    val strlSz = 4 + 8 + 56 + 8 + 40            // 'strl' + strh + strf
    val hdrlSz = 4 + 8 + 56 + 8 + strlSz        // 'hdrl' + avih + LIST strl
    val moviSz = 4 + nf * (8 + fsz + pad)
    val idxSz = 16 * nf
    val riffSz = 4 + 8 + hdrlSz + 8 + moviSz + 8 + idxSz
    val bb = java.nio.ByteBuffer.allocate(8 + riffSz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fcc(s: String): Unit = bb.put(s.getBytes("ASCII"))
    fcc("RIFF"); bb.putInt(riffSz); fcc("AVI ")
    fcc("LIST"); bb.putInt(hdrlSz); fcc("hdrl")
    fcc("avih"); bb.putInt(56)
    bb.putInt(1000000 / rate)                   // dwMicroSecPerFrame
    bb.putInt(0); bb.putInt(0)
    bb.putInt(0x10)                             // AVIF_HASINDEX
    bb.putInt(nf)                               // dwTotalFrames
    bb.putInt(0); bb.putInt(1)                  // dwStreams = 1
    bb.putInt(fsz); bb.putInt(w); bb.putInt(h)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    fcc("LIST"); bb.putInt(strlSz); fcc("strl")
    fcc("strh"); bb.putInt(56)
    fcc("vids"); fcc("DIB ")
    bb.putInt(0); bb.putShort(0); bb.putShort(0); bb.putInt(0)
    bb.putInt(1)                                // dwScale
    bb.putInt(rate)                             // dwRate
    bb.putInt(0)                                // dwStart
    bb.putInt(nf)                               // dwLength (frames)
    bb.putInt(fsz); bb.putInt(-1)               // buffer, quality
    bb.putInt(0)                                // dwSampleSize
    bb.putShort(0); bb.putShort(0)
    bb.putShort(w.toShort); bb.putShort(h.toShort)
    fcc("strf"); bb.putInt(40)
    bb.putInt(40); bb.putInt(w); bb.putInt(h)
    bb.putShort(1); bb.putShort(24)             // planes, 24-bit
    bb.putInt(0)                                // BI_RGB
    bb.putInt(fsz)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    fcc("LIST"); bb.putInt(moviSz); fcc("movi")
    val frameOffsets = new Array[Int](nf)
    var i = 0
    while (i < nf) {
      frameOffsets(i) = bb.position() - (8 + 4 + 8 + hdrlSz + 8 + 4)
      fcc("00dc"); bb.putInt(fsz)
      var j = 0
      while (j < fsz) {
        bb.put(((docId * 7 + i * 31 + j * 13) % 256).toByte); j += 1
      }
      if (pad == 1) bb.put(0.toByte)
      i += 1
    }
    fcc("idx1"); bb.putInt(idxSz)
    i = 0
    while (i < nf) {
      fcc("00dc")
      bb.putInt(if (i % 4 == 0) 0x10 else 0)    // AVIIF_KEYFRAME
      bb.putInt(frameOffsets(i))                // offset from movi data
      bb.putInt(fsz)
      i += 1
    }
    bb.array()
  }

  private[graft] final case class AviIndex(width: Int, height: Int,
      nFrames: Long, nKeyframes: Long, fpsMilli: Long, frameBytes: Long,
      firstFrameMean: Long)

  /** Parse an AVI container with full index validation. Iterative walks
    * only; every size/offset is bounded against the payload length in
    * Long arithmetic before any use, so corrupt values fail by name. */
  private[graft] def aviIndexOf(bytes: Array[Byte]): AviIndex = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(off: Int): String = {
      require(off >= 0 && off + 4L <= bytes.length,
        s"corrupt AVI: fourcc read at $off outside ${bytes.length}-byte file")
      new String(bytes, off, 4, "ASCII")
    }
    def chunkBound(id: String, off: Int, sz: Int): Unit =
      require(sz >= 0 && off + 8L + sz <= bytes.length,
        s"corrupt AVI chunk '$id': size $sz exceeds file bounds at $off")
    require(bytes.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "AVI ",
      "not an AVI file")
    val riffSz = bb.getInt(4)
    require(riffSz >= 4 && 8L + riffSz <= bytes.length,
      s"corrupt AVI: RIFF size $riffSz exceeds file bounds")
    var width = -1; var height = -1; var bitCount = -1
    var avihFrames = -1L; var strhFrames = -1L
    var scale = -1L; var rate = -1L
    var moviStart = -1; var moviEnd = -1
    var idxStart = -1; var idxCount = -1
    // top-level chunk walk (budgeted: each iteration advances >= 8 bytes)
    var off = 12
    while (off + 8 <= 8 + riffSz) {
      val id = fourcc(off); val sz = bb.getInt(off + 4)
      chunkBound(id, off, sz)
      if (id == "LIST") {
        require(sz >= 4, s"corrupt AVI LIST: size $sz below fourcc")
        val listType = fourcc(off + 8)
        if (listType == "hdrl") {
          // nested walk inside hdrl: avih + LIST strl { strh, strf }
          var p = off + 12
          val end = off + 8 + sz
          while (p + 8 <= end) {
            val cid = fourcc(p); val csz = bb.getInt(p + 4)
            chunkBound(cid, p, csz)
            require(p + 8L + csz <= end,
              s"corrupt AVI: '$cid' overruns hdrl list")
            cid match {
              case "avih" =>
                require(csz >= 40, s"avih too short ($csz)")
                avihFrames = bb.getInt(p + 8 + 16).toLong
              case "LIST" if csz >= 4 && fourcc(p + 8) == "strl" =>
                var q = p + 12
                val lend = p + 8 + csz
                while (q + 8 <= lend) {
                  val sid = fourcc(q); val ssz = bb.getInt(q + 4)
                  chunkBound(sid, q, ssz)
                  require(q + 8L + ssz <= lend,
                    s"corrupt AVI: '$sid' overruns strl list")
                  sid match {
                    case "strh" =>
                      require(ssz >= 40, s"strh too short ($ssz)")
                      require(fourcc(q + 8) == "vids",
                        "first stream must be video")
                      scale = bb.getInt(q + 8 + 20).toLong
                      rate = bb.getInt(q + 8 + 24).toLong
                      strhFrames = bb.getInt(q + 8 + 32).toLong
                    case "strf" =>
                      require(ssz >= 40, s"strf too short ($ssz)")
                      width = bb.getInt(q + 8 + 4)
                      height = bb.getInt(q + 8 + 8)
                      bitCount = bb.getShort(q + 8 + 14).toInt
                    case _ => // skip
                  }
                  q += 8 + ssz + (ssz & 1)
                }
              case _ => // skip
            }
            p += 8 + csz + (csz & 1)
          }
        } else if (listType == "movi") {
          moviStart = off + 12; moviEnd = off + 8 + sz
        }
      } else if (id == "idx1") {
        idxStart = off + 8; idxCount = sz / 16
      }
      off += 8 + sz + (sz & 1)
    }
    require(width > 0 && height > 0, "no video strf header")
    require(bitCount == 24, s"uncompressed 24-bit DIB only, got $bitCount")
    require(scale > 0 && rate > 0, s"corrupt strh rate $rate/$scale")
    require(moviStart >= 0, "no movi list")
    require(idxStart >= 0, "no idx1 index")
    // Real-world 24-bit DIBs pad each row to a 4-byte stride; the
    // synthesis dialect writes tight rows. Accept BOTH (r8 advice item):
    // frame chunks must uniformly be one of the two sizes.
    val tightBytes = width.toLong * height * 3
    val stride = ((width * 3 + 3) / 4) * 4
    val paddedBytes = stride.toLong * height
    require(tightBytes <= bytes.length,
      s"frame size $tightBytes exceeds ${bytes.length}-byte file")
    // walk movi: count '00dc' frames, mean of the FIRST frame's PIXEL
    // bytes (pad bytes excluded when the stride dialect is padded)
    var nFrames = 0L; var firstMean = -1L; var frameBytes = -1L
    var p = moviStart
    while (p + 8 <= moviEnd) {
      val cid = fourcc(p); val csz = bb.getInt(p + 4)
      chunkBound(cid, p, csz)
      require(p + 8L + csz <= moviEnd, s"corrupt AVI: '$cid' overruns movi")
      if (cid == "00dc") {
        require(csz == tightBytes || csz == paddedBytes,
          s"frame chunk size $csz matches neither tight $tightBytes nor " +
            s"4-byte-stride $paddedBytes for ${width}x$height x24")
        if (frameBytes < 0) frameBytes = csz
        require(csz == frameBytes,
          s"mixed frame chunk sizes: $csz after $frameBytes")
        if (nFrames == 0L) {
          val rowBytes = width * 3
          val rowStride = if (csz == paddedBytes) stride else rowBytes
          var acc = 0L; var y = 0
          while (y < height) {
            var x = 0
            while (x < rowBytes) {
              acc += bytes(p + 8 + y * rowStride + x) & 0xff; x += 1
            }
            y += 1
          }
          firstMean = acc / (rowBytes.toLong * height)
        }
        nFrames += 1
      }
      p += 8 + csz + (csz & 1)
    }
    require(nFrames > 0, "no frame chunks in movi")
    // idx1 validation: every entry must point at a matching '00dc'
    // chunk. Real-world muxers disagree on the offset base — relative
    // to the movi list's DATA start, relative to the 'movi' fourcc
    // (first chunk at offset 4), or absolute file offsets — so the
    // convention is DETECTED on the first entry and then required
    // uniformly (r8 advice item). Keyframe flags come from here.
    require(idxStart + 16L * idxCount <= bytes.length,
      s"corrupt idx1: $idxCount entries exceed file bounds")
    def frameChunkAt(abs: Long): Boolean =
      abs >= moviStart && abs + 8 <= moviEnd && (abs & 1) == 0 &&
        fourcc(abs.toInt) == "00dc" && bb.getInt(abs.toInt + 4) == frameBytes
    var idxBase = Long.MinValue
    var nKey = 0L; var k = 0
    while (k < idxCount) {
      val e = idxStart + 16 * k
      require(fourcc(e) == "00dc", s"idx1 entry $k: unknown ckid")
      val flags = bb.getInt(e + 4)
      val eOff = bb.getInt(e + 8); val eSz = bb.getInt(e + 12)
      require(eSz == frameBytes, s"idx1 entry $k: size $eSz != $frameBytes")
      if (idxBase == Long.MinValue) {
        // detect: movi data-start-relative, 'movi'-fourcc-relative, abs
        idxBase = Seq(moviStart.toLong, moviStart.toLong - 4L, 0L)
          .find(b => frameChunkAt(b + eOff))
          .getOrElse(throw new IllegalArgumentException(
            s"idx1 entry 0: offset $eOff addresses no frame chunk under " +
              "any offset convention (data-start-relative, " +
              "fourcc-relative, absolute)"))
      }
      val abs = idxBase + eOff
      require(eOff >= 0 && abs + 8 + eSz <= moviEnd,
        s"idx1 entry $k: offset $eOff outside movi")
      require(frameChunkAt(abs),
        s"idx1 entry $k: offset $eOff does not address a frame chunk " +
          "under the detected convention")
      if ((flags & 0x10) != 0) nKey += 1
      k += 1
    }
    // cross-container consistency — the contracts a real demuxer trusts
    require(avihFrames == nFrames && strhFrames == nFrames &&
      idxCount.toLong == nFrames,
      s"frame-count mismatch: avih=$avihFrames strh=$strhFrames " +
        s"movi=$nFrames idx1=$idxCount")
    AviIndex(width, height, nFrames, nKey, rate * 1000L / scale, frameBytes,
      firstMean)
  }

  /** Oracle: every column from the synthesis formula only — no bytes. */
  val m10Sql: String =
    """WITH p AS (
      |  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 4 AS h,
      |    3 + doc_id % 6 AS nf, 10 + doc_id % 20 AS rate
      |  FROM documents
      |), px AS (
      |  SELECT doc_id, w * h * 3 AS fsz, unnest(range(0, w * h * 3)) AS j
      |  FROM p)
      |SELECT p.doc_id,
      |  CAST(p.w AS INTEGER) AS width, CAST(p.h AS INTEGER) AS height,
      |  CAST(p.nf AS BIGINT) AS n_frames,
      |  CAST((p.nf + 3) // 4 AS BIGINT) AS n_keyframes,
      |  CAST(p.rate * 1000 AS BIGINT) AS fps_milli,
      |  CAST(p.w * p.h * 3 AS BIGINT) AS frame_bytes,
      |  m.mean AS first_frame_mean
      |FROM p JOIN (
      |  SELECT doc_id, CAST(SUM((doc_id * 7 + j * 13) % 256) // MAX(fsz)
      |    AS BIGINT) AS mean
      |  FROM px GROUP BY doc_id) m USING (doc_id)
      |ORDER BY p.doc_id""".stripMargin

  // ---------------------------------------------------------------- m11

  /** REAL compressed-image decode (no stub): each doc carries a
    * synthesized PNG — signature, CRC32-validated chunk stream (IHDR /
    * optional tEXt / IDAT split across two chunks / IEND), a genuine
    * zlib-DEFLATE-compressed pixel stream (java.util.zip, the same
    * codec family as the zarr/blosc paths), and per-scanline filters
    * cycling through ALL FIVE PNG filter types (None/Sub/Up/Average/
    * Paeth, `filter = y % 5`) — and the kernel DECODES it end to end:
    * chunk walk with CRC check, IHDR validation, multi-chunk IDAT
    * concatenation, full inflate with exact-size verification, and the
    * complete unfilter family including the Paeth predictor. The pixel
    * bytes are an integer pattern of doc_id, so the oracle recomputes
    * every output from the synthesis formula WITHOUT seeing bytes — a
    * hash match proves signature walk, CRC arithmetic, inflate AND all
    * five unfilters genuinely ran (a single wrong Paeth branch shifts
    * px_sum). This is the compressed sibling of m01's uncompressed PPM:
    * the first decode stage where entropy coding enters the engine.
    *
    * Corruption contract: chunk lengths/offsets are bounded by the file
    * length in Long arithmetic before use, IHDR dimensions are bounded
    * before any allocation, inflate failures and size mismatches fail
    * by name, and the walk is iterative with >= 12-byte progress per
    * chunk (CorruptionSweepSpec sweeps it like WAV/PPM/AVI/GRIB).
    *
    * Scale shape: map-only (one scan, per-row kernel, no shuffle before
    * the presentation sort) — decode-bound at 100 TB like every
    * production image-ingest stage. */
  def m11PngDecode(s: SparkSession, d: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_chunks", LongType, nullable = false),
      StructField("px_sum", LongType, nullable = false),
      StructField("px_mean_milli", LongType, nullable = false),
      StructField("tl_px", LongType, nullable = false),
      StructField("br_px", LongType, nullable = false)))
    documentsUnspread(s, d).select(col("doc_id")).orderBy("doc_id") // sort below the decode (see m01)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          // payload synthesized then GENUINELY re-decoded from bytes
          val v = pngDecodeOf(pngBytes(id))
          var sum = 0L
          var i = 0
          while (i < v.pixels.length) { sum += v.pixels(i) & 0xff; i += 1 }
          Row(id, v.width, v.height, v.nChunks, sum,
            1000L * sum / v.pixels.length, (v.pixels(0) & 0xff).toLong,
            (v.pixels(v.pixels.length - 1) & 0xff).toLong)
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** Synthesized PNG parameters (all pure functions of doc_id — the
    * oracle's closed form): w = 4 + id%5, h = 3 + id%4, 8-bit RGB
    * (color type 2), pixel byte b of scanline y is
    * (id·11 + y·29 + b·17) % 256, scanline y is filtered with type
    * y % 5, the IDAT stream is split across two chunks, and even ids
    * carry a tEXt chunk (so n_chunks = 4 + (id+1) % 2). */
  private[graft] def pngBytes(docId: Long): Array[Byte] = {
    val w = (4 + docId % 5).toInt
    val h = (3 + docId % 4).toInt
    pngEncode(w, h, Array.tabulate(h * w * 3) { p =>
      val y = p / (w * 3); val b = p % (w * 3)
      ((docId * 11 + y * 29 + b * 17) % 256).toByte
    }, tEXt = if (docId % 2 == 0) Some("id\u0000" + docId) else None)
  }

  /** Encode an 8-bit RGB raster as a real PNG (filters cycling all five
    * types, IDAT split across two chunks — see [[pngBytes]]). */
  private[graft] def pngEncode(w: Int, h: Int, rgb: Array[Byte],
                               tEXt: Option[String] = None): Array[Byte] = {
    require(rgb.length == w * h * 3,
      s"pngEncode: ${rgb.length} bytes for ${w}x$h RGB")
    val bpp = 3
    val rowBytes = w * bpp
    val raw = Array.tabulate(h, rowBytes) { (y, b) =>
      rgb(y * rowBytes + b) & 0xff
    }
    val filtered = new Array[Byte](h * (1 + rowBytes))
    var y = 0
    while (y < h) {
      val f = y % 5
      filtered(y * (1 + rowBytes)) = f.toByte
      var b = 0
      while (b < rowBytes) {
        val x = raw(y)(b)
        val left = if (b >= bpp) raw(y)(b - bpp) else 0
        val up = if (y > 0) raw(y - 1)(b) else 0
        val upLeft = if (y > 0 && b >= bpp) raw(y - 1)(b - bpp) else 0
        val out = f match {
          case 0 => x
          case 1 => x - left
          case 2 => x - up
          case 3 => x - (left + up) / 2
          case 4 => x - paethPredictor(left, up, upLeft)
        }
        filtered(y * (1 + rowBytes) + 1 + b) = (out & 0xff).toByte
        b += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(filtered); defl.finish()
    val zbuf = new Array[Byte](filtered.length + 64)
    var zlen = 0
    while (!defl.finished()) {
      require(zlen < zbuf.length, "png synth: compression did not shrink")
      zlen += defl.deflate(zbuf, zlen, zbuf.length - zlen)
    }
    defl.end()
    val z = java.util.Arrays.copyOf(zbuf, zlen)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length)
      bb.put(typ.getBytes("ASCII")); bb.put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("ASCII")); crc.update(data)
      bb.putInt(crc.getValue.toInt)
      bos.write(bb.array())
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w); ihdr.putInt(h)
    ihdr.put(8.toByte)   // bit depth
    ihdr.put(2.toByte)   // color type: truecolor RGB
    ihdr.put(0.toByte); ihdr.put(0.toByte); ihdr.put(0.toByte)
    chunk("IHDR", ihdr.array())
    tEXt.foreach(t => chunk("tEXt", t.getBytes("ASCII")))
    val cut = math.max(1, z.length / 2) // always two non-empty IDATs
    chunk("IDAT", java.util.Arrays.copyOfRange(z, 0, cut))
    chunk("IDAT", java.util.Arrays.copyOfRange(z, cut, z.length))
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  /** The PNG Paeth predictor (RFC 2083 §6.6): nearest of left/up/up-left
    * to the linear estimate, ties in that order. */
  private[graft] def paethPredictor(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private[graft] final case class PngImage(width: Int, height: Int,
      nChunks: Long, pixels: Array[Byte])

  /** Decode a PNG across the FULL color-type matrix (r13 — the real-
    * corpus surface: grayscale 1/2/4/8/16, truecolor 8/16, palette
    * 1/2/4/8 with tRNS alpha, gray+alpha, RGBA; Adam7 interlace for all
    * of them): CRC-checked chunk walk, multi-chunk IDAT, full zlib
    * inflate with exact-size verification (per-pass geometry), all five
    * unfilters at the correct filter distance per pixel layout. Output
    * is always RGB24; alpha composites over WHITE with the exact
    * integer formula (c·a + 255·(255−a) + 127) div 255 — cross-
    * validated against compositing ImageIO's RGBA output the same way.
    * 16-bit samples take their high byte (the libpng 16→8 strip);
    * sub-byte gray scales by bit replication (×255/×85/×17 — exact).
    * Iterative walks only; every length is bounded against the payload
    * in Long arithmetic BEFORE any allocation, so corrupt values fail by
    * name instead of looping or mass-allocating. */
  private[graft] def pngDecodeOf(bytes: Array[Byte]): PngImage = {
    val sig = Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte)
    require(bytes.length >= 8 + 25 &&
      java.util.Arrays.equals(java.util.Arrays.copyOf(bytes, 8), sig),
      "not a PNG file")
    val bb = java.nio.ByteBuffer.wrap(bytes) // big-endian by default
    var off = 8
    var width = -1; var height = -1
    var bitDepth = -1; var colorType = -1; var interlace = -1
    var plte: Array[Byte] = null
    var trns: Array[Byte] = null
    var nChunks = 0L
    var sawIhdr = false; var sawIend = false; var idatDone = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!sawIend) {
      require(off + 8 <= bytes.length,
        s"corrupt PNG: truncated chunk header at $off")
      val len = bb.getInt(off)
      val typ = new String(bytes, off + 4, 4, "ASCII")
      require(len >= 0 && off + 12L + len <= bytes.length,
        s"corrupt PNG chunk '$typ': length $len exceeds file bounds at $off")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, off + 4, 4 + len)
      val stored = bb.getInt(off + 8 + len).toLong & 0xffffffffL
      require(crc.getValue == stored,
        s"corrupt PNG chunk '$typ': CRC mismatch at $off")
      require(sawIhdr || typ == "IHDR", "first chunk must be IHDR")
      typ match {
        case "IHDR" =>
          require(!sawIhdr, "duplicate IHDR")
          require(len == 13, s"IHDR length $len != 13")
          width = bb.getInt(off + 8); height = bb.getInt(off + 12)
          require(width > 0 && height > 0 &&
            width.toLong * height * 8 + height <= (1L << 26),
            s"unsupported PNG dimensions ${width}x$height")
          bitDepth = bytes(off + 16) & 0xff
          colorType = bytes(off + 17) & 0xff
          val legal = (colorType, bitDepth) match {
            case (0, 1 | 2 | 4 | 8 | 16) => true // grayscale
            case (2, 8 | 16) => true // truecolor
            case (3, 1 | 2 | 4 | 8) => true // palette
            case (4, 8 | 16) => true // gray + alpha
            case (6, 8 | 16) => true // truecolor + alpha
            case _ => false
          }
          require(legal,
            s"unsupported PNG color type $colorType at bit depth $bitDepth")
          require(bytes(off + 18) == 0 && bytes(off + 19) == 0,
            "unsupported compression/filter method")
          interlace = bytes(off + 20) & 0xff
          require(interlace == 0 || interlace == 1,
            s"unsupported PNG interlace method $interlace")
          sawIhdr = true
        case "PLTE" =>
          require(len > 0 && len % 3 == 0 && len <= 256 * 3,
            s"corrupt PNG: PLTE length $len")
          plte = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
        case "tRNS" =>
          require(len <= 256 * 2, s"corrupt PNG: tRNS length $len")
          trns = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
        case "IDAT" =>
          require(!idatDone, "non-consecutive IDAT chunks")
          idat.write(bytes, off + 8, len)
        case "IEND" =>
          require(len == 0, s"IEND length $len != 0")
          sawIend = true
        case _ => // ancillary chunk: CRC-validated, content skipped
      }
      if (typ != "IDAT" && idat.size() > 0) idatDone = true
      nChunks += 1
      off += 12 + len
    }
    require(off == bytes.length, "trailing bytes after IEND")
    require(colorType != 3 || (plte != null && plte.length >= 3),
      "palette PNG without a PLTE chunk")
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    val bitsPP = channels * bitDepth
    val bppF = math.max(1, bitsPP / 8) // filter distance in bytes
    // interlace passes: Adam7 origins/strides, or the single full pass
    val passX0 = if (interlace == 0) Array(0) else Array(0, 4, 0, 2, 0, 1, 0)
    val passY0 = if (interlace == 0) Array(0) else Array(0, 0, 4, 0, 2, 0, 1)
    val passDx = if (interlace == 0) Array(1) else Array(8, 8, 4, 4, 2, 2, 1)
    val passDy = if (interlace == 0) Array(1) else Array(8, 8, 8, 4, 4, 2, 2)
    def passW(p: Int): Int =
      if (width > passX0(p)) (width - passX0(p) + passDx(p) - 1) / passDx(p)
      else 0
    def passH(p: Int): Int =
      if (height > passY0(p)) (height - passY0(p) + passDy(p) - 1) / passDy(p)
      else 0
    def rowBytesOf(wp: Int): Int = (wp * bitsPP + 7) / 8
    val expectL = passX0.indices.map { p =>
      val wp = passW(p); val hp = passH(p)
      if (wp == 0 || hp == 0) 0L else hp.toLong * (1 + rowBytesOf(wp))
    }.sum
    require(expectL > 0 && expectL <= (1L << 27),
      s"unsupported PNG scanline volume $expectL bytes")
    val expect = expectL.toInt
    val z = idat.toByteArray
    require(z.nonEmpty, "no IDAT data")
    val infl = new java.util.zip.Inflater()
    infl.setInput(z)
    val filtered = new Array[Byte](expect)
    var got = 0
    try {
      while (!infl.finished() && got < expect) {
        val n = infl.inflate(filtered, got, expect - got)
        // n == 0 while unfinished means truncated input or a preset-
        // dictionary demand — both corrupt here; also breaks any spin
        require(n > 0 || infl.finished(),
          s"corrupt PNG: IDAT stream truncated after $got of $expect bytes")
        got += n
      }
      require(got == expect && infl.inflate(new Array[Byte](1)) == 0 &&
        infl.finished(),
        s"corrupt PNG: inflated $got bytes, scanlines need $expect")
    } catch { case e: java.util.zip.DataFormatException =>
      throw new IllegalArgumentException(
        s"corrupt PNG: inflate failed (${e.getMessage})")
    } finally infl.end()

    // exact integer WHITE compositing: floor((c·a + 255·(255−a) + 127)/255)
    @inline def comp(c: Int, a: Int): Int =
      (c * a + 255 * (255 - a) + 127) / 255
    // sub-byte gray scales by exact bit replication; 16-bit strips low
    @inline def gscale(v: Int): Int = bitDepth match {
      case 1 => v * 255; case 2 => v * 85; case 4 => v * 17; case _ => v
    }
    val out = new Array[Byte](width * height * 3)
    var base = 0
    var p = 0
    while (p < passX0.length) {
      val wp = passW(p); val hp = passH(p)
      if (wp > 0 && hp > 0) {
        val rb = rowBytesOf(wp)
        val plane = new Array[Byte](hp * rb)
        var y = 0
        while (y < hp) {
          val f = filtered(base + y * (1 + rb)) & 0xff
          require(f <= 4, s"corrupt PNG: unknown filter type $f on row $y")
          var b = 0
          while (b < rb) {
            val x = filtered(base + y * (1 + rb) + 1 + b) & 0xff
            val left = if (b >= bppF) plane(y * rb + b - bppF) & 0xff else 0
            val up = if (y > 0) plane((y - 1) * rb + b) & 0xff else 0
            val upLeft =
              if (y > 0 && b >= bppF) plane((y - 1) * rb + b - bppF) & 0xff
              else 0
            val recon = f match {
              case 0 => x
              case 1 => x + left
              case 2 => x + up
              case 3 => x + (left + up) / 2
              case 4 => x + paethPredictor(left, up, upLeft)
            }
            plane(y * rb + b) = (recon & 0xff).toByte
            b += 1
          }
          // emit this row's pixels into the full-size RGB plane
          val rowOff = y * rb
          // raw sample ch of pixel i (high byte at depth 16; bit-packed
          // below 8 — single-channel types only, per the legality matrix)
          @inline def raw(i: Int, ch: Int): Int = bitDepth match {
            case 16 => plane(rowOff + (i * channels + ch) * 2) & 0xff
            case 8 => plane(rowOff + i * channels + ch) & 0xff
            case d =>
              val bit = i * bitsPP
              ((plane(rowOff + bit / 8) & 0xff) >> (8 - d - bit % 8)) &
                ((1 << d) - 1)
          }
          // full-precision sample for tRNS comparison at depth 16
          @inline def raw16(i: Int, ch: Int): Int =
            ((plane(rowOff + (i * channels + ch) * 2) & 0xff) << 8) |
              (plane(rowOff + (i * channels + ch) * 2 + 1) & 0xff)
          @inline def trnsU16(k: Int): Int =
            ((trns(k * 2) & 0xff) << 8) | (trns(k * 2 + 1) & 0xff)
          var i = 0
          while (i < wp) {
            var r = 0; var g = 0; var bl = 0
            colorType match {
              case 0 =>
                val v = raw(i, 0)
                val transparent = trns != null && trns.length >= 2 && {
                  if (bitDepth == 16) raw16(i, 0) == trnsU16(0)
                  else v == (trnsU16(0) & ((1 << bitDepth) - 1))
                }
                val gv = if (transparent) 255 else gscale(v)
                r = gv; g = gv; bl = gv
              case 2 =>
                r = raw(i, 0); g = raw(i, 1); bl = raw(i, 2)
                if (trns != null && trns.length >= 6) {
                  val m =
                    if (bitDepth == 16)
                      raw16(i, 0) == trnsU16(0) && raw16(i, 1) == trnsU16(1) &&
                        raw16(i, 2) == trnsU16(2)
                    else r == (trnsU16(0) & 0xff) && g == (trnsU16(1) & 0xff) &&
                      bl == (trnsU16(2) & 0xff)
                  if (m) { r = 255; g = 255; bl = 255 }
                }
              case 3 =>
                val idx = raw(i, 0)
                require(idx * 3 + 2 < plte.length,
                  s"corrupt PNG: palette index $idx beyond the " +
                    s"${plte.length / 3}-entry PLTE")
                val a = if (trns != null && idx < trns.length)
                  trns(idx) & 0xff else 255
                r = comp(plte(idx * 3) & 0xff, a)
                g = comp(plte(idx * 3 + 1) & 0xff, a)
                bl = comp(plte(idx * 3 + 2) & 0xff, a)
              case 4 =>
                val a = raw(i, 1)
                val gv = comp(raw(i, 0), a)
                r = gv; g = gv; bl = gv
              case 6 =>
                val a = raw(i, 3)
                r = comp(raw(i, 0), a)
                g = comp(raw(i, 1), a)
                bl = comp(raw(i, 2), a)
            }
            val o = ((passY0(p) + y * passDy(p)) * width +
              passX0(p) + i * passDx(p)) * 3
            out(o) = r.toByte; out(o + 1) = g.toByte; out(o + 2) = bl.toByte
            i += 1
          }
          y += 1
        }
        base += hp * (1 + rb)
      }
      p += 1
    }
    PngImage(width, height, nChunks, out)
  }

  /** Oracle: every column from the synthesis formula only — no bytes. */
  val m11Sql: String =
    """WITH p AS (
      |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      |  FROM documents
      |), px AS (
      |  SELECT doc_id, w, h, unnest(range(0, h * w * 3)) AS k
      |  FROM p
      |), s AS (
      |  SELECT doc_id, w, h,
      |    SUM((doc_id * 11 + (k // (w * 3)) * 29 + (k % (w * 3)) * 17)
      |      % 256) AS px_sum
      |  FROM px GROUP BY 1, 2, 3)
      |SELECT doc_id,
      |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
      |  CAST(4 + (doc_id + 1) % 2 AS BIGINT) AS n_chunks,
      |  CAST(px_sum AS BIGINT) AS px_sum,
      |  CAST(1000 * px_sum // (h * w * 3) AS BIGINT) AS px_mean_milli,
      |  CAST((doc_id * 11) % 256 AS BIGINT) AS tl_px,
      |  CAST((doc_id * 11 + (h - 1) * 29 + (w * 3 - 1) * 17) % 256
      |    AS BIGINT) AS br_px
      |FROM s ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m12

  /** REAL dictionary-coded image decode (no stub, no library codec):
    * each doc carries a synthesized GIF87a — logical screen descriptor,
    * 16-entry global color table, image descriptor, and the pixel
    * indices compressed with a HAND-ROLLED variable-width LZW coder
    * (LSB-first bit packing, clear/EOI codes, dictionary growth with
    * width bumps at each power of two, the KwKwK self-referential case
    * — exercised deliberately: the synthesis pattern ends in a
    * constant-color row, the classic KwKwK trigger) — and the kernel
    * DECODES it: header walk, palette load, sub-block reassembly, and
    * the full LZW decode loop. zlib (m11) is a library inflate; LZW
    * here is the engine's own entropy coder — encoder and decoder are
    * independent implementations whose agreement the pixel-exact spec
    * proves. The oracle recomputes index sums AND palette-resolved RGB
    * sums from the synthesis formulas without seeing bytes, so a hash
    * match proves bit unpacking, dictionary reconstruction and palette
    * lookup all genuinely ran.
    *
    * Corruption contract: every length/offset is bounded before use,
    * the code stream must stay inside the dictionary (a code beyond
    * next-available fails by name), decoded pixel count must equal w·h
    * exactly, and the walk is iterative with explicit progress
    * (CorruptionSweepSpec sweeps it like PNG/WAV/AVI).
    *
    * Scale shape: map-only (one scan, per-row kernel, no shuffle before
    * the presentation sort) — decode-bound at 100 TB. */
  def m12GifDecode(s: SparkSession, d: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_colors", IntegerType, nullable = false),
      StructField("px_index_sum", LongType, nullable = false),
      StructField("px_rgb_sum", LongType, nullable = false),
      StructField("tl_idx", LongType, nullable = false),
      StructField("br_idx", LongType, nullable = false)))
    documentsUnspread(s, d).select(col("doc_id")).orderBy("doc_id") // sort below the decode (see m01)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          // payload synthesized then GENUINELY re-decoded from bytes
          val v = gifDecodeOf(gifBytes(id))
          var isum = 0L; var rgb = 0L
          var i = 0
          while (i < v.indices.length) {
            val ix = v.indices(i) & 0xff
            isum += ix
            rgb += (v.palette(3 * ix) & 0xff) + (v.palette(3 * ix + 1) & 0xff) +
              (v.palette(3 * ix + 2) & 0xff)
            i += 1
          }
          Row(id, v.width, v.height, v.palette.length / 3, isum, rgb,
            (v.indices(0) & 0xff).toLong,
            (v.indices(v.indices.length - 1) & 0xff).toLong)
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** Synthesized GIF parameters (pure functions of doc_id — the oracle's
    * closed form): w = 6 + id%7, h = 4 + id%5, 16-color palette with
    * entry j = ((j·23+id)%256, (j·31+id)%256, (j·47+id)%256); pixel
    * index at (y, x) is (id·5 + y·11 + x·7) % 16 except the LAST row,
    * which is the constant id%16 (the KwKwK run). */
  private[graft] def gifBytes(docId: Long): Array[Byte] = {
    val w = (6 + docId % 7).toInt
    val h = (4 + docId % 5).toInt
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) =
          if (y == h - 1) (docId % 16).toInt
          else ((docId * 5 + y * 11 + x * 7) % 16).toInt
        x += 1
      }
      y += 1
    }
    val palette = Array.tabulate(48) { b =>
      val j = b / 3
      val v = (b % 3) match {
        case 0 => (j * 23 + docId) % 256
        case 1 => (j * 31 + docId) % 256
        case _ => (j * 47 + docId) % 256
      }
      v.toByte
    }
    gifEncode(w, h, palette, px)
  }

  /** Encode a 16-color indexed raster as a real GIF87a (LZW-compressed,
    * 255-byte sub-blocks — see [[gifBytes]]). */
  private[graft] def gifEncode(w: Int, h: Int, palette: Array[Byte],
                               px: Array[Int]): Array[Byte] = {
    require(palette.length == 48, s"gifEncode: 16-entry RGB palette, got ${palette.length} bytes")
    require(px.length == w * h, s"gifEncode: ${px.length} pixels for ${w}x$h")
    val bos = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    bos.write("GIF87a".getBytes("ASCII"))
    u16(w); u16(h)
    bos.write(0xF3)          // GCT present, 8-bit resolution, 16 entries
    bos.write(0); bos.write(0)
    bos.write(palette, 0, 48)
    bos.write(0x2C)          // image descriptor
    u16(0); u16(0); u16(w); u16(h)
    bos.write(0)             // no local color table
    bos.write(4)             // LZW minimum code size
    val code = lzwEncode(px, 4)
    var off = 0
    while (off < code.length) {   // 255-byte sub-blocks
      val n = math.min(255, code.length - off)
      bos.write(n); bos.write(code, off, n)
      off += n
    }
    bos.write(0)             // block terminator
    bos.write(0x3B)          // trailer
    bos.toByteArray
  }

  /** GIF-flavor LZW encode: variable code width starting at min+1,
    * LSB-first packing, clear emitted up front and on dictionary
    * exhaustion (4096), EOI last. Kept independent of [[lzwDecode]] —
    * their agreement is what the round-trip spec proves.
    *
    * Width discipline: every code is emitted at the DECODER's width at
    * that stream position, which the encoder simulates exactly — the
    * decoder performs one dictionary add per data code except the first
    * after a clear, and bumps width at `decNext == 2^w − 1` (one entry
    * ahead of the encoder's own add schedule, compensating its one-add
    * lag). The earlier formulation bumped on the ENCODER's add schedule,
    * which diverges by one bit exactly at the final data code — invisible
    * whenever zero padding follows, but a stream whose EOI ends
    * byte-aligned then fails to decode (caught by review simulation;
    * regression pinned in MediaApiSpec). Every emitted value fits by
    * construction: data codes are ≤ decNext (KwKwK inclusive) and
    * decNext ≤ 2^w − 1 is the bump invariant. */
  private[graft] def lzwEncode(px: Array[Int], minCode: Int): Array[Byte] = {
    require(px.nonEmpty, "lzw: empty pixel stream")
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    var width = minCode + 1
    def emit(c: Int): Unit = {
      bitBuf |= c.toLong << bitCnt; bitCnt += width
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    var dict = scala.collection.mutable.HashMap.empty[String, Int]
    var next = 0        // the encoder's own dictionary
    var decNext = 0     // the DECODER's dictionary size, simulated
    var emitsSinceClear = 0
    def reset(): Unit = {
      dict = scala.collection.mutable.HashMap.empty
      var i = 0
      while (i < clear) { dict(i.toChar.toString) = i; i += 1 }
      next = eoi + 1
      decNext = eoi + 1
      width = minCode + 1
      emitsSinceClear = 0
    }
    // the decoder adds an entry after every data code EXCEPT the first
    // following a clear (its add lags the encoder's by one mid-stream);
    // the width bumps on the standard giflib/ImageIO timing — when the
    // decoder's next free slot reaches 2^width (GifSpec calibrates both
    // directions against ImageIO)
    def emitData(c: Int): Unit = {
      emit(c)
      emitsSinceClear += 1
      if (emitsSinceClear >= 2 && decNext < 4096) {
        decNext += 1
        if (decNext == (1 << width) && width < 12) width += 1
      }
    }
    emit(clear); reset()
    var cur = px(0).toChar.toString
    var i = 1
    while (i < px.length) {
      val k = px(i).toChar
      if (dict.contains(cur + k)) cur = cur + k
      else {
        emitData(dict(cur))
        dict(cur + k) = next; next += 1
        if (next == 4096) { emit(clear); reset() }
        cur = k.toString
      }
      i += 1
    }
    emitData(dict(cur)); emit(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** GIF-flavor LZW decode with the full dictionary-reconstruction
    * algorithm incl. the KwKwK case. Fails by name on codes beyond the
    * dictionary, missing EOI, or output exceeding `maxPixels`. */
  private[graft] def lzwDecode(data: Array[Byte], minCode: Int,
                               maxPixels: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var bitPos = 0
    val totalBits = data.length * 8
    var width = minCode + 1
    def read(): Int = {
      require(bitPos + width <= totalBits,
        s"corrupt GIF: LZW stream ends mid-code at bit $bitPos")
      var v = 0; var b = 0
      while (b < width) {
        val byte = data((bitPos + b) >> 3) & 0xff
        if ((byte & (1 << ((bitPos + b) & 7))) != 0) v |= 1 << b
        b += 1
      }
      bitPos += width
      v
    }
    val dict = new Array[Array[Byte]](4096)
    var next = 0
    def reset(): Unit = {
      var i = 0
      while (i < clear) { dict(i) = Array(i.toByte); i += 1 }
      next = eoi + 1
      width = minCode + 1
    }
    reset()
    var prev: Array[Byte] = null
    var done = false
    while (!done) {
      val c = read()
      if (c == clear) { reset(); prev = null }
      else if (c == eoi) done = true
      else {
        require(c < next || (c == next && prev != null),
          s"corrupt GIF: LZW code $c beyond dictionary (next=$next)")
        val entry =
          if (c < next && dict(c) != null) dict(c)
          else prev :+ prev(0)                 // KwKwK
        out.write(entry, 0, entry.length)
        require(out.size <= maxPixels,
          s"corrupt GIF: LZW output exceeds $maxPixels pixels")
        if (prev != null && next < 4096) {
          dict(next) = prev :+ entry(0)
          next += 1
        }
        // standard (giflib/ImageIO) width timing: bump when the NEXT
        // free slot reaches 2^width — calibrated against ImageIO-written
        // streams (GifSpec); the previous next==2^width−1 rule read one
        // code early and desynced on every real-world GIF at the first
        // bump
        if (next == (1 << width) && width < 12) width += 1
        prev = entry
      }
    }
    out.toByteArray
  }

  private[graft] final case class GifImage(width: Int, height: Int,
      palette: Array[Byte], indices: Array[Byte], nFrames: Int = 1)

  /** Decode a GIF (87a AND 89a, r13): header + screen descriptor,
    * global and per-frame LOCAL color tables, extension blocks (Graphic
    * Control transparency, comments, application/NETSCAPE loops — all
    * bounded sub-block walks), Adam-style 4-pass INTERLACE row
    * reordering, sub-block reassembly, full LZW decode. Animated files
    * decode their FIRST frame (the web-thumbnail semantics) and report
    * the total frame count; a fully-transparent index renders WHITE in
    * the returned palette (GIF alpha is binary). Iterative walks; every
    * length is bounded against the payload before use. */
  private[graft] def gifDecodeOf(bytes: Array[Byte]): GifImage = {
    require(bytes.length >= 13 && {
      val m = new String(bytes, 0, 6, "ASCII")
      m == "GIF87a" || m == "GIF89a"
    }, "not a GIF87a/GIF89a file")
    def u16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    val packed = bytes(10) & 0xff
    val hasGct = (packed & 0x80) != 0
    var off = 13
    val global: Array[Byte] =
      if (!hasGct) null
      else {
        val n = 2 << (packed & 7)
        require(off + 3 * n <= bytes.length,
          s"corrupt GIF: $n-entry color table exceeds file bounds")
        val t = java.util.Arrays.copyOfRange(bytes, off, off + 3 * n)
        off += 3 * n
        t
      }
    /** Bounded sub-block walk from `off`; returns (payload, next off). */
    def subBlocks(start: Int): (Array[Byte], Int) = {
      val data = new java.io.ByteArrayOutputStream()
      var o = start
      var bl = -1
      while (bl != 0) {
        require(o < bytes.length, "corrupt GIF: unterminated sub-blocks")
        bl = bytes(o) & 0xff; o += 1
        if (bl > 0) {
          require(o + bl <= bytes.length,
            s"corrupt GIF: sub-block of $bl exceeds file bounds at $o")
          data.write(bytes, o, bl); o += bl
        }
      }
      (data.toByteArray, o)
    }
    var transparentNext = -1
    var nFrames = 0
    var first: GifImage = null
    var done = false
    while (!done) {
      require(off < bytes.length, "corrupt GIF: truncated block stream")
      (bytes(off) & 0xff) match {
        case 0x3B =>
          off += 1; done = true
        case 0x21 => // extension: label + sub-blocks
          require(off + 2 <= bytes.length, "corrupt GIF: truncated extension")
          val label = bytes(off + 1) & 0xff
          off += 2
          if (label == 0xF9 && off + 4 < bytes.length &&
              (bytes(off) & 0xff) >= 4 && (bytes(off + 1) & 0x01) != 0)
            transparentNext = bytes(off + 4) & 0xff
          off = subBlocks(off)._2
        case 0x2C => // image descriptor
          require(off + 10 <= bytes.length,
            "corrupt GIF: truncated image descriptor")
          val w = u16(off + 5); val h = u16(off + 7)
          require(w > 0 && h > 0 && w.toLong * h <= (1L << 24),
            s"unsupported GIF dimensions ${w}x$h")
          val fpacked = bytes(off + 9) & 0xff
          val interlaced = (fpacked & 0x40) != 0
          off += 10
          val local: Array[Byte] =
            if ((fpacked & 0x80) == 0) null
            else {
              val n = 2 << (fpacked & 7)
              require(off + 3 * n <= bytes.length,
                s"corrupt GIF: $n-entry local color table exceeds file bounds")
              val t = java.util.Arrays.copyOfRange(bytes, off, off + 3 * n)
              off += 3 * n
              t
            }
          require(off < bytes.length, "corrupt GIF: truncated before LZW header")
          val minCode = bytes(off) & 0xff
          require(minCode >= 2 && minCode <= 8,
            s"corrupt GIF: LZW minimum code size $minCode")
          off += 1
          val (data, next) = subBlocks(off)
          off = next
          nFrames += 1
          if (nFrames == 1) {
            val table0 = if (local != null) local else global
            require(table0 != null, "GIF frame without any color table")
            val nColors = table0.length / 3
            var indices = lzwDecode(data, minCode, w * h)
            require(indices.length == w * h,
              s"corrupt GIF: decoded ${indices.length} pixels, need ${w * h}")
            if (interlaced) {
              // 4-pass row reordering: rows arrive 0,8.. / 4,12.. /
              // 2,6.. / 1,3..; remap to natural order
              val natural = new Array[Byte](indices.length)
              val starts = Array(0, 4, 2, 1); val steps = Array(8, 8, 4, 2)
              var src = 0
              var p = 0
              while (p < 4) {
                var y = starts(p)
                while (y < h) {
                  System.arraycopy(indices, src * w, natural, y * w, w)
                  src += 1
                  y += steps(p)
                }
                p += 1
              }
              indices = natural
            }
            var i = 0
            while (i < indices.length) {
              require((indices(i) & 0xff) < nColors,
                s"corrupt GIF: pixel index ${indices(i) & 0xff} outside " +
                  s"the $nColors-entry palette")
              i += 1
            }
            // binary transparency renders WHITE (composite of a fully
            // transparent pixel) — applied in a palette copy
            val pal =
              if (transparentNext >= 0 && transparentNext < nColors) {
                val t = table0.clone()
                t(transparentNext * 3) = 255.toByte
                t(transparentNext * 3 + 1) = 255.toByte
                t(transparentNext * 3 + 2) = 255.toByte
                t
              } else table0
            first = GifImage(w, h, pal, indices)
          }
          transparentNext = -1
        case other => throw new IllegalArgumentException(
          s"corrupt GIF: unknown block introducer 0x${"%02x".format(other)}")
      }
    }
    require(off == bytes.length, "trailing bytes after GIF trailer")
    require(first != null, "GIF contains no image frame")
    first.copy(nFrames = nFrames)
  }

  // -------------------------------------------- cross-format (p11) kit

  /** The shared 8×8 gray raster of content group g (pure formula — the
    * p11 oracle's closed form): pixel i = ((g·13 + i·7) % 16) · 17, a
    * 16-level gray pattern expressible LOSSLESSLY in both containers
    * (PNG stores truecolor (v,v,v); GIF stores index v/17 against the
    * 16-gray palette). */
  private[graft] def crossRasterOf(group: Long): Array[Byte] =
    Array.tabulate(64)(i => (((group * 13 + i * 7) % 16) * 17).toByte)

  private[graft] val GrayPalette: Array[Byte] =
    Array.tabulate(48)(b => ((b / 3) * 17).toByte)

  /** Synthesize content group docId/2 in the container chosen by docId
    * parity: even → PNG, odd → GIF. Adjacent ids carry the SAME pixels
    * in DIFFERENT formats — the p11 dedup must reunite them. */
  private[graft] def crossFormatBytes(docId: Long): Array[Byte] = {
    val raster = crossRasterOf(docId / 2)
    if (docId % 2 == 0)
      pngEncode(8, 8, raster.flatMap(v => Array(v, v, v)))
    else
      gifEncode(8, 8, GrayPalette, raster.map(v => (v & 0xff) / 17))
  }

  /** Sniff + decode either image container to its 8-bit gray raster:
    * PNG by signature (R channel — the p11 rasters are gray, R=G=B),
    * GIF87a by header (palette R via index). Anything else fails by
    * name; both decoders keep their full corruption contracts. */
  private[graft] def decodeGrayOf(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.length >= 6, "image too short to sniff a container")
    if ((bytes(0) & 0xff) == 137 && bytes(1) == 'P'.toByte) {
      val v = pngDecodeOf(bytes)
      Array.tabulate(v.width * v.height)(i => v.pixels(3 * i))
    } else if (new String(bytes, 0, 6, "ASCII").startsWith("GIF8")) {
      val v = gifDecodeOf(bytes)
      Array.tabulate(v.indices.length)(i =>
        v.palette(3 * (v.indices(i) & 0xff)))
    } else throw new IllegalArgumentException(
      "unknown image container (not PNG or GIF87a)")
  }

  /** Oracle: every column from the synthesis formula only — no bytes. */
  val m12Sql: String =
    """WITH p AS (
      |  SELECT doc_id, 6 + doc_id % 7 AS w, 4 + doc_id % 5 AS h
      |  FROM documents
      |), px AS (
      |  SELECT doc_id, w, h,
      |    CASE WHEN k // w = h - 1 THEN doc_id % 16
      |         ELSE (doc_id * 5 + (k // w) * 11 + (k % w) * 7) % 16
      |    END AS idx
      |  FROM (SELECT doc_id, w, h, unnest(range(0, w * h)) AS k FROM p)
      |), s AS (
      |  SELECT doc_id, w, h, SUM(idx) AS px_index_sum,
      |    SUM((idx * 23 + doc_id) % 256 + (idx * 31 + doc_id) % 256
      |      + (idx * 47 + doc_id) % 256) AS px_rgb_sum
      |  FROM px GROUP BY 1, 2, 3)
      |SELECT doc_id,
      |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
      |  CAST(16 AS INTEGER) AS n_colors,
      |  CAST(px_index_sum AS BIGINT) AS px_index_sum,
      |  CAST(px_rgb_sum AS BIGINT) AS px_rgb_sum,
      |  CAST((doc_id * 5) % 16 AS BIGINT) AS tl_idx,
      |  CAST(doc_id % 16 AS BIGINT) AS br_idx
      |FROM s ORDER BY doc_id""".stripMargin

  // ------------------------------------------ mixed-admission (p13) kit

  /** Synthesize content group docId/3 in one of THREE containers chosen
    * by docId % 3 — the p11 pair widened to the mixed-ingest case: PNG
    * 8×8 truecolor, GIF87a 8×8 indexed, or JPEG 64×64 DC-only gray whose
    * 8×8 blocks are CONSTANT at the raster's 64 pixels. The JPEG leg
    * carries the SAME content at 8× the resolution, so the admission
    * path must resolution-normalize (block-mean downsample) before
    * hashing — the real pHash pipeline's resize step, exact here because
    * DC-only quantization-1 blocks decode to their constant exactly. */
  private[graft] def mixedFormatBytes(docId: Long): Array[Byte] = {
    val raster = crossRasterOf(docId / 3)
    (docId % 3) match {
      case 0 => pngEncode(8, 8, raster.flatMap(v => Array(v, v, v)))
      case 1 => gifEncode(8, 8, GrayPalette, raster.map(v => (v & 0xff) / 17))
      case _ =>
        // even ids: baseline with restarts (ids = 2 mod 12: 4:2:2 COLOR
        // with neutral chroma — r14); odd ids: PROGRESSIVE (SOF2) —
        // identical pixels, so the admission hash is container-blind
        if (docId % 2 == 1)
          Jpeg.encodeGrayDcOnlyProgressive(64, 64, b => raster(b) & 0xff)
        else if (docId % 12 == 2)
          Jpeg.encodeColor422DcOnly(64, 64, b => raster(b) & 0xff)
        else Jpeg.encodeGrayDcOnly(64, 64, b => raster(b) & 0xff,
          restartInterval = 2)
    }
  }

  /** m13 dispatch + p11 normalization + resolution resize: sniff the
    * container by magic bytes, decode through its REAL codec (full
    * corruption contracts), normalize to gray, and block-mean downsample
    * to the canonical 8×8 pHash raster. Dims must be 8-divisible (the
    * canonical-raster contract — anything else fails by name rather
    * than resampling approximately). */
  private[graft] def mixedGrayOf(bytes: Array[Byte]): Array[Byte] =
    mixedProbeGrayOf(bytes)._2

  /** [[mixedGrayOf]] plus the sniffed container name — ONE decode serves
    * both the probe column and the normalization (p13's admission path
    * decodes every payload exactly once). */
  /** st12's payload synthesizer: the mixed-container trio (PNG 8×8 /
    * GIF87a 8×8 / JPEG 64×64 DC-only, chosen by docId % 3) over a
    * content space built for ADMISSION semantics — groups g = docId/3
    * with g % 4 == 3 carry a UNIQUE raster (the group ordinal base-16
    * encoded in the first four pixels), the rest draw from a 16-raster
    * recurring pool. A standing corpus therefore contains every pool
    * family (arriving pool docs REJECT) while arriving unique-group
    * docs carry never-seen hashes (ADMIT) — both verdicts are
    * guaranteed non-vacuous at any split. Pixels stay multiples of 17
    * so the GIF 16-level palette and JPEG DC-only blocks are exact. */
  private[graft] def st12RasterOf(g: Long): Array[Byte] = {
    val seed = (if (g % 4 == 3) 16L + g / 4 else g % 16) % 65536L
    Array.tabulate(64) { i =>
      val v =
        if (i < 4) ((seed >> (4 * i)) & 15L) * 17
        else ((seed * 13 + i * 7) % 16) * 17
      v.toByte
    }
  }

  private[graft] def st12MediaBytes(docId: Long): Array[Byte] = {
    val raster = st12RasterOf(docId / 3)
    (docId % 3) match {
      case 0 => pngEncode(8, 8, raster.flatMap(v => Array(v, v, v)))
      case 1 => gifEncode(8, 8, GrayPalette, raster.map(v => (v & 0xff) / 17))
      case _ =>
        // odd ids: PROGRESSIVE (SOF2); ids = 2 mod 12: 4:2:2 COLOR with
        // neutral chroma (r14 — decoded RGB = luma ×3, so the admission
        // hash stays container- and sampling-blind); other evens:
        // baseline with restarts
        if (docId % 2 == 1)
          Jpeg.encodeGrayDcOnlyProgressive(64, 64, b => raster(b) & 0xff)
        else if (docId % 12 == 2)
          Jpeg.encodeColor422DcOnly(64, 64, b => raster(b) & 0xff)
        else Jpeg.encodeGrayDcOnly(64, 64, b => raster(b) & 0xff,
          restartInterval = 2)
    }
  }

  /** Decode + normalize + perceptually hash a (doc_id, bytes) media
    * frame: each payload is sniffed and decoded through its container's
    * REAL codec, block-mean-normalized to the canonical 8×8 raster
    * ([[mixedProbeGrayOf]] — one decode per payload) and hashed with
    * the codegen'd `wht_phash`. The p13 admission kernel factored out
    * so the batch query (p13/st12) and the streaming foreachBatch twin
    * ([[graft.streaming.StreamingPipelines.mediaAdmitBatch]]) share
    * one code path. Caller must have run GraftFunctions.register. */
  private[graft] def mediaHashOf(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("container", StringType, nullable = false),
      StructField("gray", BinaryType, nullable = false)))
    df.select(col("doc_id"), col("bytes"))
      .mapPartitions { rows =>
        rows.map { r =>
          val (container, gray) =
            mixedProbeGrayOf(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), container, gray)
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
      .select(col("doc_id"), col("container"),
        call_function("wht_phash", col("gray"), lit(8), lit(8)).as("phash"))
  }

  private[graft] def mixedProbeGrayOf(bytes: Array[Byte]): (String, Array[Byte]) = {
    require(bytes.length >= 6, "image too short to sniff a container")
    val (container, gray, w, h): (String, Array[Byte], Int, Int) =
      if ((bytes(0) & 0xff) == 137 && bytes(1) == 'P'.toByte) {
        val v = pngDecodeOf(bytes)
        ("png", Array.tabulate(v.width * v.height)(i => v.pixels(3 * i)),
          v.width, v.height)
      } else if (new String(bytes, 0, 6, "ASCII").startsWith("GIF8")) {
        val v = gifDecodeOf(bytes)
        ("gif", Array.tabulate(v.indices.length)(i =>
          v.palette(3 * (v.indices(i) & 0xff))), v.width, v.height)
      } else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
        val v = Jpeg.decode(bytes)
        // color JPEGs (the r14 4:2:2 legs) normalize by channel 0, the
        // same convention as the PNG leg above — the admission fixtures
        // carry neutral chroma, so R = G = B = luma exactly
        val g =
          if (v.nComponents == 1) v.pixels
          else Array.tabulate(v.width * v.height)(i => v.pixels(3 * i))
        ("jpeg", g, v.width, v.height)
      } else throw new IllegalArgumentException(
        "unknown image container (not PNG/GIF87a/JPEG)")
    require(w % 8 == 0 && h % 8 == 0,
      s"mixed admission: dims ${w}x$h not 8-divisible — cannot block-mean " +
        "to the canonical 8x8 raster exactly")
    val bw = w / 8; val bh = h / 8
    (container, Array.tabulate(64) { k =>
      val bx = k % 8; val by = k / 8
      var sum = 0L; var y = 0
      while (y < bh) {
        var x = 0
        while (x < bw) {
          sum += (gray((by * bh + y) * w + bx * bw + x) & 0xff); x += 1
        }
        y += 1
      }
      (sum / (bw * bh)).toByte
    })
  }

  // ---------------------------------------------------------------- m13

  /** m13: unified media PROBE — the ingest triage stage (the ffprobe
    * analog): ONE sniffing kernel identifies any of the engine's five
    * real containers by magic bytes (PPM `P6`, PNG signature, GIF87a,
    * RIFF/WAVE, RIFF/AVI) and reports normalized metadata — container,
    * width, height, n_units (pixels for rasters, samples for audio,
    * frames for video; −1 where a dimension has no meaning). Every
    * branch runs the container's REAL parser (decodePpm / pngDecodeOf /
    * gifDecodeOf / decodeWav / aviIndexOf) with its full corruption
    * contract — a probe that trusts headers it did not validate reports
    * garbage downstream. The synthesis picks the container by
    * doc_id % 5, so the oracle derives every column from the five
    * per-container formulas without seeing bytes: a hash match proves
    * sniffing DISPATCHED correctly and all five parsers ran.
    *
    * Scale shape: map-only (one scan, per-row kernel, no shuffle before
    * the presentation sort) — the first stage of any mixed-media ingest
    * at 100 TB, where routing by container decides every later stage. */
  def m13MediaProbe(s: SparkSession, d: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("container", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_units", LongType, nullable = false)))
    documentsUnspread(s, d).select(col("doc_id")).orderBy("doc_id") // sort below the decode (see m01)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          // payload synthesized then GENUINELY sniffed + parsed
          val p = probeOf(m13Bytes(id))
          Row(id, p.container, p.width, p.height, p.nUnits)
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** A mixed-media corpus: container chosen by doc_id % 6, payload from
    * that container's existing synthesis (JPEG joined the mix in r10). */
  private[graft] def m13Bytes(docId: Long): Array[Byte] =
    (docId % 6) match {
      case 0 => ppmBytes(docId)
      case 1 => wavBytes(docId)
      case 2 => aviBytes(docId)
      case 3 => pngBytes(docId)
      case 4 => gifBytes(docId)
      case _ => jpegBytes(docId)
    }

  private[graft] final case class BmpImage(width: Int, height: Int,
      /** w·h·3 RGB, natural (top-down) row order. */
      pixels: Array[Byte])

  /** Decode a BMP (r13 — the seventh container): BITMAPFILEHEADER +
    * BITMAPINFOHEADER, uncompressed (BI_RGB) 8-bit palette / 24-bit /
    * 32-bit pixels, bottom-up AND top-down row orders, 4-byte row
    * padding. Every header-supplied offset/size is bounded before use;
    * compressed variants (RLE, bitfields) fail by name. */
  private[graft] def bmpDecodeOf(bytes: Array[Byte]): BmpImage = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP file")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOff = bb.getInt(10)
    val hdrSize = bb.getInt(14)
    require(hdrSize >= 40, s"unsupported BMP header size $hdrSize")
    val width = bb.getInt(18)
    val heightRaw = bb.getInt(22)
    val topDown = heightRaw < 0
    val height = math.abs(heightRaw)
    require(width > 0 && height > 0 &&
      width.toLong * height * 3 <= (1L << 26),
      s"unsupported BMP dimensions ${width}x$heightRaw")
    require(bb.getShort(26) == 1, "BMP planes != 1")
    val bpp = bb.getShort(28).toInt & 0xFFFF
    require(bpp == 8 || bpp == 24 || bpp == 32,
      s"unsupported BMP bit depth $bpp (8/24/32 are)")
    val compression = bb.getInt(30)
    require(compression == 0,
      s"unsupported BMP compression $compression (BI_RGB only)")
    // palette: BGRA quads after the info header
    val palOff = 14 + hdrSize
    val declared = bb.getInt(46) // colors used (0 = 2^bpp)
    val palN =
      if (bpp != 8) 0
      else if (declared > 0) declared else 256
    require(palN <= 256 && palOff + 4L * palN <= bytes.length,
      s"corrupt BMP: $palN palette entries exceed file bounds")
    val rowBytes = (width * bpp / 8 + 3) & ~3
    require(dataOff >= palOff + 4 * palN &&
      dataOff + rowBytes.toLong * height <= bytes.length,
      s"corrupt BMP: pixel data at $dataOff ($rowBytes B/row x $height) " +
        "exceeds file bounds")
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = dataOff + (if (topDown) y else height - 1 - y) * rowBytes
      var x = 0
      while (x < width) {
        val o = (y * width + x) * 3
        bpp match {
          case 8 =>
            val idx = bytes(srcRow + x) & 0xff
            require(idx < palN,
              s"corrupt BMP: palette index $idx beyond $palN entries")
            out(o) = bytes(palOff + idx * 4 + 2)     // R (BGRA quads)
            out(o + 1) = bytes(palOff + idx * 4 + 1) // G
            out(o + 2) = bytes(palOff + idx * 4)     // B
          case 24 =>
            out(o) = bytes(srcRow + x * 3 + 2)
            out(o + 1) = bytes(srcRow + x * 3 + 1)
            out(o + 2) = bytes(srcRow + x * 3)
          case 32 =>
            out(o) = bytes(srcRow + x * 4 + 2)
            out(o + 1) = bytes(srcRow + x * 4 + 1)
            out(o + 2) = bytes(srcRow + x * 4)
        }
        x += 1
      }
      y += 1
    }
    BmpImage(width, height, out)
  }

  private[graft] final case class MediaProbe(container: String, width: Int,
      height: Int, nUnits: Long)

  /** Sniff a payload's container by magic bytes and run its REAL parser.
    * Unknown containers fail by name. */
  private[graft] def probeOf(bytes: Array[Byte]): MediaProbe = {
    require(bytes.length >= 12, "payload too short to sniff a container")
    def ascii(off: Int, len: Int) = new String(bytes, off, len, "ASCII")
    if (ascii(0, 2) == "P6" || ascii(0, 2) == "P5") {
      val (w, h, _, _, _) = decodePpm(bytes)
      MediaProbe("ppm", w, h, w.toLong * h)
    } else if ((bytes(0) & 0xff) == 137 && bytes(1) == 'P'.toByte) {
      val v = pngDecodeOf(bytes)
      MediaProbe("png", v.width, v.height, v.width.toLong * v.height)
    } else if (ascii(0, 3) == "GIF") {
      val v = gifDecodeOf(bytes)
      MediaProbe("gif", v.width, v.height, v.width.toLong * v.height)
    } else if (ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE") {
      val (_, n, _, _) = decodeWav(bytes)
      MediaProbe("wav", -1, -1, n)
    } else if (ascii(0, 4) == "RIFF" && ascii(8, 4) == "AVI ") {
      val v = aviIndexOf(bytes)
      MediaProbe("avi", v.width, v.height, v.nFrames)
    } else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      val v = Jpeg.decode(bytes)
      MediaProbe("jpeg", v.width, v.height, v.width.toLong * v.height)
    } else if (bytes(0) == 'B' && bytes(1) == 'M') {
      val v = bmpDecodeOf(bytes)
      MediaProbe("bmp", v.width, v.height, v.width.toLong * v.height)
    } else if ((bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') ||
        ((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xE0) == 0xE0)) {
      // MP3 (r14): ID3v2-prefixed or bare frame sync — the JPEG branch
      // above claims 0xFFD8 first (0xD8 fails the 0xE0 sync mask anyway)
      val v = Mp3.index(bytes)
      MediaProbe("mp3", -1, -1, v.nFrames.toLong)
    } else if ((ascii(0, 2) == "II" && bytes(3) == 0 &&
        ((bytes(2) & 0xFF) == 42 || (bytes(2) & 0xFF) == 43)) ||
        (ascii(0, 2) == "MM" && bytes(2) == 0 &&
          ((bytes(3) & 0xFF) == 42 || (bytes(3) & 0xFF) == 43))) {
      // TIFF/GeoTIFF (r15c), classic or BigTIFF — the ninth container;
      // n_units counts the FULL-RES pixels (a COG's overview pages are
      // derived data, not corpus mass)
      val v = Tiff.decode(bytes)
      MediaProbe("tiff", v.width, v.height, v.width.toLong * v.height)
    } else throw new IllegalArgumentException(
      "unknown media container (not PPM/PNG/GIF/WAVE/AVI/JPEG/BMP/MP3/TIFF)")
  }

  /** Oracle: container + metadata from the six synthesis formulas. */
  val m13Sql: String =
    """SELECT doc_id,
      |  CASE doc_id % 6 WHEN 0 THEN 'ppm' WHEN 1 THEN 'wav'
      |    WHEN 2 THEN 'avi' WHEN 3 THEN 'png' WHEN 4 THEN 'gif'
      |    ELSE 'jpeg' END AS container,
      |  CAST(CASE doc_id % 6 WHEN 0 THEN 8 + doc_id % 5 WHEN 1 THEN -1
      |    WHEN 2 THEN 8 + doc_id % 5 WHEN 3 THEN 4 + doc_id % 5
      |    WHEN 4 THEN 6 + doc_id % 7
      |    ELSE 8 * (2 + doc_id % 3) END AS INTEGER) AS width,
      |  CAST(CASE doc_id % 6 WHEN 0 THEN 6 + doc_id % 4 WHEN 1 THEN -1
      |    WHEN 2 THEN 6 + doc_id % 4 WHEN 3 THEN 3 + doc_id % 4
      |    WHEN 4 THEN 4 + doc_id % 5
      |    ELSE 8 * (1 + doc_id % 2) END AS INTEGER) AS height,
      |  CAST(CASE doc_id % 6
      |    WHEN 0 THEN (8 + doc_id % 5) * (6 + doc_id % 4)
      |    WHEN 1 THEN 256 + doc_id % 64
      |    WHEN 2 THEN 3 + doc_id % 6
      |    WHEN 3 THEN (4 + doc_id % 5) * (3 + doc_id % 4)
      |    WHEN 4 THEN (6 + doc_id % 7) * (4 + doc_id % 5)
      |    ELSE 64 * (2 + doc_id % 3) * (1 + doc_id % 2)
      |    END AS BIGINT) AS n_units
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m14

  /** m14: REAL baseline-JPEG decode (no stub) — the dominant still-image
    * format of web-scale multimodal corpora, and the first LOSSY-DCT
    * codec in the engine (PNG/GIF are entropy-only). Each doc carries a
    * synthesized baseline JPEG — marker stream (SOI, DQT, SOF0, DHT,
    * optional DRI, SOS, RSTn, EOI), custom canonical Huffman tables,
    * byte-stuffed entropy data — and the kernel DECODES it end to end
    * through [[Jpeg.decode]]: the full marker walk, canonical Huffman
    * decode, DC prediction with restart resets, dequantization and the
    * 2-D IDCT. Fixture blocks are DC-only at quantization 1, so the
    * IDCT output is the exact closed-form constant per 8×8 block: the
    * DuckDB oracle recomputes every statistic WITHOUT decoding, and a
    * hash match proves the Huffman decode, predictor chain, restart
    * handling and IDCT all genuinely ran (JpegSpec additionally
    * cross-validates both encode and decode against the JDK's ImageIO
    * codec, including libjpeg-style AC tables and 4:2:0 color).
    *
    * Scale shape: map-only, like m11/m12 — decode-bound at 100 TB. */
  def m14JpegDecode(s: SparkSession, d: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_comps", IntegerType, nullable = false),
      StructField("n_blocks", LongType, nullable = false),
      StructField("px_sum", LongType, nullable = false),
      StructField("px_mean_milli", LongType, nullable = false),
      StructField("tl_px", LongType, nullable = false),
      StructField("br_px", LongType, nullable = false),
      StructField("n_restarts", LongType, nullable = false)))
    documentsUnspread(s, d).select(col("doc_id")).orderBy("doc_id") // sort below the decode (see m01)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          // payload synthesized then GENUINELY re-decoded from bytes
          val v = Jpeg.decode(jpegBytes(id))
          var sum = 0L
          var i = 0
          while (i < v.pixels.length) { sum += v.pixels(i) & 0xff; i += 1 }
          Row(id, v.width, v.height, v.nComponents,
            (v.width / 8).toLong * (v.height / 8),
            sum, 1000L * sum / v.pixels.length,
            (v.pixels(0) & 0xff).toLong,
            (v.pixels(v.pixels.length - 1) & 0xff).toLong,
            v.nRestarts)
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** Synthesized JPEG parameters (pure functions of doc_id — the
    * oracle's closed form): w = 8·(2 + id%3), h = 8·(1 + id%2),
    * grayscale; 8×8 block b (scan order) is the exact constant
    * (id·17 + b·29) % 256; EVEN ids carry a restart interval of 2
    * (RST markers + DC predictor resets); ids ≡ 1 (mod 4) are
    * PROGRESSIVE (SOF2, three scans: DC first at Al=1, DC refinement,
    * AC band — the Annex-G path decodes the SAME closed-form pixels,
    * so the oracle is unchanged and a hash match proves the
    * spectral-selection + successive-approximation machinery ran);
    * ids ≡ 3 (mod 12) are 4:2:2 COLOR (r14 — luma 2×1, chroma 1×1
    * at the neutral constant 128, so the interleaved two-luma-blocks-
    * per-MCU layout and half-width chroma upsampling genuinely run
    * while decoded RGB is the SAME closed-form luma replicated ×3;
    * these ids have id%3 == 0, keeping w = 16 a legal 4:2:2 MCU
    * multiple, and the same width/height formulas). */
  private[graft] def jpegBytes(docId: Long): Array[Byte] = {
    val w = 8 * (2 + docId % 3).toInt
    val h = 8 * (1 + docId % 2).toInt
    val bv = (b: Int) => ((docId * 17 + b * 29) % 256).toInt
    if (docId % 4 == 1) Jpeg.encodeGrayDcOnlyProgressive(w, h, bv)
    else if (docId % 12 == 3) Jpeg.encodeColor422DcOnly(w, h, bv)
    else Jpeg.encodeGrayDcOnly(w, h, bv,
      restartInterval = if (docId % 2 == 0) 2 else 0)
  }

  val m14Sql: String =
    """WITH p AS (
      |  SELECT doc_id, 2 + doc_id % 3 AS bw, 1 + doc_id % 2 AS bh
      |  FROM documents
      |), s AS (
      |  SELECT doc_id, bw, bh,
      |    SUM((doc_id * 17 + b * 29) % 256) AS block_sum
      |  FROM (SELECT doc_id, bw, bh, unnest(range(0, bw * bh)) AS b FROM p)
      |  GROUP BY 1, 2, 3)
      |SELECT doc_id,
      |  CAST(bw * 8 AS INTEGER) AS width, CAST(bh * 8 AS INTEGER) AS height,
      |  CAST(CASE WHEN doc_id % 12 = 3 THEN 3 ELSE 1 END AS INTEGER)
      |    AS n_comps,
      |  CAST(bw * bh AS BIGINT) AS n_blocks,
      |  CAST(64 * block_sum *
      |    CASE WHEN doc_id % 12 = 3 THEN 3 ELSE 1 END AS BIGINT) AS px_sum,
      |  CAST(1000 * 64 * block_sum // (bw * bh * 64) AS BIGINT) AS px_mean_milli,
      |  CAST((doc_id * 17) % 256 AS BIGINT) AS tl_px,
      |  CAST((doc_id * 17 + (bw * bh - 1) * 29) % 256 AS BIGINT) AS br_px,
      |  CAST(CASE WHEN doc_id % 2 = 0 THEN (bw * bh - 1) // 2 ELSE 0 END
      |    AS BIGINT) AS n_restarts
      |FROM s ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m15

  /** m15: REAL MP3 frame INDEX (r14 — the audio-corpus triage stage
    * next to m10's AVI demux): each doc carries a synthesized MPEG
    * Layer-III stream — real frame headers (version/bitrate/sample-rate/
    * padding arithmetic), optional ID3v2 prefix and ID3v1 trailer, CBR
    * and VBR mixes — and the kernel genuinely WALKS it through
    * [[Mp3.index]]. The oracle recomputes every column from the
    * synthesis formulas, including the TOTAL BYTE count as the SQL sum
    * of per-frame lengths — one wrong bitrate-table entry or padding
    * bit desyncs the walk and splits the hash.
    *
    * Scale shape: map-only, like the other media indexers. */
  def m15Mp3Index(s: SparkSession, d: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("mpeg_version", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("bitrate_kbps", IntegerType, nullable = false),
      StructField("duration_ms", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("has_id3v2", IntegerType, nullable = false),
      StructField("has_id3v1", IntegerType, nullable = false),
      StructField("vbr_tag", StringType, nullable = false),
      StructField("vbr_frames", IntegerType, nullable = false),
      StructField("vbr_bytes", LongType, nullable = false)))
    documentsUnspread(s, d).select(col("doc_id")).orderBy("doc_id") // sort below the decode (see m01)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val v = Mp3.index(mp3Bytes(id))
          Row(id, v.nFrames, v.mpegVersion, v.sampleRate, v.bitrateKbps,
            v.durationMs, v.nBytes,
            if (v.hasId3v2) 1 else 0, if (v.hasId3v1) 1 else 0,
            v.vbrTag, v.vbrFrames, v.vbrBytes)
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** m15 synthesis (pure functions of doc_id — the oracle's closed
    * form): n = 30 + id%20 Layer-III frames; MPEG1 unless id ≡ 1 mod 3
    * (then MPEG2 — whose sample-rate index is then always 1 = 24 kHz);
    * sample-rate index id%3; EVEN ids are CBR at bitrate index 9
    * (128 / 80 kbps), odd ids VBR cycling indexes 1..3; ids ≡ 1 mod 4
    * carry a 17-byte ID3v2 tag, ids ≡ 2 mod 5 an ID3v1 trailer. */
  private[graft] def mp3Bytes(docId: Long): Array[Byte] = {
    val n = (30 + docId % 20).toInt
    val mpeg1 = docId % 3 != 1
    // r15 VBR headers: MPEG1 VBR streams carry Xing (or VBRI when
    // id ≡ 0 mod 5), CBR ids divisible by 6 carry the LAME "Info" tag;
    // MPEG2 VBR streams stay bare (their 8 kbps first frame is smaller
    // than the header — the realistic low-bitrate case)
    val tag =
      if (docId % 2 == 1 && docId % 3 != 1)
        (if (docId % 5 == 0) "vbri" else "xing")
      else if (docId % 2 == 0 && docId % 6 == 0) "info"
      else "none"
    Mp3.encode(n, mpeg1, (docId % 3).toInt,
      k => if (docId % 2 == 0) 9 else 1 + (k % 3),
      id3v2Size = if (docId % 4 == 1) 17 else -1,
      id3v1 = docId % 5 == 2,
      vbrTag = tag)
  }

  val m15Sql: String =
    """WITH p AS (
      |  SELECT doc_id, 30 + doc_id % 20 AS n,
      |    (doc_id % 3 != 1) AS mpeg1, doc_id % 3 AS sridx
      |  FROM documents
      |), geom AS (
      |  SELECT doc_id, n, mpeg1,
      |    CASE WHEN mpeg1 THEN
      |      CASE sridx WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END
      |    ELSE 24000 END AS sr,
      |    CASE WHEN mpeg1 THEN 1152 ELSE 576 END AS spf
      |  FROM p
      |), fr AS (
      |  SELECT doc_id, n, mpeg1, sr, spf, unnest(range(0, n)) AS k
      |  FROM geom
      |), flen AS (
      |  SELECT doc_id, n, mpeg1, sr, spf, k,
      |    1000 * CASE
      |      WHEN doc_id % 2 = 0 THEN CASE WHEN mpeg1 THEN 128 ELSE 80 END
      |      ELSE CASE WHEN mpeg1 THEN
      |             CASE k % 3 WHEN 0 THEN 32 WHEN 1 THEN 40 ELSE 48 END
      |           ELSE CASE k % 3 WHEN 0 THEN 8 WHEN 1 THEN 16 ELSE 24 END
      |           END
      |      END AS br
      |  FROM fr
      |)
      |SELECT doc_id,
      |  CAST(max(n) AS INTEGER) AS n_frames,
      |  CAST(CASE WHEN max(CAST(mpeg1 AS INT)) = 1 THEN 1 ELSE 2 END
      |    AS INTEGER) AS mpeg_version,
      |  CAST(max(sr) AS INTEGER) AS sample_rate,
      |  CAST(CASE WHEN doc_id % 2 = 0
      |    THEN CASE WHEN max(CAST(mpeg1 AS INT)) = 1 THEN 128 ELSE 80 END
      |    ELSE -1 END AS INTEGER) AS bitrate_kbps,
      |  CAST(max(n) * max(spf) * 1000 // max(sr) AS BIGINT) AS duration_ms,
      |  CAST(SUM((CASE WHEN mpeg1 THEN 144 * br // sr
      |            ELSE 72 * br // sr END) + k % 2) AS BIGINT) AS n_bytes,
      |  CAST(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END AS INTEGER)
      |    AS has_id3v2,
      |  CAST(CASE WHEN doc_id % 5 = 2 THEN 1 ELSE 0 END AS INTEGER)
      |    AS has_id3v1,
      |  CASE WHEN doc_id % 2 = 1 AND doc_id % 3 <> 1 THEN
      |    CASE WHEN doc_id % 5 = 0 THEN 'vbri' ELSE 'xing' END
      |  WHEN doc_id % 2 = 0 AND doc_id % 6 = 0 THEN 'info'
      |  ELSE 'none' END AS vbr_tag,
      |  CAST(CASE WHEN (doc_id % 2 = 1 AND doc_id % 3 <> 1)
      |         OR (doc_id % 2 = 0 AND doc_id % 6 = 0)
      |    THEN max(n) ELSE -1 END AS INTEGER) AS vbr_frames,
      |  CAST(CASE WHEN (doc_id % 2 = 1 AND doc_id % 3 <> 1)
      |         OR (doc_id % 2 = 0 AND doc_id % 6 = 0)
      |    THEN SUM((CASE WHEN mpeg1 THEN 144 * br // sr
      |              ELSE 72 * br // sr END) + k % 2)
      |    ELSE -1 END AS BIGINT) AS vbr_bytes
      |FROM flen GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m16

  /** m16: REAL TIFF/GeoTIFF decode (r15 — the raster twin of m14's
    * JPEG and m15's MP3 stages; GeoTIFF is what the reference's users
    * feed xarray through rioxarray): each doc carries a synthesized
    * TIFF — classic and BigTIFF, both byte orders, strip and tile
    * layouts, None/LZW/Deflate/PackBits compression, predictor 2,
    * 8/16-bit gray and RGB, GeoTIFF pixel-scale/tiepoint/EPSG keys —
    * and the kernel genuinely WALKS it through [[Tiff.decode]]: IFD
    * parse, segment decompression, predictor undo, pixel assembly.
    * The oracle recomputes every column — including the PIXEL SUM over
    * the whole raster — from the synthesis formulas; one wrong LZW
    * width bump or predictor pass splits the hash.
    *
    * Scale shape: map-only, like the other media decoders. */
  def m16TiffDecode(s: SparkSession, d: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("byte_order", StringType, nullable = false),
      StructField("compression", IntegerType, nullable = false),
      StructField("predictor", IntegerType, nullable = false),
      StructField("layout", StringType, nullable = false),
      StructField("n_segments", IntegerType, nullable = false),
      StructField("bits", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("px_sum", LongType, nullable = false),
      StructField("tl_px", IntegerType, nullable = false),
      StructField("br_px", IntegerType, nullable = false),
      StructField("model_type", IntegerType, nullable = false),
      StructField("epsg", IntegerType, nullable = false),
      StructField("scale_micro", LongType, nullable = false),
      StructField("lon0_milli", LongType, nullable = false),
      StructField("lat0_milli", LongType, nullable = false),
      StructField("big_tiff", IntegerType, nullable = false),
      StructField("n_pages", IntegerType, nullable = false)))
    documentsUnspread(s, d).select(col("doc_id")).orderBy("doc_id") // sort below the decode (see m01)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val v = Tiff.decode(tiffBytes(id))
          var sum = 0L
          var i = 0
          while (i < v.pixels.length) { sum += v.pixels(i); i += 1 }
          Row(id, v.width, v.height, if (v.littleEndian) "II" else "MM",
            v.compression, v.predictor, if (v.tiled) "tile" else "strip",
            v.nSegments, v.bits, v.samples, sum,
            v.pixels(0), v.pixels(v.pixels.length - 1),
            v.modelType, v.epsg,
            math.round(v.scaleX * 1e6),
            math.round(v.tieX * 1e3), math.round(v.tieY * 1e3),
            if (v.bigTiff) 1 else 0, v.nPages)
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** m16 synthesis (pure functions of doc_id — the oracle's closed
    * form): w = 24+8(id%5), h = 16+8(id%3); little-endian iff even;
    * RGB iff id ≡ 2 mod 4; 16-bit gray iff id ≡ 3 mod 6 (disjoint from
    * RGB); 16x16 tiles iff id ≡ 0 mod 3 else 7-row strips (short last
    * strip); compression cycles None/LZW/Deflate/PackBits/LZW+pred2
    * on id%5; BigTIFF iff id ≡ 7 mod 8; projected (EPSG:32633) iff
    * id ≡ 0 mod 7 else geographic (EPSG:4326); pixel scale
    * 0.25(1+id%4) degrees, tiepoint (-180+id%360, 90-id%180);
    * px(x,y,c) = (7x+13y+17id+41c) mod 256, times 257 when 16-bit;
    * ids = 4 mod 9 carry a COG-style half-resolution overview page
    * (n_pages = 2), decoded-past by the first-IFD read. */
  private[graft] def tiffBytes(docId: Long): Array[Byte] = {
    val w = (24 + (docId % 5) * 8).toInt
    val h = (16 + (docId % 3) * 8).toInt
    val rgb = docId % 4 == 2
    val bits = if (docId % 6 == 3) 16 else 8
    val (comp, pred) = (docId % 5) match {
      case 0 => (1, 1)
      case 1 => (5, 1)
      case 2 => (8, 1)
      case 3 => (32773, 1)
      case _ => (5, 2)
    }
    val geographic = docId % 7 != 0
    val px = (x: Int, y: Int, c: Int) => {
      val v = ((x * 7 + y * 13 + docId * 17 + c * 41) % 256).toInt
      if (bits == 16) v * 257 else v
    }
    val geo = Some(Tiff.Geo(
      0.25 * (1 + docId % 4), 0.25 * (1 + docId % 4),
      (-180 + docId % 360).toDouble, (90 - docId % 180).toDouble,
      if (geographic) 4326 else 32633, geographic))
    val page0 = Tiff.Page(w, h, bits, if (rgb) 3 else 1, comp, pred,
      tile = if (docId % 3 == 0) Some((16, 16)) else None,
      rowsPerStrip = 7, px = px, geo = geo)
    // ids = 4 mod 9 are two-page COGs: the full-res raster plus one
    // half-resolution overview (NewSubfileType 1, decimated pixels) --
    // decode() still reads page 0, so every other column is untouched
    val pages =
      if (docId % 9 == 4)
        Seq(page0, Tiff.Page(w / 2, h / 2, bits, if (rgb) 3 else 1, 1, 1,
          tile = None, rowsPerStrip = h / 2,
          px = (x, y, c) => px(2 * x, 2 * y, c), subfileType = 1))
      else Seq(page0)
    Tiff.encodeMulti(pages, littleEndian = docId % 2 == 0,
      bigTiff = docId % 8 == 7)
  }

  val m16Sql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    24 + (doc_id % 5) * 8 AS w,
      |    16 + (doc_id % 3) * 8 AS h,
      |    (doc_id % 4 = 2) AS rgb,
      |    (doc_id % 6 = 3) AS b16
      |  FROM documents
      |), cell AS (
      |  SELECT doc_id, w, h, rgb, b16,
      |    (i % w) * 7 + (i // w) * 13 + doc_id * 17 AS base
      |  FROM (SELECT doc_id, w, h, rgb, b16, unnest(range(0, w * h)) AS i
      |        FROM p)
      |)
      |SELECT doc_id,
      |  CAST(max(w) AS INTEGER) AS width,
      |  CAST(max(h) AS INTEGER) AS height,
      |  CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
      |  CAST(CASE doc_id % 5 WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 8
      |       WHEN 3 THEN 32773 ELSE 5 END AS INTEGER) AS compression,
      |  CAST(CASE WHEN doc_id % 5 = 4 THEN 2 ELSE 1 END AS INTEGER)
      |    AS predictor,
      |  CASE WHEN doc_id % 3 = 0 THEN 'tile' ELSE 'strip' END AS layout,
      |  CAST(CASE WHEN doc_id % 3 = 0
      |    THEN ((max(w) + 15) // 16) * ((max(h) + 15) // 16)
      |    ELSE (max(h) + 6) // 7 END AS INTEGER) AS n_segments,
      |  CAST(CASE WHEN doc_id % 6 = 3 THEN 16 ELSE 8 END AS INTEGER) AS bits,
      |  CAST(CASE WHEN doc_id % 4 = 2 THEN 3 ELSE 1 END AS INTEGER)
      |    AS n_samples,
      |  CAST(SUM(CASE
      |    WHEN rgb THEN base % 256 + (base + 41) % 256 + (base + 82) % 256
      |    WHEN b16 THEN 257 * (base % 256)
      |    ELSE base % 256 END) AS BIGINT) AS px_sum,
      |  CAST(CASE WHEN doc_id % 6 = 3 THEN 257 * ((doc_id * 17) % 256)
      |       ELSE (doc_id * 17) % 256 END AS INTEGER) AS tl_px,
      |  CAST(CASE
      |    WHEN doc_id % 4 = 2 THEN
      |      ((max(w) - 1) * 7 + (max(h) - 1) * 13 + doc_id * 17 + 82) % 256
      |    WHEN doc_id % 6 = 3 THEN
      |      257 * (((max(w) - 1) * 7 + (max(h) - 1) * 13 + doc_id * 17) % 256)
      |    ELSE ((max(w) - 1) * 7 + (max(h) - 1) * 13 + doc_id * 17) % 256
      |    END AS INTEGER) AS br_px,
      |  CAST(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 2 END AS INTEGER)
      |    AS model_type,
      |  CAST(CASE WHEN doc_id % 7 = 0 THEN 32633 ELSE 4326 END AS INTEGER)
      |    AS epsg,
      |  CAST(250000 * (1 + doc_id % 4) AS BIGINT) AS scale_micro,
      |  CAST((-180 + doc_id % 360) * 1000 AS BIGINT) AS lon0_milli,
      |  CAST((90 - doc_id % 180) * 1000 AS BIGINT) AS lat0_milli,
      |  CAST(CASE WHEN doc_id % 8 = 7 THEN 1 ELSE 0 END AS INTEGER)
      |    AS big_tiff,
      |  CAST(CASE WHEN doc_id % 9 = 4 THEN 2 ELSE 1 END AS INTEGER)
      |    AS n_pages
      |FROM cell GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m16_tiff_decode" -> m16TiffDecode _,
    "m15_mp3_index" -> m15Mp3Index _,
    "m14_jpeg_decode" -> m14JpegDecode _,
    "m13_media_probe" -> m13MediaProbe _,
    "m12_gif_decode" -> m12GifDecode _,
    "m11_png_decode" -> m11PngDecode _,
    "m10_avi_index" -> m10AviIndex _,
    "m08_scene_cuts" -> m08SceneCuts _,
    "m09_audio_fingerprint" -> m09AudioFingerprint _,
    "m07_energy_segments" -> m07EnergySegments _,
    "m01_image_decode" -> m01ImageDecode _,
    "m02_frame_sample" -> m02FrameSample _,
    "m03_resize" -> m03Resize _,
    "m04_embed_stub" -> m04EmbedStub _,
    "m05_wav_decode" -> m05WavDecode _,
    "m06_phash_dedup" -> m06PhashDedup _,
  )

  val oracles: Map[String, String] = Map(
    "m16_tiff_decode" -> m16Sql,
    "m15_mp3_index" -> m15Sql,
    "m14_jpeg_decode" -> m14Sql,
    "m13_media_probe" -> m13Sql,
    "m12_gif_decode" -> m12Sql,
    "m11_png_decode" -> m11Sql,
    "m10_avi_index" -> m10Sql,
    "m09_audio_fingerprint" -> m09Sql,
    "m08_scene_cuts" -> m08Sql,
    "m07_energy_segments" -> m07Sql,
    "m01_image_decode" -> m01Sql,
    "m02_frame_sample" -> m02Sql,
    "m03_resize" -> m03Sql,
    "m04_embed_stub" -> m04Sql,
    "m05_wav_decode" -> m05Sql,
    "m06_phash_dedup" -> m06Sql,
  )
}
