package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.queries.MultiModalOps

/** Library-shaped multimodal API: the container parsers and raster/feature
  * kernels the gated m01…m05 queries validate (real PPM/P6 and RIFF/WAVE
  * byte parsing with synthesis-formula oracle proofs, exact integer box
  * resampling, deterministic frame sampling and feature extraction),
  * applied to ANY DataFrame carrying an opaque binary payload column.
  * Decodes run inside `mapPartitions` — one pass, no shuffle,
  * executor-local byte work — the shape a 100 TB media-preprocessing
  * stage needs. Payloads the parser rejects — and rows with a null id —
  * surface as null feature rows (`ok = false`), not task failures: one
  * corrupt object must not kill a million-file pass. */
object Media {

  /** Read the id column, tolerating nulls: a malformed row degrades to a
    * null-id / ok=false row instead of an executor NPE killing the task. */
  private def idOrNull(r: Row): java.lang.Long =
    if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))

  /** Decode PPM/P6 images: (id, ok, width, height, r_mean, g_mean, b_mean). */
  def decodePpm(df: DataFrame, idCol: String = "doc_id",
                bytesCol: String = "payload"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("ok", BooleanType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("r_mean", LongType, nullable = true),
      StructField("g_mean", LongType, nullable = true),
      StructField("b_mean", LongType, nullable = true)))
    df.select(col(idCol).cast("long"), col(bytesCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = idOrNull(r)
          try {
            if (id == null) throw new IllegalArgumentException("null id")
            val (w, h, rm, gm, bm) = MultiModalOps.decodePpm(r.getAs[Array[Byte]](1))
            Row(id, true, w, h, rm, gm, bm)
          } catch { case _: Exception => Row(id, false, null, null, null, null, null) }
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** Decode RIFF/WAVE audio:
    * (id, ok, sample_rate, n_samples, duration_ms, rms, zero_crossings). */
  def decodeWav(df: DataFrame, idCol: String = "doc_id",
                bytesCol: String = "payload"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("ok", BooleanType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_samples", LongType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("rms", LongType, nullable = true),
      StructField("zero_crossings", LongType, nullable = true)))
    df.select(col(idCol).cast("long"), col(bytesCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = idOrNull(r)
          try {
            if (id == null) throw new IllegalArgumentException("null id")
            val (rate, n, rms, zc) = MultiModalOps.decodeWav(r.getAs[Array[Byte]](1))
            Row(id, true, rate, n, n * 1000L / rate, rms, zc)
          } catch { case _: Exception => Row(id, false, null, null, null, null, null) }
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** Parse + index AVI video containers (the m10 semantics over any AVI
    * payload column): nested RIFF LIST walk, header decode, '00dc' frame
    * count, idx1 keyframe flags, with every cross-container consistency
    * contract (avih ≡ strh ≡ movi ≡ idx1 frame counts, index offsets
    * addressing real frame chunks) enforced — an inconsistent container
    * is reported corrupt, not half-parsed. Accepts both DIB stride
    * dialects (tight rows and the real-world 4-byte-padded stride; pad
    * bytes are excluded from the pixel mean) and all three idx1 offset
    * conventions in the wild (movi-data-relative, 'movi'-fourcc-
    * relative, absolute — detected on the first entry, then required
    * uniformly). Corrupt payloads and null ids
    * are flagged (ok = false), never fatal. Returns (id, ok, width,
    * height, n_frames, n_keyframes, fps_milli, frame_bytes,
    * first_frame_mean). */
  def aviIndex(df: DataFrame, idCol: String = "doc_id",
               bytesCol: String = "payload"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("ok", BooleanType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_frames", LongType, nullable = true),
      StructField("n_keyframes", LongType, nullable = true),
      StructField("fps_milli", LongType, nullable = true),
      StructField("frame_bytes", LongType, nullable = true),
      StructField("first_frame_mean", LongType, nullable = true)))
    df.select(col(idCol).cast("long"), col(bytesCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = idOrNull(r)
          try {
            if (id == null) throw new IllegalArgumentException("null id")
            val v = MultiModalOps.aviIndexOf(r.getAs[Array[Byte]](1))
            Row(id, true, v.width, v.height, v.nFrames, v.nKeyframes,
              v.fpsMilli, v.frameBytes, v.firstFrameMean)
          } catch { case _: Exception =>
            Row(id, false, null, null, null, null, null, null, null)
          }
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** Full PNG decode (the m11 semantics over any PNG payload column):
    * CRC-validated chunk walk, multi-chunk IDAT, zlib inflate with
    * exact-size verification, all five unfilters (incl. Paeth). 8-bit
    * RGB only — anything else, corrupt payloads, and null ids are
    * flagged (ok = false), never fatal. Returns (id, ok, width, height,
    * n_chunks, px_sum, px_mean_milli, tl_px, br_px). */
  def pngDecode(df: DataFrame, idCol: String = "doc_id",
                bytesCol: String = "payload"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("ok", BooleanType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_chunks", LongType, nullable = true),
      StructField("px_sum", LongType, nullable = true),
      StructField("px_mean_milli", LongType, nullable = true),
      StructField("tl_px", LongType, nullable = true),
      StructField("br_px", LongType, nullable = true)))
    df.select(col(idCol).cast("long"), col(bytesCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = idOrNull(r)
          try {
            if (id == null) throw new IllegalArgumentException("null id")
            val v = MultiModalOps.pngDecodeOf(r.getAs[Array[Byte]](1))
            var sum = 0L
            var i = 0
            while (i < v.pixels.length) { sum += v.pixels(i) & 0xff; i += 1 }
            Row(id, true, v.width, v.height, v.nChunks, sum,
              1000L * sum / v.pixels.length, (v.pixels(0) & 0xff).toLong,
              (v.pixels(v.pixels.length - 1) & 0xff).toLong)
          } catch { case _: Exception =>
            Row(id, false, null, null, null, null, null, null, null)
          }
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** Full GIF87a decode (the m12 semantics over any GIF payload column):
    * header/palette walk, sub-block reassembly, hand-rolled variable-
    * width LZW decode (dictionary growth, KwKwK, width bumps). Single
    * global-palette images only — anything else, corrupt payloads, and
    * null ids are flagged (ok = false), never fatal. Returns (id, ok,
    * width, height, n_colors, px_index_sum, px_rgb_sum, tl_idx,
    * br_idx). */
  def gifDecode(df: DataFrame, idCol: String = "doc_id",
                bytesCol: String = "payload"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("ok", BooleanType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_colors", IntegerType, nullable = true),
      StructField("px_index_sum", LongType, nullable = true),
      StructField("px_rgb_sum", LongType, nullable = true),
      StructField("tl_idx", LongType, nullable = true),
      StructField("br_idx", LongType, nullable = true)))
    df.select(col(idCol).cast("long"), col(bytesCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = idOrNull(r)
          try {
            if (id == null) throw new IllegalArgumentException("null id")
            val v = MultiModalOps.gifDecodeOf(r.getAs[Array[Byte]](1))
            var isum = 0L; var rgb = 0L
            var i = 0
            while (i < v.indices.length) {
              val ix = v.indices(i) & 0xff
              isum += ix
              rgb += (v.palette(3 * ix) & 0xff) +
                (v.palette(3 * ix + 1) & 0xff) + (v.palette(3 * ix + 2) & 0xff)
              i += 1
            }
            Row(id, true, v.width, v.height, v.palette.length / 3, isum, rgb,
              (v.indices(0) & 0xff).toLong,
              (v.indices(v.indices.length - 1) & 0xff).toLong)
          } catch { case _: Exception =>
            Row(id, false, null, null, null, null, null, null, null)
          }
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** Full baseline-JPEG decode (the m14 semantics over any JPEG payload
    * column): marker walk, canonical Huffman decode with byte
    * unstuffing and restart handling, dequantization, 2-D IDCT, and
    * grayscale / 4:4:4 / 4:2:0 YCbCr reassembly (JFIF color
    * conversion). Progressive/arithmetic/12-bit variants, corrupt
    * payloads, and null ids are flagged (ok = false), never fatal.
    * Returns (id, ok, width, height, n_components, px_sum,
    * px_mean_milli, n_restarts). */
  def jpegDecode(df: DataFrame, idCol: String = "doc_id",
                 bytesCol: String = "payload"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("ok", BooleanType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_components", IntegerType, nullable = true),
      StructField("px_sum", LongType, nullable = true),
      StructField("px_mean_milli", LongType, nullable = true),
      StructField("n_restarts", LongType, nullable = true)))
    df.select(col(idCol).cast("long"), col(bytesCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = idOrNull(r)
          try {
            if (id == null) throw new IllegalArgumentException("null id")
            val v = graft.queries.Jpeg.decode(r.getAs[Array[Byte]](1))
            var sum = 0L
            var i = 0
            while (i < v.pixels.length) { sum += v.pixels(i) & 0xff; i += 1 }
            Row(id, true, v.width, v.height, v.nComponents, sum,
              1000L * sum / v.pixels.length, v.nRestarts)
          } catch { case _: Exception =>
            Row(id, false, null, null, null, null, null, null)
          }
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** MP3 frame index (the m15 semantics over any payload column):
    * walk the MPEG audio frame headers — ID3v2/ID3v1 tags skipped — and
    * report (n_frames, mpeg_version, sample_rate, bitrate_kbps [-1 =
    * VBR], duration_ms). Corrupt/non-MP3 payloads and null ids are
    * flagged (ok = false), never fatal. */
  def mp3Index(df: DataFrame, idCol: String = "doc_id",
               bytesCol: String = "payload"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("ok", BooleanType, nullable = false),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("mpeg_version", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("bitrate_kbps", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)))
    df.select(col(idCol).cast("long"), col(bytesCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = idOrNull(r)
          try {
            if (id == null) throw new IllegalArgumentException("null id")
            val v = graft.queries.Mp3.index(r.getAs[Array[Byte]](1))
            Row(id, true, v.nFrames, v.mpegVersion, v.sampleRate,
              v.bitrateKbps, v.durationMs)
          } catch { case _: Exception =>
            Row(id, false, null, null, null, null, null)
          }
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** Unified media probe (the m13 semantics over any payload column):
    * sniff PPM/PGM/PNG/GIF/WAVE/AVI/JPEG/BMP/MP3 by magic bytes, run the container's
    * REAL parser, and report normalized metadata. Unknown containers,
    * corrupt payloads, and null ids are flagged (ok = false), never
    * fatal. Returns (id, ok, container, width, height, n_units). */
  def probe(df: DataFrame, idCol: String = "doc_id",
            bytesCol: String = "payload"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("ok", BooleanType, nullable = false),
      StructField("container", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_units", LongType, nullable = true)))
    df.select(col(idCol).cast("long"), col(bytesCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = idOrNull(r)
          try {
            if (id == null) throw new IllegalArgumentException("null id")
            val p = MultiModalOps.probeOf(r.getAs[Array[Byte]](1))
            Row(id, true, p.container, p.width, p.height, p.nUnits)
          } catch { case _: Exception =>
            Row(id, false, null, null, null, null)
          }
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** VAD-style energy segmentation (the m07 semantics over any WAV payload
    * column): fixed 32-sample frames, a frame is active iff its energy is
    * nonzero, active runs are segments. Corrupt payloads and null ids are
    * flagged (ok = false), never fatal. */
  def energySegments(df: DataFrame, idCol: String = "doc_id",
                     bytesCol: String = "payload"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("ok", BooleanType, nullable = false),
      StructField("n_frames", LongType, nullable = true),
      StructField("n_active", LongType, nullable = true),
      StructField("n_segments", LongType, nullable = true),
      StructField("longest_run", LongType, nullable = true)))
    df.select(col(idCol).cast("long"), col(bytesCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = idOrNull(r)
          try {
            if (id == null) throw new IllegalArgumentException("null id")
            val (_, samples) = MultiModalOps.wavSamples(r.getAs[Array[Byte]](1))
            val (nFrames, nActive, nSeg, longest) = MultiModalOps.segmentsOf(samples)
            Row(id, true, nFrames, nActive, nSeg, longest)
          } catch { case _: Exception => Row(id, false, null, null, null, null) }
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** Audio fingerprints (m09): the Haitsma–Kalker-style robust hash's
    * deterministic core — sign bits of consecutive frame-energy deltas
    * over the first 8 frames of RIFF-parsed PCM, packed into one
    * integer. Equal fingerprints mark same-signal audio families (the
    * audio twin of [[perceptualHash]]). Rows whose payload is not a
    * parseable mono PCM-16 WAV with at least 8 complete frames emit
    * ok=false instead of failing the scan. */
  def audioFingerprints(df: DataFrame, idCol: String = "doc_id",
                        bytesCol: String = "payload"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("ok", BooleanType, nullable = false),
      StructField("fp", LongType, nullable = true)))
    df.select(col(idCol).cast("long"), col(bytesCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = idOrNull(r)
          try {
            if (id == null) throw new IllegalArgumentException("null id")
            val (_, samples) = MultiModalOps.wavSamples(r.getAs[Array[Byte]](1))
            Row(id, true, MultiModalOps.fingerprintOf(samples))
          } catch { case _: Exception => Row(id, false, null) }
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }

  /** Scene-cut detection (m08): segment a payload viewed as 64-byte
    * frames into shots wherever consecutive frame-mean intensities jump
    * by more than the threshold — the structure a video sampler consumes.
    * Returns (doc_id, n_frames, n_cuts, n_scenes, longest_scene); rows
    * with a null id or an under-one-frame payload are skipped (no scene
    * exists). One map pass, no shuffle. */
  def sceneCuts(df: DataFrame, idCol: String = "doc_id",
                bytesCol: String = "payload"): DataFrame =
    MultiModalOps.sceneCutsOf(df.select(
      col(idCol).cast("long").as("doc_id"),
      col(bytesCol).cast("binary").as("payload")))

  /** Frame sampling (the m02 semantics over any payload column): each
    * payload expands to length/frameBytes virtual frames; every `stride`-th
    * frame is kept with a deterministic per-frame fingerprint — the
    * explode + downsample shape of video preprocessing. Pure column
    * algebra (codegen'd, no UDF); rows with a null id or an
    * under-one-frame payload produce no frames. */
  def sampleFrames(df: DataFrame, idCol: String = "doc_id",
                   bytesCol: String = "payload", frameBytes: Int = 64,
                   stride: Int = 4): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be > 0")
    df.select(col(idCol).cast("long").as("doc_id"),
        col(bytesCol).cast("binary").as("payload"))
      .filter(col("doc_id").isNotNull)
      .withColumn("n_frames",
        expr(s"cast(length(payload) as bigint) div $frameBytes"))
      .filter(col("n_frames") > 0)
      .withColumn("frame_id", explode(expr("sequence(0, n_frames - 1)")))
      .filter(col("frame_id") % stride === 0)
      .select(col("doc_id"), col("frame_id"),
        expr("cast(conv(substring(md5(concat(cast(doc_id as string), ':', " +
          "cast(frame_id as string))), 1, 15), 16, 10) as bigint)").as("frame_fp"))
  }

  /** Box-filter resize (the m03 kernel over any payload column): the
    * payload is viewed as a grayscale raster `rasterW` pixels wide and
    * box-resampled to outDim×outDim with exact integer area averaging;
    * long-form output (doc_id, y, x, px), one row per output pixel.
    * Rows whose payload can't fill one full box partition
    * (length < rasterW*outDim) — or with a null id — produce no pixels. */
  def resize(df: DataFrame, idCol: String = "doc_id",
             bytesCol: String = "payload", outDim: Int = 8,
             rasterW: Int = 32): DataFrame = {
    require(outDim > 0 && rasterW >= outDim,
      "need outDim > 0 and rasterW >= outDim")
    MultiModalOps.resizeOf(
      df.select(col(idCol).cast("long").as("doc_id"),
        col(bytesCol).cast("binary").as("payload")),
      outDim, rasterW)
  }

  /** Perceptual hash (the m06 kernel over any payload column): the payload
    * raster is box-resampled to 8×8 (exact integer area averaging), WHT-
    * transformed (±1 integer weights — a DCT stand-in with no float
    * divergence), and hashed by the signs of coefficients 1..60. Returns
    * (doc_id, phash); equal hashes = perceptual duplicates — feed the
    * result to a group-by/window for canonical selection, or join two
    * corpora on phash for cross-corpus image dedup. Rows whose payload
    * can't fill one full box partition, or with a null id, are dropped. */
  def perceptualHash(df: DataFrame, idCol: String = "doc_id",
                     bytesCol: String = "payload", outDim: Int = 8,
                     rasterW: Int = 32): DataFrame = {
    // outDim >= 8: the 60-bit hash reads WHT coefficients 1..60, which only
    // exist when the transform has >= 64 points (outDim^2)
    require(outDim >= 8 && rasterW >= outDim,
      "need outDim >= 8 and rasterW >= outDim")
    MultiModalOps.phashOf(
      df.select(col(idCol).cast("long").as("doc_id"),
        col(bytesCol).cast("binary").as("payload")),
      outDim, rasterW)
  }

  /** Feature-extraction stage (the m04 semantics over any payload column):
    * payload → fixed-width feature vector (array<bigint>, `dims` dims),
    * ready for the [[Vectors]] similarity operators. The extractor is a
    * deterministic md5-derived STUB — a learned model has no place in this
    * container — but the contract (binary in, dense vector column out, one
    * codegen'd scan) is the real plumbing a swap-in encoder inherits.
    * Rows with a null id or payload are dropped. */
  def embedStub(df: DataFrame, idCol: String = "doc_id",
                bytesCol: String = "payload", dims: Int = 8): DataFrame = {
    require(dims > 0 && dims * 4 <= 32, "md5 stub supports 1..8 dims")
    df.select(col(idCol).cast("long").as("doc_id"),
        col(bytesCol).cast("binary").as("payload"))
      .filter(col("doc_id").isNotNull && col("payload").isNotNull)
      .select(col("doc_id"), expr(
        s"transform(sequence(0, ${dims - 1}), k -> " +
          "cast(conv(substring(md5(payload), k * 4 + 1, 4), 16, 10) as bigint))")
        .as("feature"))
  }
}
