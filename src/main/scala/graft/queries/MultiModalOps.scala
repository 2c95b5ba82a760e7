package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * decode / feature-extract / frame-sample stages.
  *
  * The image/audio codecs aren't available in this container, so the decode
  * kernel is a clearly-marked deterministic STUB (see [[FakeDecode]]) — but
  * the Spark-side plumbing is real and tested: binary columns flow through
  * mapPartitions in batches (the JVM twin of mapInPandas), the decoded
  * output is a typed struct schema, and partitioning survives the decode.
  * Swapping [[FakeDecode.decode]] for a real codec is a one-function change.
  */
object MultiModalOps {
  import Tables._

  /** STUB decoder: derives deterministic "media metadata" from the payload
    * bytes alone. A real deployment would replace this body with an actual
    * image/audio decode (e.g. via a JNI codec); the signature — bytes in,
    * typed features out — is the contract. */
  object FakeDecode {
    final case class Decoded(width: Int, height: Int, nBytes: Long, fmt: String)
    def decode(payload: Array[Byte]): Decoded = {
      val n = payload.length
      // ??? real codec goes here — deterministic fake derived from length
      val width = 64 + (n % 577)
      val height = 64 + ((n * 31) % 449)
      val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
      Decoded(width, height, n.toLong, fmt)
    }
  }

  /** Binary ingestion + batched decode via mapPartitions (mapInPandas twin):
    * documents' text bytes stand in for image payloads. */
  def m01DecodeStub(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("fmt", StringType, nullable = false)))
    val decoded = docs.mapPartitions { rows =>
      // batch shape: one iterator per partition, decode streams through
      rows.map { r =>
        val dec = FakeDecode.decode(r.getAs[Array[Byte]]("payload"))
        Row(r.getLong(0), dec.width, dec.height, dec.nBytes, dec.fmt)
      }
    }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
    decoded.orderBy("doc_id")
  }

  /** The stub arithmetic is replicable in SQL, which gives the plumbing an
    * oracle even though the kernel is fake. */
  val m01Sql: String =
    """SELECT doc_id,
      |  CAST(64 + (length(text) % 577) AS INTEGER) AS width,
      |  CAST(64 + ((length(text) * 31) % 449) AS INTEGER) AS height,
      |  length(text)::BIGINT AS n_bytes,
      |  CASE WHEN length(text) % 3 = 0 THEN 'png'
      |       WHEN length(text) % 3 = 1 THEN 'jpeg' ELSE 'webp' END AS fmt
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Frame sampling: each payload expands to n_bytes/64 virtual frames;
    * every 4th frame is kept with a deterministic per-frame fingerprint —
    * the explode + downsample shape of video preprocessing. */
  def m02FrameSample(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("n_frames", expr("cast(length(text) as bigint) div 64"))
      .filter(col("n_frames") > 0)
      .withColumn("frame_id", explode(expr("sequence(0, n_frames - 1)")))
      .filter(col("frame_id") % 4 === 0)
      .select(col("doc_id"), col("frame_id"),
        expr("cast(conv(substring(md5(concat(cast(doc_id as string), ':', " +
          "cast(frame_id as string))), 1, 15), 16, 10) as bigint)").as("frame_fp"))
      .orderBy("doc_id", "frame_id")

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

  /** Resize stage: fit the decoded box into 224×224 preserving aspect ratio
    * (integer math). The resample kernel itself is the stubbed part; the
    * dimension arithmetic, batching and schema are the real plumbing. */
  def m03ResizeStub(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("new_w", IntegerType, nullable = false),
      StructField("new_h", IntegerType, nullable = false)))
    docs.mapPartitions { rows =>
      rows.map { r =>
        val dec = FakeDecode.decode(r.getAs[Array[Byte]]("payload"))
        val m = math.max(dec.width, dec.height)
        // ??? real resample kernel goes here — only the geometry is computed
        Row(r.getLong(0), dec.width, dec.height,
          dec.width * 224 / m, dec.height * 224 / m)
      }
    }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
      .orderBy("doc_id")
  }

  val m03Sql: String =
    """WITH dec AS (
      |  SELECT doc_id,
      |    CAST(64 + (length(text) % 577) AS INTEGER) AS width,
      |    CAST(64 + ((length(text) * 31) % 449) AS INTEGER) AS height
      |  FROM documents)
      |SELECT doc_id, width, height,
      |  CAST(width * 224 // greatest(width, height) AS INTEGER) AS new_w,
      |  CAST(height * 224 // greatest(width, height) AS INTEGER) AS new_h
      |FROM dec ORDER BY doc_id""".stripMargin

  /** Feature-extraction stage: payload → fixed-width feature vector
    * (array<bigint>, 8 dims). The extractor is a deterministic md5-derived
    * stub; the contract — binary in, dense vector column out, ready for the
    * s0x similarity operators — is the real plumbing. */
  def m04EmbedStub(s: SparkSession, d: String): DataFrame = {
    val withVec = documents(s, d)
      .select(col("doc_id"), expr(
        "transform(sequence(0, 7), k -> " +
          "cast(conv(substring(md5(text), k * 4 + 1, 4), 16, 10) as bigint))")
        .as("feature"))
    // project the vector to scalar columns for the oracle compare; the
    // array<bigint> `feature` column is the actual pipeline product
    val flat = (0 until 8).map(k => col("feature").getItem(k).as(s"f$k"))
    withVec.select((col("doc_id") +: flat): _*).orderBy("doc_id")
  }

  val m04Sql: String = {
    val cols = (0 until 8).map(k =>
      s"('0x' || substr(md5(text), ${k * 4 + 1}, 4))::BIGINT AS f$k").mkString(",\n  ")
    s"""SELECT doc_id,
       |  $cols
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_decode_stub" -> m01DecodeStub _,
    "m02_frame_sample" -> m02FrameSample _,
    "m03_resize_stub" -> m03ResizeStub _,
    "m04_embed_stub" -> m04EmbedStub _,
  )

  val oracles: Map[String, String] = Map(
    "m01_decode_stub" -> m01Sql,
    "m02_frame_sample" -> m02Sql,
    "m03_resize_stub" -> m03Sql,
    "m04_embed_stub" -> m04Sql,
  )
}
