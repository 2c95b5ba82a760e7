package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.queries.MultiModalOps

/** Library-shaped multimodal decode API: the container parsers the gated
  * m01/m05 queries validate (real PPM/P6 and RIFF/WAVE byte parsing, with
  * oracle proofs from the synthesis formulas), applied to ANY DataFrame
  * carrying an opaque binary payload column. The decode runs inside
  * `mapPartitions` — one pass, no shuffle, executor-local byte work — the
  * shape a 100 TB media-preprocessing stage needs. Payloads the parser
  * rejects surface as null feature rows (`ok = false`), not task failures:
  * one corrupt object must not kill a million-file pass. */
object Media {

  /** Decode PPM/P6 images: (id, ok, width, height, r_mean, g_mean, b_mean). */
  def decodePpm(df: DataFrame, idCol: String = "doc_id",
                bytesCol: String = "payload"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("r_mean", LongType, nullable = true),
      StructField("g_mean", LongType, nullable = true),
      StructField("b_mean", LongType, nullable = true)))
    df.select(col(idCol).cast("long"), col(bytesCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          try {
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
      StructField("doc_id", LongType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_samples", LongType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("rms", LongType, nullable = true),
      StructField("zero_crossings", LongType, nullable = true)))
    df.select(col(idCol).cast("long"), col(bytesCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          try {
            val (rate, n, rms, zc) = MultiModalOps.decodeWav(r.getAs[Array[Byte]](1))
            Row(id, true, rate, n, n * 1000L / rate, rms, zc)
          } catch { case _: Exception => Row(id, false, null, null, null, null, null) }
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema))
  }
}
