package graft.sql

import graft.core._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Relational interop (SURVEY §1.6, §7.11): an exploded long view of a
  * datacube — one row per (variable, dim coordinates..., value) — derived
  * on demand so cube data can join/aggregate against ordinary tables with
  * full Catalyst optimization, and the inverse pivot back to a Fragment.
  *
  * The long view schema for an (time, lat, lon) cube:
  *   (var_name string, time long, lat long, lon long, value double)
  * Dim columns are the integer positions along each axis; physical coord
  * values live in their own (dim, pos, coord_value) view so the long table
  * stays narrow at scale.
  */
object LongView {

  /** Explode data variables into the long view. All variables must share
    * the cube's dim order (subsets allowed). */
  def fragmentToLongDF(spark: SparkSession, f: Fragment): DataFrame = {
    val dimsOrdered = f.dims.keys.toVector.sorted
    val schema = StructType(
      StructField("var_name", StringType, nullable = false) +:
        dimsOrdered.map(d => StructField(d, LongType, nullable = false)) :+
        StructField("value", DoubleType, nullable = false))
    val rows = f.dataVars.toSeq.sortBy(_._1).flatMap { case (name, v) =>
      val shape = v.shape
      val strides = shape.scanRight(1)(_ * _).tail
      (0 until v.data.size).iterator.map { flat =>
        val coords = v.dims.indices.map(k => ((flat / strides(k)) % shape(k)).toLong)
        val full = dimsOrdered.map { d =>
          val k = v.dims.indexOf(d)
          if (k >= 0) coords(k) else 0L
        }
        Row.fromSeq(name +: full :+ v.data.getDouble(flat))
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), schema)
  }

  /** Dim-coordinate lookup view: (dim, pos, coord_value). */
  def coordsToDF(spark: SparkSession, f: Fragment): DataFrame = {
    val rows = f.coords.toSeq.sortBy(_._1).flatMap { case (name, v) =>
      if (v.dims == Vector(name))
        (0 until v.data.size).map(i => Row(name, i.toLong, v.data.getDouble(i)))
      else Seq.empty
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows),
      StructType(Seq(
        StructField("dim", StringType, nullable = false),
        StructField("pos", LongType, nullable = false),
        StructField("coord_value", DoubleType, nullable = false))))
  }

  /** Inverse pivot: long DF (one variable) back into a dense Variable. */
  def longDFToVariable(df: DataFrame, varName: String,
                       dims: Vector[String], shape: Vector[Int]): Variable = {
    val strides = shape.scanRight(1)(_ * _).tail
    val data = new Array[Double](shape.product)
    df.filter(df("var_name") === varName)
      .select((dims.map(df(_)) :+ df("value")): _*)
      .collect()
      .foreach { r =>
        var flat = 0
        dims.indices.foreach(k => flat += r.getLong(k).toInt * strides(k))
        data(flat) = r.getDouble(dims.length)
      }
    Variable(dims, NDArray.ofDoubles(shape, data))
  }
}
