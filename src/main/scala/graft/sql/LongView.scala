package graft.sql

import graft.core._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
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
  *
  * Scale design: cells are materialized as Rows ONLY on executors, inside a
  * flatMap over fragment slabs — the driver holds fragment metadata and the
  * (already in-memory) source arrays, never a per-cell row. A 10⁹-cell cube
  * explodes as parallel slab tasks.
  */
object LongView {

  private def longSchema(dimsOrdered: Vector[String]): StructType =
    StructType(
      StructField("var_name", StringType, nullable = false) +:
        dimsOrdered.map(d => StructField(d, LongType, nullable = false)) :+
        StructField("value", DoubleType, nullable = false))

  /** Per-cell row iterator for one variable slab whose dim positions are
    * shifted by `offsets` (global position = local + offset). Runs on
    * executors. */
  private def cellRows(name: String, v: Variable, offsets: Map[String, Long],
                       dimsOrdered: Vector[String]): Iterator[Row] = {
    val shape = v.shape
    val strides = shape.scanRight(1)(_ * _).tail
    // var-dim k -> its slot in the output row; precomputed outside the loop
    val slotOf = v.dims.map(d => dimsOrdered.indexOf(d))
    val base = dimsOrdered.map(d => offsets.getOrElse(d, 0L)).toArray
    (0 until v.data.size).iterator.map { flat =>
      val full = base.clone()
      var k = 0
      while (k < slotOf.length) {
        if (slotOf(k) >= 0)
          full(slotOf(k)) += (flat / strides(k)) % shape(k)
        k += 1
      }
      Row.fromSeq(name +: full.toSeq :+ v.data.getDouble(flat))
    }
  }

  /** Explode a DISTRIBUTED collection of indexed fragments into the long
    * view — one executor-side flatMap, no driver materialization. Dim
    * columns are global positions: each fragment's concat-dim element
    * offset (IndexedPosition.start, stamped by indexItems) shifts its local
    * coordinates. This is the 100 TB path: the cube arrives as the rechunk/
    * scan output and every task explodes only its own fragments. */
  def fragmentsToLongDF(frags: Dataset[(Index, Fragment)],
                        dimsOrdered: Vector[String]): DataFrame = {
    val schema = longSchema(dimsOrdered)
    frags.flatMap { case (idx, f) =>
      val offsets: Map[String, Long] = dimsOrdered.flatMap { d =>
        idx.findConcatDim(d).map { cd =>
          val pos = idx(cd)
          // contract: positions are indexItems-stamped element offsets; an
          // unindexed position would silently collapse every fragment onto
          // the axis origin (duplicate global coords) — reject instead
          require(pos.indexed,
            s"fragmentsToLongDF requires indexItems-stamped positions; " +
              s"dim $d has unindexed position $pos — run Transforms.indexItems first")
          d -> pos.value.toLong
        }
      }.toMap
      f.dataVars.toSeq.sortBy(_._1).iterator.flatMap { case (name, v) =>
        cellRows(name, v, offsets, dimsOrdered)
      }
    }(Encoders.row(schema))
  }

  /** Explode one driver-held fragment: each variable is sliced into slabs
    * along its leading dim so the explosion runs as parallel executor tasks
    * (the slabs ship Kryo-encoded; per-cell Rows are only ever built on
    * executors). */
  def fragmentToLongDF(spark: SparkSession, f: Fragment): DataFrame = {
    val dimsOrdered = f.dims.keys.toVector.sorted
    val schema = longSchema(dimsOrdered)
    val par = math.max(1, spark.sparkContext.defaultParallelism)
    // (var name, slab variable, leading-dim offset)
    val slabs: Seq[(String, Variable, Long)] =
      f.dataVars.toSeq.sortBy(_._1).flatMap { case (name, v) =>
        if (v.shape.isEmpty || v.shape.head <= 1)
          Seq((name, v, 0L))
        else {
          val n0 = v.shape.head
          val step = math.max(1, (n0 + par - 1) / par)
          (0 until n0 by step).map { lo =>
            val hi = math.min(lo + step, n0)
            val slc = Slc(lo, hi) +: v.shape.tail.map(s => Slc(0, s))
            (name, v.copy(data = v.data.slice(slc.toVector)), lo.toLong)
          }
        }
      }
    spark.createDataset(slabs)(Encoders.kryo[(String, Variable, Long)])
      .repartition(math.min(slabs.size, par).max(1))
      .flatMap { case (name, v, lo) =>
        val offsets = v.dims.headOption.map(_ -> lo).toMap
        cellRows(name, v, offsets, dimsOrdered)
      }(Encoders.row(schema))
  }

  /** Dim-coordinate lookup view: (dim, pos, coord_value). Coordinate arrays
    * are metadata-sized (1-D, one per axis), so driver-side rows are fine. */
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

}
