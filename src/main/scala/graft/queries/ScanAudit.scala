package graft.queries
import org.apache.spark.sql.SparkSession

/** Diagnostic main: count per-table FileScans in every driver query's
  * physical plan and flag tables scanned more than once. This is how the
  * t15 hidden-second-scan (round 7) was generalized into a surface-wide
  * audit: a DataFrame branch referencing the same lineage re-plans the
  * whole scan, which is invisible at bench scale and a 2× scan cost at
  * 100 TB. Legitimate multi-scan classes (see SCALE_r7.md): true
  * self-joins, pushdown-pruned subset branches (e.g. `vec_id < 10` query
  * sides), and composed pipelines whose branches carry different pushed
  * filters. Run: `sbt "runMain graft.queries.ScanAudit"`. */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    graft.SparkEntry.queries.toVector.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, d).queryExecution.executedPlan.toString
        val scans = "FileScan parquet".r.findAllIn(p).size
        val tables = "/([a-z0-9_]+)\\.parquet".r
          .findAllMatchIn(p).map(_.group(1)).toVector
        val dup = tables.groupBy(identity).filter(_._2.size > 1).keys.toVector.sorted
        if (dup.nonEmpty)
          println(s"AUDIT $name scans=$scans dupTables=${dup.mkString(",")}")
      } catch { case e: Throwable =>
        println(s"AUDIT $name ERR ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
