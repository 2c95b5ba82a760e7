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
    // portable entry: the dataset dir comes from argv or the same env var
    // Bench uses — no machine-specific default baked in
    val d = args.headOption.orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse {
        System.err.println(
          "usage: ScanAudit <sfDir>  (a dir holding the parquet tables, " +
            "e.g. documents.parquet; or set SPARK_GRAFT_SF_DIR)")
        sys.exit(2)
      }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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
