package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement main for d15's prefix-filter selectivity (SCALE_r8 §13):
  * counts, per corpus, the naive shared-gram pair mass (what a
  * filter-less set-similarity join would shuffle), the prefix+length
  * candidate mass (what d15 actually shuffles into verification), and
  * the final pairs. Naive counting is itself the quadratic job the
  * filter exists to avoid, so it only runs when `args(0) == "naive"`.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.queries.PpjoinScale [naive]".
  */
object PpjoinScale {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val withNaive = args.headOption.contains("naive")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val grams = DedupOps.ppjoinGramsOf(docs, DedupOps.PpJoinK)
    val naive = if (withNaive)
      grams.as("x").join(grams.as("y"),
          col("x.f") === col("y.f") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id"), col("y.doc_id")).distinct().count()
    else -1L
    val cands = DedupOps.ppjoinCandidatesOf(grams, DedupOps.PpJoinT10).count()
    val pairs = DedupOps
      .ppjoinPairsOf(docs, DedupOps.PpJoinT10, DedupOps.PpJoinK).count()
    println(s"""{"metric":"ppjoin_scale","sf":"$dir","naive":$naive,""" +
      s""""candidates":$cands,"pairs":$pairs}""")
    spark.stop()
  }
}
