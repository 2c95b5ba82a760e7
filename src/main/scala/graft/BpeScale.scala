package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Measurement main for the batched-BPE trainer (t17's `batch` knob):
  * learns the same `nMerges` merges with batch=1 and batch=B on
  * SPARK_GRAFT_SF_DIR's documents table, counts driver round-trips via a
  * job listener, and asserts the two merge tables are identical row for
  * row on this corpus. Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.BpeScale [nMerges] [B]"
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nMerges = args.headOption.map(_.toInt).getOrElse(24)
    val batch = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val docs = graft.queries.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    def measure(b: Int): (Array[String], Int, Double) = {
      // warmup pass populates footer/codegen caches so both arms compare
      graft.queries.TextOps.bpeMergesOf(docs, 1, b).collect()
      Thread.sleep(200)
      val before = jobs.get()
      val t0 = System.nanoTime()
      val rows = graft.queries.TextOps.bpeMergesOf(docs, nMerges, b)
        .collect().map(_.mkString(","))
      val secs = (System.nanoTime() - t0) / 1e9
      (rows, jobs.get() - before, secs)
    }
    val (seqRows, seqJobs, seqSecs) = measure(1)
    val (batRows, batJobs, batSecs) = measure(batch)
    val same = seqRows.sameElements(batRows)
    // 1-based merge number where the batched schedule first departs from
    // sequential (the documented approximation: a merge can create a pair
    // that outranks a deferred one); -1 = fully identical. A pure length
    // mismatch (early exhaustion under batching) reports the first merge
    // past the common prefix rather than conflating with "identical".
    val firstDiff =
      if (same) -1
      else {
        val idx = seqRows.zip(batRows).indexWhere { case (a, b) => a != b }
        if (idx >= 0) idx + 1
        else math.min(seqRows.length, batRows.length) + 1
      }
    println(f"""{"metric":"bpe_batch","nMerges":$nMerges,"batch":$batch,""" +
      f""""identical":$same,"first_divergence":$firstDiff,""" +
      f""""seq_jobs":$seqJobs,"bat_jobs":$batJobs,""" +
      f""""seq_sec":$seqSecs%.2f,"bat_sec":$batSecs%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
