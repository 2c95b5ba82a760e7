package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-timing main for p12_neardup_families (the r11 verdict's #3:
  * p12 drifted 1.92 → ~3.0 s across r10→r11 measurements while its
  * components — s02 pair source, d07-style CC — stayed flat and the
  * diff between the rounds was provably inert at sf0.1). Times each
  * barrier of the p12 kernel separately, after one untimed warmup of
  * the whole query (the Bench convention), so the drift can be pinned
  * to a stage instead of adjudicated from totals.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_CPUS=8
  *   sbt "runMain graft.queries.P12Profile"
  */
object P12Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def secs[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // untimed warmup: full query once (footers, JIT, codegen)
    PipelineOps.p12NeardupFamilies(spark, sfDir)
      .queryExecution.toRdd.count()

    for (round <- 1 to 3) {
      // control: the same s02 derivation materialized WITHOUT the
      // checkpoint (what the s02 bench row times) — the delta against
      // stage 1 is the checkpoint's own cost
      val (_, tCount) = secs {
        SimilarityOps.s02EmbedNearDup(spark, sfDir)
          .queryExecution.toRdd.count()
      }
      // stage 1: the s02 pair derivation, materialized exactly the way
      // the kernel consumes it (eager localCheckpoint)
      val (pairs, tPairs) = secs {
        SimilarityOps.s02EmbedNearDup(spark, sfDir)
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"),
            col("sim"))
          .localCheckpoint(true)
      }
      // stage 2: connected components over the checkpointed pairs
      val (comp, tCc) = secs {
        DedupOps.connectedComponents(spark,
          pairs.select("doc_a", "doc_b"), DedupOps.SingleTaskEdgeMax)
          .localCheckpoint(true)
      }
      // stage 3: the family/strongest tail + presentation sort
      val (_, tTail) = secs {
        val fam = comp.groupBy("label").agg(
          count(lit(1)).as("family_size"), min("doc_id").as("canonical_id"))
        val strongest = pairs
          .join(comp.select(col("doc_id").as("doc_a"), col("label")), "doc_a")
          .groupBy("label").agg(max("sim").as("max_sim"))
        fam.join(strongest, "label")
          .select(col("label").as("family_id"), col("family_size"),
            col("canonical_id"), col("max_sim"))
          .orderBy("family_id")
          .queryExecution.toRdd.count()
      }
      // reference: the one-call query as Bench times it
      val (_, tFull) = secs {
        PipelineOps.p12NeardupFamilies(spark, sfDir)
          .queryExecution.toRdd.count()
      }
      println(f"""{"metric":"p12_profile","round":$round,"s02_count_sec":$tCount%.2f,"pairs_sec":$tPairs%.2f,""" +
        f""""cc_sec":$tCc%.2f,"tail_sec":$tTail%.2f,""" +
        f""""staged_total":${tPairs + tCc + tTail}%.2f,"full_query_sec":$tFull%.2f,""" +
        f""""sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
