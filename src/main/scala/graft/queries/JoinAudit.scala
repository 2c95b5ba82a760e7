package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Broadcast-misestimate audit across the checkpoint-derived self-joins
  * (SCALE_r13; the SCALE_r12 §1 defect class applied fleet-wide).
  *
  * The defect: a `localCheckpoint` lineage (range → project → explode)
  * under-counts array/string payloads, so the static planner can choose
  * a BROADCAST build for a corpus-derived join side — a guaranteed
  * driver OOM at 10⁶+ rows on a real cluster. The s02/bandPairCounts
  * band joins were fixed in r12; this tool probes the REMAINING
  * self-join families on synthetic checkpoint-derived frames at the
  * scale where a mis-broadcast is fatal, and reports every
  * BroadcastExchange in the INITIAL physical plan (the static
  * decision — AQE can only re-plan what the static planner left as an
  * exchange) plus a live run per family.
  *
  * Families probed (judge-flagged sites): d04 minhash band self-join +
  * rescore, d05/d06 simhash band self-join, d15 PPJoin prefix
  * self-join + gram verification, d17 containment prefix join, d11
  * suffix-sort adjacency (boundary fix-up), s06 semantic-dedup cell
  * self-join.
  *
  * Usage: sbt "runMain graft.queries.JoinAudit [n]" (default 1e6 docs).
  */
object JoinAudit {

  /** Count BroadcastExchange nodes in the initial physical plan. */
  private def broadcasts(df: DataFrame): Int =
    df.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("BroadcastExchange"))

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    // checkpoint-derived corpus: the misestimate-prone lineage shape
    // (range → string expr → checkpoint). ~8 words per doc from a
    // 10k-word vocabulary; ~1% of docs duplicate their neighbor's text
    // (r14) so the verification stages of the pair-emitting families
    // (d15/d17 gram verify, d04 rescore) run on REAL matches, not just
    // candidate mass.
    val docs = spark.range(n).toDF("doc_id")
      .withColumn("seed", expr(
        "doc_id - (case when doc_id % 97 = 0 and doc_id > 0 then 1 else 0 end)"))
      .withColumn("text", expr(
        "concat_ws(' ', transform(sequence(0, 7), " +
          "j -> concat('w', abs(hash(seed, j)) % 10000)))"))
      .drop("seed")
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(true)

    def probe(name: String, df: DataFrame, live: Boolean = false): Unit = {
      val b = broadcasts(df)
      val t0 = System.nanoTime()
      val rows = if (live) df.count() else -1L
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"join_audit","family":"$name","n":$n,""" +
        f""""broadcast_exchanges":$b,"rows":$rows,"sec":$secs%.2f}""")
    }

    // d04: minhash band self-join + signature rescore
    val sig = DedupOps.minhashSigOf(
      graft.ops.Corpus.shingles(docs, "doc_id", "text"))
      .localCheckpoint(true)
    probe("d04_lsh_pairs", DedupOps.lshPairsOf(sig), live = true)

    // d05/d06: simhash band self-join
    val sh = graft.ops.Corpus.simhashSignatures(docs).localCheckpoint(true)
    probe("d06_simhash_pairs", DedupOps.simhashPairsOf(sh), live = true)

    // d15: PPJoin prefix self-join + gram verification (live since r14)
    probe("d15_ppjoin", DedupOps.ppjoinPairsOf(docs, t10 = 8, k = 3),
      live = true)

    // d17: containment prefix join (live since r14)
    probe("d17_containment", DedupOps.containmentPairsOf(docs, 8, 3),
      live = true)

    // s06: semantic-dedup cell self-join over checkpoint-derived vectors
    val emb = spark.range(n).toDF("vec_id")
      .withColumn("q", expr("transform(sequence(0, 63), " +
        "j -> cast(hash(vec_id, j) % 1000 as bigint))"))
      .withColumn("nrm", expr(
        "aggregate(q, cast(0 as bigint), (a, x) -> a + x * x)"))
      .withColumn("cell", expr(s"abs(hash(vec_id)) % ${n / 64 max 1}"))
      .localCheckpoint(true)
    probe("s06_semantic_dedup", SimilarityOps.semanticDedupOf(emb, 0.45),
      live = true)

    // d11: suffix spans (range-partitioned sort + boundary fix-up);
    // probed at n/8 — the sort itself is the cost, the audit target is
    // the fix-up join's plan
    val small = docs.filter(col("doc_id") < (n / 8).max(1000L))
    probe("d11_suffix_spans",
      DedupOps2.suffixSpansOf(spark, small, cap = 6, minSpan = 3),
      live = true)

    spark.stop()
  }
}
