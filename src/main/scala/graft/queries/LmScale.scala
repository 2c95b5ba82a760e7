package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement main for t18's distributed LM (SCALE_r11): synthesizes a
  * clean slice whose bigram vocabulary is ≥ 10^6 rows — past
  * [[TextOps.PplBroadcastMaxBigrams]], the size class the old
  * driver-collect LM could not hold — trains the LM distributed, and
  * scores a target corpus through the SHUFFLE-join path. Prints one JSON
  * line with the distinct-bigram count, the chosen join mode and the
  * scoring wall time.
  *
  * The synthetic corpus draws `wordsPerDoc` tokens per doc from a
  * `vocab`-sized avalanche-hashed vocabulary, so distinct bigrams grow
  * with doc mass until they saturate vocab^2 — pick vocab ~ 3000 and
  * 50k docs for ~1.8M distinct bigrams.
  *
  * Usage: sbt "runMain graft.queries.LmScale [nDocs] [vocab] [wordsPerDoc]".
  */
object LmScale {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(50000)
    val vocab = args.lift(1).map(_.toInt).getOrElse(3000)
    val wordsPerDoc = args.lift(2).map(_.toInt).getOrElse(40)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic token stream: token k of doc i indexes the vocab by
    // an md5 avalanche of (i, k) — no linear structure, Zipf-free worst
    // case for bigram-vocabulary growth
    def corpus(n: Long, seed: Int) = spark.range(n)
      .repartition(cpus.toInt)
      .select(col("id").as("doc_id"), concat_ws(" ",
        expr(s"""transform(sequence(1, $wordsPerDoc), k ->
                 concat('w', pmod(cast(conv(substring(md5(concat(
                 cast(id AS STRING), '_', cast(k AS STRING), '_$seed')),
                 1, 12), 16, 10) AS BIGINT), $vocab)))""")).as("text"))

    val clean = corpus(nDocs, 1).localCheckpoint(true)
    val target = corpus(math.max(nDocs / 5L, 1000L), 2).localCheckpoint(true)

    val c2 = TextOps.docBigramsOf(clean)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .localCheckpoint(true)
    val n2 = c2.count()
    val mode =
      if (n2 <= TextOps.PplBroadcastMaxBigrams) "broadcast" else "shuffle"

    val t0 = System.nanoTime()
    val out = graft.ops.Text.perplexityFilter(target, clean)
    val rows = out.queryExecution.toRdd.count() // materialize the real plan
    val secs = (System.nanoTime() - t0) / 1e9

    println(s"""{"metric":"lm_scale","n_docs_clean":$nDocs,""" +
      s""""vocab":$vocab,"distinct_bigrams":$n2,"mode":"$mode",""" +
      s""""scored_docs":$rows,"score_secs":${"%.2f".format(secs)}}""")
    spark.stop()
  }
}
