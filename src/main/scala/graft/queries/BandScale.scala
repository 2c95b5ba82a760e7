package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement main for the LSH band-width scale trade (SCALE_r8): counts
  * banded candidates and exact-rescore survivors for several
  * (bands × bits, threshold) constructions over one embeddings corpus.
  *
  * Motivation: the r8 cross-mode runs measured IDENTICAL candidate mass
  * on the uniform and heavytail corpora (e.g. 18.73M vs 18.75M at 6k
  * vectors), proving the ~n² candidate growth is NOT a corpus property —
  * it is the construction's random-collision floor,
  * bands · 2^-bits · n²/2 (16×4 admits ~64% of ALL pairs), plus the
  * Gaussian tail above the low 0.45 threshold. The production lever is
  * WIDER bands at a higher threshold: collision probability for a random
  * pair falls 2× per extra bit while a true pair at p = 1-acos(t)/π
  * falls only p× — so bits ≈ log(n) holds the candidate mass near-linear
  * (the classic LSH n^(1+ρ) regime, ρ = ln(1/p1)/ln 2).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.queries.BandScale
  * [16x4 32x8 64x16]" — optional args restrict the configs (the 16x4
  * count at 20k vectors alone is a 200M-row join).
  */
object BandScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    // `synth N1 [N2 ...]`: measure the adaptive fence PAST the testdata
    // corpus sizes (the BitsMax=30 raise targets bits > 18, i.e. > 2^18
    // rows — no sf dir is that large). Deterministic murmur3-quantized
    // 64-dim vectors; counts the banded candidate mass under the gated
    // construction (64 bands x clamp(ceil(log2 n), BitsMin, BitsMax)).
    // Random vectors are the WORST case for the collision-floor claim:
    // every candidate is floor mass (bands * n^2 / 2^bits / 2), so
    // linearity here is the construction's, not the corpus's.
    if (args.headOption.contains("synth")) {
      for (n <- args.drop(1).map(_.toLong)) {
        val bits = SimilarityOps.adaptiveBits(n)
        val synth = spark.range(n).toDF("vec_id")
          .withColumn("q", expr(
            "transform(sequence(0, 63), j -> " +
              "cast(hash(vec_id, j) % 1000 as bigint))"))
          .repartition(spark.sparkContext.defaultParallelism)
          .localCheckpoint(true)
        val t0 = System.nanoTime()
        val cands = SimilarityOps.s02Candidates(synth,
          SimilarityOps.ScaledBands, bits).count()
        val secs = (System.nanoTime() - t0) / 1e9
        val floor = SimilarityOps.ScaledBands.toDouble * n * n /
          (1L << bits) / 2
        println(f"""{"metric":"band_scale_synth","n":$n,"bands":${SimilarityOps.ScaledBands},""" +
          f""""bits":$bits,"candidates":$cands,"floor":$floor%.0f,"sec":$secs%.2f}""")
      }
      spark.stop(); return
    }
    val emb = SimilarityOps.withQuantized(
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding")), "embedding")
      .localCheckpoint(true)
    val n = emb.count()
    // the r9 GATED doc-vector construction (s02): hashed-bigram document
    // embeddings + adaptive bands at t=0.9 — measured when 'docs' is
    // requested (or by default) so the linear-candidate claim for the
    // production near-dup query has per-corpus counters
    if (args.isEmpty || args.contains("docs")) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val dEmb = SimilarityOps.docBigramVectors(docs).localCheckpoint(true)
      val dBits = SimilarityOps.adaptiveBits(docs.count())
      val dn = dEmb.count()
      val t0 = System.nanoTime()
      val cands = SimilarityOps.s02Candidates(dEmb,
        SimilarityOps.ScaledBands, dBits).count()
      val surv = SimilarityOps.nearDupPairsOf(dEmb,
        SimilarityOps.NearDupThreshold, SimilarityOps.ScaledBands, dBits)
        .count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"band_scale_docs","n":$dn,"bands":${SimilarityOps.ScaledBands},""" +
        f""""bits":$dBits,"threshold":${SimilarityOps.NearDupThreshold},""" +
        f""""candidates":$cands,"survivors":$surv,"sec":$secs%.2f,"sf":"$sfDir"}""")
    }
    // (bands, bits, threshold): the demoted fixed-width 16x4@0.45 and
    // 32x8@0.7 fixtures, the fixed 64x16@0.8 SCALE_r8 §2 point, and the
    // GATED adaptive rule (bits = clamp(ceil(log2 n), 8, 18)) at both the
    // near-dup 0.8 and the s05-gated 0.45 thresholds
    val ab = SimilarityOps.adaptiveBits(n)
    val all = Seq(("16x4", 16, 4, 0.45), ("32x8", 32, 8, 0.7),
      ("64x16", 64, 16, 0.8),
      ("adaptive", SimilarityOps.ScaledBands, ab, 0.8),
      ("adaptive45", SimilarityOps.ScaledBands, ab, 0.45))
    val picked =
      if (args.isEmpty) all
      else all.filter { case (nm, _, _, _) => args.contains(nm) }
    for ((_, bands, bits, thr) <- picked) {
      val t0 = System.nanoTime()
      val cands = SimilarityOps.s02Candidates(emb, bands, bits).count()
      val surv = SimilarityOps.nearDupPairsOf(emb, thr, bands, bits).count()
      val secs = (System.nanoTime() - t0) / 1e9
      // the same lever applied to whole-corpus kNN-graph construction
      // (s11): edges out + wall-clock under this band construction.
      // Gated to bits >= 8: under 16x4 the ~64%-of-all-pairs collision
      // floor would push ~n^2/3 rows through the pair-count agg AND the
      // per-vector window just to produce a datapoint SCALE_r8 never
      // reports — the 16x4 run stays a usable candidate-count probe.
      val (edges, knnSecs) =
        if (bits >= 8) {
          val t1 = System.nanoTime()
          val e = SimilarityOps.knnGraphOf(emb, SimilarityOps.KnnK,
            bands, bits).count()
          (e, (System.nanoTime() - t1) / 1e9)
        } else (-1L, -1.0)
      println(f"""{"metric":"band_scale","n":$n,"bands":$bands,"bits":$bits,""" +
        f""""threshold":$thr,"candidates":$cands,"survivors":$surv,""" +
        f""""sec":$secs%.2f,"knn_edges":$edges,"knn_sec":$knnSecs%.2f,""" +
        f""""sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
