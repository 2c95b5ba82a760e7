package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement main for s15's incremental claim (SCALE_r8): the gated
  * s15 query builds its standing state in-query (simulating a state
  * load), so the bench total cannot show the upkeep cost alone. This
  * probe separates the phases:
  *
  *   1. full   — s11 rebuild over the whole corpus (the baseline an
  *               ingest pipeline pays per batch WITHOUT maintenance),
  *   2. state  — standing-pair table build over the old corpus only
  *               (paid ONCE, then persisted in production),
  *   3. probe  — batch band-probe + merged cap/rescore/top-k tail with
  *               the standing table PRE-MATERIALIZED (the true
  *               per-batch upkeep cost).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.queries.IncScale".
  */
object IncScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val emb = SimilarityOps.withQuantized(
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding")), "embedding")
      .localCheckpoint(true)
    val n = emb.count()
    // optional arg: batch denominator (batch = highest 1/den of ids);
    // defaults to the gated query's split. Smaller batches show the
    // probe cost tracking BATCH size, not corpus size.
    val den = args.headOption.map(_.toLong)
      .getOrElse(SimilarityOps.NewBatchDen)
    require(den >= 2, s"batch denominator must be >= 2, got $den")
    val maxId = emb.agg(max("vec_id")).as[Long].head()
    val t = (maxId + 1L) * (den - 1L) / den
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (fullEdges, fullSec) = timed {
      SimilarityOps.knnGraphOf(emb, SimilarityOps.KnnK).count()
    }
    // the gated adaptive construction (bits from the FULL corpus count —
    // the same resolution the s11/s15/s16 queries share)
    val bits = SimilarityOps.adaptiveBits(n)
    // state: band signatures + pair table (both persisted in production)
    val (standingBands, bandStateSec) = timed {
      SimilarityOps.s02Bands(emb.filter(col("vec_id") < t),
          SimilarityOps.ScaledBands, bits)
        .localCheckpoint(true)
    }
    val (standing, stateSec) = timed {
      SimilarityOps.bandPairCounts(standingBands)
        .localCheckpoint(true) // eager: the probe phase reads state only
    }
    val (incEdges, probeSec) = timed {
      val probe = SimilarityOps.incrementalProbe(emb, t,
        SimilarityOps.ScaledBands, bits, Some(standingBands))
      SimilarityOps.knnGraphFromCands(emb, standing.union(probe),
        SimilarityOps.KnnK, SimilarityOps.KnnCandCap).count()
    }
    require(fullEdges == incEdges,
      s"equality contract violated: full $fullEdges vs incremental $incEdges")
    // phase 4 (s16, r9 shape): the persisted state is the CAPPED
    // per-vector candidate LISTS plus the standing edges — the upkeep
    // job merges only touched vectors' lists with their probe entries,
    // so probe+tail cost tracks batch collision mass, not corpus size.
    val (standingCapped, listStateSec) = timed {
      SimilarityOps.cappedLists(SimilarityOps.symmetrized(standing),
          SimilarityOps.KnnCandCap)
        .localCheckpoint(true)
    }
    val (standingEdges, edgeStateSec) = timed {
      SimilarityOps.rescoreTopK(emb.filter(col("vec_id") < t),
          standingCapped, SimilarityOps.KnnK)
        .localCheckpoint(true)
    }
    var touchedOld = 0L
    val (tchEdges, touchedSec) = timed {
      val probeSym = SimilarityOps.symmetrized(
          SimilarityOps.incrementalProbe(emb, t,
            SimilarityOps.ScaledBands, bits, Some(standingBands)))
        .localCheckpoint(true)
      val touched = probeSym.select("vec_id").distinct()
      touchedOld = touched.filter(col("vec_id") < t).count()
      val reranked = SimilarityOps.knnTailFromSym(emb,
        standingCapped.join(
            org.apache.spark.sql.functions.broadcast(touched),
            Seq("vec_id"), "left_semi")
          .unionByName(probeSym),
        SimilarityOps.KnnK, SimilarityOps.KnnCandCap)
      standingEdges.join(touched, Seq("vec_id"), "left_anti")
        .unionByName(reranked).count()
    }
    require(fullEdges == tchEdges,
      s"s16 equality contract violated: full $fullEdges vs touched $tchEdges")
    // phase 5 (st11, r10 split): near-dup ADMISSION over documents —
    // standing featurizer + band index build vs the per-batch probe,
    // measured separately so the gated probe number is the production
    // number; a small (32-doc) batch shows probe cost tracking BATCH
    // size, not corpus size.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").localCheckpoint(true)
    val dMax = docs.agg(max("doc_id")).as[Long].head()
    val dt = (dMax + 1L) * (den - 1L) / den
    val (admState, admStateSec) = timed {
      SimilarityOps.admissionStateOf(docs.filter(col("doc_id") < dt))
    }
    var admAdmitted = 0L
    val (admRows, admProbeSec) = timed {
      val r = SimilarityOps.admissionProbeOf(admState,
          docs.filter(col("doc_id") >= dt))
        .agg(count(lit(1)).as("n"),
          sum(when(col("admitted"), 1L).otherwise(0L)).as("adm"))
        .head()
      admAdmitted = r.getLong(1); r.getLong(0)
    }
    val (smallRows, admSmallSec) = timed {
      SimilarityOps.admissionProbeOf(admState,
        docs.filter(col("doc_id") > dMax - 32L)).count()
    }
    println(f"""{"metric":"inc_scale","n":$n,"t":$t,"edges":$fullEdges,""" +
      f""""bits":$bits,"full_sec":$fullSec%.2f,""" +
      f""""band_state_sec":$bandStateSec%.2f,"state_sec":$stateSec%.2f,""" +
      f""""probe_sec":$probeSec%.2f,"list_state_sec":$listStateSec%.2f,""" +
      f""""edge_state_sec":$edgeStateSec%.2f,""" +
      f""""touched_sec":$touchedSec%.2f,"touched_old":$touchedOld,""" +
      f""""adm_state_sec":$admStateSec%.2f,"adm_probe_sec":$admProbeSec%.2f,""" +
      f""""adm_rows":$admRows,"adm_admitted":$admAdmitted,""" +
      f""""adm_small_probe_sec":$admSmallSec%.2f,"adm_small_rows":$smallRows,""" +
      f""""sf":"$sfDir"}""")
    spark.stop()
  }
}
