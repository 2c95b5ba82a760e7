package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.SimilarityOps

/** Library-shaped similarity-search API over ANY (id, float-vector)
  * DataFrame. Vectors are quantized to exact integers at the boundary
  * (round(x*1000)) so scores are deterministic across partitionings —
  * the same contract the DuckDB oracle validates for s01…s04 — and
  * scoring runs through the codegen'd `dot_i64`/`normsq_i64` kernels. */
object Vectors {

  private def norm(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).cast("long").as("vec_id"),
      expr(SimilarityOps.quantize(vecCol)).as("q"))

  /** Exact cosine top-k: each query vector (a SMALL set — it is broadcast)
    * scored against the full corpus in one scan; per-query top-k via
    * window. Queries identified by id membership in `queryIds`. */
  def cosineTopK(spark: SparkSession, emb: DataFrame, queryIds: Seq[Long],
                 k: Int, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val e = norm(emb, idCol, vecCol)
    SimilarityOps.bruteForceTopKOf(e,
      e.filter(col("vec_id").isin(queryIds: _*)), k)
  }

  /** Exact cosine top-k with a separate query table (its own id space):
    * the two frames are quantized identically; every query row is scored
    * against every corpus row in one broadcast-join scan. Because the id
    * spaces are independent, NO self-exclusion is applied — a corpus id
    * that happens to equal a query id is still a valid neighbor. */
  def cosineTopKFor(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
                    k: Int, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    SimilarityOps.bruteForceTopKOf(
      norm(corpus, idCol, vecCol), norm(queries, idCol, vecCol), k,
      excludeSelf = false)
  }

  /** Scalar-quantized (SQ8) top-k: vectors compress to per-component int8
    * codes with a per-vector scale; candidates rank by the cosine of the
    * CODES (4× less scan bandwidth once packed) and the winners are
    * exactly rescored — the output carries both `sim_sq8` and `sim_exact`
    * so callers can audit the quantization error before trusting the
    * compressed index (s07). */
  def sq8TopK(spark: SparkSession, emb: DataFrame, queryIds: Seq[Long],
              k: Int, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    SimilarityOps.sq8TopKOf(norm(emb, idCol, vecCol),
      col("vec_id").isin(queryIds: _*), k)
  }

  /** Binary-quantization (BQ) top-k (s18): every vector compresses to
    * 128 random-hyperplane sign bits; candidates pre-rank by HAMMING
    * distance (`bit_count(xor)` over four longs — 24 bytes per vector, the
    * memory-bandwidth win that makes BQ the densest index tier under
    * SQ8 and PQ) and the top-`r` survivors per query are exactly
    * rescored. Returns the s01-shaped (query_id, rk, neighbor_id, sim). */
  def bqTopK(spark: SparkSession, emb: DataFrame, queryIds: Seq[Long],
             k: Int, r: Int = SimilarityOps.BqRescoreR,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val q = SimilarityOps.withQuantized(
      emb.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v")), "v")
    SimilarityOps.bqTopKOf(q, q.filter(col("vec_id").isin(queryIds: _*)), k, r)
  }

  /** Filtered vector search (s19): exact top-k restricted to a metadata
    * predicate — corpus label must equal the query's label. The filter
    * is pushed INTO the search as an equi-join key (never applied as a
    * post-filter on a shortlist, which under a selective predicate
    * returns fewer than k hits). Returns (query_id, rk, neighbor_id,
    * label, sim). */
  def filteredTopK(spark: SparkSession, emb: DataFrame, queryIds: Seq[Long],
                   k: Int, idCol: String = "vec_id",
                   vecCol: String = "embedding",
                   labelCol: String = "label"): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val q = emb.select(col(idCol).cast("long").as("vec_id"),
        col(labelCol).as("label"),
        expr(SimilarityOps.quantize(vecCol)).as("q"))
      .withColumn("nrm", expr("normsq_i64(q)"))
    SimilarityOps.filteredTopKOf(q,
      q.filter(col("vec_id").isin(queryIds: _*)), k)
  }

  /** Distributed Lloyd's k-means (s12): the clustering primitive behind
    * the IVF/PQ/SemDeDup indexes as a first-class operator. Deterministic:
    * seeds are the k lowest-id vectors, assignment ties go to the lowest
    * cell, updates are truncated integer means over quantized vectors.
    * Per iteration ONE corpus pass aggregates k×dim integer sums via
    * treeAggregate (no data shuffle); the corpus parquet is read once.
    * Returns one row per vector: (vec_id, cell, d2 — exact integer
    * squared L2 to the final centroid). */
  def kmeans(spark: SparkSession, emb: DataFrame, k: Int = 8, iters: Int = 3,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    graft.queries.ClusterOps.kmeansOf(spark, norm(emb, idCol, vecCol), k, iters)

  /** Cluster topic labels (t23): the most over-represented corpus terms
    * per k-means cell by integer milli-lift — k-means the embeddings,
    * join the thin assignment to the documents on the shared id space,
    * score each (cell, term) by its cell rate over its corpus rate
    * (`(1000·tf·T) div (T_cell·ctf)`), suppress at-or-below-corpus-rate
    * terms (≤ 1000) and those under the `minTf` support floor, and keep
    * the top-`topK` per cell (score desc, term asc). One corpus text
    * scan; everything after the (cell, term) aggregate is vocab-sized.
    * Returns (cell, rk, term, tf, score_milli). */
  def clusterLabels(spark: SparkSession, emb: DataFrame, docs: DataFrame,
                    k: Int = 8, iters: Int = 3,
                    topK: Int = graft.queries.ClusterOps.LabelTopK,
                    minTf: Long = graft.queries.ClusterOps.LabelMinTf,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    docIdCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    graft.queries.ClusterOps.clusterLabelsOf(
      graft.queries.ClusterOps.kmeansOf(spark, norm(emb, idCol, vecCol),
        k, iters),
      docs.select(col(docIdCol).cast("long").as("doc_id"),
        col(textCol).as("text")),
      topK, minTf)

  /** Cluster-quality audit against reference labels (s17): k-means the
    * corpus, then score every cell's label homogeneity — size, distinct
    * label count, majority label (ties to the lowest label id) and exact
    * integer purity (milli units). The validation gate to run before
    * building per-cell curation (coresets, SemDeDup, routing) on a
    * clustering. Returns (cell, n_vecs, n_labels, top_label, top_n,
    * purity_milli), one row per non-empty cell. */
  def clusterPurity(spark: SparkSession, emb: DataFrame, k: Int = 8,
                    iters: Int = 3, idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame =
    graft.queries.ClusterOps.clusterPurityOf(
      graft.queries.ClusterOps.kmeansOf(spark, norm(emb, idCol, vecCol),
        k, iters),
      emb.select(col(idCol).cast("long").as("vec_id"),
        col(labelCol).as("label")))

  /** Cluster-balanced coreset sampling (s14, the D4-style diversity
    * selection): k-means the corpus, then keep the ceil(size/keepDen)
    * most CENTRAL vectors of every cluster — per-mode quotas instead of
    * density-blind uniform sampling. `central = false` flips the ordering
    * to keep the farthest (outlier mining). Returns one verdict row per
    * vector: (vec_id, cell, d2, cell_rank, cell_size, kept). */
  def coresetSample(spark: SparkSession, emb: DataFrame, k: Int = 8,
                    iters: Int = 3,
                    keepDen: Long = graft.queries.ClusterOps.CoresetKeepDen,
                    central: Boolean = true, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame =
    graft.queries.ClusterOps.coresetOf(
      graft.queries.ClusterOps.kmeansOf(spark, norm(emb, idCol, vecCol),
        k, iters), keepDen, central)

  /** PageRank centrality over the approximate kNN graph (s13): build the
    * s11 edge list, then run `iters` deterministic integer-PageRank
    * sweeps (damping 0.85, milli units, pr⁰ = 1000). High pr_milli marks
    * neighborhood hubs (the pruning anchors of SemDeDup/D4-style
    * curation); deg = 0 rows are isolates. Returns
    * (vec_id, deg, pr_milli). */
  def knnPagerank(spark: SparkSession, emb: DataFrame,
                  k: Int = SimilarityOps.KnnK,
                  iters: Int = graft.queries.ClusterOps.PrIters,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val q = SimilarityOps.withQuantized(
      emb.select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).as("embedding")), "embedding")
    val edges = SimilarityOps.knnGraphOf(q, k)
      .select("vec_id", "neighbor_id").localCheckpoint(true)
    graft.queries.ClusterOps.pagerankOf(
      q.select("vec_id").localCheckpoint(true), edges, iters)
  }

  /** Approximate kNN-graph construction (s11): every corpus vector's
    * top-`k` neighbors among banded-LSH candidates (`bands` × `bandBits`
    * OR/AND construction; the default is the adaptive production rule — 64 bands × clamp(ceil(log₂ n), 8, 18) bits) — the input
    * primitive of graph-based curation (cluster pruning, near-dup
    * families, diversity sampling). Each vector's candidates are capped
    * at its `candCap` most-collision-frequent partners BEFORE the exact
    * integer rescore (the LSH multi-probe ranking) so the payload-heavy
    * rescore is ≤ 2·candCap·n edges — linear at any corpus size; one
    * per-vector top-k window, no cross product. Returns (vec_id, rk,
    * neighbor_id, sim); vectors whose bands collide with nothing have no
    * rows. */
  def knnGraph(spark: SparkSession, emb: DataFrame,
               k: Int = SimilarityOps.KnnK,
               bands: Int = SimilarityOps.ScaledBands,
               bandBits: Int = SimilarityOps.AdaptiveBits,
               candCap: Int = SimilarityOps.KnnCandCap,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    SimilarityOps.knnGraphOf(
      SimilarityOps.withQuantized(
        emb.select(col(idCol).cast("long").as("vec_id"), col(vecCol)), vecCol),
      k, bands, bandBits, candCap)
  }

  /** Incremental kNN-graph maintenance (s15): absorb `batch` into the
    * kNN graph of `standing` without recomputing the standing pairs —
    * the per-pair collision state of the old corpus is reused as-is and
    * only the batch probes the band index. The merged graph EQUALS a
    * full [[knnGraph]] rebuild over standing ∪ batch row-for-row (band
    * signatures are per-vector, so the candidate tables partition). The
    * contract requires every batch id to be GREATER than every standing
    * id (append-ordered ingest — what makes the probe enumerate exactly
    * the new pairs); violations fail by name. */
  def knnGraphAddBatch(spark: SparkSession, standing: DataFrame,
                       batch: DataFrame, k: Int = SimilarityOps.KnnK,
                       bands: Int = SimilarityOps.ScaledBands,
                       bandBits: Int = SimilarityOps.AdaptiveBits,
                       candCap: Int = SimilarityOps.KnnCandCap,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val (all, t) = prepAppendBatch(spark, standing, batch, idCol, vecCol,
      "knnGraphAddBatch")
    SimilarityOps.incrementalKnnOf(all, t, k, bands, bandBits, candCap)
  }

  /** Touched-only kNN-graph upkeep (s16): same append-ordered
    * standing/batch contract and the same exact-equality result as
    * [[knnGraphAddBatch]], but the cap/rescore/top-k tail runs ONLY over
    * the vectors the probe touched — untouched standing vectors keep
    * their edges verbatim (old×old collision counts are immutable under
    * append-only ingest, so their candidate multisets are bit-identical).
    * Upkeep cost O(batch collision mass + touched·cap) instead of
    * O(corpus·cap); the result still equals a from-scratch knnGraph of
    * standing ∪ batch row-for-row. */
  def knnGraphUpkeep(spark: SparkSession, standing: DataFrame,
                     batch: DataFrame, k: Int = SimilarityOps.KnnK,
                     bands: Int = SimilarityOps.ScaledBands,
                     bandBits: Int = SimilarityOps.AdaptiveBits,
                     candCap: Int = SimilarityOps.KnnCandCap,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val (all, t) = prepAppendBatch(spark, standing, batch, idCol, vecCol,
      "knnGraphUpkeep")
    SimilarityOps.touchedKnnOf(all, t, k, bands, bandBits, candCap)
  }

  /** Shared validation + quantization for the incremental-graph facades:
    * fails by name on empty frames and on a batch id space that does not
    * strictly follow the standing ids (append-ordered ingest contract). */
  private def prepAppendBatch(spark: SparkSession, standing: DataFrame,
                              batch: DataFrame, idCol: String, vecCol: String,
                              caller: String): (DataFrame, Long) = {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // validate on the CHEAP id aggregates first (empty frames fail by
    // name, not NPE; a contract-violating call never pays quantization)
    val maxOld = standing.agg(max(col(idCol).cast("long"))).as[Option[Long]]
      .head().getOrElse(throw new IllegalArgumentException(
        s"$caller: standing corpus is empty — build the initial " +
          "graph with knnGraph instead"))
    val minNew = batch.agg(min(col(idCol).cast("long"))).as[Option[Long]]
      .head().getOrElse(throw new IllegalArgumentException(
        s"$caller: batch is empty — nothing to absorb"))
    require(maxOld < minNew,
      s"$caller: batch ids must all exceed standing ids " +
        s"(append-ordered ingest), got standing max $maxOld >= batch min " +
        s"$minNew — re-key the batch first")
    val all = SimilarityOps.withQuantized(
      standing.select(col(idCol).cast("long").as("vec_id"), col(vecCol))
        .unionByName(
          batch.select(col(idCol).cast("long").as("vec_id"), col(vecCol))),
      vecCol).localCheckpoint(true)
    (all, minNew)
  }

  /** MMR diversified re-ranking (s10, Carbonell & Goldstein 1998): from
    * each query's exact top-`pool` cosine shortlist, greedily select `k`
    * results maximizing `lambda10/10`·relevance − `(10−lambda10)/10`·
    * max-similarity-to-already-selected — the standard stage that keeps
    * near-duplicate hits from crowding a result page. The objective is
    * exact integer micro-cosine arithmetic (ties break by ascending id),
    * the shortlist is one checkpointed corpus scan, and the greedy loop
    * runs `k` metadata-sized jobs — the corpus is never rescanned.
    * Returns (query_id, rank, vec_id, rel_micro, maxsim_micro, mmr10). */
  def mmrRerank(spark: SparkSession, emb: DataFrame, queryIds: Seq[Long],
                k: Int = SimilarityOps.MmrK, pool: Int = SimilarityOps.MmrPool,
                lambda10: Int = SimilarityOps.MmrLambda10,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val e = norm(emb, idCol, vecCol)
    SimilarityOps.mmrRerankOf(e,
      e.filter(col("vec_id").isin(queryIds: _*)), pool, k, lambda10)
  }

  /** Sign-LSH bucketed approximate top-k: 8 random hyperplanes hash every
    * vector into one of 256 buckets; neighbors are scored only within the
    * query's bucket (equi-join on bucket — n/256 work per query). */
  def lshTopK(spark: SparkSession, emb: DataFrame, queryIds: Seq[Long],
              k: Int, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    SimilarityOps.lshTopKOf(
      SimilarityOps.withQuantized(
        emb.select(col(idCol).cast("long").as("vec_id"), col(vecCol)), vecCol),
      col("a.vec_id").isin(queryIds: _*), k)
  }

  /** IVF-flat approximate top-k: sqrt(n) coarse cells (seeded from the
    * first vectors — a deterministic stand-in for a trained quantizer),
    * each query probes its `nProbe` nearest cells and scores only those
    * cells' members — NProbe·sqrt(n) work per query instead of n. */
  def ivfTopK(spark: SparkSession, emb: DataFrame, queryIds: Seq[Long],
              k: Int, nProbe: Int = 2, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val e = emb.select(col(idCol).cast("long").as("vec_id"),
      expr(SimilarityOps.quantize(vecCol)).as("q")).as[(Long, Array[Long])]
    // centroid seeding needs one count + one sqrt(n)-row collect up front;
    // the returned probe-and-score plan itself is lazy (the deterministic
    // tagging subtree feeds both join sides — persist it via the input if
    // reused across actions; the facade never persists on the caller's
    // behalf, matching [[graft.ops.Corpus]])
    SimilarityOps.ivfBuildOf(SimilarityOps.ivfTagOf(spark, e, nProbe),
      col("vec_id").isin(queryIds: _*), k)
  }

  /** IVF-PQ ANN top-k (s08, the FAISS `IVFx,PQy` production index family):
    * IVF coarse cells restrict each query to `nProbe` probe lists,
    * candidates rank by asymmetric PQ distance (per-subquantizer codebook
    * lookup tables via the codegen'd `pq_adc_i64` kernel), and the
    * shortlist is exactly rescored and re-ranked on the full-precision
    * vectors. Codebooks train driver-side on a deterministic
    * metadata-sized sample with integer Lloyd iterations. Returns
    * (query_id, rk, neighbor_id, sim_pq, sim_exact). */
  def ivfPqTopK(spark: SparkSession, emb: DataFrame, queryIds: Seq[Long],
                k: Int, nProbe: Int = 2, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val e = emb.select(col(idCol).cast("long").as("vec_id"),
      expr(SimilarityOps.quantize(vecCol)).as("q")).as[(Long, Array[Long])]
    SimilarityOps.ivfPqBuildOf(spark,
      SimilarityOps.ivfTagOf(spark, e, nProbe),
      col("vec_id").isin(queryIds: _*), k)
  }

  /** Embedding near-duplicate pairs at an exact-cosine threshold: banded
    * random-hyperplane LSH candidate generation (equi-join on band
    * signatures — never all pairs) + exact integer rescore of candidates
    * only. APPROXIMATE RECALL at the stated construction; precision exact.
    *
    * SCALE TUNING (`bands` × `bandBits`): random-collision candidate mass
    * scales ~ bands · n² / 2^bandBits while recall at the threshold is
    * 1-(1-p^bandBits)^bands with p = 1-acos(threshold)/π. The DEFAULT is
    * the production adaptive rule — bandBits = clamp(ceil(log₂ n), 8, 18)
    * with 64 bands — whose collision floor is ~bands·n (LINEAR: each
    * doubling of the corpus adds one bit and halves the per-pair
    * probability; the classic n^(1+ρ) LSH regime). Measured at 20k
    * vectors: 71× fewer candidates than a fixed 32×8 with zero survivor
    * loss at t = 0.8 (SCALE_r8 §2). Pass explicit `bandBits` past 2^18
    * vectors or to trade recall for cost at a low threshold — recall at
    * sub-noise thresholds (< ~0.6 in 64 dims) decays as bits grow, and
    * the exact output there is itself Θ(n²) (SCALE_r8 §1): no
    * construction emits it linearly. */
  def nearDuplicatePairs(spark: SparkSession, emb: DataFrame,
                         threshold: Double = 0.45,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding",
                         bands: Int = SimilarityOps.ScaledBands,
                         bandBits: Int = SimilarityOps.AdaptiveBits): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    SimilarityOps.nearDupPairsOf(
      SimilarityOps.withQuantized(
        emb.select(col(idCol).cast("long").as("vec_id"), col(vecCol)),
        vecCol),
      threshold, bands, bandBits)
  }

  /** Semantic deduplication (the SemDeDup shape, arXiv:2303.09540): the
    * corpus is clustered by the deterministic IVF coarse quantizer, and
    * within each cluster every vector with a lower-id near-twin at exact
    * cosine >= `threshold` is marked pruned. Returns one verdict row per
    * vector: (vec_id, cell, kept).
    *
    * Recall is bounded by the clustering (a near-twin pair split across
    * cells is never compared — the paper's trade), precision is exact.
    *
    * SCALE TUNING (`numCells`): the default (<= 0) uses the gated s06
    * rule, max(ceil(sqrt(n)), n / 64) cells — sqrt(n) cells below the
    * 4,096-vector crossover, ~64-vector cells beyond it, so within-cell
    * pair mass is linear in n (the paper's k ∝ n LAION-scale regime).
    * Pass numCells ≈ n / targetCellSize for an explicit target. Either
    * way assignment runs the TWO-LEVEL quantizer: only ceil(sqrt(cells))
    * coarse centroids ever reach the driver, and assignment work is
    * n·sqrt(cells) — never the flat n·cells scan. */
  def semanticDedup(spark: SparkSession, emb: DataFrame,
                    threshold: Double = 0.45,
                    numCells: Long = 0L,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val e = emb.select(col(idCol).cast("long").as("vec_id"),
      expr(SimilarityOps.quantize(vecCol)).as("q")).as[(Long, Array[Long])]
    val cells =
      if (numCells > 0) numCells
      else {
        val n = e.count()
        math.max(math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong),
          n / SimilarityOps.SemDedupCellTarget)
      }
    SimilarityOps.semanticDedupOf(
      SimilarityOps.ivfTagTwoLevel(spark, e, cells), threshold)
  }
}
