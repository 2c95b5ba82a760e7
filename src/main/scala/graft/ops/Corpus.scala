package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{DedupOps, DedupOps2}

/** Library-shaped corpus dedup API: the same operators the driver-checked
  * `d01…d09` queries exercise, parameterized over ANY (id, text) DataFrame
  * instead of the benchmark's `documents` table. Column names are
  * normalized at the boundary (`select id as doc_id, text`), so every call
  * delegates to the one implementation the DuckDB oracle validates —
  * the facade cannot drift from the gated semantics.
  *
  * All operators keep the gated scale shape: candidate pairs come from
  * equi-joins on shingle/band keys (never a cross join), hot shingles are
  * df-capped with hard-bounded aggregation state, and clustering runs a
  * single-task union-find for small candidate graphs with distributed
  * pointer-doubling propagation beyond [[DedupOps.SingleTaskEdgeMax]].
  *
  * Every operator returns a LAZY plan — nothing executes until the caller
  * runs an action, so results compose under Catalyst and survive executor
  * loss by recomputation (all subtrees are deterministic). Callers reusing
  * a result across multiple actions should `persist` it themselves; the
  * facade never persists on the caller's behalf.
  */
object Corpus {

  /** Normalize to the internal (doc_id, text) shape. `idCol` must be
    * integral and unique per row (the shingle algebra's invariant). */
  private def norm(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))

  /** Exact-content duplicate groups: one row per distinct content with its
    * canonical (minimum) id and copy count. */
  def exactDuplicateGroups(docs: DataFrame, idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame =
    DedupOps.exactGroupsOf(norm(docs, idCol, textCol))

  /** Word-trigram shingle table (doc_id, g), per-document distinct. */
  def shingles(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    DedupOps.shinglesOf(norm(docs, idCol, textCol))

  /** MinHash signature matrix (deterministic permutations; the gated d03
    * width is 16 — widen `numHashes` for finer similarity resolution). */
  def minhashSignatures(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text",
                        numHashes: Int = 16): DataFrame =
    DedupOps.minhashSigOf(shingles(docs, idCol, textCol), numHashes)

  /** Banded-LSH near-duplicate candidate pairs with estimated similarity
    * (fraction of agreeing minhashes).
    *
    * LAZY, like every facade operator: the returned plan computes nothing
    * until an action runs, so a caller can compose/filter it and Catalyst
    * optimizes the whole. The deterministic signature subtree appears in
    * the band and scoring branches, but within ONE action AQE reuses the
    * signature exchange (ReusedQueryStage, pinned by `PlanSpec`) so the
    * expensive aggregation runs once; persist `docs` (or the result)
    * before multi-action reuse. The driver-gated d04 query keeps the eager
    * cache-and-release pattern for its bounded bench output — that pattern
    * is wrong for a library API (it forces computation at call time and
    * stores non-replicated executor-local blocks an executor loss cannot
    * rebuild). */
  def minhashCandidatePairs(spark: SparkSession, docs: DataFrame,
                            idCol: String = "doc_id",
                            textCol: String = "text",
                            numHashes: Int = 16,
                            numBands: Int = 4): DataFrame =
    DedupOps.lshPairsOf(
      minhashSignatures(docs, idCol, textCol, numHashes), numBands)

  /** n-gram Jaccard near-duplicate pairs (threshold 0.8): ONE df-capped
    * shingle-grouping pass (bounded per-group state via the
    * `collect_list_capped` aggregate, registered here), in-group pair
    * emission, exact integer Jaccard.
    *
    * Domain: ids must be non-negative and < 2^42 (they are packed with the
    * per-doc shingle count into one long; out-of-range ids fail loudly
    * with `raise_error`, never wrap). Ids from 60-bit hashes or from
    * `monotonically_increasing_id` past partition 511 exceed the range —
    * remap such ids to a dense domain first. Cost note: the capped-group
    * subtree feeds both the pair and the count branches and the branches
    * prune different columns, so one action computes the grouping twice;
    * for repeated actions persist the RESULT (the grouped intermediate is
    * not exposed). */
  def ngramJaccardPairs(spark: SparkSession, docs: DataFrame,
                        idCol: String = "doc_id",
                        textCol: String = "text",
                        threshold: Double = 0.8): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    DedupOps.d02Build(
      DedupOps.groupedShinglesOf(shingles(docs, idCol, textCol)), threshold)
  }

  /** Connected components over an undirected candidate-pair frame (first
    * two columns = the pair): (doc_id, label) with label = component min. */
  def duplicateComponents(spark: SparkSession, pairs: DataFrame): DataFrame =
    DedupOps.connectedComponents(spark, pairs, DedupOps.SingleTaskEdgeMax)

  /** Full near-dup clustering: minhash LSH candidates → connected
    * components → one row per cluster with size and canonical id. */
  def duplicateClusters(spark: SparkSession, docs: DataFrame,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame =
    duplicateComponents(spark,
      minhashCandidatePairs(spark, docs, idCol, textCol)
        .select("doc_a", "doc_b"))
      .groupBy("label").agg(
        count(lit(1)).as("cluster_size"),
        min("doc_id").as("canonical_id"))
      .select(col("label").as("cluster_id"), col("cluster_size"),
        col("canonical_id"))

  /** Leakage-safe train/val split (d13): the split decision is
    * CLUSTER-atomic — every document joins its minhash-LSH near-dup
    * component and the held-out choice hashes the CLUSTER id, so two
    * near-duplicates can never straddle the eval boundary (a val doc
    * whose near-twin sits in train is partially memorized, and eval loss
    * understates held-out loss). Documents in no candidate pair are
    * singleton clusters. ≈ 1/mod of clusters land in 'val'. Returns
    * (doc_id, cluster_id, split). */
  def leakageSafeSplit(spark: SparkSession, docs: DataFrame,
                       mod: Long = graft.queries.DedupOps2.LeakSplitMod,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    graft.queries.DedupOps2.leakageSplitOf(spark,
      norm(docs, idCol, textCol).select("doc_id"),
      minhashCandidatePairs(spark, docs, idCol, textCol)
        .select("doc_a", "doc_b"), mod)

  /** 32-bit term-frequency-weighted SimHash per document. */
  def simhashSignatures(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame =
    DedupOps.simhashOf(norm(docs, idCol, textCol))

  /** SimHash near-duplicate pairs (Hamming distance <= 6) via 8-bit
    * sub-band bucketing — never a cross join. */
  def simhashPairs(spark: SparkSession, docs: DataFrame,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    // lazy; the deterministic simhash subtree is the self-join's both sides
    // (see [[minhashCandidatePairs]] for the persistence guidance)
    DedupOps.simhashPairsOf(simhashSignatures(docs, idCol, textCol))

  /** Exact substring-span dedup (d10, the ExactSubstr family of
    * arXiv:2107.06499): per-document accounting of token spans duplicated
    * across >= 2 documents, merged as maximal TOKEN INTERVALS (a span of
    * duplicated k-gram starts i0..i1 covers exactly i1 - i0 + k tokens;
    * overlapping gram windows never double-count, so dup_frac <= 1). Only
    * contaminated docs appear in the output. */
  def duplicatedSpans(docs: DataFrame, k: Int = 5,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    require(k >= 2, s"span width k must be >= 2, got $k")
    graft.queries.DedupOps2.spanDedupOf(norm(docs, idCol, textCol), k)
  }

  /** Longest cross-document duplicated token span (d11, the suffix-
    * ordering machinery behind ExactSubstr): per document, the longest
    * span (capped at `cap` tokens) shared verbatim with any other
    * document, plus a partner doc achieving it (the lowest doc id among
    * the ADJACENT-suffix witnesses — other docs may share the same span
    * without being the adjacent witness). One distributed
    * range-partitioned suffix sort + an adjacent-LCP pass (the suffix-
    * array adjacency theorem); spans shorter than `minSpan` are not
    * reported. The result is eagerly checkpointed (the sorted suffix
    * frame is cached for the boundary fix-up and released before
    * returning). */
  def longestSharedSpans(spark: org.apache.spark.sql.SparkSession,
                         docs: DataFrame, cap: Int = 30, minSpan: Int = 5,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    require(cap >= minSpan && minSpan >= 1,
      s"need cap >= minSpan >= 1, got cap=$cap minSpan=$minSpan")
    graft.queries.DedupOps2.suffixSpansOf(spark,
      norm(docs, idCol, textCol), cap, minSpan)
  }

  /** Soft (weighted) deduplication (d12): every exact copy stays with
    * sampling weight `1000 div n_copies` milli-units, so duplicated
    * content's total training exposure equals one copy's — the
    * down-weight-don't-drop alternative to [[exactDuplicateGroups]].
    * Returns (doc_id, n_copies, n_tokens, weight_milli,
    * eff_tokens_milli). One scan + one content-hash count window, no
    * join. */
  def softDedupWeights(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    DedupOps2.softDedupOf(norm(docs, idCol, textCol))

  /** Marginal-novelty scoring in ingestion order (t21): per document,
    * the fraction (integer milli-units) of its DISTINCT word k-grams
    * that no lower-id document contains — the streaming-curation signal
    * "how much of this doc was new when it arrived" (the incremental
    * complement of [[duplicatedSpans]]' symmetric accounting). Returns
    * (doc_id, n_grams, n_novel, novel_milli); docs with < k words are
    * omitted. One scan, three keyed exchanges, no join. */
  def noveltyFractions(docs: DataFrame, k: Int = graft.queries.SelectionOps.NoveltyK,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    graft.queries.SelectionOps.noveltyOf(norm(docs, idCol, textCol), k)

  def segments(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    DedupOps2.segmentsOf(norm(docs, idCol, textCol))

  /** Segment-level dedup accounting: per document, how many segments it
    * holds, how many are non-canonical duplicates, and how many words
    * survive keeping only the globally-first occurrence of each segment. */
  def paragraphDedup(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame =
    DedupOps2.paragraphDedupOf(norm(docs, idCol, textCol))

  /** Prefix-filtered set-similarity join (d15, the PPJoin family —
    * Bayardo WWW'07 / Xiao WWW'08): ALL pairs with word-`k`-gram-set
    * Jaccard ≥ `t10`/10, EXACT at every document frequency (where
    * [[nearDuplicatePairs]]'s MinHash banding and the df-capped n-gram
    * join are recall-bounded approximations). Candidates come from an
    * equi-join on rarest-first prefix grams — provably lossless — plus
    * the length filter; returns (doc_a, doc_b, inter, union_n,
    * jacc_milli). */
  def ppjoinPairs(docs: DataFrame, t10: Int = DedupOps.PpJoinT10,
                  k: Int = DedupOps.PpJoinK, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    DedupOps.ppjoinPairsOf(norm(docs, idCol, textCol), t10, k)

  /** Containment join (d17): all DIRECTED pairs with
    * C(A→B) = |A∩B| / |A| ≥ `t10`/10 over word-`k`-gram sets — the
    * asymmetric sibling of [[ppjoinPairs]] and the set-level quote/
    * inclusion detector (a paragraph quoted in a 100× larger doc has
    * C ≈ 1 but Jaccard ≈ 1%). One-sided prefix filter on the contained
    * side, provably lossless. Returns (doc_a contained-in doc_b, na,
    * inter, containment_milli). */
  def containmentPairs(docs: DataFrame, t10: Int = DedupOps.ContainT10,
                       k: Int = DedupOps.PpJoinK, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    DedupOps.containmentPairsOf(norm(docs, idCol, textCol), t10, k)

  /** Near-duplicate FAMILY pruning (p12): pairs from the production
    * adaptive-LSH doc embedding ([[graft.ops.Text.nearDuplicateDocs]])
    * become an undirected graph; connected components group transitive
    * duplicate families, each keeping its min-id canonical. Returns one
    * row per family: (family_id, family_size, canonical_id, max_sim —
    * the family's strongest internal similarity, the curator's merge-
    * certainty audit column). Pair mass is survivor-sized (linear under
    * the adaptive construction); everything downstream is family-count-
    * sized. */
  def nearDupFamilies(spark: SparkSession, docs: DataFrame,
                      threshold: Double =
                        graft.queries.SimilarityOps.NearDupThreshold,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    graft.queries.PipelineOps.neardupFamiliesOf(spark,
      graft.ops.Text
        .nearDuplicateDocs(spark, docs, threshold, idCol = idCol, textCol = textCol)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"), col("sim")))

  /** Capped-join recall audit (d16): exact prefix-join trigram pairs at
    * Jaccard ≥ 0.8 over a deterministic `doc_id % sampleDen` doc sample,
    * each flagged by whether the PRODUCTION df-capped n-gram join
    * ([[ngramJaccardPairs]], computed over the FULL corpus — its caps
    * are what is being audited) found it. The within-sample found-rate
    * estimates the capped join's recall; the sample divides the exact
    * join's quadratic shingle mass by sampleDen². Pass sampleDen = 1
    * for the full offline certification (every exact pair audited —
    * unrunnable at large corpus scale, which is the point of the
    * sample). Returns (doc_a, doc_b, jacc_milli, found_by_capped). */
  def dedupRecallAudit(spark: SparkSession, docs: DataFrame,
                       sampleDen: Long = DedupOps.AuditSampleDen,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    DedupOps.recallAuditOf(norm(docs, idCol, textCol),
      ngramJaccardPairs(spark, docs, idCol, textCol), sampleDen)

  /** Cross-source duplicate provenance (d14): per duplicated segment
    * (the d08 unit, same hash + canonical key), its copy count, source
    * spread, dominant source and the cross-source flag — boilerplate
    * (one source: fix that extractor) vs syndication (many: keep one
    * canonical) triage. `sourceCol` is any grouping of provenance
    * (feed, domain, crawl snapshot). */
  def dupProvenance(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text",
                    sourceCol: String = "source"): DataFrame =
    DedupOps2.dupProvenanceOf(docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(sourceCol).as("source"), col(textCol).as("text")))

  /** Incremental-ingest dedup: which documents of `newBatch` repeat
    * segment-level content already present in `corpus`? The batch's
    * distinct segment hashes build a Bloom filter (the SMALL side —
    * broadcast-sized regardless of corpus size); the corpus segment scan
    * is prefiltered by it and an exact hash join removes false positives,
    * so the result equals the plain semi-join while the shuffle carries
    * only collisions. */
  def incrementalDedup(spark: SparkSession, corpus: DataFrame,
                       newBatch: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    DedupOps2.bloomIncrementalOf(spark,
      norm(corpus, idCol, textCol), norm(newBatch, idCol, textCol))
}
