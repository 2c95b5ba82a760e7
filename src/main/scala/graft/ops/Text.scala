package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.TextOps

/** Library-shaped text-analysis API: the quality/cleaning/fingerprinting
  * operators the driver-checked `t01…t10` queries exercise, parameterized
  * over ANY (id, text) DataFrame. Column names are normalized at the
  * boundary and calls delegate to the oracle-gated kernels (same pattern
  * as [[Corpus]]). Every operator here is a single codegen'd scan — a
  * map-only pass at any corpus scale.
  */
object Text {

  private def norm(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))

  /** Token/length/stopword/uniqueness statistics per document (t01). */
  def stats(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    TextOps.textStatsOf(norm(docs, idCol, textCol))

  /** md5 + 60-bit + winnowing-style rolling fingerprints (t03). */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    TextOps.fingerprintOf(norm(docs, idCol, textCol))

  /** Deterministic 64-dim hashed-bigram document embeddings (the s02
    * feature map): every word bigram hashes to an integer vector (md5
    * arithmetic — no model, no driver state) and a document embeds as
    * the tf-weighted integer sum. One corpus scan + a vocab-sized
    * distributed gram-vector table; docs with < 2 words have no vector.
    * Returns (doc_id, q: array<bigint>, nrm) — the exact-integer frame
    * the [[Vectors]]-style kernels consume directly. */
  def bigramEmbeddings(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    graft.queries.SimilarityOps.docBigramVectors(norm(docs, idCol, textCol))
      .withColumnRenamed("vec_id", "doc_id")

  /** PRODUCTION near-duplicate document pairs (s02): hashed-bigram
    * embeddings + adaptive banded LSH (64 bands ×
    * clamp(ceil(log₂ n), 8, 18) bits — candidate floor ~bands·n, LINEAR
    * at any corpus size) + exact integer rescore at cosine ≥
    * `threshold`. Returns (vec_a, vec_b, sim) over doc ids. */
  /** Near-duplicate ADMISSION of an arriving doc batch against a
    * standing corpus (st11): the standing corpus defines a frozen
    * featurizer (its idf table, doc count and adaptive bit width —
    * ingest gates don't recompute global stats per batch; unseen grams
    * take the rarest weight) plus a band index, each batch doc embeds
    * and probes it, and a doc is admitted iff no standing doc reaches
    * cosine ≥ `threshold`. Per-doc against standing state only, so
    * micro-batch boundaries never change a verdict — see
    * [[graft.streaming.StreamingPipelines.nearDupAdmitBatch]] for the
    * foreachBatch streaming driver. Returns (doc_id, n_candidates,
    * max_sim, admitted) for the batch. */
  def nearDuplicateAdmission(spark: SparkSession, standing: DataFrame,
                             batch: DataFrame,
                             threshold: Double =
                               graft.queries.SimilarityOps.NearDupThreshold,
                             idCol: String = "doc_id",
                             textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    graft.queries.SimilarityOps.nearDupAdmissionOf(
      norm(standing, idCol, textCol), norm(batch, idCol, textCol), threshold)
  }

  def nearDuplicateDocs(spark: SparkSession, docs: DataFrame,
                        threshold: Double =
                          graft.queries.SimilarityOps.NearDupThreshold,
                        bands: Int = graft.queries.SimilarityOps.ScaledBands,
                        bandBits: Int = graft.queries.SimilarityOps.AdaptiveBits,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val d = norm(docs, idCol, textCol)
    // resolve the adaptive bit width against the RAW doc count (like the
    // gated s02), not the embeddable subset (docs with >= 2 words): the
    // two counts can straddle a power-of-two fence when short docs exist,
    // and the facade must pick the same candidate structure as the gated
    // query and its oracle
    val bits =
      if (bandBits == graft.queries.SimilarityOps.AdaptiveBits)
        graft.queries.SimilarityOps.adaptiveBits(d.count())
      else bandBits
    graft.queries.SimilarityOps.nearDupPairsOf(
      graft.queries.SimilarityOps.docBigramVectors(d).localCheckpoint(true),
      threshold, bands, bits)
  }

  /** Whitespace vs BPE-ish (GPT-2 pre-tokenizer shape) token counts (t06). */
  def tokenCounts(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    TextOps.bpeTokensOf(norm(docs, idCol, textCol))

  /** Trim/collapse/strip normalization with before/after accounting (t08). */
  def cleaned(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame =
    TextOps.cleanTextOf(norm(docs, idCol, textCol))

  /** Gopher-style within-document repetition signals + keep flag (t10).
    * Documents shorter than 3 tokens are excluded (no trigram exists). */
  def repetitionSignals(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame =
    TextOps.repetitionOf(norm(docs, idCol, textCol))

  /** BPE merge learning (t17): learn the first `nMerges` byte-pair merges
    * from any corpus — one corpus scan to a word-frequency table, then
    * vocab-sized merge iterations (the production tokenizer-trainer
    * shape). Returns (merge_no, pair, merged, cnt).
    *
    * `batch` > 1 accepts up to that many SYMBOL-DISJOINT pairs per
    * iteration (greedy by rank; overlapping pairs defer) — the standard
    * batched-BPE trick that turns a 50k-merge training run from 50k
    * driver round-trips into ~50k/batch. Equal to sequential whenever no
    * merge creates a pair outranking a later accepted one (pinned by
    * spec on a disjoint-pair corpus); batch=1 is exactly sequential.
    *
    * Caveat: merge APPLICATION uses a boundary-replace pass, which equals
    * reference BPE's greedy left-to-right pairwise scan except on words
    * containing a 5+-fold repetition of the merged substring (e.g.
    * "aaaaa" when merging a+a) — there the replace pass merges all
    * occurrences at once where greedy BPE leaves stragglers. Pair counts
    * on such words can differ from a reference trainer's. The benchmark
    * corpus is spec-asserted free of this shape (TextApiSpec's
    * `(.+)\\1{4}` probe); on arbitrary corpora, screen the word table
    * with that regex if exact reference-trainer parity matters. */
  def bpeMerges(docs: DataFrame, nMerges: Int = TextOps.BpeMergeCount,
                idCol: String = "doc_id",
                textCol: String = "text",
                batch: Int = 1): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    TextOps.bpeMergesOf(norm(docs, idCol, textCol), nMerges, batch)
  }

  /** Late-interaction (MaxSim / ColBERT) retrieval (s09): score query
    * documents against the corpus as the sum over query token occurrences
    * of the max token-level cosine — token-granular relevance instead of
    * one pooled vector. The token×token interaction collapses to a
    * broadcast (query vocab × corpus vocab) similarity table (exact
    * integer micro-units), so scoring is pure equi-joins over the
    * inverted (doc, word) index. Returns (query_id, rk, doc_id,
    * n_q_tokens, maxsim_milli). Intended for bounded dictionaries; at an
    * unbounded vocabulary substitute per-token ANN for the dense table. */
  def lateInteractionTopK(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
                          queryIds: Seq[Long], k: Int = 5,
                          idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame =
    graft.queries.SimilarityOps.maxsimTopKOf(spark,
      norm(docs, idCol, textCol),
      col("doc_id").isin(queryIds: _*), k)

  /** BM25 TOP-K (t22): sparse lexical retrieval through the inverted
    * index — each query document's DISTINCT words score every other
    * document with exact-integer BM25 (k1=1.2, b=0.75; idf as the
    * floor-log2 bit length, tf saturation rationalized to an integer
    * ratio in milli units). The classical counterpart of
    * [[Vectors.cosineTopK]]'s dense arm and one side of every hybrid
    * retrieval stack. Returns (query_id, rk, doc_id, n_hit_terms,
    * score_milli), rk by score desc / doc_id asc. */
  def bm25TopK(docs: DataFrame, queryIds: Seq[Long], k: Int = 5,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    graft.queries.RetrievalOps.bm25TopKOf(
      norm(docs, idCol, textCol),
      col("doc_id").isin(queryIds: _*), k)

  /** BPE ENCODE (t19): learn `nMerges` merges from the corpus (t17's
    * trainer, `batch` forwarded) and tokenize every document with them —
    * the train-once/encode-everything loop of a production tokenizer.
    * The merge table applies as literal replace chains in a map-only
    * scan. Returns per doc (n_words, chars_total, tokens_after,
    * compression_pm). The t17 repetition caveat applies to encode too. */
  def bpeEncode(docs: DataFrame, nMerges: Int = TextOps.BpeMergeCount,
                idCol: String = "doc_id", textCol: String = "text",
                batch: Int = 1): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    TextOps.bpeEncodeOf(norm(docs, idCol, textCol), nMerges, batch)
  }

  /** Retrieval chunking (t16): fixed token windows advancing by `stride`
    * (overlap = window - stride) with per-chunk offsets and content
    * fingerprints — the chunk table a RAG embedding/index stage consumes. */
  def chunkWindows(docs: DataFrame,
                   window: Int = TextOps.ChunkWindow,
                   stride: Int = TextOps.ChunkStride,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(window >= stride && stride > 0,
      s"window $window must be >= stride $stride > 0 (gaps would drop tokens)")
    TextOps.chunkWindowsOf(norm(docs, idCol, textCol), window, stride)
  }

  /** Corpus-driven stopword discovery (t25): the top-`topK` terms by
    * document frequency among those in ≥ `minDfMilli`/1000 of documents
    * — the language-adaptive input to [[gopherFilters]]'s stopword
    * parameter (the CCNet per-language loop: discover function words,
    * then gate on them). Returns (rk, term, df, df_milli). */
  def stopwordDiscovery(spark: SparkSession, docs: DataFrame,
                        topK: Int = graft.queries.TextOps.StopTopK,
                        minDfMilli: Long = graft.queries.TextOps.StopMinDfMilli,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame =
    TextOps.stopwordDiscoveryOf(spark, norm(docs, idCol, textCol),
      topK, minDfMilli)

  /** Vocabulary-growth audit (t24, Heaps' law): split the corpus into
    * `slices` equal id-ordered slices and report per slice the token
    * mass, novel-term count, cumulative vocabulary and integer novelty
    * rate — the corpus-health curve that flattens under duplication and
    * straightens under vocabulary explosion. */
  def vocabGrowth(spark: SparkSession, docs: DataFrame,
                  slices: Int = graft.queries.TextOps.HeapsSlices,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    TextOps.vocabGrowthOf(spark, norm(docs, idCol, textCol), slices)

  /** Temperature-weighted data-mix weights per source (t15): token mass,
    * raw share, and the w ∝ tokens^0.5 sampling weight + boost — the
    * source-mixing step of pre-training data assembly. */
  def mixWeights(docs: DataFrame, sourceCol: String = "source",
                 textCol: String = "text"): DataFrame =
    TextOps.mixWeightsOf(docs.select(
      col(sourceCol).as("source"), col(textCol).as("text")))

  /** Gopher-style quality-filter rules (t14): per-rule pass flags
    * (word-count bounds, mean-word-length band, required stopwords) and
    * the combined keep — the auditable pre-training admission gate. The
    * stopword rule defaults to the paper's §A.1.1 gate: >= 2 distinct
    * words from the 8-stopword list in
    * [[graft.queries.TextOps.GopherStopwords]] (the, be, to, of, and,
    * that, have, with); pass `stopwords` to substitute a
    * corpus-appropriate set (the oracle-gated benchmark entries use
    * {the, a} because the synthetic vocabulary contains only 'the' from
    * the paper's list — an explicit simplification, not Gopher
    * fidelity). */
  def gopherFilters(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text",
                    stopwords: Seq[String] = TextOps.GopherStopwords): DataFrame =
    TextOps.gopherFiltersOf(norm(docs, idCol, textCol), stopwords = stopwords)

  /** CCNet-style perplexity quality filter (t18, Wenzek et al. 2020):
    * train a smoothed bigram LM on the `clean` trusted slice, score each
    * doc in `docs` by mean integer-bit surprisal, and bucket the corpus
    * head/middle/tail at the 33rd/66th percentiles. Surprisal is
    * log-free integer arithmetic (bit counts), so results are engine-
    * deterministic. Returns (doc_id, n_bigrams, sum_bits, ppl_milli,
    * bucket); docs with fewer than 2 tokens are unscored and omitted.
    * The LM stays distributed: scoring joins broadcast it while it has
    * at most `broadcastMaxBigrams` distinct bigrams and shuffle past
    * that (a Wikipedia-scale clean slice reaches ~10^8 bigram rows). */
  def perplexityFilter(docs: DataFrame, clean: DataFrame,
                       idCol: String = "doc_id",
                       textCol: String = "text",
                       broadcastMaxBigrams: Long =
                         TextOps.PplBroadcastMaxBigrams): DataFrame =
    TextOps.perplexityFilterOf(norm(docs, idCol, textCol),
      norm(clean, idCol, textCol), broadcastMaxBigrams)

  /** DSIR importance-weight data selection (t20, Xie et al. 2023,
    * arXiv:2302.03169): featurize every document as hashed bigrams,
    * estimate target-vs-raw feature counts in one pool pass, score each
    * document by its integer-bit importance weight, and keep the top
    * `keepFrac` slice at a corpus-relative percentile threshold.
    * `isTarget` is a predicate over the pool's NON-text columns naming
    * the trusted target-domain slice (it must select at least one doc
    * with >= 2 tokens, else the call fails by name). Returns (doc_id,
    * n_feats, score_milli, selected); docs with fewer than 2 tokens have
    * no bigram features and are omitted (the t18 contract). */
  def dsirSelect(docs: DataFrame,
                 isTarget: org.apache.spark.sql.Column,
                 keepFrac: Double = graft.queries.SelectionOps.DsirKeepFrac,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    graft.queries.SelectionOps.dsirSelectOf(
      docs.withColumn("doc_id", col(idCol).cast("long"))
        .withColumn("text", col(textCol)),
      isTarget, keepFrac)

  /** Stopword-ratio language-ID heuristic (t02 without the benchmark's
    * labeled lang column): doc_id, lang_guess, stop_ratio. */
  def languageId(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    TextOps.langIdOf(norm(docs, idCol, textCol)
      .withColumn("lang", lit(null).cast("string")))
      .drop("lang")

  /** Character-bigram language-ID heuristic (t05 without the label):
    * doc_id, ngram_hits, hits_per_1000, lang_guess. */
  def languageIdNgram(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    TextOps.langIdNgramOf(norm(docs, idCol, textCol)
      .withColumn("lang", lit(null).cast("string")))
      .drop("lang")

  /** Deterministic hash sampling (t07's selection as row flags): keep a
    * `percent`-sized sample chosen by the md5-derived hash of the id —
    * stable across runs, partitionings, and cluster sizes, unlike
    * `df.sample` whose output depends on partition layout. */
  def deterministicSample(docs: DataFrame, percent: Int,
                          idCol: String = "doc_id"): DataFrame = {
    require(percent >= 0 && percent <= 100, s"percent must be 0..100, got $percent")
    docs.withColumn("sampled", (expr(
      s"cast(conv(substring(md5(cast($idCol as string)), 1, 15), 16, 10) as bigint)")
      % 100 < percent).cast("int"))
  }

  /** Benchmark decontamination: flag training documents sharing word
    * n-gram spans with a held-out eval set. The eval set's distinct n-gram
    * table broadcasts (it is tiny relative to the corpus), so the training
    * grams probe it map-side with NO shuffle of corpus n-grams — one
    * corpus pass at any scale. Returns contaminated docs with their
    * overlap fraction. */
  def contamination(train: DataFrame, evalSet: DataFrame, n: Int = 5,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    TextOps.contaminationOf(
      norm(train, idCol, textCol), norm(evalSet, idCol, textCol), n)

  /** Per-domain cap by quality rank (the t12 selection as row flags): keep
    * the top `cap` documents of each domain by `scoreCol` (descending, id
    * tiebreak). Windowed on hash partitions of the domain — no global
    * sort; the t12 driver query is the per-domain summary of exactly this
    * selection. */
  def domainBalance(docs: DataFrame, cap: Int,
                    idCol: String = "doc_id",
                    domainCol: String = "source",
                    scoreCol: String = "n_chars"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(domainCol)
      .orderBy(col(scoreCol).desc, col(idCol))
    docs.withColumn("rk", row_number().over(w))
      .withColumn("kept", col("rk") <= cap)
  }

  /** Sequence packing (the t13 kernel): the corpus token stream in doc-id
    * order is cut into fixed `window`-token training sequences; each doc
    * reports its stream offset and the window range it spans. The global
    * prefix sum runs as per-shard partials + broadcast offsets — never a
    * single-partition window — so it holds at any corpus size. The
    * per-shard-totals collect is metadata-sized (idRange / shardSpan
    * rows). Requires a long-typed id ordering the stream. */
  def sequencePack(docs: DataFrame, window: Int = 256,
                   shardSpan: Long = 1000L,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(window > 0 && shardSpan > 0, "need window > 0 and shardSpan > 0")
    TextOps.sequencePackOf(norm(docs, idCol, textCol), window, shardSpan)
  }

  /** PII redaction over the RAW text (t09's scrubber without the
    * benchmark's synthetic-PII augmentation): per-document match counts
    * and the scrubbed text, using the same RE2-and-Java-compatible
    * patterns the oracle-gated query validates. */
  def piiScrub(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    norm(docs, idCol, textCol)
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(TextOps.EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("text"), lit(TextOps.PhoneRe), lit(0)))
          .cast("long").as("n_phones"),
        size(regexp_extract_all(col("text"), lit(TextOps.IpRe), lit(0)))
          .cast("long").as("n_ips"),
        regexp_replace(regexp_replace(regexp_replace(
          col("text"), TextOps.EmailRe, "<EMAIL>"),
          TextOps.PhoneRe, "<PHONE>"), TextOps.IpRe, "<IP>")
          .as("scrubbed"))
}
