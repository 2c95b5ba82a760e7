package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sparse LEXICAL retrieval — the inverted-index/BM25 family (Robertson &
  * Zaragoza 2009, "The Probabilistic Relevance Framework: BM25 and
  * Beyond"), the classical counterpart of the dense s0x vector block and
  * the second arm of every production hybrid-search stack. The reference
  * corpus engine has no analog — beyond-reference depth in the retrieval
  * family s01/s09 established.
  *
  * Cross-engine determinism (the t20 contract — no libm, no float
  * accumulation): BM25's two real-valued pieces are rationalized to exact
  * integer arithmetic.
  *   - idf(w) = floor(log2(N / df(w))) via the bit-length identity
  *     `length(bin(N div df)) − 1` (the t18/t20 integer-log recipe). A
  *     term in every document scores 0 — the stopword-suppression
  *     behavior the saturating real-valued idf approximates.
  *   - With k1 = 6/5 and b = 3/4, the tf saturation
  *     tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) multiplies out to the
  *     integer ratio 22·avgdl·tf / (10·avgdl·tf + 3·avgdl + 9·dl).
  * Per-term score_milli = (1000 · idf_bits · 22 · avgdl · tf) div
  * (10·avgdl·tf + 3·avgdl + 9·dl); every operand is nonnegative so Spark
  * `div` ≡ DuckDB `//`, and per-doc scores are SUMS of integers —
  * associative, shuffle-order-proof.
  *
  * Scale shape: ONE corpus scan builds the posting-list table
  * (doc, term, tf, dl) via explode + hash agg, eagerly checkpointed (the
  * t20 pattern) so the downstream consumers (corpus stats, document
  * frequencies, query-term extraction, scoring join) never re-plan the
  * file scan. Scoring is the inverted-index equi-join: the metadata-sized
  * query-term table (annotated with idf from the vocab-sized df table and
  * the 1-row corpus stats) BROADCAST against the posting lists — candidate
  * work is Σ_w |postings(w)| over query terms only, never corpus × queries.
  * At 100 TB the posting table is the classic term-sharded index; the same
  * equi-join shape holds with the query side still broadcast.
  */
object RetrievalOps {
  import Tables._

  /** Query set: documents with doc_id < this (the s09 convention).
    * DERIVED from the dense block's query-set constant so the two arms
    * of the p07 hybrid fusion can never gate on different id sets. */
  val Bm25NumQueries: Long = SimilarityOps.NumQueries.toLong

  /** Final per-query result depth. */
  val Bm25TopK = 5

  /** RRF constant (Cormack et al. 2009): rank r contributes
    * 1000000 div (60 + r) milli-units per arm. */
  val RrfK = 60

  /** Per-arm candidate-list depth for the hybrid fusion (p07): fuse the
    * top-L of each arm, L > k, the standard RRF configuration. */
  val HybridTopL = 20

  /** t22: BM25 top-k over the documents corpus. Queries are the documents
    * with doc_id < [[Bm25NumQueries]]; each query's DISTINCT words score
    * against every OTHER document through the inverted index. Output:
    * (query_id, rk, doc_id, n_hit_terms, score_milli), rk by score desc
    * with doc_id ascending tie-break. */
  def t22Bm25Topk(s: SparkSession, d: String): DataFrame =
    bm25TopKOf(documents(s, d).select("doc_id", "text"),
      col("doc_id") < Bm25NumQueries, Bm25TopK)
      .orderBy("query_id", "rk")

  /** The posting-list subtree — one corpus scan → word explode → hash agg
    * to (doc_id, is_q, dl, w, tf). `is_q` and `dl` are functionally
    * determined by doc_id; carrying them as group keys leaves the
    * cardinality (= distinct (doc, word) pairs) and shuffle shape
    * unchanged (the t20 carry idiom). Exposed lazily so PlanSpec can pin
    * its physical shape (ONE FileScan, partial+final agg), which the
    * eager checkpoint in [[bm25TopKOf]] would otherwise hide. */
  private[graft] def bm25PostingsLazy(docs: DataFrame, queryCond: Column): DataFrame =
    docs.select(col("doc_id"), col("text"), queryCond.as("is_q"))
      .withColumn("words", split(col("text"), " "))
      .select(col("doc_id"), col("is_q"), size(col("words")).as("dl"),
        explode(col("words")).as("w"))
      .groupBy("doc_id", "is_q", "dl", "w")
      .agg(count(lit(1)).as("tf"))

  /** t22's kernel over any (doc_id, text) frame and a query-membership
    * predicate over the frame's columns (graft.ops.Text API). `topL`
    * is the emitted list depth (p07 fuses deeper lists than t22 emits). */
  private[graft] def bm25TopKOf(docs: DataFrame, queryCond: Column,
                                topL: Int): DataFrame = {
    require(topL >= 1, s"bm25TopK: list depth must be >= 1, got $topL")
    // eager checkpoint: stats/df/query/scoring branches all read the
    // materialized postings instead of re-planning the corpus scan
    val postings = bm25PostingsLazy(docs, queryCond).localCheckpoint(true)
    // corpus stats: 1 row (N docs, integer mean doc length)
    val stats = postings.groupBy("doc_id").agg(first("dl").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("tot"))
      .select(col("n_docs"), expr("tot div n_docs").as("avgdl"))
    // document frequency per term (vocab-sized)
    val dfTab = postings.groupBy("w").agg(count(lit(1)).as("df"))
    // query terms (metadata-sized: |queries| × their distinct words),
    // annotated with integer idf — the broadcast probe side
    val qterms = postings.filter(col("is_q"))
      .select(col("doc_id").as("query_id"), col("w"))
      .join(dfTab, Seq("w"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("w"), col("avgdl"),
        (length(expr("bin(n_docs div df)")) - 1).cast("long").as("idf_bits"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score_milli").desc, col("doc_id"))
    postings
      .join(broadcast(qterms), Seq("w"))
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("term_milli", expr(
        "(1000 * idf_bits * 22 * avgdl * tf) div " +
          "(10 * avgdl * tf + 3 * avgdl + 9 * dl)"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_hit_terms"), sum("term_milli").as("score_milli"))
      .withColumn("rk", row_number().over(wTop).cast("long"))
      .filter(col("rk") <= topL)
      .select("query_id", "rk", "doc_id", "n_hit_terms", "score_milli")
  }

  /** The BM25 derivation as prefixed CTE text ending in `<p>bm` =
    * (query_id, doc_id, n_hit_terms, score_milli, rk ≤ topL) — SHARED by
    * t22Sql and p07Sql so the scoring semantics can never drift between
    * the gated query and the composed pipeline (the dsirSqlCtes lesson). */
  private[graft] def bm25SqlCtes(p: String, topL: Int,
                                 numQueries: Long = Bm25NumQueries): String =
    s"""${p}pool AS (
       |  SELECT doc_id, doc_id < $numQueries AS is_q,
       |    string_split(text, ' ') AS words
       |  FROM documents
       |), ${p}post AS (
       |  SELECT doc_id, is_q, dl, w, COUNT(*) AS tf
       |  FROM (SELECT doc_id, is_q, len(words) AS dl, unnest(words) AS w
       |        FROM ${p}pool)
       |  GROUP BY 1, 2, 3, 4
       |), ${p}stats AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(dl) // COUNT(*) AS BIGINT) AS avgdl
       |  FROM (SELECT doc_id, ANY_VALUE(dl) AS dl FROM ${p}post GROUP BY 1)
       |), ${p}df AS (
       |  SELECT w, COUNT(*) AS df FROM ${p}post GROUP BY 1
       |), ${p}qt AS (
       |  SELECT q.doc_id AS query_id, q.w, s.avgdl,
       |    length(bin(CAST(s.n_docs // d.df AS BIGINT))) - 1 AS idf_bits
       |  FROM ${p}post q JOIN ${p}df d USING (w) CROSS JOIN ${p}stats s
       |  WHERE q.is_q
       |), ${p}sc AS (
       |  SELECT q.query_id, p.doc_id, COUNT(*) AS n_hit_terms,
       |    CAST(SUM((1000 * q.idf_bits * 22 * q.avgdl * p.tf)
       |      // (10 * q.avgdl * p.tf + 3 * q.avgdl + 9 * p.dl))
       |      AS BIGINT) AS score_milli
       |  FROM ${p}post p JOIN ${p}qt q USING (w)
       |  WHERE p.doc_id <> q.query_id
       |  GROUP BY 1, 2
       |), ${p}bm AS (
       |  SELECT query_id, doc_id, n_hit_terms, score_milli,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score_milli DESC, doc_id) AS BIGINT) AS rk
       |  FROM ${p}sc
       |  QUALIFY rk <= $topL)""".stripMargin

  val t22Sql: String =
    s"""WITH ${bm25SqlCtes("", Bm25TopK)}
       |SELECT query_id, rk, doc_id, n_hit_terms, score_milli
       |FROM bm ORDER BY query_id, rk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t22_bm25_topk" -> t22Bm25Topk _,
  )

  val oracles: Map[String, String] = Map(
    "t22_bm25_topk" -> t22Sql,
  )
}
