package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed training-data pipeline — the individual operators
  * (dedup, quality rules, scrubbing, token accounting) chained the way a
  * production corpus build runs them, as ONE declarative plan Catalyst
  * optimizes end-to-end:
  *
  *   exact dedup (keep first doc per content hash)
  *     → Gopher-style repetition/quality gate
  *     → PII scrub pass
  *     → per-language corpus accounting
  *
  * Single query, three hash aggregations, no collect, no UDF: at 100 TB
  * this is scan → dedup shuffle → map-side quality metrics → final
  * per-language rollup (tiny). Every stage's drop count is surfaced so
  * the pipeline is auditable.
  */
object PipelineOps {
  import Tables._

  def p01CorpusPipeline(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"))
      .withColumn("content_hash", md5(col("text")))
    // stage 1: exact dedup — keep the lowest doc_id per content hash
    val keeper = docs.groupBy("content_hash")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    val deduped = docs.join(keeper, "content_hash")
      .withColumn("is_dup", col("doc_id") =!= col("keep_id"))
    // stage 2: quality gate (repetition rules over the survivors); the
    // trigram range is guarded — Spark's sequence(0, k) runs DESCENDING
    // for k<0, so sub-3-token docs must not build grams (they fail the
    // n_tokens floor regardless, in both engines)
    val scored = deduped
      .withColumn("words", split(col("text"), " "))
      .withColumn("n_tokens", size(col("words")).cast("long"))
      .withColumn("grams", expr(
        "CASE WHEN size(words) >= 3 THEN transform(sequence(0, size(words) - 3), " +
          "i -> concat_ws(' ', words[i], words[i+1], words[i+2])) " +
          "ELSE array() END"))
      .withColumn("dup_gram_frac",
        (size(col("grams")) - size(array_distinct(col("grams"))))
          .cast("double") / size(col("grams")))
      .withColumn("quality_ok",
        col("n_tokens") >= 10 && col("dup_gram_frac") <= 0.9)
    // stage 3: scrub pass (identity on clean corpora — the pass still runs)
    val scrubbed = scored.withColumn("clean_text",
      regexp_replace(col("text"), "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"))
    // stage 4: per-language accounting of every stage's effect
    scrubbed
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_dropped"),
        sum(when(!col("is_dup") && !col("quality_ok"), 1L).otherwise(0L))
          .as("n_quality_dropped"),
        sum(when(!col("is_dup") && col("quality_ok"), 1L).otherwise(0L))
          .as("n_kept"),
        sum(when(!col("is_dup") && col("quality_ok"), col("n_tokens"))
          .otherwise(0L)).as("tokens_kept"),
        sum(when(!col("is_dup") && col("quality_ok"),
          length(col("clean_text")).cast("long")).otherwise(0L))
          .as("chars_kept"))
      .orderBy("lang")
  }

  val p01Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, lang, text, md5(text) AS content_hash FROM documents
      |), keeper AS (
      |  SELECT content_hash, MIN(doc_id) AS keep_id FROM docs GROUP BY 1
      |), deduped AS (
      |  SELECT d.*, d.doc_id <> k.keep_id AS is_dup
      |  FROM docs d JOIN keeper k USING (content_hash)
      |), scored AS (
      |  SELECT *,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    list_transform(generate_series(1, len(string_split(text, ' ')) - 2), i ->
      |      string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
      |      || ' ' || string_split(text, ' ')[i+2]) AS grams
      |  FROM deduped
      |), gated AS (
      |  SELECT *,
      |    (n_tokens >= 10 AND
      |     (len(grams) - len(list_distinct(grams)))::DOUBLE / len(grams) <= 0.9)
      |      AS quality_ok,
      |    regexp_replace(text, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}',
      |      '<EMAIL>', 'g') AS clean_text
      |  FROM scored)
      |SELECT lang,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_dropped,
      |  CAST(SUM(CASE WHEN NOT is_dup AND NOT quality_ok THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_quality_dropped,
      |  CAST(SUM(CASE WHEN NOT is_dup AND quality_ok THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept,
      |  CAST(SUM(CASE WHEN NOT is_dup AND quality_ok THEN n_tokens ELSE 0 END) AS BIGINT)
      |    AS tokens_kept,
      |  CAST(SUM(CASE WHEN NOT is_dup AND quality_ok THEN len(clean_text) ELSE 0 END) AS BIGINT)
      |    AS chars_kept
      |FROM gated GROUP BY lang ORDER BY lang""".stripMargin

  /** The INCREMENTAL twin of p01: one day's ingest batch (source = src19)
    * admitted against the standing corpus. Per new document, in one
    * declarative plan:
    *
    *   segment-overlap dedup vs the corpus (d09's semantics, left-joined so
    *     every batch doc gets a dup_frac)
    *     → benchmark-contamination gate (t11's 5-gram probe, eval set =
    *       corpus docs with doc_id % BenchMod = 0, broadcast)
    *     → token-count quality floor
    *     → admission verdict
    *
    * At 100 TB the corpus-side segment table is the big input; both probes
    * are equi-joins keyed on segment/gram hash, and d09's Bloom prefilter
    * composes in front of the dedup join unchanged (omitted here so the
    * whole verdict stays one Catalyst plan the oracle can mirror). */
  def p02IncrementalUpdate(s: SparkSession, d: String): DataFrame = {
    // every filter (new batch / corpus / eval set) sits BELOW its explode,
    // so each branch segments only the rows it keeps
    val docs = documents(s, d).select("doc_id", "source", "text")
    val isNew = col("source") === DedupOps2.NewBatchSource
    def hashedSegs(in: DataFrame) = DedupOps2.segmentsOf(in)
      .withColumn("h", expr(DedupOps2.h60("seg")))
    val newSegs = hashedSegs(docs.filter(isNew))
      .select("doc_id", "h").distinct()
    val corpusSegs = hashedSegs(docs.filter(!isNew))
      .select("h").distinct().withColumn("dup", lit(1L))
    val dupFrac = newSegs.join(corpusSegs, Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segs"),
        sum(coalesce(col("dup"), lit(0L))).cast("long").as("n_dup_segs"))
      .withColumn("dup_frac",
        round(col("n_dup_segs").cast("double") / col("n_segs"), 4))
    def gramsOf(in: DataFrame) = in
      .withColumn("words", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, greatest(size(words) - ${TextOps.ContamN - 1}, 1)), " +
          s"i -> concat_ws(' ', slice(words, i, ${TextOps.ContamN})))")).as("g"))
      .distinct()
    val benchGrams = gramsOf(
      docs.filter(!isNew && col("doc_id") % TextOps.BenchMod === 0))
      .select("g").distinct().withColumn("hit", lit(1L))
    val contam = gramsOf(docs.filter(isNew))
      .join(broadcast(benchGrams), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("hit"), lit(0L))).cast("long").as("n_contam_grams"))
    docs.filter(isNew)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .select("doc_id", "n_tokens")
      .join(dupFrac, "doc_id")
      .join(contam, "doc_id")
      .withColumn("contaminated", col("n_contam_grams") > 0)
      .withColumn("admitted",
        col("dup_frac") <= 0.5 && !col("contaminated") && col("n_tokens") >= 10)
      .select("doc_id", "n_tokens", "dup_frac", "contaminated", "admitted")
      .orderBy("doc_id")
  }

  val p02Sql: String = {
    val nb = DedupOps2.NewBatchSource
    s"""WITH segs0 AS (${DedupOps2.segmentsSql}),
       |segs AS (
       |  SELECT s.doc_id, ${DedupOps2.h60Duck("s.seg")} AS h,
       |    d.source = '$nb' AS is_new
       |  FROM segs0 s JOIN documents d ON s.doc_id = d.doc_id),
       |new_segs AS (SELECT DISTINCT doc_id, h FROM segs WHERE is_new),
       |corpus_segs AS (SELECT DISTINCT h FROM segs WHERE NOT is_new),
       |dupf AS (
       |  SELECT ns.doc_id, COUNT(*) AS n_segs,
       |    CAST(SUM(CASE WHEN cs.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_dup_segs
       |  FROM new_segs ns LEFT JOIN corpus_segs cs ON ns.h = cs.h
       |  GROUP BY 1),
       |grams AS (
       |  SELECT DISTINCT doc_id, source = '$nb' AS is_new, unnest(list_transform(
       |      range(1, greatest(len(words) - ${TextOps.ContamN - 1}, 1) + 1),
       |      i -> array_to_string(words[i : i + ${TextOps.ContamN - 1}], ' '))) AS g
       |  FROM (SELECT doc_id, source, string_split(text, ' ') AS words
       |        FROM documents)),
       |bench AS (
       |  SELECT DISTINCT g FROM grams
       |  WHERE NOT is_new AND doc_id % ${TextOps.BenchMod} = 0),
       |contam AS (
       |  SELECT gr.doc_id,
       |    CAST(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_contam_grams
       |  FROM grams gr LEFT JOIN bench b ON gr.g = b.g
       |  WHERE gr.is_new GROUP BY 1)
       |SELECT d.doc_id,
       |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |  ROUND(n_dup_segs::DOUBLE / n_segs, 4) AS dup_frac,
       |  n_contam_grams > 0 AS contaminated,
       |  (ROUND(n_dup_segs::DOUBLE / n_segs, 4) <= 0.5
       |    AND NOT (n_contam_grams > 0)
       |    AND len(string_split(d.text, ' ')) >= 10) AS admitted
       |FROM documents d
       |JOIN dupf USING (doc_id) JOIN contam USING (doc_id)
       |WHERE d.source = '$nb' ORDER BY d.doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_corpus_pipeline" -> p01CorpusPipeline _,
    "p02_incremental_update" -> p02IncrementalUpdate _,
  )

  val oracles: Map[String, String] = Map(
    "p01_corpus_pipeline" -> p01Sql,
    "p02_incremental_update" -> p02Sql,
  )
}
