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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_corpus_pipeline" -> p01CorpusPipeline _,
  )

  val oracles: Map[String, String] = Map(
    "p01_corpus_pipeline" -> p01Sql,
  )
}
