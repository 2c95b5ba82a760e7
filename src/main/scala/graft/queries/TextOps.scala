package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines, over the
  * `documents` table: token counting, quality scoring, language-ID heuristic,
  * document fingerprinting, corpus token frequencies.
  *
  * Every metric is derived from integer counts (or one final division of
  * exact integers) so Spark and the DuckDB oracle hash identically. All the
  * heavy lifting stays inside codegen'd `functions._` expressions — no UDFs —
  * so at 100 TB these are a single scan + one shuffle for the aggregating
  * variants.
  */
object TextOps {
  import Tables._

  /** Per-document token stats + quality score. Texts are single-space
    * separated, so token char mass = length - (n_tokens - 1). */
  def t01TextStats(s: SparkSession, d: String): DataFrame =
    textStatsOf(documents(s, d))

  /** t01's kernel over any (doc_id, text) frame (graft.ops.Text API). */
  private[graft] def textStatsOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("words", split(col("text"), " "))
      .withColumn("n_tokens", size(col("words")).cast("long"))
      .withColumn("n_uniq", size(array_distinct(col("words"))).cast("long"))
      .withColumn("n_stop", expr(
        "size(filter(words, w -> w = 'the' OR w = 'a'))").cast("long"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("n_uniq"),
        length(col("text")).cast("long").as("n_chars_calc"),
        round((length(col("text")) - (col("n_tokens") - 1)).cast("double")
          / col("n_tokens"), 4).as("avg_token_len"),
        round(col("n_stop").cast("double") / col("n_tokens"), 4).as("stop_ratio"),
        round(col("n_uniq").cast("double") / col("n_tokens"), 4).as("uniq_ratio"))
      .orderBy("doc_id")

  val t01Sql: String =
    """WITH t AS (
      |  SELECT doc_id, text, string_split(text, ' ') AS words FROM documents
      |), c AS (
      |  SELECT doc_id, text,
      |    len(words)::BIGINT AS n_tokens,
      |    len(list_distinct(words))::BIGINT AS n_uniq,
      |    len(list_filter(words, w -> w = 'the' OR w = 'a'))::BIGINT AS n_stop
      |  FROM t)
      |SELECT doc_id, n_tokens, n_uniq, length(text)::BIGINT AS n_chars_calc,
      |  ROUND((length(text) - (n_tokens - 1))::DOUBLE / n_tokens, 4) AS avg_token_len,
      |  ROUND(n_stop::DOUBLE / n_tokens, 4) AS stop_ratio,
      |  ROUND(n_uniq::DOUBLE / n_tokens, 4) AS uniq_ratio
      |FROM c ORDER BY doc_id""".stripMargin

  /** n-gram/stopword language-ID heuristic: English function words vs the
    * labeled lang column. Deterministic rule shared with the oracle. */
  def t02LangId(s: SparkSession, d: String): DataFrame =
    langIdOf(documents(s, d))

  /** t02's kernel over any (doc_id, [lang,] text) frame; `lang` is passed
    * through for label comparison when present (graft.ops.Text API injects
    * a null label and drops it). */
  private[graft] def langIdOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("words", split(col("text"), " "))
      .withColumn("stop_cnt", expr(
        "size(filter(words, w -> w = 'the' OR w = 'a'))"))
      .withColumn("ratio", col("stop_cnt").cast("double") / size(col("words")))
      .select(
        col("doc_id"), col("lang"),
        when(col("ratio") >= 0.05, lit("en")).otherwise(lit("unk")).as("lang_guess"),
        round(col("ratio"), 4).as("stop_ratio"))
      .orderBy("doc_id")

  val t02Sql: String =
    """WITH t AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents
      |), c AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(words, w -> w = 'the' OR w = 'a'))::DOUBLE / len(words) AS ratio
      |  FROM t)
      |SELECT doc_id, lang,
      |  CASE WHEN ratio >= 0.05 THEN 'en' ELSE 'unk' END AS lang_guess,
      |  ROUND(ratio, 4) AS stop_ratio
      |FROM c ORDER BY doc_id""".stripMargin

  /** Document fingerprints: full md5, a 60-bit integer fingerprint, and a
    * winnowing-style rolling fingerprint (min/max over hashed word 5-gram
    * windows). */
  def t03Fingerprint(s: SparkSession, d: String): DataFrame =
    // unspread: fingerprintOf's first operation is the doc_id sort, whose
    // range exchange already spreads the single-split scan (Tables.spread
    // would add a second exchange of the same rows for nothing)
    fingerprintOf(documentsUnspread(s, d))

  /** t03's kernel over any (doc_id, text) frame (graft.ops.Text API).
    * The presentation sort runs BELOW the fingerprint projection (r15):
    * a final orderBy's range-sampling pass would execute the md5-per-
    * gram transform over the whole corpus a second time; sorting the
    * raw (doc_id, text) rows first keeps the sampling pass scan-cheap
    * and the projection — order-preserving — evaluates once. */
  private[graft] def fingerprintOf(docs: DataFrame): DataFrame =
    docs
      .orderBy("doc_id")
      .withColumn("words", split(col("text"), " "))
      .withColumn("grams", expr(
        "transform(sequence(1, greatest(size(words) - 4, 1)), " +
          "i -> concat_ws(' ', slice(words, i, 5)))"))
      .withColumn("gram_hashes", expr(
        "transform(grams, g -> cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint))"))
      .select(
        col("doc_id"),
        md5(col("text")).as("md5_hex"),
        expr("cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint)").as("fp60"),
        expr("array_min(gram_hashes)").as("roll_min"),
        expr("array_max(gram_hashes)").as("roll_max"))

  val t03Sql: String =
    """WITH t AS (
      |  SELECT doc_id, text, string_split(text, ' ') AS words FROM documents
      |), g AS (
      |  SELECT doc_id, text,
      |    list_transform(range(1, greatest(len(words) - 4, 1) + 1),
      |      i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' || words[i+3] || ' ' || words[i+4]) AS grams
      |  FROM t
      |), h AS (
      |  SELECT doc_id, text,
      |    list_transform(grams, gr -> ('0x' || substr(md5(gr), 1, 15))::BIGINT) AS gh
      |  FROM g)
      |SELECT doc_id, md5(text) AS md5_hex,
      |  ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp60,
      |  list_min(gh) AS roll_min, list_max(gh) AS roll_max
      |FROM h ORDER BY doc_id""".stripMargin

  /** Corpus-level token frequencies (explode -> two-phase hash agg). */
  def t04TokenFreq(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("cnt").desc, col("token"))

  val t04Sql: String =
    """SELECT token, COUNT(*) AS cnt, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY token ORDER BY cnt DESC, token""".stripMargin

  /** Character-n-gram language-ID: frequency of English-profile bigrams
    * ('th','he','er','an') per 1000 chars. Bigram counts use the
    * replace-length trick — pure string built-ins, identical in both
    * engines, fully codegen'd (single scan, no shuffle at any scale). */
  def t05LangIdNgram(s: SparkSession, d: String): DataFrame = {
    val grams = Seq("th", "he", "er", "an")
    val cnt = grams.map(g =>
      s"((length(text) - length(replace(text, '$g', ''))) div 2)").mkString(" + ")
    langIdNgramOf(documents(s, d))
  }

  /** t05's kernel (graft.ops.Text API twin of [[langIdOf]]). */
  private[graft] def langIdNgramOf(docs: DataFrame): DataFrame = {
    val grams = Seq("th", "he", "er", "an")
    val cnt = grams.map(g =>
      s"((length(text) - length(replace(text, '$g', ''))) div 2)").mkString(" + ")
    docs
      .withColumn("ngram_hits", expr(cnt).cast("long"))
      .withColumn("rate", round(col("ngram_hits") * lit(1000.0) /
        length(col("text")), 4))
      .select(
        col("doc_id"), col("lang"),
        col("ngram_hits"),
        col("rate").as("hits_per_1000"),
        when(col("rate") >= 30.0, lit("en")).otherwise(lit("unk"))
          .as("lang_guess"))
      .orderBy("doc_id")
  }

  val t05Sql: String = {
    val cnt = Seq("th", "he", "er", "an").map(g =>
      s"((length(text) - length(replace(text, '$g', ''))) // 2)").mkString(" + ")
    s"""WITH c AS (
       |  SELECT doc_id, lang, ($cnt)::BIGINT AS ngram_hits,
       |    ROUND(($cnt) * 1000.0 / length(text), 4) AS rate
       |  FROM documents)
       |SELECT doc_id, lang, ngram_hits, rate AS hits_per_1000,
       |  CASE WHEN rate >= 30.0 THEN 'en' ELSE 'unk' END AS lang_guess
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** BPE-ish regex tokenization: letter runs, digit runs, and single
    * punctuation marks as separate tokens (the GPT-2 pre-tokenizer shape),
    * counted per document next to the whitespace count. */
  def t06BpeTokens(s: SparkSession, d: String): DataFrame =
    bpeTokensOf(documents(s, d))

  /** t06's kernel over any (doc_id, text) frame (graft.ops.Text API). */
  private[graft] def bpeTokensOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("bpe", expr(
        "regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        size(col("bpe")).cast("long").as("bpe_tokens"),
        expr("size(array_distinct(bpe))").cast("long").as("bpe_uniq"))
      .orderBy("doc_id")

  val t06Sql: String =
    """SELECT doc_id,
      |  len(string_split(text, ' '))::BIGINT AS ws_tokens,
      |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS bpe_tokens,
      |  len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')))::BIGINT AS bpe_uniq
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Deterministic stratified sampling: a 10% hash-sample (md5 of doc_id —
    * stable across engines, runs and partitionings, unlike rand()) with
    * per-language acceptance stats. The pattern training pipelines use to
    * carve reproducible eval/train splits at any scale: one scan, no
    * shuffle before the per-stratum agg. */
  def t07SampleStrata(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("h", expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)"))
      .withColumn("sampled", (col("h") % 100 < 10).cast("int"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("sampled")).cast("long").as("n_sampled"),
        min(when(col("sampled") === 1, col("doc_id"))).as("first_sampled"))
      .orderBy("lang")

  val t07Sql: String =
    """WITH h AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 10
      |      THEN 1 ELSE 0 END AS sampled
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(sampled) AS BIGINT) AS n_sampled,
      |  CAST(MIN(CASE WHEN sampled = 1 THEN doc_id END) AS BIGINT) AS first_sampled
      |FROM h GROUP BY lang ORDER BY lang""".stripMargin

  /** Text cleaning/normalization: trim, collapse whitespace runs, strip
    * non-alphanumerics, dedupe repeated tokens — the scrub stage before
    * tokenization. All regexp built-ins (codegen'd single scan); emits
    * before/after sizes so the oracle pins the exact transform. */
  def t08CleanText(s: SparkSession, d: String): DataFrame =
    cleanTextOf(documents(s, d))

  /** t08's kernel over any (doc_id, text) frame (graft.ops.Text API). */
  private[graft] def cleanTextOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("cleaned", regexp_replace(
        regexp_replace(trim(col("text")), "[^a-z0-9 ]", ""),
        " +", " "))
      .withColumn("toks", split(col("cleaned"), " "))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("raw_len"),
        length(col("cleaned")).cast("long").as("clean_len"),
        size(col("toks")).cast("long").as("n_tokens"),
        expr("size(array_distinct(toks))").cast("long").as("n_uniq_tokens"),
        md5(col("cleaned")).as("clean_md5"))
      .orderBy("doc_id")

  val t08Sql: String =
    """WITH c AS (
      |  SELECT doc_id, text,
      |    regexp_replace(regexp_replace(trim(text), '[^a-z0-9 ]', '', 'g'),
      |      ' +', ' ', 'g') AS cleaned
      |  FROM documents)
      |SELECT doc_id, length(text)::BIGINT AS raw_len,
      |  length(cleaned)::BIGINT AS clean_len,
      |  len(string_split(cleaned, ' '))::BIGINT AS n_tokens,
      |  len(list_distinct(string_split(cleaned, ' ')))::BIGINT AS n_uniq_tokens,
      |  md5(cleaned) AS clean_md5
      |FROM c ORDER BY doc_id""".stripMargin

  /** PII scrubbing — the redaction pass every LLM training pipeline runs
    * before tokenization. The corpus is synthetic word salad, so each doc
    * first gets DETERMINISTIC synthetic PII derived from doc_id (one
    * email, doc_id%3 phone numbers, one internal IP), then the scrubber
    * counts and redacts with RE2-and-Java-compatible regexes (no
    * lookaround/backrefs, so Spark's codegen'd regexp_* and the DuckDB
    * oracle agree byte-for-byte; md5 of the scrubbed text is the proof).
    * One scan, no shuffle, no UDF — at 100 TB this is a map-only pass. */
  private[graft] val EmailRe = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private[graft] val PhoneRe = "\\+1-555-[0-9]{4}"
  private[graft] val IpRe = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  def t09PiiScrub(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("aug", concat(
        col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com"),
        expr("repeat(concat(' call +1-555-', lpad(cast(doc_id % 10000 as string), 4, '0')), cast(doc_id % 3 as int))"),
        lit(" ip 10.0."), col("doc_id") % 256, lit(".1")))
      .select(
        col("doc_id"),
        // regexes passed as Column literals, not through the SQL parser —
        // expr() string literals would eat the backslash escapes
        size(regexp_extract_all(col("aug"), lit(EmailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("aug"), lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
        size(regexp_extract_all(col("aug"), lit(IpRe), lit(0))).cast("long").as("n_ips"),
        md5(regexp_replace(regexp_replace(regexp_replace(
          col("aug"), EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"), IpRe, "<IP>"))
          .as("scrub_md5"))
      .orderBy("doc_id")

  val t09Sql: String =
    s"""WITH aug AS (
       |  SELECT doc_id,
       |    text || ' contact user' || doc_id || '@example.com' ||
       |    repeat(' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
       |           CAST(doc_id % 3 AS INT)) ||
       |    ' ip 10.0.' || (doc_id % 256) || '.1' AS aug
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(aug, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(aug, '$PhoneRe')) AS BIGINT) AS n_phones,
       |  CAST(len(regexp_extract_all(aug, '$IpRe')) AS BIGINT) AS n_ips,
       |  md5(regexp_replace(regexp_replace(regexp_replace(
       |    aug, '$EmailRe', '<EMAIL>', 'g'), '$PhoneRe', '<PHONE>', 'g'),
       |    '$IpRe', '<IP>', 'g')) AS scrub_md5
       |FROM aug ORDER BY doc_id""".stripMargin

  /** Within-document repetition signals (the Gopher/RefinedWeb quality
    * rules): fraction of duplicate trigrams, top-trigram mass, and
    * duplicate-token fraction per document, plus the resulting keep/drop
    * flag. All ratios are exact integer divisions rounded once; the
    * trigram explode is per-document (no corpus-wide shuffle beyond the
    * final sort) — a map-side aggregate at 100 TB. */
  def t10Repetition(s: SparkSession, d: String): DataFrame =
    repetitionOf(documents(s, d))

  /** t10's kernel over any (doc_id, text) frame (graft.ops.Text API). */
  private[graft] def repetitionOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("words", split(col("text"), " "))
      .withColumn("n_tokens", size(col("words")).cast("long"))
      // guard: Spark's sequence(0, k) runs DESCENDING for k<0, so short
      // docs must be excluded before building the trigram index range
      .filter(col("n_tokens") >= 3)
      .withColumn("grams", expr(
        "transform(sequence(0, size(words) - 3), i -> " +
          "concat_ws(' ', words[i], words[i+1], words[i+2]))"))
      .withColumn("n_grams", size(col("grams")).cast("long"))
      .withColumn("n_uniq_grams", size(array_distinct(col("grams"))).cast("long"))
      // top-gram count via a SINGLE pass over the SORTED gram array
      // (longest equal-run): O(G log G) per doc instead of the
      // O(distinct × G) filter-per-distinct-gram formulation, which was
      // the most expensive per-row expression on the whole bench surface
      // (t10 2.90 s at sf0.1 under honest materialization). Same value:
      // equal grams are adjacent after sorting, so the longest run IS
      // the max multiplicity.
      .withColumn("top_gram_n", expr(
        "aggregate(array_sort(grams), " +
          "struct(cast(null as string) as prev, 0L as run, 0L as best), " +
          "(acc, g) -> struct(g as prev, " +
          "  IF(acc.prev IS NOT NULL AND g = acc.prev, acc.run + 1, 1L) as run, " +
          "  greatest(acc.best, IF(acc.prev IS NOT NULL AND g = acc.prev, " +
          "    acc.run + 1, 1L)) as best), " +
          "acc -> acc.best)").cast("long"))
      .select(
        col("doc_id"),
        col("n_grams"),
        round((col("n_grams") - col("n_uniq_grams")).cast("double")
          / col("n_grams"), 4).as("dup_gram_frac"),
        round(col("top_gram_n").cast("double") / col("n_grams"), 4)
          .as("top_gram_frac"),
        round((col("n_tokens") - size(array_distinct(col("words"))))
          .cast("double") / col("n_tokens"), 4).as("dup_token_frac"))
      .withColumn("keep",
        col("dup_gram_frac") <= 0.9 && col("top_gram_frac") <= 0.3)
      .orderBy("doc_id")

  val t10Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3
      |), g AS (
      |  SELECT doc_id, words,
      |    CAST(len(words) AS BIGINT) AS n_tokens,
      |    list_transform(generate_series(1, len(words) - 2), i ->
      |      words[i] || ' ' || words[i+1] || ' ' || words[i+2]) AS grams
      |  FROM t
      |), m AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(len(grams) AS BIGINT) AS n_grams,
      |    CAST(len(list_distinct(grams)) AS BIGINT) AS n_uniq_grams,
      |    CAST(list_max(list_transform(list_distinct(grams), g2 ->
      |      len(list_filter(grams, x -> x = g2)))) AS BIGINT) AS top_gram_n,
      |    CAST(len(list_distinct(words)) AS BIGINT) AS n_uniq_tokens
      |  FROM g)
      |SELECT doc_id, n_grams,
      |  ROUND((n_grams - n_uniq_grams)::DOUBLE / n_grams, 4) AS dup_gram_frac,
      |  ROUND(top_gram_n::DOUBLE / n_grams, 4) AS top_gram_frac,
      |  ROUND((n_tokens - n_uniq_tokens)::DOUBLE / n_tokens, 4) AS dup_token_frac,
      |  (ROUND((n_grams - n_uniq_grams)::DOUBLE / n_grams, 4) <= 0.9 AND
      |   ROUND(top_gram_n::DOUBLE / n_grams, 4) <= 0.3) AS keep
      |FROM m ORDER BY doc_id""".stripMargin

  /** Documents whose doc_id is divisible by this are the held-out
    * "benchmark/eval set" for the contamination check. */
  val BenchMod = 23
  /** Contamination n-gram width (words). */
  val ContamN = 5

  /** Benchmark-contamination check: flag training documents sharing 5-gram
    * spans with the held-out eval set — the standard decontamination step
    * before training. The eval set's distinct n-gram table is tiny relative
    * to the corpus, so it is explicitly `broadcast()`: the corpus-side
    * n-gram stream hash-probes it map-side with no shuffle of corpus
    * n-grams. Output = contaminated docs with their overlap fraction. */
  def t11Contamination(s: SparkSession, d: String): DataFrame = {
    // the eval-set/train split runs BELOW the gram explode: each branch
    // explodes only its slice (eval is a few percent), so total gram work
    // is ONE corpus pass, not one full explode per branch
    val docs = documents(s, d).select("doc_id", "text")
    contaminationOf(
      docs.filter(col("doc_id") % BenchMod =!= 0),
      docs.filter(col("doc_id") % BenchMod === 0),
      ContamN)
      .orderBy("doc_id")
  }

  /** The t11 kernel over any training-corpus / eval-set pair of
    * (doc_id, text) frames (graft.ops.Text API): the eval set's distinct
    * n-gram table broadcasts, the train grams probe it map-side in ONE
    * aggregation pass. */
  private[graft] def contaminationOf(train: org.apache.spark.sql.DataFrame,
                                     evalSet: org.apache.spark.sql.DataFrame,
                                     n: Int): org.apache.spark.sql.DataFrame = {
    def gramsOf(docs: org.apache.spark.sql.DataFrame) = docs
      .withColumn("words", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, greatest(size(words) - ${n - 1}, 1)), " +
          s"i -> concat_ws(' ', slice(words, i, $n)))")).as("g"))
      .distinct()
    val benchGrams = gramsOf(evalSet)
      .select("g").distinct().withColumn("hit", lit(1L))
    // single pass over the train grams: broadcast-probe the eval-set grams
    // and fold totals + hits in ONE aggregation (no second corpus scan)
    gramsOf(train)
      .join(broadcast(benchGrams), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).cast("long").as("n_hit"))
      .filter(col("n_hit") > 0)
      .withColumn("contamination",
        round(col("n_hit").cast("double") / col("n_grams"), 4))
      .select("doc_id", "n_grams", "n_hit", "contamination")
  }

  val t11Sql: String =
    s"""WITH grams AS (
       |  SELECT DISTINCT doc_id, unnest(list_transform(
       |      range(1, greatest(len(words) - ${ContamN - 1}, 1) + 1),
       |      i -> array_to_string(words[i : i + ${ContamN - 1}], ' '))) AS g
       |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)),
       |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % $BenchMod = 0),
       |train AS (SELECT * FROM grams WHERE doc_id % $BenchMod <> 0),
       |per_doc AS (SELECT doc_id, COUNT(*) AS n_grams FROM train GROUP BY 1),
       |hits AS (
       |  SELECT doc_id, COUNT(*) AS n_hit FROM train JOIN bench USING (g)
       |  GROUP BY 1)
       |SELECT doc_id, n_grams, n_hit,
       |  ROUND(n_hit::DOUBLE / n_grams, 4) AS contamination
       |FROM per_doc JOIN hits USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Per-source document cap for t12 (domain balancing). */
  val DomainCap = 15

  /** Domain balancing: cap every source (domain) at DomainCap documents,
    * keeping the highest-quality ones — the standard anti-domination step
    * so one crawl domain cannot swamp the training mix. Quality rank here
    * is (n_chars desc, doc_id) — deterministic and cheap; any scored rank
    * drops in. One window function over a (source)-partitioned shuffle —
    * no global sort; per-source state is the cap, not the domain size. */
  def t12DomainBalance(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
    documents(s, d)
      .withColumn("rk", row_number().over(w))
      .withColumn("kept", col("rk") <= DomainCap)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("n_chars")).otherwise(0L)).as("chars_kept"),
        min(when(col("kept"), col("n_chars"))).as("min_kept_chars"))
      .orderBy("source")
  }

  val t12Sql: String =
    s"""WITH ranked AS (
       |  SELECT source, doc_id, n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY n_chars DESC, doc_id) <= $DomainCap AS kept
       |  FROM documents)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN kept THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept,
       |  CAST(MIN(CASE WHEN kept THEN n_chars END) AS BIGINT) AS min_kept_chars
       |FROM ranked GROUP BY source ORDER BY source""".stripMargin

  /** t13: sequence packing — the GPT-style training-batch layout: the
    * corpus token stream (docs concatenated in doc_id order) is cut into
    * fixed `PackWindow`-token windows; each doc reports its stream offset
    * and the window range it lands in (a doc spanning a cut contributes
    * to two+ training sequences — the standard packing accounting).
    *
    * The core is a GLOBAL prefix sum over doc_id order, computed the
    * scale-correct way: docs shard by `doc_id div ShardSpan`, one
    * hash-partitioned aggregate produces per-shard token totals (shard
    * count = id-range/1000 — metadata-sized), the driver scan-sums them
    * into per-shard stream offsets re-broadcast as a join table, and the
    * per-doc cumsum is a window over (shard) partitions ONLY — no
    * single-partition global window anywhere (PlanSpec-gated), which is
    * what makes this hold at 10^10 docs where `Window.orderBy` with no
    * partitioning would serialize the corpus through one task. */
  val PackWindow = 256
  private val ShardSpan = 1000L

  def t13SequencePack(s: SparkSession, d: String): DataFrame =
    sequencePackOf(documents(s, d), PackWindow, ShardSpan).orderBy("doc_id")

  /** t13's kernel over any (doc_id, text) frame (graft.ops.Text API). */
  private[graft] def sequencePackOf(docsIn: DataFrame, window: Int,
                                    shardSpan: Long): DataFrame =
    sequencePackCountsOf(docsIn
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")),
      window, shardSpan)

  /** The packing arithmetic over a pre-counted (doc_id, n_tokens) frame —
    * t13 counts whitespace tokens; p08 packs the REAL tokenizer's
    * per-doc BPE counts through the same distributed prefix sum. */
  private[graft] def sequencePackCountsOf(counts: DataFrame, window: Int,
                                          shardSpan: Long = ShardSpan): DataFrame = {
    val s = counts.sparkSession
    import s.implicits._
    val docs = counts
      .withColumn("shard", expr(s"doc_id div $shardSpan"))
    // per-shard totals: metadata-sized (numShards = idRange/shardSpan),
    // same broadcast-smalls pattern as the IVF centroid seeding
    val shardTotals = docs.groupBy("shard")
      .agg(sum("n_tokens").as("shard_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = {
      var acc = 0L
      shardTotals.map { case (sh, t) => val o = (sh, acc); acc += t; o }.toSeq
    }
    val offsetsDf = offsets.toDF("shard", "shard_offset")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
    docs.join(broadcast(offsetsDf), "shard")
      .withColumn("pack_start",
        col("shard_offset") + sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("first_window", expr(s"pack_start div $window"))
      // greatest(n_tokens, 1): a ZERO-token doc (reachable through p08's
      // BPE counts — an all-empty-word text encodes to 0 tokens; t13's
      // whitespace counts are always >= 1) occupies no window, and the
      // raw formula would put last_window BEFORE first_window when its
      // pack_start sits exactly on a window boundary. Convention:
      // last_window = first_window for empty docs (an empty range).
      .withColumn("last_window",
        expr(s"(pack_start + greatest(n_tokens, 1L) - 1) div $window"))
      .select("doc_id", "n_tokens", "pack_start", "first_window", "last_window")
  }

  val t13Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, n_tokens,
       |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pack_start
       |  FROM t)
       |SELECT doc_id, n_tokens, CAST(pack_start AS BIGINT) AS pack_start,
       |  CAST(pack_start // $PackWindow AS BIGINT) AS first_window,
       |  CAST((pack_start + GREATEST(n_tokens, 1) - 1) // $PackWindow
       |    AS BIGINT) AS last_window
       |FROM c ORDER BY doc_id""".stripMargin

  /** t14: Gopher-style quality-filter rules (Rae et al. 2021, §A.1.1 — the
    * standard pre-training admission gate; also C4's heuristics): per-doc
    * word count bounds, mean-word-length band, and a required-stopword
    * rule, each reported as its own flag next to the combined keep — the
    * shape pipelines need to audit WHICH rule dropped a document, not just
    * how many dropped. The stopword rule is Gopher's actual §A.1.1 gate:
    * at least [[GopherMinStopKinds]] DISTINCT words from the paper's
    * 8-stopword list [[GopherStopwords]] (the, be, to, of, and, that,
    * have, with) must occur — that list is the kernel/facade DEFAULT. The
    * BENCHMARK entries (t14, p04) pass [[BenchStopwords]] instead: the
    * synthetic corpus vocabulary contains only 'the' from the paper's
    * list, so the full list would fail every document and the rule would
    * not discriminate; the 2-word set keeps the oracle-gated entries
    * meaningful on this corpus (the simplification is explicit here and
    * in Text.gopherFilters' scaladoc).
    * All ratios derive from integer counts with one rounded division
    * (the t01 determinism contract); single codegen'd scan, no shuffle —
    * a map-only pass at 100 TB. */
  val GopherMinWords = 50
  val GopherMaxWords = 100000
  val GopherMwlLo = 3.0
  val GopherMwlHi = 5.0
  val GopherMinStopKinds = 2
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  /** Corpus-discriminating subset used by the oracle-gated bench entries
    * (see the t14 scaladoc above for why). */
  val BenchStopwords: Seq[String] = Seq("the", "a")
  /** Lambda body shared verbatim by the Spark kernel and the DuckDB oracle
    * (both use `w` as the bound variable); p04 composes it too. The words
    * are spliced into SQL text, and Spark and DuckDB ESCAPE DIFFERENTLY
    * (backslash vs quote-doubling), so rather than escaping two ways we
    * reject metacharacters by name — every real stopword list is plain
    * letters. */
  private[graft] def stopCondOf(stopwords: Seq[String]): String = {
    require(stopwords.nonEmpty, "gopherFilters: stopword list is empty")
    stopwords.find(!_.matches("[A-Za-z0-9]+")).foreach { bad =>
      throw new IllegalArgumentException(
        s"gopherFilters: stopword '$bad' contains characters outside " +
          "[A-Za-z0-9] — quotes/backslashes would be spliced into SQL text")
    }
    stopwords.map(s => s"w = '$s'").mkString(" OR ")
  }
  private[graft] val benchStopCond = stopCondOf(BenchStopwords)

  def t14GopherFilters(s: SparkSession, d: String): DataFrame =
    gopherFiltersOf(documents(s, d), stopwords = BenchStopwords)
      .orderBy("doc_id")

  /** t14's kernel over any (doc_id, text) frame (graft.ops.Text API).
    * `passthrough` names extra input columns to carry into the output —
    * the single-scan hook composition pipelines (p04) use instead of
    * re-joining the flags back onto the corpus. */
  private[graft] def gopherFiltersOf(docs: DataFrame,
                                     passthrough: Seq[String] = Nil,
                                     stopwords: Seq[String] = GopherStopwords): DataFrame =
    docs
      .withColumn("words", split(col("text"), " "))
      .withColumn("n_words", size(col("words")).cast("long"))
      .withColumn("mean_word_len",
        round((length(col("text")) - (col("n_words") - 1)).cast("double")
          / col("n_words"), 4))
      .withColumn("n_stop_kinds", expr(
        s"size(filter(array_distinct(words), w -> ${stopCondOf(stopwords)}))")
        .cast("long"))
      .withColumn("pass_nwords",
        col("n_words") >= GopherMinWords && col("n_words") <= GopherMaxWords)
      .withColumn("pass_mwl",
        col("mean_word_len") >= GopherMwlLo && col("mean_word_len") <= GopherMwlHi)
      .withColumn("pass_stop", col("n_stop_kinds") >= GopherMinStopKinds)
      .withColumn("keep",
        col("pass_nwords") && col("pass_mwl") && col("pass_stop"))
      .select(("doc_id" +: "n_words" +: "mean_word_len" +: "n_stop_kinds" +:
        "pass_nwords" +: "pass_mwl" +: "pass_stop" +: "keep" +:
        passthrough).map(col): _*)

  /** The per-doc Gopher word metrics as prefixed CTE text ending in
    * `<p>m` (doc_id, carry..., n_words, mwl, n_stop) — SHARED by t14Sql,
    * p04Sql and p05Sql so the metric definitions (and the bench stopword
    * set) can never drift between the gated gate and the composed
    * pipelines. `keepSql` is the combined admission predicate over those
    * columns. */
  private[graft] def gopherMetricsSqlCtes(p: String,
                                          carry: Seq[String] = Nil): String = {
    val cs = carry.map(c => s"$c, ").mkString
    s"""${p}t AS (
       |  SELECT doc_id, ${cs}text, string_split(text, ' ') AS words
       |  FROM documents
       |), ${p}m AS (
       |  SELECT doc_id, $cs
       |    CAST(len(words) AS BIGINT) AS n_words,
       |    ROUND((length(text) - (len(words) - 1))::DOUBLE / len(words), 4)
       |      AS mwl,
       |    CAST(len(list_filter(list_distinct(words),
       |      w -> $benchStopCond)) AS BIGINT) AS n_stop
       |  FROM ${p}t)""".stripMargin
  }

  private[graft] val gopherKeepSql: String =
    s"(n_words >= $GopherMinWords AND n_words <= $GopherMaxWords" +
      s" AND mwl >= $GopherMwlLo AND mwl <= $GopherMwlHi" +
      s" AND n_stop >= $GopherMinStopKinds)"

  val t14Sql: String =
    s"""WITH ${gopherMetricsSqlCtes("")}
       |SELECT doc_id, n_words, mwl AS mean_word_len,
       |  n_stop AS n_stop_kinds,
       |  (n_words >= $GopherMinWords AND n_words <= $GopherMaxWords) AS pass_nwords,
       |  (mwl >= $GopherMwlLo AND mwl <= $GopherMwlHi) AS pass_mwl,
       |  (n_stop >= $GopherMinStopKinds) AS pass_stop,
       |  $gopherKeepSql AS keep
       |FROM m ORDER BY doc_id""".stripMargin

  /** t15: data-mix weights — the source-mixing step of pre-training data
    * assembly (the Pile / LLaMA recipe): per-source token mass, its raw
    * share of the corpus, and a temperature-weighted sampling weight
    * w_s ∝ tokens_s^α with α = 0.5, which up-weights small sources
    * relative to proportional sampling. The weight's numerator/denominator
    * are sqrt values FLOORED TO INTEGER MILLI-UNITS before summing, so the
    * denominator is an exact integer sum (associative, shuffle-order-proof
    * — the float-sum order trap the t01 contract exists to avoid) and the
    * only doubles are final divisions of exact integers, identical in both
    * engines. boost = mix_weight/share computed directly from the integers
    * (at extreme token counts compute it in doubles — the integer products
    * here are ~1e9 at bench scale, far from overflow).
    *
    * Scale: ONE scan + one hash agg to ~#sources rows; totals come from a
    * full-frame window over that metadata-sized aggregate (not a second
    * scan branch). Nothing grows with corpus size but the agg. */
  def t15MixWeights(s: SparkSession, d: String): DataFrame =
    mixWeightsOf(documents(s, d)).orderBy("source")

  /** t15's kernel over any (source, text) frame (graft.ops.Text API). */
  private[graft] def mixWeightsOf(docs: DataFrame): DataFrame = {
    val per = docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("src_tokens"))
      .withColumn("st",
        floor(sqrt(col("src_tokens").cast("double")) * 1000).cast("long"))
    // totals via a full-frame window over the ~#sources-row aggregate —
    // metadata-sized input, so the single-partition window is safe at any
    // corpus scale, and it avoids the second corpus scan that a
    // `per.agg(...) join per` totals branch plans (each branch re-derives
    // the scan lineage; PlanSpec pins t15 to ONE FileScan)
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    per
      .withColumn("total_tokens", sum("src_tokens").over(w))
      .withColumn("total_st", sum("st").over(w))
      .select(
        col("source"), col("n_docs"), col("src_tokens"),
        round(col("src_tokens").cast("double") / col("total_tokens"), 6)
          .as("share"),
        round(col("st").cast("double") / col("total_st"), 6).as("mix_weight"),
        round((col("st").cast("double") * col("total_tokens")) /
          (col("total_st").cast("double") * col("src_tokens")), 4).as("boost"))
  }

  val t15Sql: String =
    """WITH per AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
      |  FROM documents GROUP BY source
      |), st AS (
      |  SELECT *, CAST(FLOOR(SQRT(CAST(src_tokens AS DOUBLE)) * 1000) AS BIGINT) AS stv
      |  FROM per
      |), tot AS (
      |  SELECT CAST(SUM(src_tokens) AS BIGINT) AS total_tokens,
      |    CAST(SUM(stv) AS BIGINT) AS total_st FROM st)
      |SELECT source, n_docs, src_tokens,
      |  ROUND(CAST(src_tokens AS DOUBLE) / total_tokens, 6) AS share,
      |  ROUND(CAST(stv AS DOUBLE) / total_st, 6) AS mix_weight,
      |  ROUND((CAST(stv AS DOUBLE) * total_tokens) /
      |    (CAST(total_st AS DOUBLE) * src_tokens), 4) AS boost
      |FROM st CROSS JOIN tot ORDER BY source""".stripMargin

  /** t16: retrieval chunking — the RAG indexing step: each document is
    * cut into fixed `ChunkWindow`-token windows advancing by `ChunkStride`
    * (so consecutive chunks overlap by window - stride tokens, the
    * standard trick so no answer span straddles a chunk boundary unseen),
    * each chunk emitting its offset, length and content fingerprint. The
    * chunk table is what an embedding/index stage consumes.
    * One Generate (explode) per doc — no shuffle before the final sort;
    * chunk count per doc is ceil(n/stride), so output mass is corpus
    * token mass / stride — linear at any scale. */
  val ChunkWindow = 64
  val ChunkStride = 48

  def t16ChunkWindows(s: SparkSession, d: String): DataFrame =
    chunkWindowsOf(documents(s, d), ChunkWindow, ChunkStride)
      .orderBy("doc_id", "chunk_no")

  /** t16's kernel over any (doc_id, text) frame (graft.ops.Text API). */
  private[graft] def chunkWindowsOf(docs: DataFrame, window: Int,
                                    stride: Int): DataFrame =
    docs
      .withColumn("words", split(col("text"), " "))
      .withColumn("n", size(col("words")).cast("long"))
      .withColumn("chunk_no",
        explode(expr(s"sequence(0L, (n + ${stride - 1}) div $stride - 1)")))
      .select(
        col("doc_id"), col("chunk_no"),
        (col("chunk_no") * stride).as("start_tok"),
        least(lit(window.toLong), col("n") - col("chunk_no") * stride)
          .as("chunk_tokens"),
        md5(expr(s"concat_ws(' ', slice(words, chunk_no * $stride + 1, $window))"))
          .as("chunk_md5"))

  val t16Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS words,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, words, n,
       |    unnest(range(0, (n + ${ChunkStride - 1}) // $ChunkStride)) AS chunk_no
       |  FROM t)
       |SELECT doc_id, chunk_no,
       |  chunk_no * $ChunkStride AS start_tok,
       |  least($ChunkWindow, n - chunk_no * $ChunkStride) AS chunk_tokens,
       |  md5(array_to_string(words[chunk_no * $ChunkStride + 1 :
       |    chunk_no * $ChunkStride + least($ChunkWindow, n - chunk_no * $ChunkStride)],
       |    ' ')) AS chunk_md5
       |FROM c ORDER BY doc_id, chunk_no""".stripMargin

  /** t17: BPE merge learning — tokenizer TRAINING, not just tokenization:
    * learn the first `BpeMergeCount` byte-pair merges from the corpus the
    * way production trainers do (HuggingFace tokenizers): ONE corpus scan
    * compresses the text to a word-frequency table, then each merge
    * iteration is a vocab-sized aggregation (adjacent-symbol pair counts
    * weighted by word frequency) + a 1-row argmax collect + a symbol-string
    * rewrite. At 100 TB the corpus is touched exactly once; the iterations
    * run on |vocab| rows (the freq table is persisted and released in a
    * `finally`, the CacheHygieneSpec contract).
    *
    * Merge application semantics: symbols are '~'-delimited with wrap
    * boundaries and a merge applies as TWO leftmost-non-overlapping
    * `replace(sym, "~a~b~", "~ab~")` passes — IDENTICAL in Spark and
    * DuckDB by construction. Two passes equal reference BPE's greedy
    * left-to-right pairwise application for every word except those
    * containing a 5+-fold repetition of some substring — there BOTH the
    * grouping and (for even-length runs of 6+) the merge-site count can
    * differ from reference BPE; TextApiSpec
    * asserts no corpus word has such a repetition so the caveat cannot
    * rot. Corpus text must not contain '~' (it would forge symbol
    * boundaries) — validated on the vocab-sized freq table with a named
    * error, not a second corpus scan. Learning stops early (fewer rows)
    * if the vocabulary runs out of adjacent pairs before nMerges.
    * Winner tie-break is (count desc, pair asc) in both engines.
    *
    * BATCHED ITERATIONS (`batch` > 1, the standard batched-BPE trick): a
    * real 30k-50k-merge vocabulary at one driver round-trip per merge is
    * 50k Spark jobs, so each iteration may instead accept up to `batch`
    * pairs from the ranked count table, greedily skipping any pair that
    * shares a SYMBOL with a higher-ranked accepted pair — disjoint pairs
    * merge independently, so their counts and rewrites are exactly the
    * sequential ones. Batched ≡ sequential whenever no merge CREATES a
    * pair outranking a later accepted pair (TextApiSpec pins B=8 ≡ B=1
    * on such a corpus, including the deferral of an overlapping pair);
    * on adversarial corpora the batch may pick a pair sequential BPE
    * would have re-ranked — the documented approximation every batched
    * trainer makes. batch=1 (the default and the gated t17 entry) is
    * bit-for-bit the sequential algorithm. */
  val BpeMergeCount = 3

  def t17BpeMerges(s: SparkSession, d: String): DataFrame =
    bpeMergesOf(documents(s, d), BpeMergeCount)

  /** t17's kernel over any (doc_id, text) frame (graft.ops.Text API). */
  private[graft] def bpeMergesOf(docs: DataFrame, nMerges: Int,
                                 batch: Int = 1): DataFrame = {
    require(batch >= 1, s"bpeMerges: batch must be >= 1, got $batch")
    val s = docs.sparkSession
    import s.implicits._
    val freq = docs
      // (?s). so the char split treats \r and unicode line separators
      // identically in Java regex and the oracle's RE2
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("sym", concat(lit("~"),
        concat_ws("~", expr("regexp_extract_all(word, '(?s).', 0)")), lit("~")))
      .select("word", "cnt", "sym")
      .persist()
    try {
      val forged = freq.filter(col("word").contains("~")).limit(1)
        .collect().headOption
      forged.foreach { r =>
        throw new IllegalArgumentException(
          s"bpeMerges: corpus word '${r.getString(0)}' contains the symbol " +
            "delimiter '~' — it would forge symbol boundaries; scrub first")
      }
      var state = freq.select("cnt", "sym")
      val winners = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, String, Long)]
      var exhausted = false
      while (winners.size < nMerges && !exhausted) {
        // over-fetch 4x so heavy symbol overlap still fills the batch;
        // under-filled batches just take another (cheap) iteration
        val top = state
          .withColumn("ss", expr("filter(split(sym, '~'), x -> x != '')"))
          .withColumn("pair", explode(expr(
            // sequence(1, 0) runs DESCENDING in Spark (the t10 guard):
            // single-symbol words must emit an empty pair list explicitly
            "case when size(ss) >= 2 then transform(sequence(1, size(ss) - 1), " +
              "i -> concat(element_at(ss, i), '~', element_at(ss, i + 1))) " +
              "else array() end")))
          .groupBy("pair").agg(sum("cnt").as("c"))
          .orderBy(col("c").desc, col("pair").asc)
          .limit(if (batch == 1) 1 else batch * 4).collect()
        if (top.isEmpty) exhausted = true // vocabulary fully merged
        else {
          // greedy maximal prefix of symbol-disjoint pairs
          val used = scala.collection.mutable.Set.empty[String]
          val want = math.min(batch, nMerges - winners.size)
          val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
          top.iterator.takeWhile(_ => accepted.size < want).foreach { row =>
            val p = row.getString(0)
            val syms = p.split('~').filter(_.nonEmpty)
            if (syms.forall(!used.contains(_))) {
              accepted += ((p, row.getLong(1)))
              used ++= syms
            }
          }
          // disjoint merges rewrite independently: apply the whole batch
          // as one chained projection (a single narrow stage)
          var st = state
          accepted.foreach { case (p, c) =>
            // pair values go through lit(), never the SQL parser — a pair
            // containing quotes/backslashes must not be parsed as syntax
            val search = lit("~" + p + "~")
            val merged = lit("~" + p.replace("~", "") + "~")
            st = st
              .withColumn("sym", replace(col("sym"), search, merged))
              .withColumn("sym", replace(col("sym"), search, merged))
            winners += ((winners.size + 1L, p, p.replace("~", ""), c))
          }
          state = st
        }
      }
      winners.toSeq.toDF("merge_no", "pair", "merged", "cnt")
        .orderBy("merge_no")
    } finally freq.unpersist()
  }

  /** The t17 merge-LEARNING derivation as CTE text (w, f, s0, and per-
    * iteration e/c/w/s stages — winners land in w1..wN) — unrolled from
    * BpeMergeCount so query and oracle can never desync on the constant,
    * and SHARED by t17Sql (reports the winners) and t19Sql (applies
    * them): each stage re-derives pair counts from the previous stage's
    * symbol strings with the identical winner rule, and applies the
    * merge with the same TWO replace passes. The final stage includes
    * its own merge application so t19 can replay all N merges. */
  private[graft] def bpeLearnSqlCtes: String = {
    def pairStage(symRel: String, n: Int): String =
      s"""e$n AS (
         |  SELECT cnt, unnest(CASE WHEN len(ss) >= 2
         |    THEN list_transform(range(1, len(ss)), i -> ss[i] || '~' || ss[i+1])
         |    ELSE [] END) AS pair
         |  FROM (SELECT cnt, list_filter(string_split(sym, '~'), x -> x <> '') AS ss
         |        FROM $symRel)
         |), c$n AS (SELECT pair, CAST(SUM(cnt) AS BIGINT) AS c FROM e$n GROUP BY pair
         |), w$n AS (SELECT pair, c FROM c$n ORDER BY c DESC, pair LIMIT 1)""".stripMargin
    def mergeStage(prev: String, n: Int): String =
      s"""s$n AS (
         |  SELECT cnt, replace(replace(sym,
         |      '~' || w$n.pair || '~', '~' || replace(w$n.pair, '~', '') || '~'),
         |      '~' || w$n.pair || '~', '~' || replace(w$n.pair, '~', '') || '~')
         |    AS sym
         |  FROM $prev CROSS JOIN w$n)""".stripMargin
    val stages = (1 to BpeMergeCount).map { n =>
      s"${pairStage(s"s${n - 1}", n)},\n${mergeStage(s"s${n - 1}", n)}"
    }.mkString(",\n")
    s"""w AS (
       |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
       |), f AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY word
       |), s0 AS (
       |  SELECT cnt,
       |    '~' || array_to_string(regexp_extract_all(word, '(?s).'), '~') || '~' AS sym
       |  FROM f
       |), $stages""".stripMargin
  }

  val t17Sql: String = {
    val union = (1 to BpeMergeCount).map { n =>
      s"SELECT $n::BIGINT AS merge_no, pair, replace(pair, '~', '') AS merged, c AS cnt FROM w$n"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH $bpeLearnSqlCtes
       |SELECT * FROM (
       |  $union
       |) ORDER BY merge_no""".stripMargin
  }

  val t19Sql: String = {
    // apply the learned winners (w1..wN) to a WORD-keyed symbol table
    // with the identical two-pass replace, then roll up per doc. Each
    // winner is wrapped as an ALWAYS-ONE-ROW no-op-padded table (wg$n):
    // on a merge-exhausted corpus the empty w$n would otherwise CROSS
    // JOIN the apply chain to zero rows while the kernel (which just
    // stops learning early) still emits every doc — the '~~' search of
    // the padded '' pair matches nothing, so the stage is a no-op,
    // exactly like the kernel applying fewer merges.
    val apply = (1 to BpeMergeCount).map { n =>
      s"""wg$n AS (
         |  SELECT COALESCE(MAX(pair), '') AS pair FROM w$n
         |), a$n AS (
         |  SELECT word, replace(replace(sym,
         |      '~' || wg$n.pair || '~', '~' || replace(wg$n.pair, '~', '') || '~'),
         |      '~' || wg$n.pair || '~', '~' || replace(wg$n.pair, '~', '') || '~')
         |    AS sym
         |  FROM a${n - 1} CROSS JOIN wg$n)""".stripMargin
    }.mkString(",\n")
    s"""WITH $bpeLearnSqlCtes,
       |a0 AS (
       |  SELECT word,
       |    '~' || array_to_string(regexp_extract_all(word, '(?s).'), '~') || '~' AS sym
       |  FROM (SELECT DISTINCT word FROM w)
       |), $apply,
       |wtoks AS (
       |  SELECT word,
       |    CAST(len(list_filter(string_split(sym, '~'), x -> x <> '')) AS BIGINT)
       |      AS toks
       |  FROM a$BpeMergeCount
       |), docw AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
       |SELECT d.doc_id, COUNT(*) AS n_words,
       |  CAST(SUM(length(d.word)) AS BIGINT) AS chars_total,
       |  CAST(SUM(t.toks) AS BIGINT) AS tokens_after,
       |  CAST(CASE WHEN SUM(length(d.word)) > 0
       |    THEN (1000 * SUM(t.toks)) // SUM(length(d.word)) ELSE 0 END
       |    AS BIGINT) AS compression_pm
       |FROM docw d JOIN wtoks t ON d.word = t.word
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
  }

  /** t19: BPE ENCODE — applying the t17-learned merge table to tokenize
    * the corpus, the other half of the tokenizer loop (t17 trains, t19
    * encodes; production = train once, encode petabytes): each word's
    * symbol string receives the [[BpeMergeCount]] learned merges in
    * order (the same two-pass boundary replace as training), and the doc
    * aggregates its token counts before/after plus the compression in
    * integer per-mille. The merge table is learned DRIVER-SIDE (one
    * corpus scan through the t17 kernel, iterations on the vocab table)
    * and applied as LITERAL replace chains — a broadcast-free map-only
    * encode scan, the shape that tokenizes 100 TB. The oracle re-learns
    * the identical merges via t17's unrolled CTEs and applies them with
    * the same replace chain — full train+encode agreement. */
  def t19BpeEncode(s: SparkSession, d: String): DataFrame =
    bpeEncodeOf(documents(s, d), BpeMergeCount).orderBy("doc_id")

  /** t19's kernel over any (doc_id, text) frame (graft.ops.Text API). */
  private[graft] def bpeEncodeOf(docs: DataFrame, nMerges: Int,
                                 batch: Int = 1): DataFrame = {
    // train (vocab-sized iterations; corpus scanned once), then encode
    val merges: Seq[String] = bpeMergesOf(docs, nMerges, batch)
      .collect().sortBy(_.getLong(0)).map(_.getString(1)).toSeq
    val symBase = concat(lit("~"),
      concat_ws("~", expr("regexp_extract_all(w, '(?s).', 0)")), lit("~"))
    // merges apply IN LEARNED ORDER, each as the training rewrite's two
    // leftmost-non-overlapping replace passes — encode == train semantics
    val symFinal = merges.foldLeft[org.apache.spark.sql.Column](symBase) {
      (c, p) =>
        val search = lit("~" + p + "~")
        val merged = lit("~" + p.replace("~", "") + "~")
        replace(replace(c, search, merged), search, merged)
    }
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("chars", length(col("w")).cast("long"))
      .withColumn("sym", symFinal)
      .withColumn("toks",
        expr("size(filter(split(sym, '~'), x -> x != ''))").cast("long"))
      .select("doc_id", "chars", "toks")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("chars").as("chars_total"),
        sum("toks").as("tokens_after"))
      // zero-safe: an all-empty-word doc has chars_total = 0 (Spark div
      // would yield NULL, the oracle would divide by zero — both wrong)
      .withColumn("compression_pm",
        when(col("chars_total") > 0,
          expr("(1000 * tokens_after) div chars_total")).otherwise(lit(0L)))
      .select("doc_id", "n_words", "chars_total", "tokens_after",
        "compression_pm")
  }

  /** t18: CCNet-style perplexity quality filter (Wenzek et al. 2020,
    * arXiv:1911.00359 — the standard LM-based pre-training admission
    * stage): train a smoothed bigram LM on a trusted "clean" slice of the
    * corpus, score every target-language document by its mean per-bigram
    * surprisal under that LM, and bucket the corpus into head/middle/tail
    * at the 33rd/66th score percentiles (CCNet's corpus-relative cut).
    *
    * Cross-engine determinism (the t01/t15 contract, no libm logs): the
    * per-bigram surprisal is the INTEGER bit count
    * floor(log2((c1 + V) div (c2 + 1))) computed as
    * `length(bin(...)) - 1` — pure integer arithmetic plus a binary-
    * string length, identical in Spark and DuckDB — where c2 is the
    * clean-slice bigram count, c1 = SUM_w2 c2(w1, w2) its left-context
    * mass, and V the context vocabulary (add-one smoothing:
    * p = (c2+1)/(c1+V)). Per-doc score = (1000 * sum_bits) div
    * n_bigrams; the only doubles are the two percentile thresholds
    * (exact percentile over BIGINT matches quantile_cont — the skill-
    * documented equivalence).
    *
    * Scale shape: ONE clean-slice scan aggregates the bigram LM, which
    * stays DISTRIBUTED (eagerly checkpointed; c1 and V derive from the
    * checkpoint with no rescan). The clean slice is user-supplied: a
    * realistic CCNet setup trains on gigabytes of Wikipedia whose
    * word-bigram table is ~10^8 rows, far past anything a driver can
    * collect — so the LM is never collect()ed. Scoring is one corpus
    * scan → explode → two LM joins → hash agg per doc: the joins
    * BROADCAST while the LM has at most [[PplBroadcastMaxBigrams]]
    * distinct bigrams (one corpus pass, no shuffle of the doc-bigram
    * mass) and fall back to SHUFFLE joins above it (the LM then cannot
    * live in one executor; the doc bigrams exchange on their join keys
    * instead). Both shapes are PlanSpec-pinned; the scored frame is
    * eagerly checkpointed so the tertile-threshold branch reads the
    * materialized scores instead of re-planning the corpus scan.
    * Exactly TWO FileScans total (the naive derived-branch formulation
    * planned EIGHT). */
  val PplCleanSources: Seq[String] = Seq("src0", "src1")
  val PplLang = "en"

  def t18PerplexityFilter(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val en = docs.filter(col("lang") === PplLang)
    perplexityFilterOf(en,
      en.filter(col("source").isin(PplCleanSources: _*)))
      .orderBy("doc_id")
  }

  /** Past this many distinct clean-slice bigrams the LM stops being
    * broadcast and the scoring joins shuffle instead: ~1M (w1, w2, c2)
    * rows is tens of MB serialized — comfortably under executor
    * broadcast budgets — while a Wikipedia-scale LM (~10^8 rows) must
    * exchange. */
  val PplBroadcastMaxBigrams: Long = 1000000L

  /** t18's kernel over any (doc_id, text) target frame and a `clean`
    * trusted slice with the same columns (graft.ops.Text API). */
  private[graft] def perplexityFilterOf(docs: DataFrame, clean: DataFrame,
                                        broadcastMaxBigrams: Long =
                                          PplBroadcastMaxBigrams): DataFrame = {
    // ONE clean-slice pass -> the LM, kept DISTRIBUTED and eagerly
    // checkpointed; c1/V derive from the checkpoint with no rescan.
    // Never collected: the clean slice is user-supplied and its bigram
    // table can reach ~10^8 rows (gigabytes of Wikipedia).
    val c2 = docBigramsOf(clean)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .localCheckpoint(true)
    val n2 = c2.count() // a scalar off the checkpoint, not a collect
    require(n2 > 0,
      "perplexityFilter: the clean slice yields no bigrams — the LM " +
        "cannot be trained (need docs with >= 2 tokens)")
    val c1 = c2.groupBy("w1").agg(sum("c2").as("c1")).localCheckpoint(true)
    val v = c1.count() // context-vocabulary size: one long, same contract
    val small = n2 <= broadcastMaxBigrams
    val (jc2, jc1) =
      if (small) (broadcast(c2), broadcast(c1))
      else (c2.hint("shuffle_merge"), c1.hint("shuffle_merge"))
    // eager checkpoint: the thresholds branch reads the materialized
    // per-doc scores instead of re-planning the corpus scan
    val scored = perplexityScoresLazy(docBigramsOf(docs), jc2, jc1, v)
      .localCheckpoint(true)
    val thr = scored.agg(
      expr("percentile(ppl_milli, 0.33)").as("p33"),
      expr("percentile(ppl_milli, 0.66)").as("p66"))
    scored.crossJoin(broadcast(thr))
      .withColumn("bucket",
        when(col("ppl_milli") <= col("p33"), "head")
          .when(col("ppl_milli") <= col("p66"), "middle")
          .otherwise("tail"))
      .select("doc_id", "n_bigrams", "sum_bits", "ppl_milli", "bucket")
  }

  /** Adjacent-bigram explode of a (doc_id, text) frame (t18's unit). */
  private[graft] def docBigramsOf(df: DataFrame): DataFrame = df
    .withColumn("words", split(col("text"), " "))
    .filter(size(col("words")) >= 2)
    .select(col("doc_id"), explode(expr(
      "transform(sequence(1, size(words) - 1), " +
        "i -> struct(words[i-1] AS w1, words[i] AS w2))")).as("bg"))
    .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** The lazy scoring subtree (one corpus scan + two LM joins + one hash
    * agg) — separated so PlanSpec can gate its physical shape, which the
    * eager checkpoint in [[perplexityFilterOf]] would otherwise hide
    * behind a `Scan ExistingRDD`. The caller decides the join strategy
    * by pre-hinting `c2`/`c1` (broadcast below the size threshold,
    * unhinted → shuffle above it). */
  private[graft] def perplexityScoresLazy(docBigrams: DataFrame,
                                          c2: DataFrame, c1: DataFrame,
                                          v: Long): DataFrame =
    docBigrams
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .withColumn("s_bits",
        (length(expr(s"bin((coalesce(c1, 0L) + ${v}L) div (coalesce(c2, 0L) + 1))"))
          - 1).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("s_bits").as("sum_bits"))
      .withColumn("ppl_milli", expr("(1000 * sum_bits) div n_bigrams"))

  val t18Sql: String =
    s"""WITH en AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS words
       |  FROM documents WHERE lang = '$PplLang'
       |), bg AS (
       |  SELECT doc_id, source, words[i] AS w1, words[i + 1] AS w2
       |  FROM (SELECT doc_id, source, words,
       |          unnest(range(1, len(words))) AS i
       |        FROM en WHERE len(words) >= 2)
       |), c2 AS (
       |  SELECT w1, w2, COUNT(*) AS c2 FROM bg
       |  WHERE source IN (${PplCleanSources.map(s => s"'$s'").mkString(", ")})
       |  GROUP BY 1, 2
       |), c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY 1
       |), v AS (SELECT COUNT(*) AS v FROM c1
       |), sc AS (
       |  SELECT bg.doc_id,
       |    length(bin(CAST(
       |      (COALESCE(c1.c1, 0) + v.v) // (COALESCE(c2.c2, 0) + 1)
       |      AS BIGINT))) - 1 AS s_bits
       |  FROM bg LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)
       |  CROSS JOIN v
       |), scored AS (
       |  SELECT doc_id, COUNT(*) AS n_bigrams,
       |    CAST(SUM(s_bits) AS BIGINT) AS sum_bits,
       |    CAST((1000 * SUM(s_bits)) // COUNT(*) AS BIGINT) AS ppl_milli
       |  FROM sc GROUP BY 1
       |), thr AS (
       |  SELECT quantile_cont(ppl_milli, 0.33) AS p33,
       |    quantile_cont(ppl_milli, 0.66) AS p66 FROM scored)
       |SELECT doc_id, n_bigrams, sum_bits, ppl_milli,
       |  CASE WHEN ppl_milli <= p33 THEN 'head'
       |       WHEN ppl_milli <= p66 THEN 'middle' ELSE 'tail' END AS bucket
       |FROM scored CROSS JOIN thr ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t24

  /** Ingest-order slices for the vocabulary-growth curve. */
  val HeapsSlices = 10

  /** t24: vocabulary-growth audit (Heaps' law) — the corpus-health
    * diagnostic curation pipelines watch across ingest: split the corpus
    * into [[HeapsSlices]] equal doc-id slices (ids are ingest-ordered)
    * and report, per slice, the token mass, the number of NOVEL terms
    * (first corpus occurrence in this slice), the cumulative vocabulary,
    * and the novelty rate `1000·new div tokens`. Healthy heavy-tailed
    * text bends like V(n) ∝ n^β (β ≈ 0.5–0.7, Heaps 1978); a flattening
    * curve signals duplication/boilerplate mass, a straightening one
    * vocabulary explosion (spam, encoding noise). All integer-exact.
    *
    * Scale shape: ONE corpus explode → hash agg to the (slice, term)
    * table (≤ slices × vocab rows, checkpointed — the t23 pattern);
    * novel-term counts (min slice per term) and per-slice token mass are
    * two branches of that metadata-sized table; the cumulative sum is a
    * full-frame window over [[HeapsSlices]] rows. The slice width comes
    * from one max(doc_id) head() (metadata-sized driver value). */
  def t24VocabGrowth(s: SparkSession, d: String): DataFrame =
    vocabGrowthOf(s, documents(s, d), HeapsSlices).orderBy("slice")

  /** t24's kernel over any (doc_id, text) frame (graft.ops.Text API).
    * Slices are equal-width ID-RANGE slices over [min, max] doc_id —
    * offset id spaces slice correctly; sparse ids weight slices by
    * id-space coverage (ingest order), not row count. */
  private[graft] def vocabGrowthOf(s: SparkSession, docs: DataFrame,
                                   slices: Int): DataFrame = {
    require(slices >= 1, s"vocabGrowth: slices must be >= 1, got $slices")
    val b = docs.agg(min("doc_id"), max("doc_id")).head()
    require(!b.isNullAt(0), "vocabGrowth: empty corpus")
    val lo = b.getLong(0)
    val span = b.getLong(1) - lo + 1L
    val st = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .withColumn("slice", expr(s"((doc_id - $lo) * $slices) div $span"))
      .groupBy("slice", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val toks = st.groupBy("slice").agg(sum("tf").as("n_tokens"))
    val novel = st.groupBy("term").agg(min("slice").as("slice"))
      .groupBy("slice").agg(count(lit(1)).as("n_new_terms"))
    // HeapsSlices rows: the single-partition window is metadata-sized
    val W = org.apache.spark.sql.expressions.Window
    val w = W.orderBy("slice")
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    toks.join(novel, Seq("slice"), "left")
      .withColumn("n_new_terms", coalesce(col("n_new_terms"), lit(0L)))
      .withColumn("cum_terms", sum("n_new_terms").over(w))
      .withColumn("novelty_milli",
        expr("(1000 * n_new_terms) div n_tokens"))
      .select("slice", "n_tokens", "n_new_terms", "cum_terms",
        "novelty_milli")
  }

  val t24Sql: String =
    s"""WITH hn AS (
       |  SELECT MIN(doc_id) AS lo, MAX(doc_id) - MIN(doc_id) + 1 AS span
       |  FROM documents
       |), hs AS (
       |  SELECT ((d.doc_id - hn.lo) * $HeapsSlices) // hn.span AS slice,
       |    unnest(string_split(d.text, ' ')) AS term
       |  FROM documents d CROSS JOIN hn
       |), hst AS (
       |  SELECT slice, term, COUNT(*) AS tf FROM hs GROUP BY 1, 2
       |), htok AS (
       |  SELECT slice, CAST(SUM(tf) AS BIGINT) AS n_tokens
       |  FROM hst GROUP BY 1
       |), hnov AS (
       |  SELECT slice, COUNT(*) AS n_new_terms
       |  FROM (SELECT term, MIN(slice) AS slice FROM hst GROUP BY 1)
       |  GROUP BY 1)
       |SELECT t.slice, t.n_tokens,
       |  CAST(COALESCE(v.n_new_terms, 0) AS BIGINT) AS n_new_terms,
       |  CAST(SUM(COALESCE(v.n_new_terms, 0)) OVER (ORDER BY t.slice
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS cum_terms,
       |  CAST((1000 * COALESCE(v.n_new_terms, 0)) // t.n_tokens AS BIGINT)
       |    AS novelty_milli
       |FROM htok t LEFT JOIN hnov v ON t.slice = v.slice
       |ORDER BY t.slice""".stripMargin

  // ---------------------------------------------------------------- t25

  /** Stopwords reported per corpus. */
  val StopTopK = 20

  /** Document-frequency floor (milli): a stopword must appear in at
    * least this fraction of documents. */
  val StopMinDfMilli = 400L

  /** t25: corpus-driven STOPWORD DISCOVERY — the language-adaptive input
    * to t14's parameterized stopword gate (CCNet runs exactly this loop
    * per language: derive function words from document frequency, then
    * gate on them): the top-[[StopTopK]] terms by document frequency
    * among those present in ≥ [[StopMinDfMilli]]/1000 of documents
    * (function words saturate df; content words don't — Zipf's law makes
    * the df gap sharp). Integer-exact: df counts and milli rates, ties
    * by term. Feed the resulting terms to `Text.gopherFilters(stopwords
    * = …)` to close the discover→gate loop (spec does exactly that).
    *
    * Scale shape: one corpus scan → per-doc DISTINCT terms (explode of
    * array_distinct — zero shuffle for the distinct, the shinglesOf
    * trick) → vocab-sized df hash agg; the rank window runs on the
    * ≤ vocab rows. The doc total is one metadata count. */
  def t25StopwordDiscovery(s: SparkSession, d: String): DataFrame =
    stopwordDiscoveryOf(s, documents(s, d), StopTopK, StopMinDfMilli)
      .orderBy("rk")

  /** t25's kernel over any (doc_id, text) frame (graft.ops.Text API). */
  private[graft] def stopwordDiscoveryOf(s: SparkSession, docs: DataFrame,
                                         topK: Int, minDfMilli: Long): DataFrame = {
    import s.implicits._
    require(topK >= 1, s"stopwordDiscovery: topK must be >= 1, got $topK")
    require(minDfMilli >= 0 && minDfMilli <= 1000,
      s"stopwordDiscovery: minDfMilli must be in [0,1000], got $minDfMilli")
    val nDocs = docs.count()
    require(nDocs >= 1, "stopwordDiscovery: empty corpus")
    val W = org.apache.spark.sql.expressions.Window
    val w = W.orderBy(col("df").desc, col("term").asc)
    docs
      .select(explode(array_distinct(split(col("text"), " "))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("df_milli", expr(s"(1000 * df) div $nDocs"))
      .filter(col("df_milli") >= minDfMilli)
      // vocab-sized frame: the single-partition rank window is fine
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
      .select("rk", "term", "df", "df_milli")
  }

  val t25Sql: String =
    s"""WITH sn AS (
       |  SELECT COUNT(*) AS n FROM documents
       |), sdf AS (
       |  SELECT term, COUNT(*) AS df FROM (
       |    SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
       |    FROM documents) GROUP BY 1
       |), sm AS (
       |  SELECT term, df, (1000 * df) // sn.n AS df_milli
       |  FROM sdf CROSS JOIN sn)
       |SELECT CAST(rk AS BIGINT) AS rk, term, CAST(df AS BIGINT) AS df,
       |  CAST(df_milli AS BIGINT) AS df_milli
       |FROM (SELECT term, df, df_milli,
       |        ROW_NUMBER() OVER (ORDER BY df DESC, term) AS rk
       |      FROM sm WHERE df_milli >= $StopMinDfMilli)
       |WHERE rk <= $StopTopK ORDER BY rk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t25_stopword_discovery" -> t25StopwordDiscovery _,
    "t24_vocab_growth" -> t24VocabGrowth _,
    "t19_bpe_encode" -> t19BpeEncode _,
    "t18_perplexity_filter" -> t18PerplexityFilter _,
    "t17_bpe_merges" -> t17BpeMerges _,
    "t16_chunk_windows" -> t16ChunkWindows _,
    "t15_mix_weights" -> t15MixWeights _,
    "t14_gopher_filters" -> t14GopherFilters _,
    "t13_sequence_pack" -> t13SequencePack _,
    "t11_contamination" -> t11Contamination _,
    "t12_domain_balance" -> t12DomainBalance _,
    "t08_clean_text" -> t08CleanText _,
    "t09_pii_scrub" -> t09PiiScrub _,
    "t10_repetition" -> t10Repetition _,
    "t01_text_stats" -> t01TextStats _,
    "t02_langid" -> t02LangId _,
    "t03_fingerprint" -> t03Fingerprint _,
    "t04_token_freq" -> t04TokenFreq _,
    "t05_langid_ngram" -> t05LangIdNgram _,
    "t06_bpe_tokens" -> t06BpeTokens _,
    "t07_sample_strata" -> t07SampleStrata _,
  )

  val oracles: Map[String, String] = Map(
    "t25_stopword_discovery" -> t25Sql,
    "t24_vocab_growth" -> t24Sql,
    "t19_bpe_encode" -> t19Sql,
    "t18_perplexity_filter" -> t18Sql,
    "t17_bpe_merges" -> t17Sql,
    "t16_chunk_windows" -> t16Sql,
    "t15_mix_weights" -> t15Sql,
    "t14_gopher_filters" -> t14Sql,
    "t13_sequence_pack" -> t13Sql,
    "t01_text_stats" -> t01Sql,
    "t02_langid" -> t02Sql,
    "t03_fingerprint" -> t03Sql,
    "t04_token_freq" -> t04Sql,
    "t05_langid_ngram" -> t05Sql,
    "t06_bpe_tokens" -> t06Sql,
    "t07_sample_strata" -> t07Sql,
    "t08_clean_text" -> t08Sql,
    "t09_pii_scrub" -> t09Sql,
    "t10_repetition" -> t10Sql,
    "t11_contamination" -> t11Sql,
    "t12_domain_balance" -> t12Sql,
  )
}
