package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** The driver's testdata generator has shifted `events.ts`'s physical type
  * across rounds (TIMESTAMP(NANOS) → naive timestamp[us] read as
  * TIMESTAMP_NTZ). Loading an unrecognized drift mode must fail with a
  * named error, not a downstream DATATYPE_MISMATCH twelve queries deep.
  */
final class UnsupportedTableSchemaException(table: String, column: String, tpe: DataType)
  extends IllegalStateException(
    s"$table.$column has unsupported type $tpe; expected one of " +
      "LongType (nanosAsLong), TimestampType, TimestampNTZType — " +
      "the testdata generator drifted again; add a normalization arm in Tables")

/** Table loaders over the driver-generated parquet dirs (TESTDATA.md).
  * All queries receive `sfDir` and read only through these helpers so the
  * scan (and its pushed filters / pruned columns) is uniform everywhere.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  /** events.parquet has stored `ts` as parquet TIMESTAMP(NANOS) (read via
    * spark.sql.legacy.parquet.nanosAsLong as a LongType of epoch nanos)
    * and, since the round-6 generator, as naive timestamp[us] (read as
    * TIMESTAMP_NTZ). Normalize every drift mode to a micros TimestampType
    * `ts` plus a raw `ts_ns` long so queries can pick whichever is
    * loss-free. The NTZ→Timestamp cast is lossless because the session tz
    * is pinned UTC (build.sbt), matching DuckDB's naive-timestamp read. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(t(s, d, "events"))

  /** Normalize any observed `ts` drift mode to (TimestampType ts, long
    * ts_ns). Works on batch and streaming DataFrames alike — streaming
    * sources over the same parquet must apply the identical arm. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case TimestampType =>
        df.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case other =>
        throw new UnsupportedTableSchemaException("events", "ts", other)
    }
  /** Spread a small-file scan across the cores before CPU-heavy per-row
    * work (r15 optimization, guide §2.5 "input skew: one huge unsplittable
    * file ... repartition immediately after the read"). Parquet splits at
    * row-group granularity and the driver's testdata is ONE file with ONE
    * row group per table, so every stage fused to the scan — gram md5
    * hashing, BPE, media decode, shingling — otherwise runs as a single
    * task regardless of core count. Scale-adaptive, not a local[n] tune:
    * the target is defaultParallelism (whatever the session was given) and
    * the repartition is SKIPPED whenever the scan already yields at least
    * that many splits, i.e. on any real multi-file corpus this is the
    * identity and no exchange is added; when it does fire, the shuffle
    * moves the table exactly once (the corpus is by definition small —
    * few splits — when the gate passes). Round-robin repartition is
    * deterministic under retries (sortBeforeRepartition, SPARK-23207). */
  private def spread(s: SparkSession, d: String, name: String): DataFrame = {
    val df = t(s, d, name)
    val target = s.sparkContext.defaultParallelism
    // The split probe (.rdd.getNumPartitions) is only safe because t() is
    // a bare exchange-free parquet scan — under AQE, .rdd on a plan with
    // an exchange would materialize query stages (run jobs) at build time
    // (r15 ADVICE). Assert the precondition so a future normalization arm
    // that adds a shuffle fails loudly here instead of silently executing
    // work in the gate; and memoize the verdict per (context, file, target)
    // — the probe spins up a full QueryExecution, and every query re-calls
    // documents()/embeddings(), so one bench pass was paying ~100 probe
    // plans for a value that cannot change while the session is alive
    // (the parquet inputs are immutable for the run; same files + same
    // session config => same split count).
    val ctx = s.sparkContext
    val key = s"${ctx.applicationId}@${ctx.startTime}#$d/$name#$target"
    val needs = spreadDecisions.computeIfAbsent(key, _ => {
      require(df.queryExecution.logical
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LeafNode],
        s"spread: $name scan must be a bare relation leaf (exchange-free) " +
          "— the split probe would otherwise execute query stages")
      Boolean.box(df.rdd.getNumPartitions < target)
    })
    if (needs) df.repartition(target) else df
  }

  /** Memoized spread verdicts, keyed by (context identity, file, target):
    * bounded (a handful of tables × one target per session); other-context
    * entries are harmless booleans, but the applicationId+startTime key
    * keeps a restarted context from reading a stale verdict. */
  private val spreadDecisions =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  def documents(s: SparkSession, d: String): DataFrame =
    spread(s, d, "documents")
  /** The raw documents scan, NO spread: only for queries whose first
    * operation is itself a global sort (the media decoders sort by doc_id
    * BELOW the decode) — there the sort's range exchange already spreads
    * the rows across the cores and a spread would be a second, redundant
    * exchange of the same bytes — or an internal round-robin repartition
    * (docBigramVectors), where the spread would be the same bytes through
    * two back-to-back exchanges. */
  private[graft] def documentsUnspread(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    spread(s, d, "embeddings")
}
