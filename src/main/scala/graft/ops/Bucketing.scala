package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-layout utilities for the 100 TB path. A fact table that is
  * joined or aggregated on the same key in many pipelines (orders ⋈
  * lineitem on orderkey; documents ⋈ dedup verdicts on doc_id) should be
  * LAID OUT bucketed on that key once, so every later join/agg reuses the
  * layout instead of re-shuffling the table per query — at 100 TB the
  * shuffle, not the scan, is what a bucketed layout deletes.
  *
  * Uses Spark's native bucketing (`bucketBy` + `sortBy` + `saveAsTable`,
  * hash-partitioned files per bucket): two tables bucketed on their join
  * key with the same bucket count join with NO Exchange — and NO Sort
  * either when `spark.sql.legacy.bucketedTableScan.outputOrdering=true`
  * (since Spark 3.0 the scan hides the bucket sort order by default) —
  * verified by BucketingSpec's plan gates.
  */
object Bucketing {

  /** Persist `df` bucketed (and sorted) by `key` into `buckets` buckets.
    * Bucket count is a layout decision: pick it so one bucket of the
    * LARGEST co-bucketed table fits an executor task comfortably
    * (~128-512 MB post-compression at cluster scale). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    // repartition on the bucket key first (same murmur3-pmod hash as the
    // bucket spec) so each bucket is written as exactly ONE file: readers
    // only exploit the sortBy order with one file per bucket, and a
    // one-file-per-bucket layout is also what avoids the small-files
    // problem when thousands of writer tasks each touch every bucket
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two co-bucketed tables on their bucket key — shuffle-free when
    * both were written by writeBucketed with the same bucket count. */
  def coLocatedJoin(spark: SparkSession, tableA: String, tableB: String,
                    key: String): DataFrame =
    spark.table(tableA).join(spark.table(tableB), key)
}
