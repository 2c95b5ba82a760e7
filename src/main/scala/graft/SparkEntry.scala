package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q04StarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Relational2.queries ++ Relational3.queries ++
      CubeOps.queries ++ BakeOps.queries ++ NetcdfOps.queries ++ Hdf5Ops.queries ++
      GribOps.queries ++ DapOps.queries ++ ZarrV2Ops.queries ++
      GeotiffOps.queries ++
      TextOps.queries ++ SelectionOps.queries ++ RetrievalOps.queries ++
      DedupOps.queries ++ DedupOps2.queries ++
      SimilarityOps.queries ++ ClusterOps.queries ++
      MultiModalOps.queries ++ StreamOps.queries ++ PipelineOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Relational2.oracles ++ Relational3.oracles ++
      CubeOps.oracles ++ BakeOps.oracles ++ NetcdfOps.oracles ++
      Hdf5Ops.oracles ++ GribOps.oracles ++ DapOps.oracles ++
      ZarrV2Ops.oracles ++ GeotiffOps.oracles ++
      TextOps.oracles ++ SelectionOps.oracles ++ RetrievalOps.oracles ++
      DedupOps.oracles ++ DedupOps2.oracles ++
      SimilarityOps.oracles ++ ClusterOps.oracles ++
      MultiModalOps.oracles ++ StreamOps.oracles ++
      PipelineOps.oracles
}
