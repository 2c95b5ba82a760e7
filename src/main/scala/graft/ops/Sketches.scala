package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Library-shaped mergeable-sketch API (the q24/q32/q33/q34 kernels over
  * arbitrary columns). Sketches are what actually runs at 10^12 rows:
  * their state is grid/register-sized whatever the input, their builds
  * are one partial-aggregated scan, and two corpora's sketches combine
  * with an elementwise monoid — so incremental ingest never re-touches
  * the standing data. */
object Sketches {

  /** Build a Count-Min grid over `keyCol`: one scan, the d-row fan-out
    * as a literal-array explode inside the scan's codegen stage, partial
    * aggregation map-side — the shuffle carries at most d·w cells per
    * map partition at any row count. Returns (r, c, n), the mergeable
    * grid (grids of disjoint corpora SUM elementwise — see
    * `SketchSpec`). Hash rows are disjoint 16-bit md5 slices; pick
    * w ≈ e/ε for an ε·N overcount bound with probability 1 − 2^−d. */
  def countMinCells(df: DataFrame, keyCol: String,
                    d: Int = 4, w: Int = 4096): DataFrame =
    df.select(posexplode(expr(
        graft.queries.Relational3.cmsColsExpr(s"`$keyCol`", d, w)))
        .as(Seq("r", "c")))
      .groupBy("r", "c").agg(count(lit(1)).as("n"))

  /** Estimate the frequency of every key in `keys` against a prebuilt
    * grid (min over the key's d cells — one-sided: estimates can only
    * exceed true counts). `d`/`w` must match the build. Returns
    * (<keyCol>, est_n). */
  def countMinEstimate(cells: DataFrame, keys: DataFrame, keyCol: String,
                       d: Int = 4, w: Int = 4096): DataFrame =
    keys.select(col(keyCol),
        posexplode(expr(
          graft.queries.Relational3.cmsColsExpr(s"`$keyCol`", d, w)))
          .as(Seq("r", "c")))
      .join(cells, Seq("r", "c"))
      .groupBy(keyCol).agg(min("n").as("est_n"))

  /** Sketch-estimated heavy hitters in ONE pass over `df` plus a probe
    * of the candidate keys: build the grid, estimate every distinct key,
    * return the top `k` by (est_n desc, key). For keys whose true count
    * exceeds N/w the estimate is within ε·N of exact w.h.p. — the
    * standard CMS heavy-hitter contract. */
  def heavyHitters(spark: SparkSession, df: DataFrame, keyCol: String,
                   k: Int, d: Int = 4, w: Int = 4096): DataFrame = {
    val cells = countMinCells(df, keyCol, d, w).localCheckpoint(true)
    countMinEstimate(cells, df.select(keyCol).distinct(), keyCol, d, w)
      .orderBy(col("est_n").desc, col(keyCol)).limit(k)
  }
}
