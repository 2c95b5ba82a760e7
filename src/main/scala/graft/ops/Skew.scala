package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB path. AQE's skew-join splitting
  * handles most cases at runtime; explicit salting remains necessary when a
  * single join key dominates so heavily that even split partitions hot-spot
  * (the classic null-key / celebrity-entity problem in web-scale joins).
  */
object Skew {

  /** Salted equi-join: the skewed (large) side gets a random salt in
    * [0, saltFactor); the small side is exploded saltFactor times so every
    * (key, salt) pair finds its match. Result equals a plain inner join on
    * `key`, but the hot key's rows spread over saltFactor reducers.
    *
    * The salt must NOT affect results — it is derived from a hash of the
    * row's other columns rather than rand(), keeping the operator
    * deterministic (and hence oracle-checkable).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int = 8, saltSource: Column): DataFrame = {
    val salted = large.withColumn("__salt", pmod(hash(saltSource), lit(saltFactor)))
    val exploded = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }

  /** Key-frequency report — the diagnostic used to decide whether a join
    * needs salting (top-k heavy hitters by row count). */
  def keySkewReport(df: DataFrame, key: String, topK: Int = 10): DataFrame =
    df.groupBy(key)
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc, col(key))
      .limit(topK)
}
