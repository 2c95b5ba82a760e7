package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Second wave of relational coverage: HAVING, decorrelated comparisons,
  * date bucketing, conditional aggregation, string/LIKE/regexp functions,
  * order-priority semi-join counts (TPC-H Q4 shape), and JSON extraction
  * over the events props column. Same determinism rules as Relational. */
object Relational2 {
  import Tables._

  /** GROUP BY ... HAVING: parts appearing on many orders. */
  def q15Having(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n_lines"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .filter(col("n_lines") >= 8)
      .orderBy("l_partkey")

  val q15Sql: String =
    """SELECT l_partkey, COUNT(*) AS n_lines,
      |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      |FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 8
      |ORDER BY l_partkey""".stripMargin

  /** Orders priced above their customer's average (correlated comparison,
    * decorrelated through a window — one pass, no self-join). */
  def q16AboveAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
    orders(s, d)
      .withColumn("cust_avg", avg(col("o_totalprice")).over(w))
      .withColumn("n_cust_orders", count(lit(1)).over(w))
      .filter(col("n_cust_orders") >= 3 &&
        col("o_totalprice") > col("cust_avg") * 1.5)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"))
      .orderBy("o_orderkey")
  }

  val q16Sql: String =
    """WITH w AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice,
      |    AVG(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg,
      |    COUNT(*) OVER (PARTITION BY o_custkey) AS n_cust_orders
      |  FROM orders)
      |SELECT o_orderkey, o_custkey,
      |  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
      |FROM w WHERE n_cust_orders >= 3 AND o_totalprice > cust_avg * 1.5
      |ORDER BY o_orderkey""".stripMargin

  /** Monthly order volume (date_trunc bucketing). */
  def q17Monthly(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM")
        .as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
      .orderBy("month")

  val q17Sql: String =
    """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM orders GROUP BY 1 ORDER BY month""".stripMargin

  /** Conditional aggregation share (TPC-H Q14 shape): fraction of revenue
    * from ECONOMY-type parts, as a ratio of exact integer sums. */
  def q18CondAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "ECONOMY",
          round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
            .cast("long")).otherwise(0L)).as("economy_cents"),
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("total_cents"))
      .withColumn("economy_share",
        round(col("economy_cents").cast("double") / col("total_cents"), 6))

  val q18Sql: String =
    """WITH t AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN p_type = 'ECONOMY'
      |      THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS economy_cents,
      |    CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |  FROM lineitem JOIN part ON l_partkey = p_partkey)
      |SELECT economy_cents, total_cents,
      |  ROUND(economy_cents::DOUBLE / total_cents, 6) AS economy_share
      |FROM t""".stripMargin

  /** String functions: LIKE, regexp matching, substring, upper/length. */
  def q19Strings(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(col("p_name").like("%a%") &&
        col("p_brand").rlike("^Brand#[0-9]+$"))
      .select(col("p_partkey"),
        upper(substring(col("p_name"), 1, 3)).as("prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).cast("long").as("brand_num"))
      .orderBy("p_partkey")

  val q19Sql: String =
    """SELECT p_partkey, UPPER(substr(p_name, 1, 3)) AS prefix,
      |  length(p_name)::BIGINT AS name_len,
      |  CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num
      |FROM part
      |WHERE p_name LIKE '%a%' AND regexp_matches(p_brand, '^Brand#[0-9]+$')
      |ORDER BY p_partkey""".stripMargin

  /** TPC-H Q4 shape: orders with at least one late lineitem, counted by
    * priority via a semi join. */
  def q20LateOrders(s: SparkSession, d: String): DataFrame = {
    val late = lineitem(s, d).filter(col("l_shipdate") > lit("1999-01-01"))
      .select("l_orderkey")
    orders(s, d)
      .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  val q20Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1999-01-01')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** JSON extraction from the events props column. */
  def q21Json(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  val q21Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
      |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q15_having" -> q15Having _,
    "q16_above_avg" -> q16AboveAvg _,
    "q17_monthly" -> q17Monthly _,
    "q18_cond_agg" -> q18CondAgg _,
    "q19_strings" -> q19Strings _,
    "q20_late_orders" -> q20LateOrders _,
    "q21_json" -> q21Json _,
  )

  val oracles: Map[String, String] = Map(
    "q15_having" -> q15Sql,
    "q16_above_avg" -> q16Sql,
    "q17_monthly" -> q17Sql,
    "q18_cond_agg" -> q18Sql,
    "q19_strings" -> q19Sql,
    "q20_late_orders" -> q20Sql,
    "q21_json" -> q21Sql,
  )
}
