package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator surface: scans, filters, projections, hash/broadcast
  * joins, partial+final aggregation, windows, sorts/top-k, set ops, rollup.
  *
  * Cross-engine determinism rules (the driver hash-compares against DuckDB):
  *   - money sums are per-row `round(x*100)` cast to long, THEN summed —
  *     integer addition is associative so shuffle order can't change the hash;
  *   - every query ends in a total ORDER BY;
  *   - types are aligned (DuckDB sum(int)->HUGEINT is cast back to BIGINT
  *     on the oracle side, counts stay BIGINT, years cast to INT);
  *   - timestamps leave the plan as unix epoch integers or formatted strings.
  *
  * Scale notes (100 TB design): every aggregate here is a partial+final hash
  * agg (map-side combine free via Catalyst); dimension tables (region, nation,
  * customer at these SFs) are broadcast explicitly so the fact scan never
  * shuffles for them; filters/projections sit directly on the parquet scan so
  * pushdown + column pruning reach the reader.
  */
object Relational {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-style pricing summary: the canonical partial-agg reduction.
    * Mirrors the reference's single-pass combine (combiners.py:99-115 is the
    * min/max/count cousin); Spark gives mapper-side partial agg for free. */
  def q01Agg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_base_cents"),
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("sum_disc_cents"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
      |  ROUND(AVG(l_quantity), 4) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Filter + projection pushdown: predicate and 3-column ReadSchema must
    * reach the parquet scan (verified in PlanSpec). */
  def q02FilterProject(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01") && col("l_quantity") < 5)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * 100).cast("long").as("price_cents"))
      .orderBy("l_orderkey", "l_linenumber")

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      |  AND l_quantity < 5
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Broadcast join: customer (dim) is hint-broadcast into the orders/lineitem
    * fact pipeline — no shuffle for the dim side at any scale where it fits. */
  def q03JoinAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("revenue_cents"),
        count(lit(1)).as("n_lines"))
      .orderBy("c_mktsegment")

  val q03Sql: String =
    """SELECT c_mktsegment,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Star join through region->nation->customer->orders->lineitem; all dims
    * broadcast, single shuffle for the final group-by. */
  def q04StarJoin(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      .groupBy("r_name", "n_name")
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")).as("revenue_cents"))
      .orderBy("r_name", "n_name")

  val q04Sql: String =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** Global top-k: Spark's sort+limit compiles to TakeOrderedAndProject —
    * per-partition heaps, no global sort. */
  def q05TopK(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .orderBy(col("price_cents").desc, col("o_orderkey"))
      .limit(10)

  val q05Sql: String =
    """SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_date
      |FROM orders ORDER BY price_cents DESC, o_orderkey LIMIT 10""".stripMargin

  /** Window functions: per-customer ranking + running sum (ordered window
    * accumulation of integer cents is deterministic). */
  def q06Window(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("price_cents", round(col("o_totalprice") * 100).cast("long"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("running_cents",
        sum(col("price_cents")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("rk") <= 3)
      .select("o_custkey", "rk", "o_orderkey", "price_cents", "running_cents")
      .orderBy("o_custkey", "rk")
  }

  val q06Sql: String =
    """SELECT o_custkey, rk, o_orderkey, price_cents, CAST(running_cents AS BIGINT) AS running_cents
      |FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk,
      |    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
      |      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cents
      |  FROM orders) t
      |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin

  /** Exact distinct counting (expand+two-phase agg in Spark). */
  def q07Distinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  val q07Sql: String =
    """SELECT l_returnflag,
      |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Set ops: INTERSECT / EXCEPT over customer-key sets from two years.
    * (The reference's CONCAT/MERGE set semantics live in q13/q14; these are
    * the classical relational set ops.) */
  def q08SetOps(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    def keysIn(year: Int) = o
      .filter(col("o_orderdate") >= lit(f"$year-01-01") &&
        col("o_orderdate") < lit(f"${year + 1}-01-01"))
      .select("o_custkey")
    val both = keysIn(1995).intersect(keysIn(1996))
      .withColumn("op", lit("both"))
    val only95 = keysIn(1995).except(keysIn(1996))
      .withColumn("op", lit("only_1995"))
    both.unionAll(only95).orderBy("op", "o_custkey")
  }

  val q08Sql: String =
    """WITH y95 AS (SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'),
      |y96 AS (SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
      |SELECT o_custkey, 'both' AS op FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
      |UNION ALL
      |SELECT o_custkey, 'only_1995' AS op FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
      |ORDER BY op, o_custkey""".stripMargin

  /** Semi/anti joins (EXISTS / NOT EXISTS): customers with zero orders. */
  def q09SemiAnti(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val o = orders(s, d)
    val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("has_orders").as("status"))
    val noO = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("no_orders").as("status"))
    withO.unionAll(noO)
      .groupBy("status").agg(count(lit(1)).as("n"),
        min("c_custkey").as("min_key"), max("c_custkey").as("max_key"))
      .orderBy("status")
  }

  val q09Sql: String =
    """SELECT status, COUNT(*) AS n, MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
      |FROM (
      |  SELECT c_custkey, 'has_orders' AS status FROM customer
      |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  UNION ALL
      |  SELECT c_custkey, 'no_orders' AS status FROM customer
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
      |GROUP BY status ORDER BY status""".stripMargin

  /** Single-pass global min/max/count — the reference's MinMaxCountCombineFn
    * (combiners.py:99-115) as one fused agg over events. */
  def q10MinMaxCount(s: SparkSession, d: String): DataFrame =
    events(s, d).agg(
      unix_micros(min(col("ts"))).as("min_ts_us"),
      unix_micros(max(col("ts"))).as("max_ts_us"),
      min(col("user_id")).as("min_user"),
      max(col("user_id")).as("max_user"),
      count(lit(1)).as("n"))

  val q10Sql: String =
    """SELECT CAST(epoch_us(MIN(ts)) AS BIGINT) AS min_ts_us,
      |  CAST(epoch_us(MAX(ts)) AS BIGINT) AS max_ts_us,
      |  MIN(user_id) AS min_user, MAX(user_id) AS max_user, COUNT(*) AS n
      |FROM events""".stripMargin

  /** Event-time tumbling window aggregation (batch twin of the Structured
    * Streaming query in streaming.WindowedEvents; same plan shape). */
  def q11EventWindows(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 1000).cast("long")).as("value_milli"))
      .select(unix_timestamp(col("window.start")).as("wstart"),
        col("event_type"), col("n"), col("value_milli"))
      .orderBy("wstart", "event_type")

  val q11Sql: String =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS wstart, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
      |FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin

  /** Rollup (hierarchical grouping sets). */
  def q12Rollup(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("long").as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  val q12Sql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  COUNT(*) AS n, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** CONCAT semantics (SURVEY §2.8): vertical concatenation along an axis =
    * UNION ALL of disjoint slices, then an agg over the combined axis. */
  def q13ConcatUnion(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val a = o.filter(col("o_orderdate") < lit("1998-01-01"))
    val b = o.filter(col("o_orderdate") >= lit("1998-01-01"))
    a.unionAll(b)
      .groupBy(year(col("o_orderdate")).cast("int").as("order_year"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
      .orderBy("order_year")
  }

  val q13Sql: String =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year, COUNT(*) AS n,
      |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM (SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
      |      UNION ALL
      |      SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01')
      |GROUP BY 1 ORDER BY order_year""".stripMargin

  /** MERGE semantics (SURVEY §2.8): widthwise union of distinct variables
    * over a shared index space — pivot events into per-type columns. */
  def q14MergePivot(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("user_id"), col("click").as("n_click"), col("view").as("n_view"),
        col("purchase").as("n_purchase"), col("signup").as("n_signup"),
        col("error").as("n_error"))
      .orderBy("user_id")

  val q14Sql: String =
    """SELECT user_id,
      |  COALESCE(COUNT(*) FILTER (WHERE event_type = 'click'), 0) AS n_click,
      |  COALESCE(COUNT(*) FILTER (WHERE event_type = 'view'), 0) AS n_view,
      |  COALESCE(COUNT(*) FILTER (WHERE event_type = 'purchase'), 0) AS n_purchase,
      |  COALESCE(COUNT(*) FILTER (WHERE event_type = 'signup'), 0) AS n_signup,
      |  COALESCE(COUNT(*) FILTER (WHERE event_type = 'error'), 0) AS n_error
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q01_agg" -> q01Agg _,
    "q02_filter_project" -> q02FilterProject _,
    "q03_join_agg" -> q03JoinAgg _,
    "q04_star_join" -> q04StarJoin _,
    "q05_topk" -> q05TopK _,
    "q06_window" -> q06Window _,
    "q07_distinct" -> q07Distinct _,
    "q08_setops" -> q08SetOps _,
    "q09_semi_anti" -> q09SemiAnti _,
    "q10_minmaxcount" -> q10MinMaxCount _,
    "q11_event_windows" -> q11EventWindows _,
    "q12_rollup" -> q12Rollup _,
    "q13_concat_union" -> q13ConcatUnion _,
    "q14_merge_pivot" -> q14MergePivot _,
  )

  val oracles: Map[String, String] = Map(
    "q01_agg" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_join_agg" -> q03Sql,
    "q04_star_join" -> q04Sql,
    "q05_topk" -> q05Sql,
    "q06_window" -> q06Sql,
    "q07_distinct" -> q07Sql,
    "q08_setops" -> q08Sql,
    "q09_semi_anti" -> q09Sql,
    "q10_minmaxcount" -> q10Sql,
    "q11_event_windows" -> q11Sql,
    "q12_rollup" -> q12Sql,
    "q13_concat_union" -> q13Sql,
    "q14_merge_pivot" -> q14Sql,
  )
}
