package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY.md §2): each entry is a named
  * DataFrame program over the test tables in `dir`; `oracleSql` holds the
  * DuckDB-equivalent ANSI SQL for the driver's hash compare. Column names and
  * row order are deterministic on both sides (explicit aliases + ORDER BY with
  * unique tie-breaks); double aggregates are rounded because cross-partition
  * summation order is nondeterministic.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"    -> (Relational.pricingSummary _),
    "q02_filter_project"     -> (Relational.filterProject _),
    "q03_enrich_orders"      -> (Relational.enrichOrders _),
    "q04_semi_join_active"   -> (Relational.semiJoinActive _),
    "q05_anti_join_inactive" -> (Relational.antiJoinInactive _),
    "q06_geo_expand"         -> (Relational.geoExpand _),
    "q07_first_order"        -> (Relational.firstOrderPerCustomer _),
    "q08_revenue_by_brand"   -> (Relational.revenueByBrand _),
    "q14_supplier_running"   -> (Relational.supplierRunning _),
    "q15_top_orders"         -> (Relational.topOrders _),
    "q16_segment_setops"     -> (Relational.segmentSetOps _),
    "q17_rollup_pricing"     -> (Relational.rollupPricing _),
    "q18_distinct_counts"    -> (Relational.distinctCounts _),
    "q19_approx_distinct"    -> (Relational.approxDistinct _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for approximate ops (HLL) → driver
    * records a rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity),2) AS sum_qty,
        |  round(sum(l_extendedprice),2) AS sum_base_price,
        |  round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
        |  round(avg(l_quantity),4) AS avg_qty,
        |  round(avg(l_discount),4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  round(l_extendedprice*(1.0-l_discount),2) AS net_price
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_discount < 0.02
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_enrich_orders" ->
      """SELECT o_orderkey, c_name, c_mktsegment, round(o_totalprice,2) AS o_totalprice
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |WHERE c_custkey IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,
    "q04_semi_join_active" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q05_anti_join_inactive" ->
      """SELECT c_custkey, c_name, round(c_acctbal,2) AS c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q06_geo_expand" ->
      """SELECT r_name AS region_name, n_name AS nation_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY region_name, nation_name""".stripMargin,
    "q07_first_order" ->
      """SELECT o_custkey, first_orderkey, first_orderdate FROM (
        |  SELECT o_custkey, o_orderkey AS first_orderkey, o_orderdate AS first_orderdate,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q08_revenue_by_brand" ->
      """SELECT p_brand,
        |  round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue,
        |  count(*) AS n_items,
        |  count(DISTINCT s_suppkey) AS n_suppliers
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q14_supplier_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(row_number() OVER w AS BIGINT) AS rn,
        |  round(sum(l_quantity) OVER w, 2) AS running_qty,
        |  round(lag(l_quantity, 1, 0.0) OVER w, 2) AS prev_qty
        |FROM lineitem
        |WHERE l_suppkey < 50
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q15_top_orders" ->
      """SELECT o_orderkey, round(o_totalprice,2) AS o_totalprice
        |FROM orders
        |ORDER BY round(o_totalprice,2) DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "q16_segment_setops" ->
      """WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |     rich     AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |SELECT 'both' AS tag, c_custkey FROM (SELECT * FROM building INTERSECT SELECT * FROM rich) a
        |UNION ALL
        |SELECT 'building_only' AS tag, c_custkey FROM (SELECT * FROM building EXCEPT SELECT * FROM rich) b
        |ORDER BY tag, c_custkey""".stripMargin,
    "q17_rollup_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity),2) AS sum_qty, count(*) AS n,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "q18_distinct_counts" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
