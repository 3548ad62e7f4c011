package graft.registry

import graft.operators.TpcH
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-contract registry for the adapted TPC-H suite. */
object TpcHQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q7_nation_trade" -> (TpcH.nationPairTrade _),
    "q8_market_share" -> ((s: SparkSession, d: String) =>
      TpcH.marketShare(s, d)),
    "q10_returned" -> (TpcH.returnedRevenue _),
    "q19_banded" -> (TpcH.bandedRevenue _),
    "q16_supplier_cnt" -> (TpcH.supplierCounts _),
    "q18_large_orders" -> ((s: SparkSession, d: String) =>
      TpcH.largeOrders(s, d)),
    "q21_waiting_supplier" -> ((s: SparkSession, d: String) =>
      TpcH.waitingSuppliers(s, d)),
    "q22_dormant_rich" -> (TpcH.dormantRichCustomers _),
    "q2_min_cost" -> ((s: SparkSession, d: String) =>
      TpcH.minCostSupplier(s, d)),
    "q4_priority" -> ((s: SparkSession, d: String) =>
      TpcH.priorityOrderCheck(s, d)),
    "q6_forecast" -> (TpcH.forecastRevenue _),
    "q9_profit" -> ((s: SparkSession, d: String) =>
      TpcH.productTypeProfit(s, d)),
    "q11_concentration" -> ((s: SparkSession, d: String) =>
      TpcH.supplierValueConcentration(s, d)),
    "q12_priority_class" -> ((s: SparkSession, d: String) =>
      TpcH.shipmentPriorityClasses(s, d)),
    "q13_order_dist" -> (TpcH.customerOrderDistribution _),
    "q15_top_supplier" -> (TpcH.topSupplier _),
    "q17_small_qty" -> ((s: SparkSession, d: String) =>
      TpcH.smallQuantityRevenue(s, d)),
    "q20_excess_share" -> ((s: SparkSession, d: String) =>
      TpcH.excessShareSuppliers(s, d))
  )

  private def ds(e: String) =
    s"CAST(sum(CAST($e AS DECIMAL(18,6))) AS DOUBLE)"

  val oracle: Map[String, String] = Map(
    "q7_nation_trade" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         | CAST(year(l_shipdate) AS INT) AS yr,
         | ${ds("l_extendedprice * (1 - l_discount)")} AS volume,
         | count(*) AS n_items
         |FROM lineitem
         | JOIN supplier ON l_suppkey = s_suppkey
         | JOIN nation n1 ON s_nationkey = n1.n_nationkey
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         | JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE n1.n_name <> n2.n_name
         |GROUP BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      s"""SELECT yr, round(nation_volume / total_volume, 4) AS mkt_share,
         | nation_volume, total_volume
         |FROM (
         |  SELECT CAST(year(o_orderdate) AS INT) AS yr,
         |   ${ds("CASE WHEN n_name = 'NATION_1' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
         |     AS nation_volume,
         |   ${ds("l_extendedprice * (1 - l_discount)")} AS total_volume
         |  FROM lineitem
         |   JOIN supplier ON l_suppkey = s_suppkey
         |   JOIN nation ON s_nationkey = n_nationkey
         |   JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1)""".stripMargin,
    "q10_returned" ->
      s"""SELECT c_custkey, c_name, c_nationkey,
         | ${ds("l_extendedprice * (1 - l_discount)")} AS revenue,
         | count(*) AS n_returned_items
         |FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         |WHERE l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, c_nationkey
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q19_banded" ->
      s"""SELECT
         | ${ds("l_extendedprice * (1 - l_discount)")} AS revenue,
         | count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 1 AND 20)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
         |       AND l_quantity BETWEEN 10 AND 40)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
         |       AND l_quantity BETWEEN 20 AND 60)""".stripMargin,
    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type,
        | count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_suppkey NOT IN (
        |  SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R')
        |GROUP BY p_brand, p_type""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_name, o_orderkey, CAST(o_orderdate AS DATE)
        |   AS o_orderdate, o_totalprice,
        | round(total_qty, 4) AS total_qty
        |FROM orders
        | JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
        |       FROM lineitem GROUP BY l_orderkey
        |       HAVING sum(l_quantity) > 150) big
        |   ON o_orderkey = big.l_orderkey
        | JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q21_waiting_supplier" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND datediff('day', o_orderdate, l1.l_shipdate) > 60
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |              WHERE l3.l_orderkey = l1.l_orderkey
        |                AND l3.l_suppkey <> l1.l_suppkey
        |                AND datediff('day', o_orderdate, l3.l_shipdate)
        |                    > 60)
        |GROUP BY s_name""".stripMargin,
    "q22_dormant_rich" ->
      """SELECT c_nationkey, count(*) AS numcust,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
        |   AS totacctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |                   WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'P')
        |GROUP BY c_nationkey""".stripMargin,
    "q2_min_cost" ->
      """WITH offers AS (
        |  SELECT l_partkey, l_suppkey, s_name,
        |   min(l_extendedprice / l_quantity) AS unit_price
        |  FROM lineitem
        |   JOIN supplier ON l_suppkey = s_suppkey
        |   JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_regionkey = 3
        |  GROUP BY 1, 2, 3)
        |SELECT p_partkey, p_brand, s_name,
        | round(unit_price, 4) AS unit_price
        |FROM offers o JOIN part ON p_partkey = o.l_partkey
        |WHERE p_size <= 5
        |  AND unit_price = (SELECT min(o2.unit_price) FROM offers o2
        |                    WHERE o2.l_partkey = o.l_partkey)"""
        .stripMargin,
    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND datediff('day', o_orderdate, l_shipdate)
        |                    > 30)
        |GROUP BY o_orderpriority""".stripMargin,
    "q6_forecast" ->
      s"""SELECT ${ds("l_extendedprice * l_discount")} AS revenue,
         | count(*) AS n_items
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount BETWEEN CAST(0.05 AS DOUBLE)
         |                     AND CAST(0.07 AS DOUBLE)
         |  AND l_quantity < 24""".stripMargin,
    "q9_profit" ->
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS yr,
         | ${ds("l_extendedprice * (1 - l_discount) - " +
               "CAST(0.6 AS DOUBLE) * p_retailprice * l_quantity")}
         |   AS profit
         |FROM lineitem
         | JOIN part ON l_partkey = p_partkey
         | JOIN supplier ON l_suppkey = s_suppkey
         | JOIN nation ON s_nationkey = n_nationkey
         | JOIN orders ON l_orderkey = o_orderkey
         |WHERE p_name LIKE '%red%'
         |GROUP BY 1, 2""".stripMargin,
    "q11_concentration" ->
      s"""SELECT l_suppkey,
         | ${ds("l_extendedprice * (1 - l_discount)")} AS value
         |FROM lineitem
         |GROUP BY l_suppkey
         |HAVING ${ds("l_extendedprice * (1 - l_discount)")} >
         |  (SELECT ${ds("l_extendedprice * (1 - l_discount)")} *
         |    CAST(0.001 AS DOUBLE) FROM lineitem)""".stripMargin,
    "q12_priority_class" ->
      """SELECT
        | CASE WHEN datediff('day', o_orderdate, l_shipdate) > 60
        |      THEN 'late' ELSE 'ontime' END AS ship_class,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |          THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |          THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1""".stripMargin,
    "q13_order_dist" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |      GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH revenue AS (
         |  SELECT l_suppkey,
         |   ${ds("l_extendedprice * (1 - l_discount)")} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-07-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)"""
        .stripMargin,
    "q17_small_qty" ->
      s"""SELECT
         | round(${ds("l_extendedprice")} / 7.0, 4) AS avg_yearly,
         | count(*) AS n_lines
         |FROM lineitem
         | JOIN part ON l_partkey = p_partkey
         | JOIN (SELECT l_partkey AS pk, sum(l_quantity) AS sum_qty,
         |              count(*) AS cnt
         |       FROM lineitem GROUP BY l_partkey) per_part
         |   ON l_partkey = pk
         |WHERE p_brand = 'Brand#1' AND p_size < 10
         |  AND l_quantity * cnt * 5 < sum_qty""".stripMargin,
    "q20_excess_share" ->
      """WITH li AS (
        |  SELECT l_partkey, l_suppkey, l_quantity
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'small%'),
        | per_part AS (SELECT l_partkey AS pk, sum(l_quantity)
        |   AS part_qty FROM li GROUP BY 1),
        | per_supp AS (SELECT l_partkey, l_suppkey, sum(l_quantity)
        |   AS sup_qty FROM li GROUP BY 1, 2)
        |SELECT s_suppkey, s_name, s_nationkey
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM per_supp JOIN per_part ON l_partkey = pk
        |  WHERE sup_qty * 8 > part_qty)""".stripMargin
  )
}
