package graft.operators

import graft.Tables
import graft.functions.Fns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adapted TPC-H query shapes over the driver star schema (no partsupp /
  * commitdate / shipmode columns exist, so Q2/Q4/Q12 have no faithful
  * analog; these cover the remaining structural families: nation-pair
  * flows, market share, returned-revenue ranking, OR-of-ANDs predicate
  * pushdown, grouped NOT-IN, and HAVING-subquery membership).
  *
  * All joins follow the scale policy: only `nation` (25 rows) is hinted
  * broadcast; everything else is left to Catalyst + AQE.
  */
object TpcH {

  private def lineSupplierNation(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.supplier(s, d),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d))
        .select(col("n_nationkey").as("s_nkey"),
          col("n_name").as("supp_nation")),
        col("s_nationkey") === col("s_nkey"))

  /** Q7-style volume shipping: revenue between (supplier nation,
    * customer nation) pairs per year.
    */
  def nationPairTrade(s: SparkSession, d: String): DataFrame = {
    val custNation = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d))
        .select(col("n_nationkey").as("c_nkey"),
          col("n_name").as("cust_nation")),
        col("c_nationkey") === col("c_nkey"))
      .select(col("o_orderkey"), col("cust_nation"))
    lineSupplierNation(s, d)
      .select(col("l_orderkey"), col("supp_nation"),
        col("l_shipdate"), col("l_extendedprice"), col("l_discount"))
      .join(custNation, col("l_orderkey") === col("o_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(to_date(col("l_shipdate"))).as("yr"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("volume"),
        count(lit(1)).as("n_items"))
  }

  /** Q8-style market share: one nation's share of total revenue by
    * order year — ratio of two conditional decimal sums.
    */
  def marketShare(s: SparkSession, d: String,
      nation: String = "NATION_1"): DataFrame = {
    val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
    lineSupplierNation(s, d)
      .select(col("l_orderkey"), col("supp_nation"), disc.as("volume"))
      .join(Tables.orders(s, d).select(col("o_orderkey"),
        year(to_date(col("o_orderdate"))).as("yr")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("yr"))
      .agg(
        dsum(when(col("supp_nation") === nation, col("volume"))
          .otherwise(lit(0.0))).as("nation_volume"),
        dsum(col("volume")).as("total_volume"))
      .select(col("yr"),
        r4(col("nation_volume") / col("total_volume")).as("mkt_share"),
        col("nation_volume"), col("total_volume"))
  }

  /** Q10-style returned-item revenue: top-20 customers by revenue lost
    * to returns.
    */
  def returnedRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("n_returned_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** Q19-style OR-of-ANDs predicate: disjunctive brand/size/quantity
    * bands — the predicate-pushdown stress shape.
    */
  def bandedRevenue(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val pt = Tables.part(s, d)
    li.join(pt, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 40)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 60)))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Q16-style supplier counts with a grouped NOT-IN subquery:
    * distinct suppliers per (brand, type) excluding suppliers that ever
    * shipped a returned item.
    */
  def supplierCounts(s: SparkSession, d: String): DataFrame = {
    val badSuppliers = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .select(col("l_suppkey")).distinct()
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .join(badSuppliers.withColumnRenamed("l_suppkey", "bad_key"),
        col("l_suppkey") === col("bad_key"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** Q21-style waiting suppliers: late lineitems (shipped >60 days after
    * the order date) on finalized multi-supplier orders where this
    * supplier was the ONLY late one — the correlated EXISTS/NOT-EXISTS
    * family, expressed as equi-keyed semi/anti self-joins with a
    * residual supplier-inequality condition (each is a single shuffle on
    * l_orderkey; no correlated re-execution per row).
    */
  def waitingSuppliers(s: SparkSession, d: String,
      lateDays: Int = 60): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val late = li
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("l_shipdate"), col("o_orderdate")) > lateDays)
      .select(col("l_orderkey"), col("l_suppkey"))
    // EXISTS: another supplier contributed to the same order
    val hasOther = late.join(
      li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2")),
      col("l_orderkey") === col("k2") && col("l_suppkey") =!= col("s2"),
      "left_semi")
    // NOT EXISTS: no OTHER supplier was also late on that order
    val soleLate = hasOther.join(
      late.select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3")),
      col("l_orderkey") === col("k3") && col("l_suppkey") =!= col("s3"),
      "left_anti")
    soleLate
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
  }

  /** Q22-style dormant accounts via the SQL front-end: customers with an
    * above-average balance (scalar subquery) and no in-progress orders
    * (correlated NOT EXISTS — Catalyst rewrites it to one anti join, not
    * a per-row probe), counted per nation.
    */
  def dormantRichCustomers(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_q22")
    Tables.orders(s, d).createOrReplaceTempView("orders_q22")
    s.sql(
      """SELECT c_nationkey, count(*) AS numcust,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
        |   AS totacctbal
        |FROM customer_q22 c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_q22
        |                   WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders_q22 o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'P')
        |GROUP BY c_nationkey""".stripMargin)
  }

  /** Q18-style large orders: orders whose total quantity exceeds a
    * threshold (HAVING-subquery membership via semi join on the
    * aggregated key set).
    */
  def largeOrders(s: SparkSession, d: String, minQty: Double = 150)
      : DataFrame = {
    val bigKeys = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > minQty)
      .select(col("l_orderkey").as("big_key"), col("total_qty"))
    Tables.orders(s, d)
      .join(bigKeys, col("o_orderkey") === col("big_key"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("o_orderdate"),
        col("o_totalprice"), r4(col("total_qty")).as("total_qty"))
  }
}
