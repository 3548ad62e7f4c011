package graft.operators

import graft.Tables
import graft.functions.Fns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adapted TPC-H query shapes over the driver star schema. The schema
  * has no partsupp table and no commitdate/receiptdate/shipmode
  * columns, so Q2/Q4/Q12/Q20 run as structural ANALOGS (same query
  * family — correlated min, EXISTS-late, conditional class counts,
  * nested aggregate membership — re-keyed to the columns that exist);
  * everything else follows the original shape. With r3 the full
  * 22-query structural inventory is covered: 1,3,5,6,9,10,14,17,18 as
  * direct shapes, 2,4,7,8,11,12,13,15,16,19,20,21,22 as analogs.
  *
  * All joins follow the scale policy: only `nation` (25 rows) is hinted
  * broadcast; everything else is left to Catalyst + AQE. Money sums are
  * exact DECIMAL(18,6) (`dsum`); quantity sums stay double because the
  * generator emits integer quantities (exact in double at any
  * aggregation order — cross-engine safe without the decimal cost).
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
    * family.
    *
    * Expressed as per-order AGGREGATES rather than semi/anti self-joins
    * (the r1–r8 shape): a late row qualifies iff its order has ≥2
    * distinct suppliers overall (the EXISTS) and exactly 1 distinct
    * LATE supplier (the NOT EXISTS — with one late supplier, it is
    * necessarily this row's). The rewrite computes the fact-fact
    * `late` join ONCE by construction — the self-join form fed `late`
    * into both the semi probe and the anti build, and the r8 plan
    * showed Catalyst re-running lineitem⋈orders for the anti side
    * (ReuseExchange cannot fire across its own probe-side rewrite);
    * `localCheckpoint` fixed the double-compute but measured SLOWER at
    * sf0.1 (1.17 s vs 0.91 s — materialization overhead exceeds the
    * saved join at this scale, and the barrier blinds AQE). Here every
    * consumer of `late` is an aggregation on l_orderkey, so the plan
    * has one lineitem⋈orders execution, narrow groupBys whose partial
    * (map-side) aggregation shuffles REDUCED rows, and a key-only semi
    * join — structurally single-pass at any scale, no barrier.
    *
    * Measured trade at sf0.1 (steady-state, local[32]): self-join form
    * 0.91 s — every build side fits in a broadcast at this SF, zero
    * lineitem shuffles, so it wins LOCALLY despite computing
    * lineitem⋈orders twice; checkpoint variant 1.17 s; this form
    * 1.4 s (the shuffles are real at any SF). The +0.5 s is the local
    * price of the shape that survives 1000×: at cluster scale the
    * self-join form's broadcasts become three fact-fact sort-merge
    * joins shuffling lineitem ~4×, while this form shuffles lineitem
    * once and then only order-keyed aggregates. Scale wins over a
    * half-second local delta on a 44 s suite.
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
    // per order: how many distinct suppliers were late, with what row
    // multiplicity (the output counts late ROWS, not suppliers); when
    // exactly one supplier is late, min() IS that supplier. Two-level
    // aggregation — (order, supp) then order — instead of
    // countDistinct, whose Expand-based plan doubles the aggregated
    // rows when mixed with plain aggregates.
    val lateAgg = late.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(count(lit(1)).as("n_rows"))
      .groupBy(col("l_orderkey")).agg(
        count(lit(1)).as("n_late_supps"),
        sum(col("n_rows")).as("n_late_rows"),
        min(col("l_suppkey")).as("late_supp"))
    // EXISTS other-supplier: orders with ≥2 distinct suppliers overall
    val multiSupp = li.select(col("l_orderkey"), col("l_suppkey"))
      .distinct()
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_supps"))
      .filter(col("n_supps") >= 2)
      .select(col("l_orderkey"))
    lateAgg.filter(col("n_late_supps") === 1)
      .join(multiSupp, Seq("l_orderkey"), "left_semi")
      .join(Tables.supplier(s, d), col("late_supp") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("n_late_rows")).as("numwait"))
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

  private def ts(date: String) = lit(date).cast("timestamp")

  /** Q2-style minimum-cost supplier (analog: no partsupp, so the "cost"
    * is the minimum observed unit price l_extendedprice/l_quantity a
    * supplier charged for the part): for small parts, every EUROPE
    * supplier matching the per-part regional minimum. The correlated-min
    * family as one aggregate + an equi-join back on (part, min) — no
    * per-row subquery execution. Unit prices divide two doubles (exact
    * IEEE, both engines identical), so the min-equality is hash-safe.
    */
  def minCostSupplier(s: SparkSession, d: String,
      regionKey: Int = 3, maxSize: Int = 5): DataFrame = {
    val regionSupp = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_regionkey") === regionKey)
      .select(col("s_suppkey"), col("s_name"))
    // Per-part minima are only ever consumed for the size-filtered
    // parts, and each part's minimum depends only on that part's own
    // lineitems — so prune lineitem with a broadcast semi join BEFORE
    // both aggregates (same move as smallQuantityRevenue below): the
    // offers aggregate and its exchange shrink by ~the size filter's
    // selectivity, result rows and hash unchanged.
    val smallParts = Tables.part(s, d).filter(col("p_size") <= maxSize)
    val offers = Tables.lineitem(s, d)
      .join(broadcast(smallParts.select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(regionSupp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"), col("s_name"))
      .agg(min(col("l_extendedprice") / col("l_quantity"))
        .as("unit_price"))
    val minPerPart = offers.groupBy(col("l_partkey"))
      .agg(min(col("unit_price")).as("min_price"))
    offers.join(minPerPart, Seq("l_partkey"))
      .filter(col("unit_price") === col("min_price"))
      .join(smallParts, col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_brand"), col("s_name"),
        r4(col("unit_price")).as("unit_price"))
  }

  /** Q4-style priority check (analog: lateness = shipped >30 days after
    * the order date, standing in for commitdate<receiptdate): orders in
    * a quarter-year window with at least one late line, counted by
    * priority. The EXISTS is one semi join on l_orderkey.
    */
  def priorityOrderCheck(s: SparkSession, d: String,
      lateDays: Int = 30): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= ts("1996-01-01") &&
        col("o_orderdate") < ts("1996-04-01"))
      .join(Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_shipdate")),
        col("l_orderkey") === col("o_orderkey") &&
          datediff(col("l_shipdate"), col("o_orderdate")) > lateDays,
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))

  /** Q6 forecasting revenue change: the classic pushdown-only query —
    * every predicate reaches the parquet scan, no join, one partial
    * aggregate.
    */
  def forecastRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"))
        .as("revenue"),
        count(lit(1)).as("n_items"))

  /** Q9-style product-type profit (analog: cost proxy is
    * 0.6·p_retailprice·l_quantity in place of ps_supplycost): profit by
    * (supplier nation, order year) over parts whose name contains the
    * pattern. LIKE-filtered dimension join + two fact joins + exact
    * decimal profit sums.
    */
  def productTypeProfit(s: SparkSession, d: String,
      namePart: String = "red"): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_name").contains(namePart))
        .select(col("p_partkey"), col("p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"),
        year(to_date(col("o_orderdate"))).as("yr")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), col("yr"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) -
        lit(0.6) * col("p_retailprice") * col("l_quantity"))
        .as("profit"))

  /** Q11-style value concentration (analog: revenue per supplier in
    * place of partsupp stock value): suppliers holding more than a
    * fixed fraction of GLOBAL revenue — a grouped aggregate filtered
    * against a broadcast 1-row scalar aggregate, both sides exact
    * decimal so the threshold comparison is engine-independent.
    */
  def supplierValueConcentration(s: SparkSession, d: String,
      fraction: Double = 0.001): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val bySupp = Tables.lineitem(s, d)
      .groupBy(col("l_suppkey"))
      .agg(dsum(rev).as("value"))
    val total = Tables.lineitem(s, d).agg(dsum(rev).as("total_rev"))
    bySupp.join(broadcast(total))
      .filter(col("value") > col("total_rev") * fraction)
      .select(col("l_suppkey"), col("value"))
  }

  /** Q12-style shipping classes (analog: late/ontime lateness buckets in
    * place of shipmodes): per bucket, how many lines belong to
    * high-priority vs low-priority orders — the conditional case-sum
    * aggregation family.
    */
  def shipmentPriorityClasses(s: SparkSession, d: String,
      lateDays: Int = 60): DataFrame = {
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_shipdate"))
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1998-01-01"))
      .join(Tables.orders(s, d).select(col("o_orderkey"),
        col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("ship_class",
        when(datediff(col("l_shipdate"), col("o_orderdate")) > lateDays,
          "late").otherwise("ontime"))
      .groupBy(col("ship_class"))
      .agg(
        sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** Q13 customer order-count distribution: left join so zero-order
    * customers keep their 0 bucket, count per customer, then the
    * histogram of those counts.
    */
  def customerOrderDistribution(s: SparkSession, d: String): DataFrame = {
    val perCustomer = Tables.customer(s, d)
      .select(col("c_custkey"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderpriority") =!= "5-LOW")
          .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCustomer.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** Q15 top supplier: revenue per supplier over a window, keep the
    * supplier(s) whose revenue EQUALS the maximum (max as a broadcast
    * 1-row aggregate; decimal-exact sums make the equality hash-safe).
    */
  def topSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1996-07-01"))
      .groupBy(col("l_suppkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("max_rev"))
    Tables.supplier(s, d)
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(maxRev))
      .filter(col("total_revenue") === col("max_rev"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  /** Q17 small-quantity-order revenue: lines whose quantity is below
    * 20% of their part's average quantity, for one brand's small parts.
    * The correlated avg becomes a per-part aggregate joined back; the
    * threshold compares integer-valued quantities via
    * `5·qty·cnt < sum_qty` — all terms exact in double, so no
    * cross-engine epsilon.
    */
  def smallQuantityRevenue(s: SparkSession, d: String,
      brand: String = "Brand#1", maxSize: Int = 10): DataFrame = {
    // The correlated per-part average is only ever consumed for the
    // brand/size-filtered parts, so prune lineitem with a broadcast semi
    // join BEFORE the aggregate: both the per-part aggregate and its
    // exchange see ~the brand's share of the fact table instead of all
    // of it. (Part keys are unique, so semi-join + reuse ≡ the inner
    // filter join — same rows, same hash.)
    val parts = Tables.part(s, d)
      .filter(col("p_brand") === brand && col("p_size") < maxSize)
      .select(col("p_partkey"))
    val relevant = Tables.lineitem(s, d)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"),
        "left_semi")
    val perPart = relevant
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("cnt"))
    relevant
      .join(perPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") * col("cnt") * 5 < col("sum_qty"))
      .agg(r4(dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  /** Q20-style excess suppliers (analog: "holds excess stock" becomes
    * "shipped an outsized share of a part's volume"): suppliers who
    * moved more than 1/`shareDenom` of some small-part's total shipped
    * quantity — nested aggregate membership as two aggregates + a semi
    * join. Quantity sums are integer-exact doubles;
    * `shareDenom·sup_qty > part_qty` keeps the comparison integer-exact
    * (no fractional multiplier). Default denominator 8 (>12.5% share):
    * parts spread across ~50 suppliers in the testdata, so a majority
    * threshold would be vacuously empty.
    */
  def excessShareSuppliers(s: SparkSession, d: String,
      namePrefix: String = "small", shareDenom: Int = 8): DataFrame = {
    val liPart = Tables.lineitem(s, d)
      .join(Tables.part(s, d)
          .filter(col("p_name").startsWith(namePrefix))
          .select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val bySuppPart = liPart
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("sup_qty"))
    val byPart = liPart
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity")).as("part_qty"))
    val excess = bySuppPart
      .join(byPart, col("l_partkey") === col("pk"))
      .filter(col("sup_qty") * shareDenom > col("part_qty"))
      .select(col("l_suppkey")).distinct()
    Tables.supplier(s, d)
      .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
  }
}
