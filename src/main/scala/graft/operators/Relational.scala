package graft.operators

import graft.Tables
import graft.functions.Fns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational core over the TPC-H-ish testdata — the join / window /
  * grouping surface the reference lacks natively but the engine must
  * generalize to (SURVEY.md §2.5, §2.6, §2.8; reference correlation is
  * filter-based lookups only, Architecture_README.md:674-684).
  *
  * Scale design notes:
  *  - Only bounded-small tables (region: 5 rows, nation: 25) carry an
  *    explicit broadcast() hint. Customer/part/supplier grow linearly
  *    with scale, so those joins are left to Catalyst + AQE: broadcast
  *    at small SF, shuffle-hash/sort-merge on the pre-keyed natural key
  *    at 100 TB. Fact⋈fact (lineitem⋈orders) is always a shuffle join
  *    on the key both sides are already bucketed by in a real layout.
  *  - Filters are applied before joins so pushdown reaches the parquet
  *    scans and join inputs shrink first.
  *  - Top-k uses orderBy+limit → TakeOrderedAndProject (no global sort).
  */
object Relational {

  /** Write orders and lineitem as BUCKETED tables on the join key —
    * the lake layout that removes the fact⋈fact exchange entirely: a
    * co-located sort-merge join reads matching buckets side by side
    * with zero shuffle of either fact (at 100 TB, the difference
    * between a join that moves both corpora and one that moves
    * nothing). `bucketBy` requires the table catalog, so the tables
    * land as external parquet under `path` with deterministic names;
    * always rebuilt by the prepare hook (same policy as the lake
    * indexes — a fresh build can never serve a stale format).
    */
  def prepareBucketed(s: SparkSession, d: String, path: String,
      buckets: Int = 8): Unit = {
    s.sql("DROP TABLE IF EXISTS graft_orders_bucketed")
    s.sql("DROP TABLE IF EXISTS graft_lineitem_bucketed")
    graft.sources.Layout.writeBucketed(
      Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus")),
      "graft_orders_bucketed", "o_orderkey", buckets,
      Some(s"$path/orders_bucketed"))
    graft.sources.Layout.writeBucketed(
      Tables.lineitem(s, d).select(col("l_orderkey"),
        col("l_extendedprice"), col("l_discount")),
      "graft_lineitem_bucketed", "l_orderkey", buckets,
      Some(s"$path/lineitem_bucketed"))
  }

  /** Sequential-pattern funnel over the events stream: users who
    * viewed, then clicked strictly after their first view, then
    * purchased strictly after that first qualifying click — the
    * classic conversion analysis (MATCH_RECOGNIZE's most common use,
    * composed from joins Spark has). Each step is a user-keyed min
    * over a set ("earliest qualifying event"), so the result is
    * deterministic even under timestamp ties. Scale shape: three
    * user-keyed aggregates + two user-keyed joins — every exchange on
    * the same key, so the co-partitioning is reused down the chain;
    * the step summary is three one-row aggregates.
    */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").where(col("ts") > col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").where(col("ts") > col("t2"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    val base = broadcast(v.agg(count(lit(1)).as("base")))
    def step(n: Int, name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("users"))
        .select(lit(n).as("step"), lit(name).as("event_type"),
          col("users"))
    step(1, "view", v).unionByName(step(2, "click", c))
      .unionByName(step(3, "purchase", p))
      .crossJoin(base)
      .select(col("step"), col("event_type"), col("users"),
        r4(col("users").cast("double") / col("base")).as("conv_rate"))
  }

  /** Z-ordered lineitem copy for the 2-D data-skipping serve path
    * ([[graft.sources.Layout.writeZordered]] on the two high-cardinality
    * keys a rectangle workload filters on).
    */
  def prepareZordered(s: SparkSession, d: String, path: String): Unit =
    graft.sources.Layout.writeZordered(Tables.lineitem(s, d), path,
      "l_orderkey", "l_partkey")

  /** Rectangle aggregate over the z-ordered copy: both BETWEEN bounds
    * derive from the raw table's min/max with integer arithmetic (a
    * one-row bounded stats collect, inlined as literals so the parquet
    * scan gets real PushedFilters and row-group stats pruning on BOTH
    * columns — a scalar subquery would defeat the pushdown). The
    * result is layout-independent, so the oracle recomputes it over
    * the raw lineitem table.
    */
  def zorderRectangle(s: SparkSession, path: String, d: String)
      : DataFrame = {
    val st = Tables.lineitem(s, d).agg(
      min(col("l_orderkey")), max(col("l_orderkey")),
      min(col("l_partkey")), max(col("l_partkey"))).head()
    val (loO, hiO, loP, hiP) =
      (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
    val (o1, o2) = (loO + (hiO - loO) / 4, loO + (hiO - loO) / 2)
    val (p1, p2) = (loP + (hiP - loP) / 4, loP + (hiP - loP) / 2)
    s.read.parquet(path)
      .where(col("l_orderkey").between(o1, o2) &&
        col("l_partkey").between(p1, p2))
      .agg(count(lit(1)).as("n_items"),
        r4(sum(col("l_quantity"))).as("sum_qty"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
  }

  /** Co-located fact⋈fact revenue rollup over the bucketed tables:
    * the join itself plans with NO Exchange on either side (asserted
    * in PlansLayoutSpec); the only shuffle left is the final tiny
    * status aggregate.
    */
  def bucketedRevenue(s: SparkSession): DataFrame =
    s.table("graft_orders_bucketed")
      .join(s.table("graft_lineitem_bucketed"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q3-style shipping priority: fact⋈fact shuffle join plus a
    * broadcast dimension, aggregated revenue, deterministic top-10.
    */
  def shippingPriority(s: SparkSession, d: String): DataFrame = {
    val cutoff = lit("1998-06-01").cast("date")
    val cust = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(s, d)
      .filter(to_date(col("o_orderdate")) < cutoff)
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("o_orderdate"))
    val li = Tables.lineitem(s, d)
      .filter(to_date(col("l_shipdate")) > cutoff)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style revenue by geography: a 4-way join where every
    * dimension hop is broadcast — lineitem is the only big input.
    */
  def regionRevenue(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(to_date(col("o_orderdate")) >= lit("1996-01-01").cast("date")
        && to_date(col("o_orderdate")) < lit("1998-01-01").cast("date"))
      .select("o_orderkey", "o_custkey")
    val geo = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(geo, col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q14-style promo share: conditional aggregation over a
    * broadcast part join; ratio of two exact decimal sums.
    */
  def promoShare(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
    val pt = Tables.part(s, d).select("p_partkey", "p_type")
    val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
    li.join(pt, col("l_partkey") === col("p_partkey"))
      .agg(
        dsum(when(col("p_type") === "ECONOMY", disc).otherwise(lit(0.0)))
          .as("promo_revenue"),
        dsum(disc).as("total_revenue"))
      .select(
        r4(col("promo_revenue") / col("total_revenue") * 100)
          .as("promo_pct"),
        col("promo_revenue"), col("total_revenue"))
  }

  /** Left-semi join (EXISTS): orders with at least one returned item. */
  def ordersWithReturns(s: SparkSession, d: String): DataFrame = {
    val returned = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R").select("l_orderkey")
    Tables.orders(s, d)
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_price"))
  }

  /** Left-anti join (NOT EXISTS): customers who never ordered. */
  def customersWithoutOrders(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))

  /** Left-outer join preserving empty groups: per-customer order stats
    * including zero-order customers.
    */
  def customerOrderStats(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select("c_custkey")
      .join(Tables.orders(s, d).select("o_custkey", "o_totalprice"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_totalprice")).as("n_orders"),
        dsum(coalesce(col("o_totalprice"), lit(0.0))).as("total_spent"))

  /** Ranking window: top-3 orders per customer (row_number). */
  def topOrdersPerCustomer(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
  }

  /** Analytic windows: running sum + lag delta per user over event time.
    * Ordered by the raw nanosecond long so ordering (and therefore the
    * sequential fp accumulation) is identical across engines.
    */
  def userRunningTotals(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("value"), col("ts"))
      .withColumn("running_sum",
        sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .select(col("user_id"), col("event_id"),
        r4(col("running_sum")).as("running_sum"),
        r4(col("value") - col("prev_value")).as("delta"))
  }

  /** ROLLUP over (year, status) — the reference's hand-rolled
    * hour→day→month nest expressed as a native grouping-set operator
    * (SURVEY §2.4 note).
    */
  def orderRollup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(year(to_date(col("o_orderdate"))).as("yr"),
        col("o_orderstatus"), col("o_totalprice"))
      .rollup(col("yr"), col("o_orderstatus"))
      .agg(dsum(col("o_totalprice")).as("total_price"),
        count(lit(1)).as("n_orders"))

  /** CUBE over the lineitem flag pair. */
  def lineitemCube(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        r4(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("n_items"))

  /** Exact distinct counts per group (count-distinct expands to a
    * two-phase aggregate — partial per partition, no row explosion).
    */
  def distinctCounts(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_items"))

  /** Approximate distinct (HyperLogLog++) — the 100 TB-scale variant of
    * distinctCounts; constant memory per group. No SQL oracle (sketch
    * values are engine-specific); driver records a rows-only check.
    */
  def approxDistinctCounts(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("n_parts"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("n_orders"))

  /** Oracle-checkable companion to [[approxDistinctCounts]]: exact
    * distinct counts plus booleans asserting the HLL sketch landed
    * within 5% of them (rsd = 0.01; measured max rel err 0.0065 in the
    * accuracy ledger — 5% is noise-proof margin, not slack in the
    * claim). DuckDB recomputes the exact counts and asserts TRUE, so a
    * sketch drifting out of tolerance fails CORRECTNESS, not just the
    * ledger.
    */
  def approxDistinctTolerance(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    // exact and approx run as SEPARATE aggregations joined on the tiny
    // group key: fusing them puts the rsd-0.01 HLL buffers (~100 KB
    // each) inside the multi-distinct Expand plan, where partial HLLs
    // ride the distinct-KEY shuffle — measured 6.3 MB shuffled at
    // sf0.01 vs ~0.1 MB split. Split, the exact side shuffles only the
    // distinct keys (the canonical exact-distinct plan) and the approx
    // side ships one sketch per group per partition.
    val exact = li.groupBy(col("l_returnflag")).agg(
      countDistinct(col("l_partkey")).as("n_parts_exact"),
      countDistinct(col("l_orderkey")).as("n_orders_exact"))
    val approx = li.groupBy(col("l_returnflag")).agg(
      approx_count_distinct(col("l_partkey"), 0.01).as("ap"),
      approx_count_distinct(col("l_orderkey"), 0.01).as("ao"))
    exact.join(broadcast(approx), Seq("l_returnflag"))
      .select(col("l_returnflag"),
        col("n_parts_exact"), col("n_orders_exact"),
        (abs(col("ap") - col("n_parts_exact"))
          <= col("n_parts_exact") * 0.05).as("parts_ok"),
        (abs(col("ao") - col("n_orders_exact"))
          <= col("n_orders_exact") * 0.05).as("orders_ok"))
  }

  /** The driver-gate form of [[approxDistinctCounts]]: same exact-vs-
    * sketch tolerance contract as [[approxDistinctTolerance]] but over
    * the OTHER tiny group key (`l_linestatus`), so the registry keeps
    * one raw-HLL demonstration per key without duplicating rows. Raw
    * HLL estimates are engine-specific (no DuckDB recompute), so the
    * oracle-checkable surface is exact counts + in-tolerance booleans.
    */
  def approxDistinctByStatus(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    // split exact/approx aggregations for the same shuffle-size reason
    // documented on approxDistinctTolerance
    val exact = li.groupBy(col("l_linestatus")).agg(
      countDistinct(col("l_partkey")).as("n_parts_exact"),
      countDistinct(col("l_suppkey")).as("n_supps_exact"))
    val approx = li.groupBy(col("l_linestatus")).agg(
      approx_count_distinct(col("l_partkey"), 0.01).as("ap"),
      approx_count_distinct(col("l_suppkey"), 0.01).as("as_"))
    exact.join(broadcast(approx), Seq("l_linestatus"))
      .select(col("l_linestatus"),
        col("n_parts_exact"), col("n_supps_exact"),
        (abs(col("ap") - col("n_parts_exact"))
          <= col("n_parts_exact") * 0.05).as("parts_ok"),
        (abs(col("as_") - col("n_supps_exact"))
          <= col("n_supps_exact") * 0.05).as("supps_ok"))
  }

  private def custkeysByStatus(s: SparkSession, d: String, st: String) =
    Tables.orders(s, d).filter(col("o_orderstatus") === st)
      .select(col("o_custkey")).distinct()

  /** INTERSECT: customers with both fulfilled and open orders. */
  def customersIntersect(s: SparkSession, d: String): DataFrame =
    custkeysByStatus(s, d, "F").intersect(custkeysByStatus(s, d, "O"))

  /** EXCEPT: customers with fulfilled but no open orders. */
  def customersExcept(s: SparkSession, d: String): DataFrame =
    custkeysByStatus(s, d, "F").except(custkeysByStatus(s, d, "O"))

  /** UNION (distinct): customers with either order status. */
  def customersUnion(s: SparkSession, d: String): DataFrame =
    custkeysByStatus(s, d, "F").union(custkeysByStatus(s, d, "O"))
      .distinct()

  /** Membership predicate (SURVEY §2.2 P7): IN-list filter. */
  def returnedOrAvailable(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_returnflag").isin("A", "R"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"))

  /** Legacy daily-aggregate parser semantics (SURVEY §2.2 P10 + F12):
    * midpoint of max/min with null fallback.
    */
  def dailyMidpoint(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(to_date(col("ts_event")).as("date"))
      .agg(max(col("value")).as("mx"), min(col("value")).as("mn"))
      .select(col("date"), r4(midpoint(col("mx"), col("mn"))).as("est_avg"))

  /** Synthetic-key generation (F8–F10): split-tail + concat keys. */
  def synthKeys(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      element_at(split(col("o_orderpriority"), "-"), -1)
        .as("priority_name"),
      concat_ws("_", col("o_custkey"),
        unix_timestamp(col("o_orderdate")).cast("long")).as("synth_key"))

  /** Batch sessionization (gaps-and-islands): a new session starts when
    * the gap to the previous event exceeds 30 minutes. Computed on the
    * raw nanosecond longs — exact integer arithmetic, so session
    * boundaries are bit-identical across engines (the streaming twin
    * uses session_window; this is the batch/oracle-checkable form).
    */
  def sessionize(s: SparkSession, d: String,
      gapMinutes: Int = 30): DataFrame = {
    val gapNs = gapMinutes * 60L * 1000000000L
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("new_session",
        when(col("ts") - lag(col("ts"), 1).over(w) > gapNs, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("new_session"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event_id"),
        r4(sum(col("value"))).as("session_value"))
  }

  /** JSON field extraction (F13) and re-serialization over event props. */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("value"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), r4(avg(col("value"))).as("avg_value"))

  /** Fact⋈dim revenue rollup with an explicit Bloom semi-join
    * reduction ([[graft.functions.Bloom]]): the filtered orders side
    * is sketched into a ~7 bits/key bit-set, and lineitem rows whose
    * order key cannot match are dropped at the SCAN side of the plan —
    * before the fact table's shuffle, which is where a 100 TB join
    * spends its time. False positives just ride into the exact join,
    * so the result is identical to the plain join the oracle runs;
    * SHUFFLE.md records the measured probe-side exchange reduction.
    */
  /** Market-basket co-occurrence: part pairs appearing together in at
    * least `minSupport` orders — the self-join family (recommendation
    * mining) the suite otherwise lacks. The basket is deduped first
    * and both sides shuffle on the SAME order key, so the pair
    * explosion happens join-local; output pairs are canonical
    * (p1 < p2). Per-basket pair count is quadratic in basket size —
    * TPC-H baskets are ≤7 distinct parts so no cap is needed here; at
    * 100 TB a retail basket tail wants a per-basket top-N slice
    * before the self-join (the standard guard), which composes as one
    * extra windowed filter on the deduped items.
    */
  def coPurchase(s: SparkSession, d: String,
      minSupport: Long = 3): DataFrame = {
    // One basket-keyed exchange feeds BOTH the dedup and the self-join
    // (r18, guide §2.4 — two operations keyed the same way share one
    // exchange): hash-partitioning on l_orderkey alone satisfies the
    // distinct's (l_orderkey, l_partkey) clustering (equal pairs
    // co-locate), so the dedup runs as a single post-exchange
    // aggregate and the self-join's two identical sides arrive
    // already co-partitioned on the join key. The un-keyed form
    // planned the (ok, pk)-keyed distinct TWICE — two separate
    // corpus-sized exchanges on a key the join then could not use.
    // (At small SFs the planner may still broadcast one side — fine;
    // the keyed layout is what removes the second distinct pass.)
    // Measured at sf0.1: 1.61 -> 1.1-1.2 s steady-state, same rows.
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"))
      .repartition(col("l_orderkey"))
      .distinct()
    items.as("a")
      .join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= minSupport)
  }

  def bloomPrunedJoin(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderstatus") === "F" &&
        year(col("o_orderdate")) === 1996)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val bf = graft.functions.Bloom.build(ord, col("o_orderkey"),
      expectedItems = 1000000L)
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .filter(graft.functions.Bloom.mightContain(bf, col("l_orderkey")))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
  }
}
