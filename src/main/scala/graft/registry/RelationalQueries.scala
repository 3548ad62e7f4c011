package graft.registry

import graft.operators.{Cdc, Entity, Graph, Relational, Timeseries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Driver-contract registry for the relational operator family.
  * Column names in the Spark results and the DuckDB oracle SQL must
  * match exactly (the driver sorts columns by name before hashing).
  */
object RelationalQueries {

  /** Root of the graph-lake edge lists [[Graph.prepareEdges]] writes. */
  private def edgesRoot(d: String): String =
    s"${TextQueries.indexRoot(d)}/edges"

  /** The persisted ≥2-support co-purchase edges; stricter `minSupport`
    * filters push down to the parquet scan.
    */
  private def coEdges(s: SparkSession, d: String, minSupport: Long)
      : DataFrame =
    s.read.parquet(s"${edgesRoot(d)}/copurchase")
      .filter(col("n_orders") >= minSupport)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q3_shipping" -> (Relational.shippingPriority _),
    "q5_region" -> (Relational.regionRevenue _),
    "q14_promo" -> (Relational.promoShare _),
    "q_semi_join" -> (Relational.ordersWithReturns _),
    "q_anti_join" -> (Relational.customersWithoutOrders _),
    "q_outer_join" -> (Relational.customerOrderStats _),
    "q_window_rank" -> (Relational.topOrdersPerCustomer _),
    "q_window_running" -> (Relational.userRunningTotals _),
    "q_rollup" -> (Relational.orderRollup _),
    "q_cube" -> (Relational.lineitemCube _),
    "q_distinct" -> (Relational.distinctCounts _),
    // raw HLL estimates are engine-specific, so the registered row is
    // the tolerance form (exact counts + in-bound booleans) — grouped
    // by l_linestatus; the _tol twin covers l_returnflag
    "q_approx_distinct" -> (Relational.approxDistinctByStatus _),
    "q_approx_distinct_tol" -> (Relational.approxDistinctTolerance _),
    "q_intersect" -> (Relational.customersIntersect _),
    "q_except" -> (Relational.customersExcept _),
    "q_union" -> (Relational.customersUnion _),
    "q_membership" -> (Relational.returnedOrAvailable _),
    "q_midpoint" -> (Relational.dailyMidpoint _),
    "q_synth_keys" -> (Relational.synthKeys _),
    "q_json_extract" -> (Relational.jsonExtract _),
    "q_sessionize" -> ((s: SparkSession, d: String) =>
      Relational.sessionize(s, d)),
    // view → click → purchase conversion funnel: each step the
    // earliest strictly-later qualifying event per user — set-mins,
    // so deterministic under timestamp ties
    "q_funnel" -> (Relational.funnel _),
    // reads the bucketed lake tables written by the prepare hook: the
    // fact⋈fact join plans with zero Exchange on either side
    "q_bucketed_join_served" -> ((s: SparkSession, _: String) =>
      Relational.bucketedRevenue(s)),
    // explicit Bloom semi-join reduction: probe-side fact rows that
    // cannot match the filtered build side are dropped BEFORE the
    // fact shuffle; the reduction is invisible to the result (the
    // oracle runs the plain join)
    "q_bloom_join" -> (Relational.bloomPrunedJoin _),
    // hourly resample onto the full per-series hour grid, gaps
    // forward-filled (LOCF) from the already-rounded hourly average
    "q_gap_fill" -> (Timeseries.gapFill _),
    // type-2 history build from the purchase changelog: one validity
    // interval per state change, exact nanosecond bounds
    "q_scd2" -> (Timeseries.scd2 _),
    // point-in-time lookup: each view enriched with the purchase
    // version valid at its timestamp — one union + one entity-keyed
    // window, never an interval explosion
    "q_scd2_lookup" -> (Timeseries.scd2Lookup _),
    // last-writer-wins changelog compaction + keyed full-outer merge
    // into the customer snapshot, with per-row disposition
    "q_cdc_apply" -> (Cdc.applyPurchases _),
    // the PERSISTED CDC lake built by the prepare hook (base + two
    // time-ordered change batches): the grown snapshot answers the
    // one-shot merge's oracle exactly
    "q_cdc_apply_served" -> ((s: SparkSession, d: String) =>
      Cdc.snapshot(s, s"${TextQueries.indexRoot(d)}/cdc")),
    // Delta-style time travel: the snapshot as of batch 0 — the later
    // batch is invisible via static partition pruning on the batch
    // log; oracle = the merge recomputed over only the changes at or
    // before the lake's ts-midpoint split
    "q_cdc_travel_served" -> ((s: SparkSession, d: String) =>
      Cdc.snapshotAt(s, s"${TextQueries.indexRoot(d)}/cdc", 0L)),
    // rolling-baseline outliers: each value vs the mean/std of its
    // series' preceding 20 observations (self excluded); the flag
    // derives from the emitted 4dp baselines, so it is engine-exact
    "q_anomaly" -> ((s: SparkSession, d: String) =>
      Timeseries.anomalies(s, d)),
    // canonical part pairs co-occurring in >= 3 orders: the deduped
    // basket self-join keyed on the shared order key
    "q_copurchase" -> ((s: SparkSession, d: String) =>
      Relational.coPurchase(s, d)),
    // record linkage: dirty part names (2nd char dropped) matched to
    // the clean dictionary — block on the edit-invariant (first, last)
    // chars, levenshtein verify in-block, deterministic argmin
    "q_fuzzy_match" -> ((s: SparkSession, d: String) =>
      Entity.fuzzyMatch(s, d)),
    // the five graph queries read the edge lists prepare persisted
    // (Graph.prepareEdges) instead of each rebuilding the basket
    // self-join — the graph-lake shape; oracles still recompute from
    // the base tables, so index content stays driver-verified.
    // five damped PageRank iterations over the customer→supplier
    // graph in exact scaled-integer arithmetic — bit-identical across
    // engines, partitionings, and merge orders
    "q_pagerank" -> ((s: SparkSession, d: String) =>
      Graph.pageRankEdges(s.read.parquet(s"${edgesRoot(d)}/bipartite"),
        iters = 5)),
    // per-node triangle counts over the ≥2-support co-purchase graph
    // via degree-ordered wedge counting (each triangle found once, at
    // its minimum vertex in the (deg, id) order)
    "q_triangles" -> ((s: SparkSession, d: String) =>
      Graph.triangleCountsOfEdges(
        coEdges(s, d, 2).select(col("p1"), col("p2")))),
    // bounded BFS from the %97 seed set: frontier + anti-join rounds,
    // never path enumeration (the oracle's recursive CTE enumerates —
    // fine at oracle scale; min-of-paths ≡ BFS first-discovery)
    "q_khop" -> ((s: SparkSession, d: String) =>
      Graph.kHopOfEdges(
        coEdges(s, d, 2).select(col("p1"), col("p2")), maxHops = 3)),
    // 3-round synchronous Bellman-Ford over integer edge costs
    // (1000 div n_orders): min cost over <=3-edge paths; frontier
    // settlement would be WRONG here (cheaper longer paths must win)
    "q_cheapest_path" -> ((s: SparkSession, d: String) =>
      Graph.cheapestPathsOfEdges(
        coEdges(s, d, 2).select(col("p1"), col("p2"),
          expr("1000L div n_orders").as("w")), rounds = 3)),
    // min-label propagation to fixpoint (O(diameter) lineage-cut
    // rounds; convergence via the monotone label-sum scalar)
    "q_components" -> ((s: SparkSession, d: String) =>
      Graph.componentsOfEdges(
        coEdges(s, d, 2).select(col("p1"), col("p2")))),
    // reads the z-ordered lineitem copy written by the prepare hook:
    // the 2-D layout is invisible to the result (oracle recomputes over
    // the raw table) — it exists to give the rectangle scan row-group
    // stats pruning on both keys at once
    "q_zorder_served" -> ((s: SparkSession, d: String) =>
      Relational.zorderRectangle(s,
        s"${TextQueries.indexRoot(d)}/zorder_lineitem", d))
  )

  /** DECIMAL(18,6)-accumulated sums emitted as DOUBLE — see Fns.dsum. */
  private def ds(e: String) =
    s"CAST(sum(CAST($e AS DECIMAL(18,6))) AS DOUBLE)"

  /** One merge recompute, answered by both the inline q_cdc_apply and
    * the grown-lake q_cdc_apply_served.
    */
  private val cdcApplySql =
    """WITH latest AS (
      |  SELECT key, new_value FROM (
      |    SELECT user_id AS key, value AS new_value,
      |      row_number() OVER (PARTITION BY user_id
      |        ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events WHERE event_type = 'purchase')
      |  WHERE rn = 1),
      |base AS (SELECT c_custkey AS key, c_acctbal FROM customer)
      |SELECT coalesce(b.key, l.key) AS key,
      |  round(CASE WHEN l.key IS NOT NULL THEN l.new_value
      |        ELSE b.c_acctbal END, 4) AS acctbal,
      |  CASE WHEN b.key IS NULL THEN 'inserted'
      |       WHEN l.key IS NULL THEN 'kept'
      |       ELSE 'updated' END AS disposition
      |FROM base b FULL OUTER JOIN latest l ON b.key = l.key""".stripMargin

  val oracle: Map[String, String] = Map(
    // exact distinct counts recomputed cross-engine; the _ok booleans
    // assert the Spark HLL sketch stayed within 5% of them
    "q_approx_distinct" ->
      """SELECT l_linestatus,
        | count(DISTINCT l_partkey) AS n_parts_exact,
        | count(DISTINCT l_suppkey) AS n_supps_exact,
        | TRUE AS parts_ok, TRUE AS supps_ok
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "q_approx_distinct_tol" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts_exact,
        | count(DISTINCT l_orderkey) AS n_orders_exact,
        | TRUE AS parts_ok, TRUE AS orders_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q3_shipping" ->
      s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
         | ${ds("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND CAST(o_orderdate AS DATE) < DATE '1998-06-01'
         |  AND CAST(l_shipdate AS DATE) > DATE '1998-06-01'
         |GROUP BY 1, 2
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region" ->
      s"""SELECT r_name, n_name,
         | ${ds("l_extendedprice * (1 - l_discount)")} AS revenue,
         | count(*) AS n_items
         |FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         | JOIN nation ON c_nationkey = n_nationkey
         | JOIN region ON n_regionkey = r_regionkey
         |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
         |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
         |GROUP BY r_name, n_name""".stripMargin,
    "q14_promo" ->
      s"""SELECT
         | round(promo_revenue / total_revenue * 100, 4) AS promo_pct,
         | promo_revenue, total_revenue
         |FROM (
         |  SELECT
         |   ${ds("CASE WHEN p_type = 'ECONOMY' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} AS promo_revenue,
         |   ${ds("l_extendedprice * (1 - l_discount)")} AS total_revenue
         |  FROM lineitem JOIN part ON l_partkey = p_partkey)""".stripMargin,
    "q_semi_join" ->
      s"""SELECT o_orderstatus, count(*) AS n_orders,
         | ${ds("o_totalprice")} AS total_price
         |FROM orders
         |WHERE EXISTS (SELECT 1 FROM lineitem
         |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
         |GROUP BY o_orderstatus""".stripMargin,
    "q_anti_join" ->
      """SELECT c_nationkey, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey""".stripMargin,
    "q_outer_join" ->
      s"""SELECT c_custkey, count(o_totalprice) AS n_orders,
         | ${ds("coalesce(o_totalprice, 0)")} AS total_spent
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |   row_number() OVER (PARTITION BY o_custkey
        |                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin,
    "q_window_running" ->
      """SELECT user_id, event_id,
        | round(sum(value) OVER w, 4) AS running_sum,
        | round(value - lag(value, 1) OVER w, 4) AS delta
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |""".stripMargin,
    "q_rollup" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderstatus,
         | ${ds("o_totalprice")} AS total_price, count(*) AS n_orders
         |FROM orders
         |GROUP BY ROLLUP (1, o_orderstatus)""".stripMargin,
    "q_cube" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${ds("l_quantity")} AS sum_qty,
         | round(avg(l_discount), 4) AS avg_disc, count(*) AS n_items
         |FROM lineitem
         |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q_distinct" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(*) AS n_items
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin,
    "q_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin,
    "q_union" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin,
    "q_membership" ->
      """SELECT l_returnflag, count(*) AS n_items
        |FROM lineitem WHERE l_returnflag IN ('A', 'R')
        |GROUP BY l_returnflag""".stripMargin,
    "q_midpoint" ->
      """SELECT date,
        | round(coalesce((mx + mn) / 2, mx, mn), 4) AS est_avg
        |FROM (
        |  SELECT CAST(ts AS DATE) AS date, max(value) AS mx,
        |   min(value) AS mn
        |  FROM events GROUP BY 1)""".stripMargin,
    "q_synth_keys" ->
      """SELECT o_orderkey,
        | str_split(o_orderpriority, '-')[-1] AS priority_name,
        | concat_ws('_', o_custkey, CAST(epoch(o_orderdate) AS BIGINT))
        |   AS synth_key
        |FROM orders""".stripMargin,
    "q_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
        | count(*) AS n, round(avg(value), 4) AS avg_value
        |FROM events GROUP BY 1""".stripMargin,
    // funnel recompute: the same set-min chain. Only ts ORDERING
    // matters (the output is step counts), so the raw column works in
    // either physical schema — min/> give the same element whether ts
    // is a timestamp or the normalized ns long
    "q_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, ts FROM events),
        |v AS (
        |  SELECT user_id, min(ts) AS t1 FROM ev
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT ev.user_id, min(ev.ts) AS t2
        |  FROM ev JOIN v ON ev.user_id = v.user_id
        |  WHERE ev.event_type = 'click' AND ev.ts > v.t1
        |  GROUP BY ev.user_id),
        |p AS (
        |  SELECT ev.user_id, min(ev.ts) AS t3
        |  FROM ev JOIN c ON ev.user_id = c.user_id
        |  WHERE ev.event_type = 'purchase' AND ev.ts > c.t2
        |  GROUP BY ev.user_id),
        |b AS (SELECT count(*) AS base FROM v),
        |steps AS (
        |  SELECT 1 AS step, 'view' AS event_type,
        |    (SELECT count(*) FROM v) AS users
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM c)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM p))
        |SELECT CAST(step AS INT) AS step, event_type,
        |  CAST(users AS BIGINT) AS users,
        |  round(CAST(users AS DOUBLE) / b.base, 4) AS conv_rate
        |FROM steps, b""".stripMargin,
    // rectangle aggregate recomputed over the RAW lineitem — the
    // z-order layout must change only which row groups are read, never
    // the answer; bounds re-derived with the same integer arithmetic
    "q_zorder_served" ->
      s"""WITH b AS (
         |  SELECT
         |   min(l_orderkey) + (max(l_orderkey) - min(l_orderkey)) // 4
         |     AS o1,
         |   min(l_orderkey) + (max(l_orderkey) - min(l_orderkey)) // 2
         |     AS o2,
         |   min(l_partkey) + (max(l_partkey) - min(l_partkey)) // 4
         |     AS p1,
         |   min(l_partkey) + (max(l_partkey) - min(l_partkey)) // 2
         |     AS p2
         |  FROM lineitem)
         |SELECT count(*) AS n_items,
         | round(sum(l_quantity), 4) AS sum_qty,
         | ${ds("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem, b
         |WHERE l_orderkey BETWEEN b.o1 AND b.o2
         |  AND l_partkey BETWEEN b.p1 AND b.p2""".stripMargin,
    // same rollup recomputed over the raw tables — the bucketed layout
    // must change the PLAN (no fact exchanges), never the answer
    "q_bucketed_join_served" ->
      s"""SELECT o_orderstatus,
         | ${ds("l_extendedprice * (1 - l_discount)")} AS revenue,
         | count(*) AS n_items
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderstatus""".stripMargin,
    // the plain join — the Bloom reduction must never change it
    "q_bloom_join" ->
      s"""SELECT o_orderpriority,
         | ${ds("l_extendedprice * (1 - l_discount)")} AS revenue,
         | count(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderstatus = 'F'
         |  AND year(CAST(o_orderdate AS DATE)) = 1996
         |GROUP BY o_orderpriority""".stripMargin,
    // grid keyed by exact integer epoch-hour (epoch_ns // 3.6e12 —
    // no timestamp arithmetic), LOCF propagates the 4dp-rounded
    // hourly average unchanged
    "q_gap_fill" ->
      """WITH h AS (
        |  SELECT event_type,
        |    epoch_ns(ts) // 3600000000000 AS h_idx,
        |    round(avg(value), 4) AS avg_value, count(*) AS n_obs
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |b AS (SELECT event_type, min(h_idx) AS lo, max(h_idx) AS hi
        |      FROM h GROUP BY 1),
        |grid AS (SELECT event_type,
        |           unnest(generate_series(lo, hi)) AS h_idx
        |         FROM b),
        |j AS (SELECT g.event_type, g.h_idx, h.avg_value, h.n_obs
        |      FROM grid g LEFT JOIN h
        |        ON g.event_type = h.event_type AND g.h_idx = h.h_idx)
        |SELECT event_type, h_idx,
        |  CAST(make_timestamp(h_idx * 3600000000) AS DATE) AS date,
        |  CAST(h_idx % 24 AS INT) AS hr,
        |  avg_value,
        |  last_value(avg_value IGNORE NULLS) OVER (
        |    PARTITION BY event_type ORDER BY h_idx
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS filled_value,
        |  coalesce(n_obs, 0) AS n_obs,
        |  (avg_value IS NULL) AS is_gap
        |FROM j""".stripMargin,
    "q_scd2" ->
      """SELECT user_id, CAST(version AS INT) AS version, value,
        |  valid_from, valid_to, (valid_to IS NULL) AS is_current
        |FROM (
        |  SELECT user_id, value,
        |    row_number() OVER w AS version,
        |    epoch_ns(ts) AS valid_from,
        |    lead(epoch_ns(ts), 1) OVER w AS valid_to
        |  FROM events WHERE event_type = 'purchase'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |""".stripMargin,
    // the same tag-union-window composition; a version's interval
    // includes its start (purchases sort before views at equal ts)
    "q_scd2_lookup" ->
      """WITH p AS (
        |  SELECT user_id, epoch_ns(ts) AS tsn, event_id, 0 AS side,
        |    value AS p_value,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS BIGINT) AS p_version
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT user_id, epoch_ns(ts) AS tsn, event_id, 1 AS side,
        |    CAST(NULL AS DOUBLE) AS p_value,
        |    CAST(NULL AS BIGINT) AS p_version
        |  FROM events WHERE event_type = 'view'),
        |u AS (SELECT * FROM p UNION ALL SELECT * FROM v),
        |w AS (
        |  SELECT user_id, event_id, side,
        |    last_value(p_value IGNORE NULLS) OVER win AS asof_value,
        |    last_value(p_version IGNORE NULLS) OVER win AS asof_version
        |  FROM u
        |  WINDOW win AS (PARTITION BY user_id ORDER BY tsn, side, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id AS view_id, user_id, asof_version, asof_value
        |FROM w WHERE side = 1""".stripMargin,
    // presence-marker merge semantics: a change row wins even when its
    // value is NULL, so dispositions come from join presence, not
    // value-null tests
    "q_cdc_apply" -> cdcApplySql,
    // the grown lake must serve the one-shot merge exactly (batches
    // are time-ordered, so batch precedence ≡ LWW)
    "q_cdc_apply_served" -> cdcApplySql,
    // the as-of-batch-0 snapshot: the SAME merge with the changelog
    // truncated at the lake's integer ns-midpoint split (epoch_ns
    // handles both physical ts schemas; // and Long./ agree on
    // positives), so the time-travel read has a full recompute oracle
    "q_cdc_travel_served" ->
      """WITH ch AS (
        |  SELECT user_id AS key, value AS new_value,
        |    epoch_ns(ts) AS tns, event_id
        |  FROM events WHERE event_type = 'purchase'),
        |mid AS (
        |  SELECT min(tns) // 2 + max(tns) // 2 AS m FROM ch),
        |latest AS (
        |  SELECT key, new_value FROM (
        |    SELECT key, new_value,
        |      row_number() OVER (PARTITION BY key
        |        ORDER BY tns DESC, event_id DESC) AS rn
        |    FROM ch CROSS JOIN mid WHERE tns <= m)
        |  WHERE rn = 1),
        |base AS (SELECT c_custkey AS key, c_acctbal FROM customer)
        |SELECT coalesce(b.key, l.key) AS key,
        |  round(CASE WHEN l.key IS NOT NULL THEN l.new_value
        |        ELSE b.c_acctbal END, 4) AS acctbal,
        |  CASE WHEN b.key IS NULL THEN 'inserted'
        |       WHEN l.key IS NULL THEN 'kept'
        |       ELSE 'updated' END AS disposition
        |FROM base b FULL OUTER JOIN latest l ON b.key = l.key""".stripMargin,
    "q_anomaly" ->
      """SELECT event_type, event_id, value, base_mean, base_std,
        |  n_base, (abs(value - base_mean) > base_std * 2.0) AS is_outlier
        |FROM (
        |  SELECT event_type, event_id, value,
        |    round(avg(value) OVER w, 4) AS base_mean,
        |    round(stddev_samp(value) OVER w, 4) AS base_std,
        |    count(value) OVER w AS n_base
        |  FROM events WHERE value IS NOT NULL
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |WHERE n_base >= 10""".stripMargin,
    "q_fuzzy_match" ->
      """WITH clean AS (SELECT DISTINCT p_name FROM part),
        |dirty AS (
        |  SELECT p_partkey AS dirty_id,
        |    left(p_name, 1) || substr(p_name, 3) AS dirty_name
        |  FROM part),
        |cand AS (
        |  SELECT d.dirty_id, d.dirty_name, c.p_name,
        |    levenshtein(d.dirty_name, c.p_name) AS dist
        |  FROM dirty d JOIN clean c
        |    ON left(d.dirty_name, 1) = left(c.p_name, 1)
        |   AND right(d.dirty_name, 1) = right(c.p_name, 1)
        |  WHERE levenshtein(d.dirty_name, c.p_name) <= 2)
        |SELECT dirty_id, dirty_name, p_name AS match_name,
        |  CAST(dist AS INT) AS dist
        |FROM (SELECT *, row_number() OVER (PARTITION BY dirty_id
        |        ORDER BY dist, p_name) AS rn
        |      FROM cand)
        |WHERE rn = 1""".stripMargin,
    "q_copurchase" ->
      """SELECT a.l_partkey AS p1, b.l_partkey AS p2,
        |  count(*) AS n_orders
        |FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
        |  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        |    ON a.l_orderkey = b.l_orderkey
        |   AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2
        |HAVING count(*) >= 3""".stripMargin,
    // generated from the same template as the engine's iteration —
    // constants and round count can never drift apart
    "q_pagerank" -> Graph.oracleSql(5),
    // full recompute via the id-ordered 3-way join (a DIFFERENT
    // enumeration from the engine's degree-ordered wedges — the
    // count-per-node agreement is the cross-check)
    "q_triangles" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (
        |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey
        |   AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |tri AS (
        |  SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
        |  FROM e e1 JOIN e e2 ON e1.p2 = e2.p1
        |    JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2)
        |SELECT node, count(*) AS n_triangles
        |FROM (SELECT a AS node FROM tri
        |      UNION ALL SELECT b FROM tri
        |      UNION ALL SELECT c FROM tri)
        |GROUP BY node""".stripMargin,
    // recursive-CTE recompute: bounded path enumeration + min — equal
    // to the engine's BFS first-discovery distance by definition
    "q_khop" ->
      """WITH RECURSIVE items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (
        |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey
        |   AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |bidir AS (
        |  SELECT p1 AS s, p2 AS t FROM e
        |  UNION ALL SELECT p2, p1 FROM e),
        |seeds AS (
        |  SELECT DISTINCT node
        |  FROM (SELECT p1 AS node FROM e UNION ALL SELECT p2 FROM e)
        |  WHERE node % 97 = 0),
        |reach(node, dist) AS (
        |  SELECT node, 0 FROM seeds
        |  UNION ALL
        |  SELECT b.t, r.dist + 1
        |  FROM reach r JOIN bidir b ON b.s = r.node
        |  WHERE r.dist < 3)
        |SELECT node, CAST(min(dist) AS INT) AS dist
        |FROM reach GROUP BY node""".stripMargin,
    // transitive-closure recompute: the recursive CTE's UNION (set)
    // semantics terminate at the finite (node, reachable-label) pair
    // space; min per node == component minimum == the engine's
    // propagation fixpoint
    "q_components" ->
      """WITH RECURSIVE items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (
        |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey
        |   AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |bidir AS (
        |  SELECT p1 AS s, p2 AS t FROM e
        |  UNION ALL SELECT p2, p1 FROM e),
        |reach(node, label) AS (
        |  SELECT p1, p1 FROM e UNION SELECT p2, p2 FROM e
        |  UNION
        |  SELECT b.t, r.label FROM reach r JOIN bidir b ON b.s = r.node)
        |SELECT node, min(label) AS label
        |FROM reach GROUP BY node""".stripMargin,
    // bounded-path enumeration + min over exact integer costs — equal
    // to k rounds of Bellman-Ford relaxation by definition
    "q_cheapest_path" ->
      """WITH RECURSIVE items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (
        |  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
        |    1000 // count(*) AS w
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey
        |   AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |bidir AS (
        |  SELECT p1 AS s, p2 AS t, w FROM e
        |  UNION ALL SELECT p2, p1, w FROM e),
        |seeds AS (
        |  SELECT DISTINCT node
        |  FROM (SELECT p1 AS node FROM e UNION ALL SELECT p2 FROM e)
        |  WHERE node % 97 = 0),
        |paths(node, cost, hops) AS (
        |  SELECT node, CAST(0 AS BIGINT), 0 FROM seeds
        |  UNION ALL
        |  SELECT b.t, p.cost + b.w, p.hops + 1
        |  FROM paths p JOIN bidir b ON b.s = p.node
        |  WHERE p.hops < 3)
        |SELECT node, min(cost) AS cost
        |FROM paths GROUP BY node""".stripMargin,
    "q_sessionize" ->
      """SELECT user_id, CAST(session_idx AS INT) AS session_idx,
        | count(*) AS n_events, min(event_id) AS first_event_id,
        | round(sum(value), 4) AS session_value
        |FROM (
        |  SELECT user_id, event_id, value,
        |   sum(new_session) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |     AS session_idx
        |  FROM (
        |    SELECT user_id, ts, event_id, value,
        |     CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts), 1) OVER (
        |            PARTITION BY user_id ORDER BY ts, event_id)
        |          > 1800000000000 THEN 1 ELSE 0 END AS new_session
        |    FROM events))
        |GROUP BY user_id, session_idx""".stripMargin
  )
}
