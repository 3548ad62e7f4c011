package graft.registry

import graft.operators.{AsOf, Extras, RangeJoin, Sketch}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-contract registry for the engine-completeness extras. */
object ExtrasQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (AsOf.purchaseAsOfClick _),
    // binned interval-containment join: the time-only-predicate family
    // Spark would otherwise plan as a nested-loop product
    "q_range_join" -> ((s: SparkSession, d: String) =>
      RangeJoin.errorWindowCoverage(s, d)),
    "q_window_analytics" -> (Extras.windowAnalytics _),
    "q_grouping_sets" -> (Extras.groupingSets _),
    "q_argmax" -> (Extras.argmaxPerNation _),
    "q_strings" -> (Extras.stringFunctions _),
    "q_dates" -> (Extras.dateFunctions _),
    "q_percentiles" -> (Extras.percentiles _),
    // raw t-digest values are engine-specific, so the registered row
    // is the tolerance form — l_linestatus grouping; the _tol twin
    // covers l_returnflag
    "q_approx_percentiles" -> (Extras.approxPercentilesByStatus _),
    "q_approx_percentiles_tol" -> (Extras.approxPercentileTolerance _),
    // group-relative outlier capping into the rounded [p01, p99] band
    "q_winsorize" -> (Extras.winsorize _),
    // per-join-key row-distribution summary (hot-key share, p99/mean)
    "q_skew_profile" -> (Extras.skewProfile _),
    // RANGE-frame window: trailing 30 calendar days by ordering value
    "q_window_range" -> ((s: SparkSession, d: String) =>
      Extras.trailingRevenue(s, d)),
    "q_pivot" -> (Extras.pivotEvents _),
    "q_except_all" -> (Extras.statusExceptAll _),
    "q_stats_agg" -> (Extras.statsAggregates _),
    "q_collect" -> (Extras.collectStatuses _),
    "q_having" -> (Extras.bigSpenders _),
    "q_scalar_subquery" -> (Extras.aboveAvgBalance _),
    "q_unpivot" -> (Extras.unpivotDaily _),
    "q_pattern_filters" -> (Extras.patternFilters _),
    "q_null_fns" -> (Extras.nullFunctions _),
    "q_salted_join" -> ((s: SparkSession, d: String) =>
      Extras.saltedSegmentRevenue(s, d)),
    "q_heavy_hitters" -> ((s: SparkSession, d: String) =>
      Extras.heavyHitters(s, d)),
    // the sketch as a per-group aggregate: one O(m) summary per
    // event_type, guarantee booleans against each group's own n
    "q_heavy_hitters_grouped" -> ((s: SparkSession, d: String) =>
      Extras.heavyHittersGrouped(s, d)),
    // chi-square independence over the source × lang grid — the
    // categorical companion to q_source_drift's KL/TVD
    "q_chi2" -> (Extras.chiSquare _),
    // rule-based validation report: every rule one conditional count
    // in a single scan; zero-violation rules emit explicit 0 rows
    "q_validate" -> (Extras.validateEvents _),
    // candidate-key / functional-dependency profiling: each check one
    // multi-distinct aggregate over keys-only projections
    "q_key_discovery" -> (Extras.keyDiscovery _),
    // seasonal-naive forecast baseline, backtested as per-type MAE
    // over the data-derived 80/20 day split
    "q_forecast" -> ((s: SparkSession, d: String) =>
      graft.operators.Timeseries.forecastBacktest(s, d)),
    // one-scan column profiler (Deequ-style data-quality pass)
    "q_profile" -> (Extras.profile _),
    // equi-depth histogram: exact decile bounds (4 dp contract), all
    // bins counted in one conditional-sum aggregate
    "q_histogram" -> ((s: SparkSession, d: String) =>
      Extras.histogram(s, d)),
    // SLIDING windows (2 h window, 1 h slide): the third window
    // family — each event lands in exactly two windows
    "q_sliding" -> (Extras.slidingWindows _),
    // Spark 4 VARIANT: parse once to binary, typed variant_get
    // extraction — the scale path for semi-structured columns
    "q_variant" -> (Extras.variantExtract _),
    // per-brand Pareto frontier: bucketed local prune then global —
    // never the quadratic NOT EXISTS the SQL definition suggests
    "q_skyline" -> (Extras.skyline _),
    // count-min sketch, full cross-engine recompute (modular hashes)
    "q_cms" -> ((s: SparkSession, d: String) => Sketch.cmsProbe(s, d)),
    // AMS/F2 join-size estimate: the CBO-style one-pass sketch that
    // sizes a self-join without executing it
    "q_join_size_ams" -> (Sketch.amsJoinSize _),
    // HLL sketch mergeability: per-source sketches unioned ==
    // whole-corpus sketch, within 5% of exact — the guarantee-boolean
    // oracle pattern
    "q_hll_mergeable" -> (Extras.hllMergeable _)
  )

  val oracle: Map[String, String] = Map(
    // exhaustive dominance check — the definitional quadratic form the
    // Spark side's two-stage prune must reproduce exactly (incl.
    // keeping equal (price, size) twins: neither dominates)
    "q_skyline" ->
      """SELECT a.p_brand, a.p_partkey, a.p_retailprice, a.p_size
        |FROM part a WHERE NOT EXISTS (
        |  SELECT 1 FROM part b
        |  WHERE b.p_brand = a.p_brand
        |    AND b.p_retailprice <= a.p_retailprice
        |    AND b.p_size <= a.p_size
        |    AND (b.p_retailprice < a.p_retailprice
        |      OR b.p_size < a.p_size))""".stripMargin,
    // full sketch recomputes — same modular-hash constants, generated
    // from the Scala coefficient tables so the engines cannot drift
    "q_cms" -> Sketch.cmsOracleSql(),
    "q_join_size_ams" -> Sketch.amsOracleSql,
    // the variant path must land exactly where the string path does —
    // same extraction, same aggregate as q_json_extract's oracle
    "q_variant" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
        | count(*) AS n, round(avg(value), 4) AS avg_value
        |FROM events GROUP BY 1""".stripMargin,
    // membership reconstructed: each event's two hour-truncated
    // window starts, grouped — identical to the replicate-then-group
    // plan Spark's window() builds
    "q_sliding" ->
      """SELECT CAST(ws AS DATE) AS date,
        | CAST(extract(hour FROM ws) AS INT) AS hr,
        | round(avg(value), 4) AS avg_value,
        | max(value) AS max_value, count(*) AS n_obs
        |FROM (
        |  SELECT date_trunc('hour', ts) - o * INTERVAL 1 HOUR AS ws,
        |    value
        |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS o)
        |  WHERE value IS NOT NULL)
        |GROUP BY 1, 2""".stripMargin,
    // same rounded decile bounds, same (lo, hi] bin predicates —
    // generated so both engines bin against identical thresholds
    "q_histogram" -> {
      val bDefs = (0 to 10).map(i =>
        s"round(quantile_cont(l_extendedprice, ${i / 10.0}), 4) AS b$i")
        .mkString(", ")
      val sums = (1 to 10).map { i =>
        val in = if (i == 1)
          "l_extendedprice >= b0 AND l_extendedprice <= b1"
        else s"l_extendedprice > b${i - 1} AND l_extendedprice <= b$i"
        s"CAST(sum(CASE WHEN $in THEN 1 ELSE 0 END) AS BIGINT) AS n$i"
      }.mkString(", ")
      val rows = (1 to 10).map(i =>
        s"SELECT $i AS bin_idx, b${i - 1} AS lo, b$i AS hi, " +
          s"n$i AS n_rows FROM w CROSS JOIN b")
        .mkString("\nUNION ALL\n")
      s"""WITH b AS (SELECT $bDefs FROM lineitem),
         |w AS (SELECT $sums FROM lineitem CROSS JOIN b)
         |$rows""".stripMargin
    },
    // full profiling recompute: one row per column, same metrics;
    // stddev is the sample form in both engines, 4 dp
    "q_profile" -> Seq("l_quantity", "l_extendedprice", "l_discount",
      "l_tax").map { c =>
        s"""SELECT '$c' AS col_name, count($c) AS n,
           | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |   AS nulls,
           | count(DISTINCT $c) AS n_distinct,
           | min($c) AS min_v, max($c) AS max_v,
           | round(avg($c), 4) AS mean_v,
           | round(stddev($c), 4) AS stddev_v
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", ""),
    // exact distinct + the two guarantee booleans (sketch merge is
    // associative and lossless at fixed lgK — deterministically TRUE)
    "q_hll_mergeable" ->
      """SELECT count(DISTINCT doc_id) AS n_exact,
        | TRUE AS merged_within_tol, TRUE AS direct_within_tol
        |FROM documents""".stripMargin,
    // exact top-k recomputed cross-engine; the _ok booleans assert the
    // Space-Saving sketch's containment + error-bound guarantees (the
    // sketch CONTENTS are merge-order dependent, the guarantees never)
    "q_heavy_hitters" ->
      """SELECT key, exact_n, TRUE AS guarantee_ok, TRUE AS bound_ok
        |FROM (
        |  SELECT CAST(length(CAST(event_id AS VARCHAR)) AS VARCHAR)
        |    AS key, count(*) AS exact_n
        |  FROM events GROUP BY 1
        |  ORDER BY exact_n DESC, key LIMIT 5)""".stripMargin,
    // per-group form: exact top-k inside each event_type, both sketch
    // guarantees pinned TRUE against the group's own n
    "q_heavy_hitters_grouped" ->
      """SELECT grp, key, exact_n, TRUE AS guarantee_ok,
        | TRUE AS bound_ok
        |FROM (
        |  SELECT grp, key, exact_n, row_number() OVER (
        |    PARTITION BY grp ORDER BY exact_n DESC, key) AS rk
        |  FROM (
        |    SELECT event_type AS grp,
        |      CAST(length(CAST(event_id AS VARCHAR)) AS VARCHAR) AS key,
        |      count(*) AS exact_n
        |    FROM events GROUP BY 1, 2))
        |WHERE rk <= 3""".stripMargin,
    // full recompute: expected counts from the crossed margins over
    // the COMPLETE grid (empty cells included), (O−E)²/E summed 4 dp.
    // n_docs derives from sum() — DuckDB widens integer sums to
    // HUGEINT, which pandas renders as float64 while Spark emits
    // int64 (hash-visible at the driver) — so CAST back to BIGINT
    "q_chi2" ->
      """WITH o AS (
        |  SELECT source, lang, count(*) AS o FROM documents
        |  GROUP BY 1, 2),
        |rm AS (SELECT source, sum(o) AS rs FROM o GROUP BY 1),
        |cm AS (SELECT lang, sum(o) AS cs FROM o GROUP BY 1),
        |tot AS (SELECT sum(o) AS n FROM o),
        |grid AS (
        |  SELECT rm.source, cm.lang, rs, cs, tot.n,
        |    coalesce(o.o, 0) AS obs
        |  FROM rm CROSS JOIN cm
        |  LEFT JOIN o ON o.source = rm.source AND o.lang = cm.lang
        |  CROSS JOIN tot)
        |SELECT CAST(max(n) AS BIGINT) AS n_docs,
        | count(DISTINCT source) AS n_sources,
        | count(DISTINCT lang) AS n_langs,
        | (count(DISTINCT source) - 1) * (count(DISTINCT lang) - 1)
        |   AS dof,
        | round(sum((obs - CAST(rs AS DOUBLE) * cs / n)
        |   * (obs - CAST(rs AS DOUBLE) * cs / n)
        |   / (CAST(rs AS DOUBLE) * cs / n)), 4) AS chi2
        |FROM grid""".stripMargin,
    // one conditional count per rule; the JSON rule reuses the
    // engine-parity extraction q_json_extract established
    "q_validate" -> Seq(
      ("missing_value", "value IS NULL"),
      ("negative_value", "value IS NOT NULL AND value < 0"),
      ("value_implausible", "value IS NOT NULL AND value > 450"),
      ("unknown_event_type", "event_type NOT IN " +
        "('click', 'view', 'signup', 'purchase', 'error')"),
      ("props_k_out_of_range",
        "CAST(json_extract_string(props, '$.k') AS INT) > 90"),
      ("error_with_high_value",
        "event_type = 'error' AND value > 400"))
      .map { case (name, pred) =>
        s"""SELECT '$name' AS rule,
           | CAST(sum(CASE WHEN $pred THEN 1 ELSE 0 END) AS BIGINT)
           |   AS n_violations
           |FROM events""".stripMargin
      }.mkString("\nUNION ALL\n"),
    // each check recomputed as the same distinct-count equalities;
    // DuckDB's struct DISTINCT matches Spark's tuple DISTINCT on the
    // null-free checked columns
    "q_key_discovery" -> Seq(
      ("key:orders.o_orderkey", "orders",
        "count(*)", "count(DISTINCT o_orderkey)"),
      ("key:orders.o_custkey", "orders",
        "count(*)", "count(DISTINCT o_custkey)"),
      ("key:lineitem.(l_orderkey,l_linenumber)", "lineitem",
        "count(*)", "count(DISTINCT (l_orderkey, l_linenumber))"),
      ("key:part.p_partkey", "part",
        "count(*)", "count(DISTINCT p_partkey)"),
      ("fd:nation.n_nationkey->n_regionkey", "nation",
        "count(DISTINCT n_nationkey)",
        "count(DISTINCT (n_nationkey, n_regionkey))"),
      ("fd:lineitem.l_orderkey->l_suppkey", "lineitem",
        "count(DISTINCT l_orderkey)",
        "count(DISTINCT (l_orderkey, l_suppkey))"),
      ("fd:orders.o_custkey->o_orderpriority", "orders",
        "count(DISTINCT o_custkey)",
        "count(DISTINCT (o_custkey, o_orderpriority))"))
      .map { case (chk, tbl, lhs, rhs) =>
        s"""SELECT '$chk' AS chk, $lhs AS n_lhs, $rhs AS n_rhs,
           | $lhs = $rhs AS holds FROM $tbl""".stripMargin
      }.mkString("\nUNION ALL\n"),
    // same split-day derivation, per-slot train means and per-cell
    // test actuals through the shared 4 dp contract
    "q_forecast" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS date,
        |    extract(hour FROM ts) AS hr, value
        |  FROM events WHERE value IS NOT NULL),
        |span AS (
        |  SELECT min(date) + CAST(floor(0.8 *
        |    (max(date) - min(date) + 1)) AS INT) AS split_d
        |  FROM ev),
        |model AS (
        |  SELECT event_type, hr, round(avg(value), 4)
        |    AS forecast
        |  FROM ev CROSS JOIN span WHERE date < split_d GROUP BY 1, 2),
        |actual AS (
        |  SELECT event_type, date, hr, round(avg(value), 4)
        |    AS actual
        |  FROM ev CROSS JOIN span WHERE date >= split_d
        |  GROUP BY 1, 2, 3)
        |SELECT a.event_type, count(*) AS n_test_cells,
        | round(avg(abs(m.forecast - a.actual)), 4) AS mae
        |FROM actual a JOIN model m
        |  ON a.event_type = m.event_type AND a.hr = m.hr
        |GROUP BY a.event_type""".stripMargin,
    // exact percentiles recomputed cross-engine; the _ok booleans
    // assert the approx_percentile sketch stayed within tolerance
    "q_approx_percentiles" ->
      """SELECT l_linestatus,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
        | round(quantile_cont(l_quantity, 0.95), 4) AS p95_qty,
        | TRUE AS median_ok, TRUE AS p95_ok
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "q_approx_percentiles_tol" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        | round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
        | TRUE AS median_ok, TRUE AS p90_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // full recompute: identical RANGE frame over the exact integer
    // epoch-day; DECIMAL accumulation inside the frame makes every
    // value bit-identical with NO rounding step
    "q_window_range" ->
      """SELECT o_orderkey, o_custkey,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER w
        |   AS DOUBLE) AS trailing_rev,
        | count(*) OVER w AS n_orders_window
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
        |  RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)""".stripMargin,
    // full recompute of the per-key distribution summaries — counts
    // exact, shares/quantiles 4 dp
    "q_skew_profile" -> Seq("l_orderkey", "l_partkey", "l_suppkey")
      .map { k =>
        s"""SELECT '$k' AS key_col,
           | CAST(sum(kn) AS BIGINT) AS n_rows, count(*) AS n_keys,
           | CAST(max(kn) AS BIGINT) AS max_key_rows,
           | round(1e-9 + CAST(max(kn) AS DOUBLE) / sum(kn), 4)
           |   AS max_share,
           | round(1e-9 + quantile_cont(kn, 0.99), 4) AS p99_key_rows,
           | round(1e-9 + quantile_cont(kn, 0.99) /
           |   (CAST(sum(kn) AS DOUBLE) / count(*)), 4)
           |   AS p99_over_mean
           |FROM (SELECT $k, count(*) AS kn FROM lineitem
           |      GROUP BY $k)""".stripMargin
      }.mkString("", "\nUNION ALL\n", ""),
    // full recompute: rounded per-group quantile bounds, then the
    // clip aggregate — thresholds rounded 4 dp in BOTH engines before
    // comparison (tie-run interpolation can differ by an ulp raw)
    "q_winsorize" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |    round(1e-9 + quantile_cont(l_extendedprice, 0.01), 4)
        |      AS lo,
        |    round(1e-9 + quantile_cont(l_extendedprice, 0.99), 4)
        |      AS hi
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag, count(*) AS n,
        | CAST(sum(CASE WHEN l.l_extendedprice < b.lo THEN 1 ELSE 0
        |   END) AS BIGINT) AS clipped_lo,
        | CAST(sum(CASE WHEN l.l_extendedprice > b.hi THEN 1 ELSE 0
        |   END) AS BIGINT) AS clipped_hi,
        | round(1e-9 + avg(l.l_extendedprice), 4) AS mean_raw,
        | round(1e-9 + avg(greatest(b.lo,
        |     least(b.hi, l.l_extendedprice))), 4) AS mean_winsorized
        |FROM lineitem l JOIN b USING (l_returnflag)
        |GROUP BY l.l_returnflag""".stripMargin,
    // full recompute via the plain inequality join DuckDB plans
    // natively; all arithmetic on exact epoch-ns integers
    "q_range_join" ->
      """SELECT p.event_id AS purchase_id, count(*) AS n_windows,
        | min(epoch_ns(p.ts) - epoch_ns(e.ts)) AS min_gap_ns
        |FROM events p JOIN events e
        | ON p.event_type = 'purchase' AND e.event_type = 'error'
        | AND epoch_ns(e.ts) <= epoch_ns(p.ts)
        | AND epoch_ns(p.ts) - epoch_ns(e.ts) < 1800000000000
        |GROUP BY 1""".stripMargin,
    "q_asof_join" ->
      """SELECT event_id AS purchase_id, user_id, asof_click_value
        |FROM (
        |  SELECT event_id, user_id, side,
        |   last_value(click_value IGNORE NULLS) OVER (
        |     PARTITION BY user_id ORDER BY ts, side, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |     AS asof_click_value
        |  FROM (
        |    SELECT user_id, ts, event_id, 0 AS side,
        |     value AS click_value
        |    FROM events WHERE event_type = 'click'
        |    UNION ALL
        |    SELECT user_id, ts, event_id, 1 AS side,
        |     CAST(NULL AS DOUBLE) AS click_value
        |    FROM events WHERE event_type = 'purchase'))
        |WHERE side = 1""".stripMargin,
    "q_window_analytics" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | CAST(dense_rank() OVER w AS INT) AS drk,
        | CAST(ntile(4) OVER w AS INT) AS tile,
        | round(percent_rank() OVER w, 4) AS prk,
        | round(cume_dist() OVER w, 4) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin,
    "q_grouping_sets" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderstatus,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |   AS total_price,
        | count(*) AS n_orders
        |FROM orders
        |GROUP BY GROUPING SETS ((year(o_orderdate)), (o_orderstatus), ())
        |""".stripMargin,
    "q_argmax" ->
      """SELECT c_nationkey,
        | arg_max(c_name, c_acctbal) AS richest,
        | arg_min(c_name, c_acctbal) AS poorest,
        | round(max(c_acctbal), 4) AS max_bal
        |FROM customer GROUP BY c_nationkey""".stripMargin,
    "q_strings" ->
      """SELECT p_partkey,
        | upper(p_name) AS uname,
        | CAST(length(p_name) AS INT) AS name_len,
        | lpad(p_brand, 12, '*') AS brand_padded,
        | substr(p_type, 1, 3) AS type_prefix,
        | replace(p_name, ' ', '_') AS snake_name,
        | concat_ws('|', p_brand, p_type) AS brand_type,
        | trim('  x  ') AS trimmed
        |FROM part""".stripMargin,
    "q_dates" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
        | CAST(year(o_orderdate) AS INT) AS yr,
        | CAST(quarter(o_orderdate) AS INT) AS qtr,
        | CAST(dayofweek(o_orderdate) AS INT) AS dow,
        | CAST(o_orderdate AS DATE) + 30 AS plus30,
        | CAST(datediff('day', DATE '1998-01-01',
        |               CAST(o_orderdate AS DATE)) AS INT) AS day_offset,
        | last_day(CAST(o_orderdate AS DATE)) AS month_end,
        | CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start
        |FROM orders""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        | round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        | count(*) FILTER (WHERE event_type = 'click') AS click,
        | count(*) FILTER (WHERE event_type = 'view') AS view,
        | count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        | count(*) FILTER (WHERE event_type = 'signup') AS signup,
        | count(*) FILTER (WHERE event_type = 'error') AS error
        |FROM events GROUP BY user_id""".stripMargin,
    "q_except_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus <> 'O'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |""".stripMargin,
    "q_stats_agg" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |   CAST(count(*) AS DOUBLE) AS n,
        |   CAST(sum(q) AS DOUBLE) AS sq,
        |   CAST(sum(q*q) AS DOUBLE) AS sqq,
        |   CAST(sum(p) AS DOUBLE) AS sp,
        |   CAST(sum(p*p) AS DOUBLE) AS spp,
        |   CAST(sum(q*p) AS DOUBLE) AS sqp,
        |   CAST(sum(dc) AS DOUBLE) AS sd,
        |   CAST(sum(tx) AS DOUBLE) AS st,
        |   CAST(sum(dc*tx) AS DOUBLE) AS sdt
        |  FROM (
        |    -- DECIMAL(19,6): >18 digits forces int128 storage so the
        |    -- scale-12 products can't overflow DuckDB's int64 multiply;
        |    -- same values as Spark's decimal(18,6) operands
        |    SELECT l_returnflag,
        |     CAST(l_quantity AS DECIMAL(19,6)) AS q,
        |     CAST(l_extendedprice AS DECIMAL(19,6)) AS p,
        |     CAST(l_discount AS DECIMAL(19,6)) AS dc,
        |     CAST(l_tax AS DECIMAL(19,6)) AS tx
        |    FROM lineitem)
        |  GROUP BY l_returnflag)
        |SELECT l_returnflag,
        | round(sqrt((n*sqq - sq*sq) / (n*(n-1.0))), 4) AS sd_qty,
        | round((n*sqq - sq*sq) / (n*(n-1.0)), 4) AS var_qty,
        | -- "+ 0.0" maps IEEE -0.0 → 0.0 (Spark's BigDecimal round never
        | -- emits a negative zero; DuckDB's IEEE round does)
        | round((n*sqp - sq*sp) /
        |       (sqrt(n*sqq - sq*sq) * sqrt(n*spp - sp*sp)), 4) + 0.0
        |   AS qty_price_corr,
        | round((n*sdt - sd*st) / (n*(n-1.0)), 4) + 0.0 AS disc_tax_covar
        |FROM m""".stripMargin,
    "q_collect" ->
      """SELECT l_returnflag,
        | list_aggregate(list_sort(list(DISTINCT l_linestatus)),
        |                'string_agg', ',') AS statuses,
        | list_aggregate(
        |   list_transform(
        |     list_slice(list_sort(list(DISTINCT CAST(l_shipdate AS DATE))),
        |                1, 5),
        |     d -> strftime(d, '%Y-%m-%d')),
        |   'string_agg', ',') AS first_ship_dates
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_having" ->
      """SELECT o_custkey,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |   AS total_spent,
        | count(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |HAVING CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |       > 1000000.0""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        | round(avg(c_acctbal), 4) AS avg_bal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |GROUP BY c_mktsegment""".stripMargin,
    "q_unpivot" ->
      """WITH daily AS (
        |  SELECT date, round(avg(avg_value), 4) AS avg_value,
        |   max(max_value) AS max_value, min(min_value) AS min_value
        |  FROM (
        |    SELECT CAST(ts AS DATE) AS date, hour(ts) AS hr,
        |     avg(value) AS avg_value, max(value) AS max_value,
        |     min(value) AS min_value
        |    FROM events WHERE value IS NOT NULL GROUP BY 1, 2)
        |  GROUP BY date)
        |SELECT date, 'avg_value' AS metric, avg_value AS value FROM daily
        |UNION ALL
        |SELECT date, 'max_value', max_value FROM daily
        |UNION ALL
        |SELECT date, 'min_value', min_value FROM daily""".stripMargin,
    "q_pattern_filters" ->
      """SELECT p_partkey, p_name, p_type,
        | p_name LIKE '%a%' AS has_a,
        | p_type LIKE 'ECO%' AS is_eco,
        | regexp_matches(p_name, '^[a-m]') AS first_half_alphabet
        |FROM part
        |WHERE p_name LIKE '%e%' OR p_type LIKE '%L'""".stripMargin,
    "q_null_fns" ->
      """SELECT l_orderkey, l_linenumber,
        | coalesce(nullif(l_discount, 0.0), -1.0) AS disc_filled,
        | CASE WHEN nullif(l_discount, 0.0) IS NOT NULL
        |      THEN 'discounted' ELSE 'full_price' END AS price_kind,
        | greatest(nullif(l_discount, 0.0), 0.05) AS at_least_5pct,
        | least(coalesce(nullif(l_discount, 0.0), 1.0), 0.05)
        |   AS capped_5pct
        |FROM lineitem""".stripMargin,
    // the salted form must equal the PLAIN join bit-for-bit — that is
    // the whole correctness claim of salting
    "q_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |   AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin
  )
}
