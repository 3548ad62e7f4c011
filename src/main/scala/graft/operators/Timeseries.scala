package graft.operators

import graft.Tables
import graft.functions.Fns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series shaping over the events stream — the two warehouse
  * operations the reference's weather pipeline implies but never
  * implements: a regular-grid resample with gap fill (a dashboard
  * charting 400 days of hourly sensor data needs the missing hours
  * made explicit, `dashboard.py:1094`), and a type-2 slowly-changing
  * history built from a changelog (the principled form of the
  * reference's delete-then-insert aggregate upsert,
  * `clickhouse_etl.py:339-346`).
  *
  * Cross-engine determinism: the hour grid is keyed by the integer
  * epoch-hour `ts div 3_600_000_000_000` over the normalized
  * nanosecond `ts` (exact integer division in both engines — no
  * timestamp arithmetic, no precision-dependent truncation), and the
  * fill propagates the already-4dp-rounded hourly average, so the
  * forward-filled value is bit-identical wherever it lands.
  */
object Timeseries {

  private val NsPerHour = 3600L * 1000L * 1000L * 1000L

  /** Hourly resample of `avg(value)` per event_type onto the full
    * hour grid between each series' first and last observation,
    * missing hours forward-filled (LOCF) and flagged.
    *
    * Scale shape: one hour-keyed partial→final aggregate over the
    * corpus, a per-series bounded grid explode (`sequence` on the
    * integer hour index — span-sized, not corpus-sized), one
    * co-keyed left join, and a per-series ordered window for the
    * fill. Series count is the parallelism unit: here event_type
    * (bounded), at 100 TB a (station_id, metric) pair — millions of
    * independent partitions, each window sorted locally. Nothing in
    * the plan is corpus-quadratic and the only corpus-sized exchange
    * is the hourly aggregate's.
    */
  def gapFill(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("value").isNotNull)
      // `div`, not `/`: ts exceeds 2^53, so double division could
      // misplace an observation sitting exactly on an hour boundary
      .select(col("event_type"),
        expr(s"ts div ${NsPerHour}L").as("h_idx"),
        col("value"))
    val hourly = ev.groupBy(col("event_type"), col("h_idx"))
      .agg(r4(avg(col("value"))).as("avg_value"),
        count(lit(1)).as("n_obs"))
    val grid = hourly.groupBy(col("event_type"))
      .agg(min(col("h_idx")).as("lo"), max(col("h_idx")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"))).as("h_idx"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("event_type", "h_idx"), "left")
      .select(col("event_type"), col("h_idx"),
        to_date(timestamp_seconds(col("h_idx") * 3600)).as("date"),
        (col("h_idx") % 24).cast("int").as("hr"),
        col("avg_value"),
        last(col("avg_value"), ignoreNulls = true).over(w)
          .as("filled_value"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("avg_value").isNull.as("is_gap"))
  }

  /** Type-2 history from the purchase changelog: one validity
    * interval [valid_from, valid_to) per state change of each
    * user's `value`, ordered by (ts, event_id) — the deterministic
    * total order — with the open current version flagged. Interval
    * bounds stay exact nanosecond longs (the `ts` contract).
    *
    * Scale shape: a single entity-keyed window (lead + row_number
    * share one sort); the changelog shuffles once on the entity key
    * and each entity's history is built locally — the standard
    * CDC-to-dimension compaction, linear at any corpus size.
    */
  def scd2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .select(col("user_id"),
        row_number().over(w).as("version"),
        col("value"),
        col("ts").as("valid_from"),
        lead(col("ts"), 1).over(w).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time dimension lookup: each view event enriched with the
    * purchase-history version valid at its timestamp — the standard
    * "join the fact to the SCD2 dimension as of event time". Same
    * composition as [[AsOf]]: tag, union, ONE entity-keyed window with
    * ignore-nulls `last` — each row shuffles exactly once, vs the
    * interval-join formulation that explodes |facts|×|versions| pairs
    * per entity before filtering. A version's interval includes its
    * start (purchases sort before views at the same instant, matching
    * [valid_from, valid_to) from [[scd2]]).
    */
  def scd2Lookup(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val dim = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(0).as("side"), col("value").as("p_value"))
      .withColumn("p_version", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))).cast("long"))
    val facts = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(1).as("side"), lit(null).cast("double").as("p_value"),
        lit(null).cast("long").as("p_version"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    dim.unionByName(facts)
      .withColumn("asof_value",
        last(col("p_value"), ignoreNulls = true).over(w))
      .withColumn("asof_version",
        last(col("p_version"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id").as("view_id"), col("user_id"),
        col("asof_version"), col("asof_value"))
  }

  /** Rolling-baseline anomaly detection: each observation scored
    * against the mean/stddev of its series' preceding `lookback`
    * observations (the row itself excluded — a spike must not raise
    * its own baseline), flagged when it sits more than `sigmas` away.
    * Rows with fewer than `minBase` history rows are withheld rather
    * than scored against a noisy baseline.
    *
    * Determinism: the flag compares against the 4dp-ROUNDED baseline
    * columns that are also emitted, so the boolean derives from
    * engine-identical inputs. Scale shape: one series-keyed window —
    * the same single shuffle every per-series operator here pays; the
    * frame is row-bounded so state per row is O(lookback).
    */
  def anomalies(s: SparkSession, d: String, lookback: Int = 20,
      minBase: Int = 10, sigmas: Double = 2.0): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-lookback, -1)
    Tables.events(s, d)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"), col("value"),
        r4(avg(col("value")).over(w)).as("base_mean"),
        r4(stddev_samp(col("value")).over(w)).as("base_std"),
        count(col("value")).over(w).as("n_base"))
      .filter(col("n_base") >= minBase)
      .withColumn("is_outlier",
        abs(col("value") - col("base_mean")) >
          col("base_std") * lit(sigmas))
  }

  /** Seasonal-naive forecast backtest — the baseline every real
    * forecasting deployment is graded against (and the honest scope
    * for an engine with no model runtime): per (event_type,
    * hour-of-day) the TRAIN-window mean predicts every TEST cell of
    * that season slot; scored as per-type MAE over the test cells.
    * The 80/20 split day derives from the data's own span in exact
    * integer day arithmetic (regen-proof), and both the per-slot
    * model (types × 24 rows, broadcast back) and the per-cell actuals
    * are single corpus aggregates — training a baseline on 100 TB of
    * telemetry is two groupBys and a grid join, no iteration.
    */
  def forecastBacktest(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        to_date(col("ts_event")).as("date"),
        hour(col("ts_event")).as("hr"), col("value"))
    val span = ev.agg(min(col("date")).as("min_d"),
      max(col("date")).as("max_d"))
      .select(date_add(col("min_d"),
        floor(lit(0.8) * (datediff(col("max_d"), col("min_d")) + 1))
          .cast("int")).as("split_d"))
    val split = ev.crossJoin(broadcast(span))
    val model = split.filter(col("date") < col("split_d"))
      .groupBy(col("event_type"), col("hr"))
      .agg(r4(avg(col("value"))).as("forecast"))
    val actual = split.filter(col("date") >= col("split_d"))
      .groupBy(col("event_type"), col("date"), col("hr"))
      .agg(r4(avg(col("value"))).as("actual"))
    actual.join(broadcast(model), Seq("event_type", "hr"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_test_cells"),
        r4(avg(abs(col("forecast") - col("actual")))).as("mae"))
  }
}
