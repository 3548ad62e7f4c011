package graft.operators

import graft.functions.Fns._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's central query pattern: a three-level hierarchical
  * re-aggregation hour → day → month used to deduplicate repeated
  * observations (SURVEY.md §2.4 A2–A7; clickhouse_etl.py:309-334,
  * 372-411, 472-573 — behavior only).
  *
  * Semantics replicated exactly for oracle parity (SURVEY §8.1):
  *  - daily avg  = UNWEIGHTED avg of hourly avgs (not a per-row mean);
  *  - daily sum  = sum of hourly MAXes (the dedup trick);
  *  - monthly    = the same fold repeated over days;
  *  - `WHERE value IS NOT NULL` gates every level (§8.7 analog).
  *
  * Scale notes: each level is a hash aggregate with map-side partial
  * aggregation; the hour level reduces cardinality by orders of magnitude
  * before any further shuffle, so the day/month levels are nearly free.
  * At 100 TB the only heavy exchange is the first groupBy(date, hour) —
  * that shuffle key is fine-grained (date×hour) and therefore skew-safe.
  * Filters and the two-column projection push down to the parquet scan.
  */
object Hierarchy {

  /** A2 analog — hourly dedup-aggregate over the `events` stream table. */
  def hourly(events: DataFrame): DataFrame =
    events
      .filter(col("value").isNotNull)
      .groupBy(
        to_date(col("ts_event")).as("date"),
        hour(col("ts_event")).as("hr"))
      .agg(
        avg(col("value")).as("avg_value"),
        max(col("value")).as("max_value"),
        min(col("value")).as("min_value"),
        count(lit(1)).as("n_obs"))

  /** A3 analog — daily rollup over the hourly aggregate (avg-of-avgs). */
  def daily(events: DataFrame): DataFrame =
    hourly(events)
      .groupBy(col("date"))
      .agg(
        avg(col("avg_value")).as("avg_value"),
        sum(col("max_value")).as("sum_hourly_max"),
        max(col("max_value")).as("max_value"),
        min(col("min_value")).as("min_value"),
        sum(col("n_obs")).as("n_obs"))

  /** A4 analog — monthly rollup over the daily rollup (3-level nest). */
  def monthly(events: DataFrame): DataFrame =
    daily(events)
      .groupBy(
        year(col("date")).as("yr"),
        month(col("date")).as("mon"))
      .agg(
        avg(col("avg_value")).as("avg_value"),
        sum(col("sum_hourly_max")).as("sum_hourly_max"),
        max(col("max_value")).as("max_value"),
        min(col("min_value")).as("min_value"),
        sum(col("n_obs")).as("n_obs"))

  /** A5/T1 analog — latest-N daily rows, capped metric at read time only
    * (SURVEY §8.3). Spark plans TakeOrderedAndProject: a true distributed
    * top-k, no full sort, no single-partition shuffle.
    */
  def dailyTopK(events: DataFrame, days: Int): DataFrame =
    daily(events)
      .withColumn("avg_value_capped", capHumidity(col("avg_value")))
      .orderBy(col("date").desc)
      .limit(days)

  /** A6/T2 analog — latest-N monthly rows with the read-time cap. */
  def monthlyTopK(events: DataFrame, months: Int): DataFrame =
    monthly(events)
      .withColumn("avg_value_capped", capHumidity(col("avg_value")))
      .orderBy(col("yr").desc, col("mon").desc)
      .limit(months)

  /** A7 analog — grand averages over the monthly rows, replicating the
    * reference's Python-truthy filter (drops 0.0; SURVEY §8.2). The
    * denominator quirk matters: the truthy-filtered SUM is divided by the
    * FULL month count (`total_temp / len(monthly_data)`,
    * redis_etl.py:32-38, dashboard.py:1109-1115) — NOT by the truthy
    * count — so a month whose average is 0.0 still dilutes the overall
    * average. The total accumulates in DECIMAL(18,6) so the value is
    * bit-identical across engines before display rounding.
    *
    * `latestMonths` restricts the scope to the most recent N monthly
    * rows (the reference always windows: 12 for the cache path,
    * redis_etl.py:22; 13 for the dashboard fallback, dashboard.py:1107);
    * None keeps the deliberate all-months generalization.
    */
  def grandAverages(events: DataFrame,
      latestMonths: Option[Int] = None): DataFrame = {
    val all = monthly(events)
    val scoped = latestMonths
      .map(n => all.orderBy(col("yr").desc, col("mon").desc).limit(n))
      .getOrElse(all)
    scoped.agg(
      (sum(when(truthy(col("avg_value")), col("avg_value"))) /
        count(lit(1))).as("overall_avg_value"),
      dsum(col("sum_hourly_max")).as("total_sum"),
      avg(col("max_value")).as("overall_avg_max"),
      sum(col("n_obs")).as("total_obs"),
      count(lit(1)).as("period_months"))
  }

  /** The hand-rolled hour→day→month nest as a NATIVE grouping-set
    * rollup over (year, month, date, hour) — the summarization form the
    * engine offers alongside the faithful avg-of-avgs chain (SURVEY
    * §2.4 note): one pass, four summary levels, additive aggregates
    * only (sums/counts/extrema compose across levels; the reference's
    * unweighted avg-of-avgs deliberately does not, which is why both
    * forms exist).
    */
  def timeRollup(events: DataFrame): DataFrame =
    events
      .filter(col("value").isNotNull)
      .select(
        year(col("ts_event")).as("yr"),
        month(col("ts_event")).as("mon"),
        to_date(col("ts_event")).as("date"),
        hour(col("ts_event")).as("hr"),
        col("value"))
      .rollup(col("yr"), col("mon"), col("date"), col("hr"))
      .agg(
        graft.functions.Fns.dsum(col("value")).as("sum_value"),
        max(col("value")).as("max_value"),
        min(col("value")).as("min_value"),
        count(lit(1)).as("n_obs"))

  /** T4/S10 analog — latest-record argmax, deterministic via id tiebreak. */
  def latestRecord(events: DataFrame): DataFrame =
    events
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(1)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
}
