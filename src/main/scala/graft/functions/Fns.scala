package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable scalar column functions — the reference's entire UDF surface
  * (SURVEY.md §2.3 F1–F15) expressed as codegen'd built-in column
  * expressions. Batch and streaming tiers share these so semantics are
  * identical everywhere. Zero Scala UDFs: every function stays inside
  * whole-stage codegen.
  *
  * Reference provenance (behavior only, no code copied):
  *  - kelvinToC:   mongodb_etl.py:41, clickhouse_etl.py:219-221
  *  - metersToMm:  mongodb_etl.py:48, clickhouse_etl.py:224-227
  *  - fToC / cToF: mongodb_etl.py:64 / dashboard.py:1092,1117
  *  - capHumidity: clickhouse_etl.py:520,566 (read-time only, SURVEY §8.3)
  *  - midpoint:    clickhouse_etl.py:143-152
  *  - urlTail:     clickhouse_etl.py:238
  *  - synthKey:    clickhouse_etl.py:241
  *  - truthy:      redis_etl.py:32-34 (SURVEY §8.2 — drops 0.0, keeps null
  *                 checks inconsistent by design)
  */
object Fns {

  /** F1: Kelvin→Celsius iff the value "looks like" Kelvin (>100). */
  def kelvinToC(c: Column): Column =
    when(c > 100, c - 273.15).otherwise(c)

  /** F2: meters→millimeters iff the value "looks like" meters (<1). */
  def metersToMm(c: Column): Column =
    when(c < 1, c * 1000).otherwise(c)

  /** F3: Fahrenheit→Celsius. */
  def fToC(c: Column): Column = (c - lit(32)) * lit(5) / lit(9)

  /** F4: Celsius→Fahrenheit. */
  def cToF(c: Column): Column = c * lit(9) / lit(5) + lit(32)

  /** F5: humidity cap — `min(x,100)` only when positive, else passthrough. */
  def capHumidity(c: Column): Column =
    when(c.isNotNull && c > 0, least(c, lit(100.0))).otherwise(c)

  /** F12: midpoint of max/min with null fallback to whichever exists. */
  def midpoint(mx: Column, mn: Column): Column =
    coalesce((mx + mn) / 2, mx, mn)

  /** F8: last path segment of a URL-ish string ("a/b/c" → "c"). */
  def urlTail(c: Column): Column = element_at(split(c, "/"), -1)

  /** F9: synthetic `{id}_{epochSeconds}` key. */
  def synthKey(id: Column, ts: Column): Column =
    concat_ws("_", id, unix_timestamp(ts).cast("long"))

  /** P9: Python-truthy predicate — non-null AND non-zero. */
  def truthy(c: Column): Column = c.isNotNull && c =!= 0

  /** F15 (complete): integer display rounding — the dashboard's
    * `Math.round` tier (dashboard.py:668,678-679,686,691) — with the
    * same half-boundary nudge as [[r4]] so both engines round exact
    * .5 display values identically.
    */
  def displayRound(c: Column): Column =
    round(c + lit(1e-9), 0).cast("long")

  /** F15: the dashboard's `±8°F` high/low estimate around the overall
    * average (dashboard.py:678-679 — "Estimate high/low (could be
    * improved with actual min/max)"); ported verbatim as the display
    * envelope, quirk included.
    */
  def hiEstimate(tempF: Column): Column = displayRound(tempF + lit(8))
  def loEstimate(tempF: Column): Column = displayRound(tempF - lit(8))

  /** Round a double aggregate for deterministic cross-engine comparison.
    * Summation order differs between engines (and between Spark
    * partition layouts), drifting results by ~1e-15 relative — and
    * discrete decimal inputs regularly produce EXACT half-boundaries at
    * 4 dp (e.g. avg of 2-dp values over a power-of-two group size), so
    * plain round() flips the last digit depending on which side of the
    * boundary each engine's sum lands. The 1e-9 nudge (applied
    * identically in the SQL oracles — see SparkEntry.oracleSql) moves
    * every half-boundary case deterministically up: far larger than the
    * fp drift, far smaller than data resolution.
    */
  def r4(c: Column): Column = round(c + lit(1e-9), 4)
  def r2(c: Column): Column = round(c + lit(1e-9), 2)

  /** Exact order-independent money sum: accumulate in DECIMAL(18,6)
    * (exact integers underneath, immune to summation-order fp drift),
    * then emit as double — both engines produce the nearest double of
    * the same exact decimal. Map-side partial aggregation still applies;
    * decimal sums stay inside whole-stage codegen.
    */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,6)")).cast("double")
}
