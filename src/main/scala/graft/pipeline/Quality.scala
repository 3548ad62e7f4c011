package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality gate for observation rows — the reference documents its
  * validation rules (plausible-range checks, humidity bounds, null
  * tolerance) without enforcing them anywhere; here they are a real
  * operator: one pass splits input into (valid, quarantine-with-reasons)
  * so bad rows are preserved for audit instead of silently dropped.
  *
  * Single narrow projection + two filters over the same staged reason
  * column — Catalyst evaluates the rule array once per row; no shuffle.
  */
object Quality {

  /** Rule set: name → violation predicate (true = reject). */
  private def ruleExprs = Seq(
    "missing_timestamp" -> col("timestamp").isNull,
    "temperature_implausible" ->
      (col("temperature_c").isNotNull &&
        (col("temperature_c") < -90 || col("temperature_c") > 60)),
    "humidity_out_of_bounds" ->
      (col("humidity_percent").isNotNull &&
        (col("humidity_percent") < 0 || col("humidity_percent") > 100)),
    "rainfall_negative" ->
      (col("rainfall_mm").isNotNull && col("rainfall_mm") < 0),
    "all_metrics_null" ->
      (col("temperature_c").isNull && col("rainfall_mm").isNull &&
        col("humidity_percent").isNull))

  /** Adds a `quality_violations` array column (empty = clean). */
  def annotate(obs: DataFrame): DataFrame = {
    val reasons = ruleExprs.map { case (name, bad) =>
      when(bad, lit(name))
    }
    obs.withColumn("quality_violations",
      filter(array(reasons: _*), r => r.isNotNull))
  }

  /** (valid rows, quarantined rows with reasons). */
  def split(obs: DataFrame): (DataFrame, DataFrame) = {
    val annotated = annotate(obs)
    (annotated.filter(size(col("quality_violations")) === 0)
      .drop("quality_violations"),
      annotated.filter(size(col("quality_violations")) > 0))
  }

  /** Audit summary: violation counts by rule. */
  def report(obs: DataFrame): DataFrame =
    annotate(obs)
      .select(explode(col("quality_violations")).as("rule"))
      .groupBy(col("rule"))
      .agg(count(lit(1)).as("n_rows"))
}
