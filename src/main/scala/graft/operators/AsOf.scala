package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join — for each left row, the most recent
  * right row with the same key and `rightTs <= leftTs`.
  *
  * Built by composition (the preference order's option (a)): tag both
  * sides, UNION, one window per key ordered by (ts, side, id) with
  * `last(value, ignoreNulls)` over the preceding frame, keep left rows.
  * This shuffles each row exactly once on the key — the scale-correct
  * plan. The naive range-join alternative explodes to |left|×|right|
  * pairs per key before filtering; a custom SparkPlan would only
  * replicate what this composition already gets from the built-in
  * window operator.
  */
object AsOf {

  /** Purchases matched to the latest preceding click of the same user
    * (within the events table). Ordering uses the raw nanosecond long
    * so tie semantics are identical across engines; clicks sort before
    * purchases at the same instant (<= semantics).
    */
  def purchaseAsOfClick(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(0).as("side"), col("value").as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(1).as("side"), lit(null).cast("double").as("click_value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    clicks.unionByName(purchases)
      .withColumn("asof_click_value",
        last(col("click_value"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("asof_click_value"))
  }
}
