package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Pins the binned interval-containment join: exact boundary
  * semantics on a planted fixture, equivalence to the naive
  * nested-loop formulation, invariance to the bucket width (a pure
  * physical knob), and the plan shape the binning exists to buy —
  * an equi-join, never a nested-loop product.
  */
class RangeJoinSpec extends SparkSuite {

  private val NsPerMin = 60L * 1000 * 1000 * 1000

  /** Events fixture written as the TIMESTAMP(MICROS) physical schema
    * via a micros epoch: errors at minutes 0 and 20, purchases at
    * minutes 0 (inclusive start), 25 (covered by both), 30 (exclusive
    * end of w0, inside w1), 50 (end of w1, uncovered), plus one far
    * away. Window = 30 min.
    */
  private def fixtureDir: String = {
    val dir = tmpDir("rangejoin")
    val rows = Seq(
      // (event_id, minute, type)
      (100L, 0L, "error"), (101L, 20L, "error"),
      (200L, 0L, "purchase"), (201L, 25L, "purchase"),
      (202L, 30L, "purchase"), (203L, 50L, "purchase"),
      (204L, 500L, "purchase"))
    import spark.implicits._
    rows.toDF("event_id", "minute", "event_type")
      .withColumn("ts",
        timestamp_micros(col("minute") * (60L * 1000 * 1000)))
      .withColumn("user_id", lit(1L))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value",
        "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("planted fixture: inclusive start, exclusive end, window counts") {
    val dir = fixtureDir
    val got = RangeJoin.errorWindowCoverage(spark, dir)
      .orderBy("purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 200 @0: only w0 (gap 0, start inclusive). 201 @25: w0 (gap 25m)
    // and w1 (gap 5m). 202 @30: w0 ends exactly there (excluded), w1
    // covers (gap 10m). 203 @50: w1 ends exactly there — uncovered,
    // absent. 204: absent.
    assert(got.toSeq === Seq(
      (200L, 1L, 0L),
      (201L, 2L, 5 * NsPerMin),
      (202L, 1L, 10 * NsPerMin)))
  }

  test("matches the naive nested-loop formulation on real data") {
    val dir = sf()
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("ts").as("e_ts"))
    val naive = p.join(e,
        col("e_ts") <= col("p_ts") &&
          col("p_ts") - col("e_ts") < lit(30 * NsPerMin))
      .groupBy("purchase_id")
      .agg(count(lit(1)).as("n_windows"),
        min(col("p_ts") - col("e_ts")).as("min_gap_ns"))
    val binned = RangeJoin.errorWindowCoverage(spark, dir)
    assert(binned.count() > 0)
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
  }

  test("bucket width is a physical knob: results identical across widths") {
    val dir = sf()
    val base = RangeJoin.errorWindowCoverage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    for (mins <- Seq(7L, 90L)) {
      val alt = RangeJoin
        .errorWindowCoverage(spark, dir, bucketNs = mins * NsPerMin)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(alt.toSeq === base.toSeq, s"bucket=${mins}min diverged")
    }
  }

  test("plan is an equi-join on the bucket id, not a nested-loop product") {
    val plan = RangeJoin.errorWindowCoverage(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
