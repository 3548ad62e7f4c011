package graft

import graft.operators.Hierarchy
import org.apache.spark.sql.functions._

/** Invariants of the 3-level rollup (SURVEY §2.4, §8.1): avg-of-avgs
  * semantics (and its deliberate divergence from the weighted mean),
  * count conservation, sum conservation, dedup idempotence (ST5).
  */
class HierarchySpec extends SparkSuite {
  import spark.implicits._

  // two hours with very different observation counts → avg-of-avgs
  // diverges from the per-row mean, exactly like the reference
  private lazy val skewed = Seq(
    ("2026-08-01T10:00:00", 10.0), ("2026-08-01T10:30:00", 10.0),
    ("2026-08-01T10:40:00", 10.0), ("2026-08-01T10:50:00", 10.0),
    ("2026-08-01T11:00:00", 30.0))
    .toDF("t", "value")
    .select(col("t").cast("timestamp").as("ts_event"), col("value"),
      lit(1L).as("event_id"), lit(0L).as("ts"))

  test("daily avg is the UNWEIGHTED avg of hourly avgs") {
    val daily = Hierarchy.daily(skewed).collect().head
    // hourly avgs: 10.0 (4 obs) and 30.0 (1 obs) → unweighted avg = 20
    assert(daily.getAs[Double]("avg_value") === 20.0)
    // the weighted per-row mean would be 14.0 — must NOT match
    assert(daily.getAs[Double]("avg_value") !== 14.0)
    assert(daily.getAs[Long]("n_obs") === 5L)
  }

  test("counts and hourly-max sums are conserved up the hierarchy") {
    val ev = Tables.events(spark, sf())
    val hourly = Hierarchy.hourly(ev)
    val daily = Hierarchy.daily(ev)
    val monthly = Hierarchy.monthly(ev)
    val nHourly = hourly.agg(sum("n_obs")).collect().head.getLong(0)
    val nDaily = daily.agg(sum("n_obs")).collect().head.getLong(0)
    val nMonthly = monthly.agg(sum("n_obs")).collect().head.getLong(0)
    assert(nHourly === nDaily && nDaily === nMonthly)
    val sumHourlyMax =
      hourly.agg(sum("max_value")).collect().head.getDouble(0)
    val sumMonthly =
      monthly.agg(sum("sum_hourly_max")).collect().head.getDouble(0)
    assert(math.abs(sumHourlyMax - sumMonthly) < 1e-6)
  }

  test("min <= avg-of-avgs <= max per month") {
    Hierarchy.monthly(Tables.events(spark, sf())).collect().foreach { r =>
      val (mn, av, mx) = (r.getAs[Double]("min_value"),
        r.getAs[Double]("avg_value"), r.getAs[Double]("max_value"))
      assert(mn <= av && av <= mx)
    }
  }

  test("hourly aggregate masks exact duplicates (ST5 semantics)") {
    val once = skewed
    val twice = skewed.union(skewed)
    val a = Hierarchy.hourly(once)
      .select("date", "hr", "avg_value", "max_value", "min_value")
      .collect().toSet
    val b = Hierarchy.hourly(twice)
      .select("date", "hr", "avg_value", "max_value", "min_value")
      .collect().toSet
    assert(a === b) // metric values unchanged; only n_obs inflates
  }

  test("dailyTopK returns the latest N days, capped at read time") {
    val topk = Hierarchy.dailyTopK(Tables.events(spark, sf()), 5).collect()
    assert(topk.length === 5)
    val dates = topk.map(_.getAs[java.sql.Date]("date").toString).toSeq
    assert(dates === dates.sorted.reverse)
    topk.foreach { r =>
      val capped = r.getAs[Double]("avg_value_capped")
      assert(capped <= 100.0 || r.getAs[Double]("avg_value") <= 0)
    }
  }
}
