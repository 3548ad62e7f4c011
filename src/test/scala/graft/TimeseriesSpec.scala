package graft

import graft.operators.Timeseries
import java.sql.Timestamp

/** Gap-fill resample and SCD2 history on planted changelogs: exact
  * grid coverage, LOCF propagation, boundary placement, interval
  * chaining.
  */
class TimeseriesSpec extends SparkSuite {
  import spark.implicits._

  private def writeEvents(rows: Seq[(Long, String, Long, String,
      java.lang.Double, String)]): String = {
    val d = tmpDir("ts_events")
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts",
        org.apache.spark.sql.functions.to_timestamp($"ts_s"))
      .drop("ts_s")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("gapFill covers the grid, flags gaps, and forward-fills the " +
      "rounded hourly average") {
    // series m: hours 10, 11, 13 observed (12 missing); an extra
    // observation placed EXACTLY on the hour-11 boundary must land in
    // hour 11, and a null value row is excluded entirely
    val d = writeEvents(Seq(
      (1L, "2024-01-01 10:15:00", 1L, "m", Double.box(2.0), "{}"),
      (2L, "2024-01-01 10:45:00", 1L, "m", Double.box(4.0), "{}"),
      (3L, "2024-01-01 11:00:00", 1L, "m", Double.box(7.0), "{}"),
      (4L, "2024-01-01 13:30:00", 1L, "m", Double.box(9.0), "{}"),
      (5L, "2024-01-01 12:10:00", 1L, "m", null, "{}")))
    val got = Timeseries.gapFill(spark, d)
      .orderBy("h_idx")
      .select("hr", "avg_value", "filled_value", "n_obs", "is_gap")
      .collect()
      .map(r => (r.getInt(0),
        Option(r.get(1)).map(_.asInstanceOf[Double]),
        r.getDouble(2), r.getLong(3), r.getBoolean(4)))
    assert(got === Seq(
      (10, Some(3.0), 3.0, 2L, false),
      (11, Some(7.0), 7.0, 1L, false),
      (12, None, 7.0, 0L, true),
      (13, Some(9.0), 9.0, 1L, false)))
  }

  test("gapFill builds independent grids per series") {
    val d = writeEvents(Seq(
      (1L, "2024-01-01 00:30:00", 1L, "a", Double.box(1.0), "{}"),
      (2L, "2024-01-01 02:30:00", 1L, "a", Double.box(2.0), "{}"),
      (3L, "2024-01-02 05:00:00", 1L, "b", Double.box(3.0), "{}")))
    val got = Timeseries.gapFill(spark, d).collect()
    assert(got.count(_.getString(0) == "a") === 3) // hours 0,1,2
    assert(got.count(_.getString(0) == "b") === 1)
    assert(got.filter(_.getString(0) == "a").count(_.getBoolean(7)) === 1)
  }

  test("scd2 chains validity intervals per entity in (ts, event_id) " +
      "order with one open current version") {
    val d = writeEvents(Seq(
      (1L, "2024-01-01 00:00:00", 7L, "purchase", Double.box(10.0), "{}"),
      // same timestamp as event 3: event_id breaks the tie
      (3L, "2024-01-02 00:00:00", 7L, "purchase", Double.box(30.0), "{}"),
      (2L, "2024-01-02 00:00:00", 7L, "purchase", Double.box(20.0), "{}"),
      (4L, "2024-01-03 00:00:00", 8L, "purchase", Double.box(40.0), "{}"),
      (5L, "2024-01-04 00:00:00", 8L, "view", Double.box(99.0), "{}")))
    val got = Timeseries.scd2(spark, d)
      .orderBy("user_id", "version").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
        r.getBoolean(5)))
    assert(got.map(t => (t._1, t._2, t._3, t._6)).toSeq === Seq(
      (7L, 1, 10.0, false), (7L, 2, 20.0, false), (7L, 3, 30.0, true),
      (8L, 1, 40.0, true)))
    // interval chaining: each valid_to equals the next valid_from
    val u7 = got.filter(_._1 == 7L)
    assert(u7(0)._5.get === u7(1)._4)
    assert(u7(1)._5.get === u7(2)._4)
    assert(u7(2)._5.isEmpty)
  }

  test("scd2Lookup resolves each view to the version valid at its " +
      "timestamp, inclusive of the version start") {
    val d = writeEvents(Seq(
      (10L, "2024-01-02 00:00:00", 7L, "purchase", Double.box(1.0), "{}"),
      (11L, "2024-01-04 00:00:00", 7L, "purchase", Double.box(2.0), "{}"),
      (20L, "2024-01-01 00:00:00", 7L, "view", Double.box(0.0), "{}"),
      // exactly at version 1's valid_from: sees version 1
      (21L, "2024-01-02 00:00:00", 7L, "view", Double.box(0.0), "{}"),
      (22L, "2024-01-03 00:00:00", 7L, "view", Double.box(0.0), "{}"),
      (23L, "2024-01-05 00:00:00", 7L, "view", Double.box(0.0), "{}")))
    val got = Timeseries.scd2Lookup(spark, d)
      .orderBy("view_id").collect()
      .map(r => (r.getLong(0),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(got.toSeq === Seq(
      (20L, None, None),
      (21L, Some(1L), Some(1.0)),
      (22L, Some(1L), Some(1.0)),
      (23L, Some(2L), Some(2.0))))
  }

  test("anomalies: a spike is flagged against the preceding-rows " +
      "baseline and early rows are withheld") {
    // 12 stable readings then a spike; lookback window excludes self
    val rows = (1 to 12).map { i =>
      (i.toLong, f"2024-01-01 00:${i}%02d:00", 1L, "m",
        Double.box(10.0 + (i % 2) * 0.2), "{}")
    } :+ (13L, "2024-01-01 00:13:00", 1L, "m", Double.box(50.0), "{}")
    val d = writeEvents(rows)
    val got = Timeseries.anomalies(spark, d, lookback = 20,
      minBase = 10, sigmas = 2.0)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(1), r.getLong(5), r.getBoolean(6)))
    // rows 1..10 have < 10 history rows -> withheld
    assert(got.map(_._1).toSeq === Seq(11L, 12L, 13L))
    assert(got.map(_._3).toSeq === Seq(false, false, true))
  }

  test("coPurchase counts canonical part pairs above support") {
    import graft.operators.Relational
    val d = tmpDir("basket")
    // orders 1..4 contain {A,B}, order 5 {A,B,C}; pair (A,B) support
    // 5, (A,C)/(B,C) support 1; duplicate lines must not double-count
    val li = Seq(
      (1L, 100L), (1L, 200L), (1L, 200L),
      (2L, 100L), (2L, 200L),
      (3L, 200L), (3L, 100L),
      (4L, 100L), (4L, 200L),
      (5L, 100L), (5L, 200L), (5L, 300L))
    li.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val got = Relational.coPurchase(spark, d, minSupport = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((100L, 200L, 5L)))
  }

  test("cdc upsert: presence-marker dispositions, LWW compaction, " +
      "and a NULL-valued change still wins") {
    import graft.operators.Cdc
    val base = Seq((1L, 100.0), (2L, 200.0), (3L, 300.0))
      .toDF("key", "c_acctbal")
    val changes = Seq(
      // key 1: two writers — later ts wins
      (1L, Double.box(10.0), 1000L, 1L),
      (1L, Double.box(11.0), 2000L, 2L),
      // key 2 untouched; key 3 updated to NULL (must still win);
      // key 9 absent from base (insert)
      (3L, null.asInstanceOf[java.lang.Double], 1000L, 3L),
      (9L, Double.box(9.0), 1000L, 4L))
      .toDF("key", "value", "ts", "event_id")
    val got = Cdc.upsert(base, changes, "key", "value",
      Seq("ts", "event_id"))
      .select(org.apache.spark.sql.functions.col("key"),
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("in_change"),
          org.apache.spark.sql.functions.col("new_value"))
          .otherwise(org.apache.spark.sql.functions.col("c_acctbal"))
          .as("v"),
        org.apache.spark.sql.functions.col("in_base"),
        org.apache.spark.sql.functions.col("in_change"))
      .orderBy("key").collect()
      .map(r => (r.getLong(0), Option(r.get(1)),
        !r.isNullAt(2), !r.isNullAt(3)))
    assert(got.toSeq === Seq(
      (1L, Some(11.0), true, true),
      (2L, Some(200.0), true, false),
      (3L, None, true, true),
      (9L, Some(9.0), false, true)))
  }
}
