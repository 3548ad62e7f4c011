package graft

import graft.operators.Extras

/** Group-relative winsorization: hand-computed interpolated bounds and
  * clip counts on a planted distribution, including a tie-run group
  * (the case the rounded-threshold contract exists for).
  */
class WinsorizeSpec extends SparkSuite {
  import spark.implicits._

  private def r4d(x: Double) = math.rint((x + 1e-9) * 1e4) / 1e4

  test("clip counts and means match hand-computed p01/p99 bounds") {
    val dir = tmpDir("winsorize")
    // group A: 1..100 → lo = 1.99, hi = 99.01 → one clip each tail;
    // symmetric clipping leaves the mean at exactly 50.5.
    // group B: ten 5.0s + one 50 → lo = 5.0 (tie run), hi = 45.5 →
    // zero low clips, the 50 clipped high.
    val rows =
      (1 to 100).map(v => ("A", v.toDouble)) ++
        (Seq.fill(10)(5.0) :+ 50.0).map(v => ("B", v))
    rows.toDF("l_returnflag", "l_extendedprice")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val got = Extras.winsorize(spark, dir).orderBy("l_returnflag")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq === Seq(
      ("A", 100L, 1L, 1L, 50.5, 50.5),
      ("B", 11L, 0L, 1L, r4d(100.0 / 11), r4d(95.5 / 11))))
  }

  test("RANGE frame: same-day peers included, 30-day boundary " +
      "inclusive at 29 and exclusive at 30, sparse history isolated") {
    import org.apache.spark.sql.functions.{col, expr}
    val dir = tmpDir("rangewin")
    // one customer: two same-day orders (RANGE includes peers — a
    // ROWS frame would not), a day-29 order (day-0 pair still in),
    // a day-30 order (day-0 pair out, day-29 in), a far order alone
    val rows = Seq((1L, 0, 10.0), (2L, 0, 20.0), (3L, 29, 30.0),
      (4L, 30, 40.0), (5L, 100, 50.0))
    rows.toDF("o_orderkey", "day", "o_totalprice")
      .withColumn("o_custkey", expr("7L"))
      .withColumn("o_orderdate",
        expr("timestamp(date_add(date'1970-01-01', day))"))
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    val got = Extras.trailingRevenue(spark, dir).orderBy("o_orderkey")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 30.0, 2L), (2L, 30.0, 2L),
      (3L, 60.0, 3L), (4L, 70.0, 2L), (5L, 50.0, 1L)))
  }

  test("skew profile flags the hot key and reads uniform/constant " +
      "keys as ratio 1") {
    val dir = tmpDir("skewprof")
    // l_orderkey: 60 rows on key 1 + keys 2..41 once each (hot);
    // l_partkey: all distinct (uniform); l_suppkey: constant.
    val rows = (0 until 100).map { i =>
      val ok = if (i < 60) 1L else (i - 58).toLong
      (ok, i.toLong, 7L)
    }
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val got = Extras.skewProfile(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6))).toMap
    // orderkey: p99 of {60} ∪ {1}×40 interpolates 1 + .6·59 = 36.4;
    // mean 100/41 → ratio 36.4·41/100 = 14.924
    assert(got("l_orderkey") ===
      ((100L, 41L, 60L, 0.6, 36.4, r4d(36.4 * 41 / 100))))
    assert(got("l_partkey") === ((100L, 100L, 1L, 0.01, 1.0, 1.0)))
    assert(got("l_suppkey") === ((100L, 1L, 100L, 1.0, 100.0, 1.0)))
  }
}
