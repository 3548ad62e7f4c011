package graft

import graft.operators.{Extras, Similarity}
import org.apache.spark.sql.functions._

/** Hand-computed pins for the wave-7 statistics/mining operators:
  * chi-square independence, the rule-validation report, per-group
  * Space-Saving, and hard-negative mining.
  */
class StatsSpec extends SparkSuite {
  import spark.implicits._

  test("chi-square: hand-computed 2x2 grid including an EMPTY cell " +
      "contributes its full expected count") {
    val dir = tmpDir("chi2")
    // A: 10 en, 0 fr; B: 5 en, 5 fr — the (A, fr) cell exists only in
    // the crossed-margin grid. E(A,en)=7.5 E(A,fr)=2.5 E(B,en)=7.5
    // E(B,fr)=2.5 → chi2 = 2.5²/7.5 + 2.5 + 2.5²/7.5 + 2.5 = 6.6667
    val rows = (1 to 10).map(i => (i.toLong, s"t$i", "en", "A")) ++
      (11 to 15).map(i => (i.toLong, s"t$i", "en", "B")) ++
      (16 to 20).map(i => (i.toLong, s"t$i", "fr", "B"))
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = Extras.chiSquare(spark, dir).collect().head
    assert(got.getLong(0) === 20L)
    assert(got.getLong(1) === 2L)
    assert(got.getLong(2) === 2L)
    assert(got.getLong(3) === 1L)
    assert(got.getDouble(4) === 6.6667)
  }

  test("chi-square: an independent grid scores zero") {
    val dir = tmpDir("chi2ind")
    // both sources have the identical 2:1 lang mix → O == E everywhere
    val rows = (1 to 10).map(i => (i.toLong, "t", "en", "A")) ++
      (11 to 15).map(i => (i.toLong, "t", "fr", "A")) ++
      (16 to 25).map(i => (i.toLong, "t", "en", "B")) ++
      (26 to 30).map(i => (i.toLong, "t", "fr", "B"))
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", lit(1L))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    assert(Extras.chiSquare(spark, dir).collect().head
      .getDouble(4) === 0.0)
  }

  test("validation report: each planted violation counted once, clean " +
      "rules emit explicit zero rows") {
    val dir = tmpDir("validate")
    val base = Seq(
      // clean rows
      (1L, "click", 10.0, """{"k": 5}"""),
      (2L, "view", 20.0, """{"k": 50}"""),
      // violations
      (3L, "click", 500.0, """{"k": 5}"""),    // value_implausible
      (4L, "bogus", 10.0, """{"k": 5}"""),     // unknown_event_type
      (5L, "view", 10.0, """{"k": 95}"""),     // props_k_out_of_range
      (6L, "error", 420.0, """{"k": 5}"""))    // error_with_high_value
    base.toDF("event_id", "event_type", "value", "props")
      .withColumn("ts", expr("timestamp'2024-01-01 00:00:00'"))
      .withColumn("user_id", lit(1L))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = Extras.validateEvents(spark, dir).orderBy("rule")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(
      ("error_with_high_value", 1L), ("missing_value", 0L),
      ("negative_value", 0L), ("props_k_out_of_range", 1L),
      ("unknown_event_type", 1L), ("value_implausible", 1L)))
  }

  test("per-group heavy hitters: guarantees hold against each group's " +
      "own n; the two groups sketch independently") {
    val dir = tmpDir("hhgrp")
    // group 'click': event_ids with digit-lengths 1 (x6), 2 (x3),
    // 3 (x1); group 'view': lengths 3 (x5), 1 (x2)
    val ids = Seq.fill(6)(5L) ++ Seq.fill(3)(50L) ++ Seq.fill(1)(500L)
    val vids = Seq.fill(5)(700L) ++ Seq.fill(2)(7L)
    val rows = ids.map(i => (i, "click")) ++ vids.map(i => (i, "view"))
    rows.toDF("event_id", "event_type")
      .withColumn("ts", expr("timestamp'2024-01-01 00:00:00'"))
      .withColumn("user_id", lit(1L))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .coalesce(2).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = Extras.heavyHittersGrouped(spark, dir, m = 2, k = 2)
      .orderBy("grp", "key")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4)))
    assert(got.toSeq === Seq(
      ("click", "1", 6L, true, true), ("click", "2", 3L, true, true),
      ("view", "1", 2L, true, true), ("view", "3", 5L, true, true)))
  }

  test("seasonal-naive backtest: hand-computed split day, slot mean " +
      "and per-type MAE") {
    val dir = tmpDir("forecast")
    // 10 days, one type, hour 0 only: split = min + floor(0.8*10) =
    // day 8 → train days 0..7 (values 1..8, mean 4.5), test day 8
    // (actual 10) and day 9 (actual 2) → MAE = (5.5 + 2.5)/2 = 4.0
    val rows = (0 to 7).map(i => (i.toLong, i, (i + 1).toDouble)) ++
      Seq((8L, 8, 10.0), (9L, 9, 2.0))
    rows.toDF("event_id", "day", "value")
      .withColumn("ts", expr(
        "timestamp'2024-03-01 00:30:00' + make_interval(0,0,0,day)"))
      .withColumn("event_type", lit("click"))
      .withColumn("user_id", lit(1L))
      .withColumn("props", lit("{}"))
      .drop("day")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = graft.operators.Timeseries.forecastBacktest(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq(("click", 2L, 4.0)))
  }

  test("key discovery: planted duplicate breaks the key; FD holds " +
      "exactly when the RHS is constant per LHS value") {
    val dir = tmpDir("keydisc")
    Seq((1L, 10L, "P1"), (2L, 10L, "P1"), (3L, 20L, "P2"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_totalprice", lit(1.0))
      .withColumn("o_orderdate", expr("timestamp'2024-01-01'"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    // lineitem: (1,1) appears twice → composite key fails;
    // l_orderkey→l_suppkey broken by order 1 having suppliers 7 and 8
    Seq((1L, 1L, 7L), (1L, 1L, 8L), (2L, 1L, 7L))
      .toDF("l_orderkey", "l_linenumber", "l_suppkey")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    Seq((0L, "A", 0L), (1L, "B", 0L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/nation.parquet")
    Seq((1L, "p"), (2L, "q")).toDF("p_partkey", "p_name")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/part.parquet")
    val got = Extras.keyDiscovery(spark, dir).orderBy("chk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(got.toSeq === Seq(
      ("fd:lineitem.l_orderkey->l_suppkey", 2L, 3L, false),
      ("fd:nation.n_nationkey->n_regionkey", 2L, 2L, true),
      ("fd:orders.o_custkey->o_orderpriority", 2L, 2L, true),
      ("key:lineitem.(l_orderkey,l_linenumber)", 3L, 2L, false),
      ("key:orders.o_custkey", 3L, 2L, false),
      ("key:orders.o_orderkey", 3L, 3L, true),
      ("key:part.p_partkey", 2L, 2L, true)))
  }

  test("temperature mixing: hand-computed two-source smoothing — tail " +
      "source upweighted, head downweighted, shares sum to one") {
    def r4d(x: Double) = math.rint((x + 1e-9) * 1e4) / 1e4
    val dir = tmpDir("tempmix")
    val rows = (1 to 80).map(i => (i.toLong, "t", "en", "big")) ++
      (81 to 100).map(i => (i.toLong, "t", "en", "small"))
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", lit(1L))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = graft.operators.Sampling.temperatureMix(spark, dir)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    val pa = Seq(0.8, 0.2).map(p => math.pow(p, 0.3))
    val z = pa.sum
    assert(got.toSeq === Seq(
      ("big", 80L, 0.8, r4d(pa(0) / z), r4d(pa(0) / z * 100),
        r4d(pa(0) / z / 0.8)),
      ("small", 20L, 0.2, r4d(pa(1) / z), r4d(pa(1) / z * 100),
        r4d(pa(1) / z / 0.2))))
    // the smoothing direction: tail boosted above its raw share
    assert(got(1)._4 > 0.2 && got(0)._4 < 0.8)
  }

  test("equi-depth histogram: uniform 1..100 fixture yields ten bins " +
      "of exactly ten rows with interpolated decile bounds") {
    val dir = tmpDir("histo")
    (1 to 100).map(i => i.toDouble).toDF("l_extendedprice")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val got = Extras.histogram(spark, dir).orderBy("bin_idx").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3)))
    assert(got.map(_._4).toSeq === Seq.fill(10)(10L))
    assert(got.head._2 === 1.0)
    assert(got.last._3 === 100.0)
    // interpolated decile: q=0.1 over 1..100 → 1 + 99·0.1 = 10.9
    assert(got.head._3 === 10.9)
  }

  test("PMI collocations: hand-computed planted pair; support floor " +
      "suppresses rare pairs") {
    def r4d(x: Double) = math.rint((x + 1e-9) * 1e4) / 1e4
    val dir = tmpDir("colloc")
    // five "p q" docs plant the pair (cab=5, at the floor); ten "r"
    // singletons dilute the unigram mass; one "s t" stays below the
    // floor. N=22 tokens, M=6 bigrams.
    // PMI(p,q) = ln((5/6)/((5/22)(5/22)))
    val rows = (1 to 5).map(i => (i.toLong, "p q")) ++
      (6 to 15).map(i => (i.toLong, "r")) ++ Seq((16L, "s t"))
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextOps.collocations(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    val expected = r4d(math.log((5.0 / 6) / ((5.0 / 22) * (5.0 / 22))))
    assert(got.toSeq === Seq(("p", "q", 5L, expected)))
  }

  test("sliding windows: each event lands in exactly its two " +
      "overlapping windows") {
    val dir = tmpDir("sliding")
    Seq((1L, "2024-05-01 10:30:00", 6.0),
      (2L, "2024-05-01 11:30:00", 10.0))
      .toDF("event_id", "tss", "value")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      .withColumn("user_id", lit(1L))
      .withColumn("event_type", lit("click"))
      .withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = Extras.slidingWindows(spark, dir).orderBy("hr")
      .collect()
      .map(r => (r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4)))
    assert(got.toSeq === Seq((9, 6.0, 6.0, 1L), (10, 8.0, 10.0, 2L),
      (11, 10.0, 10.0, 1L)))
  }

  test("variant path: typed extraction matches the string path; a " +
      "missing key groups under null") {
    val dir = tmpDir("variant")
    Seq((1L, """{"k": 7}""", 10.0), (2L, """{"k": 7}""", 30.0),
      (3L, """{"other": 1}""", 50.0))
      .toDF("event_id", "props", "value")
      .withColumn("ts", expr("timestamp'2024-01-01 00:00:00'"))
      .withColumn("user_id", lit(1L))
      .withColumn("event_type", lit("click"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = Extras.variantExtract(spark, dir).orderBy("k").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)),
        r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((None, 1L, 50.0), (Some(7), 2L, 20.0)))
    // cross-path parity on real data: variant ≡ get_json_object
    val v = Extras.variantExtract(spark, sf()).collect()
      .map(_.toString).toSet
    val s2 = graft.operators.Relational.jsonExtract(spark, sf())
      .collect().map(_.toString).toSet
    assert(v === s2)
  }

  test("hard negatives: same-label vectors never surface even when " +
      "most similar; ranking is by cosine among other-label only") {
    val dir = tmpDir("hardneg")
    val rows = Seq(
      (0L, Seq(1f, 0f), 0),   // probe, label 0
      (1L, Seq(1f, 0.01f), 0), // same label, near-identical: excluded
      (2L, Seq(1f, 0.2f), 1),  // hard negative (closest other-label)
      (3L, Seq(0f, 1f), 1),    // easy negative
      (4L, Seq(1f, 0.1f), 2))  // hard negative, different label again
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val got = Similarity.hardNegatives(spark, dir, nQueries = 1, k = 3)
      .orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(got.toSeq === Seq((0L, 4L, 1), (0L, 2L, 2), (0L, 3L, 3)))
  }
}
