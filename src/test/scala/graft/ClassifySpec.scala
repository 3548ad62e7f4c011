package graft

import graft.operators.Classify

/** The NB quality filter: hand-computed smoothed log-odds on a planted
  * corpus, the strict-median gate, the empty-document prior fallback,
  * and the approx-threshold scale path.
  */
class ClassifySpec extends SparkSuite {
  import spark.implicits._

  private def plant(rows: Seq[(Long, String, String)]): String = {
    val dir = tmpDir("classify")
    rows.map { case (id, text, lang) =>
      (id, text, lang, "src0", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private def r4d(x: Double) = math.rint((x + 1e-9) * 1e4) / 1e4

  test("scores match hand-computed smoothed log-odds; keep gate is " +
      "strict-above-median") {
    val d = plant(Seq(
      (1L, "good fine", "en"),
      (2L, "good bad", "fr"),
      (3L, "bad bad", "fr")))
    // npos=1, n=3; prior = ln(1.5/2.5); df⁺/df over DISTINCT tokens:
    //   good (1,2): w = ln(1.5/2) − ln(1.5/3) = ln 1.5
    //   fine (1,1): w = ln(1.5/2) − ln(0.5/3) = ln 4.5
    //   bad  (0,2): w = ln(0.5/2) − ln(2.5/3) = ln 0.3
    // doc1 = ln(.6·1.5·4.5) = ln 4.05; doc2 = ln .27; doc3 = ln .18
    // median = doc2's score; strict > keeps only doc1 (doc2 == median)
    val got = Classify.nbQuality(spark, d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getDouble(2),
        r.getBoolean(3)))
    assert(got.toSeq === Seq(
      (1L, true, r4d(math.log(4.05)), true),
      (2L, false, r4d(math.log(0.27)), false),
      (3L, false, r4d(math.log(0.18)), false)))
  }

  test("tokenless document falls back to the prior; degenerate " +
      "all-positive class stays finite") {
    val d = plant(Seq((1L, "x", "en"), (2L, "", "en")))
    // npos=2, n=2: prior = ln(2.5/0.5) = ln 5; w(x) = ln(1.5/3) −
    // ln(0.5/1) = 0 → both docs score ln 5; strict > median keeps none
    val got = Classify.nbQuality(spark, d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq === Seq(
      (1L, r4d(math.log(5.0)), false),
      (2L, r4d(math.log(5.0)), false)))
  }

  test("DSIR weights match hand-computed bigram-LM log ratios; " +
      "top-20% gate; empty doc is NULL/not-kept") {
    val d = plant(Seq(
      (1L, "a a", "en"),
      (2L, "a b", "fr"),
      (3L, "", "en")))
    // bigrams (BOS): doc1 {(<s>,a),(a,a)}, doc2 {(<s>,a),(a,b)}.
    // cr/ct: (<s>,a)=2/1, (a,a)=1/1, (a,b)=1/0; F=3, nraw=4, ntgt=2;
    // denoms: tgt 2+0.5·4=4, raw 4+0.5·4=6.
    val lwSa = math.log(1.5 / 4) - math.log(2.5 / 6)
    val lwAa = math.log(1.5 / 4) - math.log(1.5 / 6)
    val lwAb = math.log(0.5 / 4) - math.log(1.5 / 6)
    val llw1 = r4d((lwSa + lwAa) / 2)
    val llw2 = r4d((lwSa + lwAb) / 2)
    // p80 of {llw2 < llw1} interpolates strictly below llw1: only the
    // target-like doc1 clears the strict gate; empty doc3 has no
    // features → NULL weight, keep=false by the coalesce
    val got = Classify.dsirWeights(spark, d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) null else r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq === Seq(
      (1L, true, llw1, true),
      (2L, false, llw2, false),
      (3L, true, null, false)))
  }

  test("DSIR direction + gate calibration on real data (sf0.001); " +
      "approx-threshold path weighs identically") {
    val d = "/root/testdata/sf0.001"
    val rows = Classify.dsirWeights(spark, d).collect()
      .map(r => (r.getBoolean(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getBoolean(3)))
    val scored = rows.collect { case (c, Some(w), k) => (c, w, k) }
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    val tgt = scored.collect { case (true, w, _) => w }.toSeq
    val raw = scored.collect { case (false, w, _) => w }.toSeq
    assert(tgt.nonEmpty && raw.nonEmpty)
    // target-slice docs must score higher under the target/raw ratio
    assert(mean(tgt) > mean(raw))
    // strict-above-p80 keeps at most 20% and not none
    val kept = scored.count(_._3)
    assert(kept > 0 && kept <= math.ceil(scored.size * 0.2).toInt)
    val approx = Classify
      .dsirWeights(spark, d, exactThreshold = false).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).sortBy(_._1)
    val exact = Classify.dsirWeights(spark, d).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).sortBy(_._1)
    assert(approx.toSeq === exact.toSeq)
  }

  test("approx-threshold scale path scores identically and keeps " +
      "about half (sf0.001)") {
    val d = "/root/testdata/sf0.001"
    val exact = Classify.nbQuality(spark, d)
      .select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val approx = Classify.nbQuality(spark, d, exactThreshold = false)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    assert(approx.map(r => (r._1, r._2)).toMap === exact)
    val kept = approx.count(_._3).toDouble / approx.length
    assert(kept > 0.35 && kept < 0.65, s"kept fraction $kept")
  }
}
