package graft

import graft.operators.Perplexity

/** The bigram-LM perplexity filter: hand-computed Lidstone
  * probabilities on a planted corpus, unseen-word/-context smoothing,
  * the tertile bucket edges, empty-document handling, and the
  * approx-threshold scale path.
  */
class PerplexitySpec extends SparkSuite {
  import spark.implicits._

  private def plant(rows: Seq[(Long, String, String)]): String = {
    val dir = tmpDir("ppl")
    rows.map { case (id, text, lang) =>
      (id, text, lang, "src0", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private def r4d(x: Double) = math.rint((x + 1e-9) * 1e4) / 1e4

  test("ppl matches hand-computed smoothed bigram probabilities; " +
      "unseen words and contexts hit the +1 vocabulary slot") {
    val d = plant(Seq(
      (1L, "a b", "en"),
      (2L, "a b", "en"),
      (3L, "a c", "fr")))
    // training bigrams (en): (<s>,a)×2, (a,b)×2 → c1: <s>=2, a=2;
    // V = |{a,b}| = 2, α(V+1) = 1.5
    // doc1/doc2: P(a|<s>) = 2.5/3.5, P(b|a) = 2.5/3.5 → ppl = 7/5
    // doc3: P(a|<s>) = 2.5/3.5, P(c|a) = 0.5/3.5 → ppl = 7/√5
    val expected1 = r4d(3.5 / 2.5)
    val expected3 = r4d(7.0 / math.sqrt(5.0))
    val got = Perplexity.perplexityFilter(spark, d)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getDouble(2),
        r.getString(3)))
    // tertiles over [1.4, 1.4, 3.1305]: t1 = 1.4 (interpolates between
    // the equal first two order stats), t2 = 1.4 + ⅓·(ppl3 − 1.4)
    assert(got.toSeq === Seq(
      (1L, true, expected1, "head"),
      (2L, true, expected1, "head"),
      (3L, false, expected3, "tail")))
  }

  test("a fully-unseen document scores 1/(V+1) per bigram; the empty " +
      "document carries NULL ppl and lands in tail") {
    val d = plant(Seq(
      (1L, "a a", "en"),
      (2L, "z z z", "fr"),
      (3L, "", "fr"),
      (4L, "a z", "fr")))
    // training (en): (<s>,a), (a,a) → c1: <s>=1, a=1; V = 1, α(V+1) = 1
    // doc1: (<s>,a) = 1.5/2, (a,a) = 1.5/2           → ppl = 4/3
    // doc2: (<s>,z) = 0.5/2, (z,z)×2 = 0.5/(0+1)     → ppl ≈ 2.5198
    // doc4: (<s>,a) = 1.5/2, (a,z) = 0.5/2           → ppl ≈ 2.3094
    // tertiles over the three non-null ppls (NULL excluded from the
    // percentile): t1 ≈ 1.9840, t2 ≈ 2.3795 → head / tail / middle
    val p2 = math.pow(0.25 * 0.5 * 0.5, 1.0 / 3)
    val p4 = math.sqrt(0.75 * 0.25)
    val got = Perplexity.perplexityFilter(spark, d)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getString(3)))
    assert(got(0) === ((1L, Some(r4d(4.0 / 3)), "head")))
    assert(got(1) === ((2L, Some(r4d(1.0 / p2)), "tail")))
    assert(got(2) === ((3L, None, "tail")))
    assert(got(3) === ((4L, Some(r4d(1.0 / p4)), "middle")))
  }

  test("persisted-model lifecycle: grown counts serve exactly the " +
      "inline train, batch replay is exactly-once, promotion changes " +
      "nothing") {
    import graft.operators.Perplexity
    import org.apache.spark.sql.functions.col
    val d = sf("sf0.001")
    val model = tmpDir("pplmodel")
    val inline = Perplexity.perplexityFilter(spark, d)
      .collect().map(_.toString).sorted.toSeq
    def served = Perplexity.scoreWithModel(spark, d, model)
      .collect().map(_.toString).sorted.toSeq
    Perplexity.writeModel(spark, d, model,
      docFilter = Some(col("doc_id") % 3 === 0))
    val docs = Tables.documents(spark, d)
    Perplexity.appendBatch(spark, model,
      docs.filter(col("doc_id") % 3 === 1), batchId = 1L)
    Perplexity.appendBatch(spark, model,
      docs.filter(col("doc_id") % 3 === 2), batchId = 2L)
    assert(served === inline, "grown model drifted from inline train")
    // a retried batch overwrites its own dir — no double counting
    Perplexity.appendBatch(spark, model,
      docs.filter(col("doc_id") % 3 === 2), batchId = 2L)
    assert(served === inline, "batch replay double-counted")
    Perplexity.promoteBatches(spark, model)
    assert(!new java.io.File(s"$model/bigrams_batches").exists())
    assert(served === inline, "promotion changed the model")
    // idempotent re-run on a promoted model
    Perplexity.promoteBatches(spark, model)
    assert(served === inline)
  }

  test("LM erasure: tombstoned docs' counts subtract to the survivors' " +
      "from-scratch model; duplicate requests and the compaction " +
      "window cannot double-subtract; compaction folds in") {
    import graft.operators.Perplexity
    import org.apache.spark.sql.functions.col
    val d = sf("sf0.001")
    val survPred = col("doc_id") % 7 =!= 6
    // truth: the full train+score+bucket chain over survivors only
    val survDir = tmpDir("ppl_surv")
    Tables.documents(spark, d).filter(survPred)
      .write.mode("overwrite").parquet(s"$survDir/documents.parquet")
    val want = Perplexity.perplexityFilter(spark, survDir)
      .collect().map(_.toString).sorted.toSeq
    // non-vacuous: erasing the slice must actually move the model
    assert(Perplexity.perplexityFilter(spark, d)
      .filter(survPred).collect().map(_.toString).sorted.toSeq !== want)
    // lifecycle-real: 80% base + committed batch + tombstones at once
    val model = tmpDir("ppl_del")
    val docs = Tables.documents(spark, d)
    Perplexity.writeModel(spark, d, model,
      docFilter = Some(col("doc_id") % 5 =!= 4))
    Perplexity.appendBatch(spark, model,
      docs.filter(col("doc_id") % 5 === 4), batchId = 1L)
    val doomed = docs.filter(col("doc_id") % 7 === 6)
    Perplexity.deleteDocs(spark, model, doomed, batchId = 1L)
    def served = Perplexity.scoreWithModel(spark, d, model,
      docFilter = Some(survPred))
      .collect().map(_.toString).sorted.toSeq
    assert(served === want, "tombstoned model drifted from survivors")
    // a re-sent request in a SECOND live batch subtracts once
    Perplexity.deleteDocs(spark, model, doomed, batchId = 2L)
    assert(served === want, "duplicate erasure double-subtracted")
    Perplexity.compactDeletes(spark, model)
    assert(!new java.io.File(s"$model/tombstones").exists())
    assert(!new java.io.File(s"$model/bigrams_batches").exists())
    assert(served === want, "compaction changed the live counts")
    Perplexity.compactDeletes(spark, model) // idempotent no-op
    assert(served === want)
    // crash-window replay: survivor-adjusted base with the folded
    // delete batches still visible — the persisted watermark (tw = 2)
    // makes them inert
    Perplexity.deleteDocs(spark, model, doomed, batchId = 1L)
    Perplexity.deleteDocs(spark, model, doomed, batchId = 2L)
    assert(served === want, "window replay double-subtracted")
    Perplexity.compactDeletes(spark, model) // recovery retires them
    assert(served === want)
  }

  test("approx-threshold scale path agrees with the exact tertiles " +
      "away from the boundaries") {
    // approx_percentile returns an element of the multiset while the
    // exact path interpolates, so only boundary-adjacent docs may flip
    // buckets — bound the disagreement, same contract as the
    // q_percentiles/_tol twinning
    val d = sf("sf0.001")
    val exact = Perplexity.perplexityFilter(spark, d)
      .select("doc_id", "bucket")
    val approx = Perplexity.perplexityFilter(spark, d,
      exactThresholds = false).select("doc_id", "bucket")
    val n = exact.count()
    val differing = exact.exceptAll(approx).count()
    assert(differing <= math.max(2L, n / 20),
      s"$differing of $n docs changed bucket under the approx path")
  }
}
