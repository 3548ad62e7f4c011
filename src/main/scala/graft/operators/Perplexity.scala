package graft.operators

import graft.Tables
import graft.functions.Fns._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CCNet-style language-model perplexity filtering — the third leg of
  * the pretraining quality stack next to the heuristic ratios
  * ([[TextOps.textStats]]) and the learned discriminative filter
  * ([[Classify.nbQuality]]): train a small LM on a curated reference
  * slice, score every document by its perplexity under that LM, and
  * bucket the corpus into head / middle / tail tertiles (CCNet keeps
  * head+middle, drops tail).
  *
  * Model: bigram LM with additive (Lidstone, α = ½) smoothing over
  * whitespace tokens, a per-document BOS context, and an unseen-event
  * vocabulary slot:
  * `P(w₂|w₁) = (c(w₁,w₂) + α) / (c(w₁·) + α·(V+1))`,
  * `ppl(doc) = exp(−(1/n) Σ ln P)` rounded to 4 dp (the shared
  * sum-of-doubles contract). Both training and scoring are plain
  * aggregations — closed-form, so the whole train+score+bucket chain
  * is recomputable by the DuckDB oracle (the reason for Lidstone over
  * Kneser–Ney here; the operator seam takes any reference predicate).
  *
  * Scale shape: one explode to (context, word) pairs; the bigram and
  * context count tables are vocabulary²-bounded and stay distributed
  * (never collected or broadcast); scoring is two token-keyed joins —
  * 1:N against single-row count rows, so hot contexts fan out without
  * skewing a build side — then one doc-keyed sum. The vocabulary size
  * and tertile thresholds ride along as broadcast one-row frames. The
  * exact `percentile` tertiles are the oracle-checkable form; at
  * billions of docs pass `exactThresholds = false` for the mergeable
  * `approx_percentile` sketch (the same exact/approx twinning as
  * q_percentiles/_tol).
  */
object Perplexity {

  /** Document start-of-sequence context symbol. Whitespace-split corpus
    * tokens never contain a space, so any multi-char marker that real
    * text is unlikely to produce works; `<s>` is the LM convention.
    */
  val Bos = "<s>"

  /** The curated reference slice: same target-language gate as
    * [[Classify.defaultPositive]] (CCNet trains its LM on Wikipedia in
    * the target language; the synthetic analog is the `en` slice).
    */
  def defaultReference: Column = col("lang") === "en"

  /** Per-document bigram-LM perplexity against the reference slice:
    * (doc_id, ref BOOLEAN — in the training slice, ppl DOUBLE 4 dp,
    * bucket STRING head|middle|tail). Empty documents carry a NULL ppl
    * and land in `tail`.
    */
  def perplexityFilter(s: SparkSession, d: String,
      reference: Column = defaultReference,
      alpha: Double = 0.5,
      exactThresholds: Boolean = true): DataFrame = {
    val docs = Tables.parallelized(Tables.documents(s, d))
    val base = docs.select(col("doc_id"),
      reference.cast("boolean").as("ref"),
      TextOps.tokens(col("text")).as("ts"))
    // bigram stream with BOS: pair i is (ts[i-1] | BOS, ts[i]) — the
    // index-lambda keeps empty docs at zero pairs with no slice guards
    val bi = base.select(col("doc_id"), col("ref"),
      explode(expr(
        s"transform(ts, (w, i) -> struct(" +
          s"CASE WHEN i = 0 THEN '$Bos' ELSE ts[i - 1] END AS w1, " +
          "w AS w2))")).as("bg"))
      .select(col("doc_id"), col("ref"),
        col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val refBi = bi.where(col("ref"))
    val c2 = refBi.groupBy("w1", "w2")
      .agg(count(lit(1)).cast("double").as("c2"))
    val c1 = refBi.groupBy("w1")
      .agg(count(lit(1)).cast("double").as("c1"))
    // +1 vocabulary slot absorbs unseen words (P = α / (α·(V+1)))
    val vocab = refBi.agg(
      countDistinct(col("w2")).cast("double").as("v"))
    val scoredPairs = bi
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        (-log((coalesce(col("c2"), lit(0.0)) + alpha) /
          (coalesce(col("c1"), lit(0.0)) + lit(alpha) * (col("v") + 1.0))))
          .as("nll"))
    val perDoc = scoredPairs.groupBy("doc_id")
      .agg(r4(exp(sum(col("nll")) / count(lit(1)))).as("ppl"))
    val scored = base.select(col("doc_id"), col("ref"))
      .join(perDoc, Seq("doc_id"), "left")
    val thrExpr =
      if (exactThresholds)
        "percentile(ppl, array(0.3333333333333333D, 0.6666666666666666D))"
      else
        "approx_percentile(ppl, array(0.3333333333333333D, 0.6666666666666666D), 10000)"
    val thr = scored.agg(expr(thrExpr).as("t"))
      .select(element_at(col("t"), 1).as("t1"),
        element_at(col("t"), 2).as("t2"))
    scored.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("ref"), col("ppl"),
        when(col("ppl").isNull, lit("tail"))
          .when(col("ppl") <= col("t1"), lit("head"))
          .when(col("ppl") <= col("t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }
}
