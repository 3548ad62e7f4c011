package graft.operators

import graft.Tables
import graft.functions.Fns._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Learned document-quality classification — the "model-based filter"
  * stage of a pretraining pipeline (GPT-3/LLaMA-style: score every
  * crawl document by its likeness to a curated reference slice, keep
  * the top scorers). Complements the HEURISTIC quality signals
  * ([[TextOps.textStats]] ratios, [[TextOps.langId]]): here the
  * signal is learned from the corpus itself.
  *
  * Model: Bernoulli Naive Bayes over distinct document tokens, trained
  * and applied ENTIRELY in-engine — both passes are plain aggregations,
  * so there is no driver-side fit, no model object to ship, and the
  * whole thing is closed-form recomputable by the DuckDB oracle
  * (unlike an SGD-fit linear model, which would need pinned goldens).
  * Per-token log-odds with add-half Laplace smoothing:
  * `w_t = ln((df⁺_t + ½)/(n⁺ + 1)) − ln((df⁻_t + ½)/(n⁻ + 1))`,
  * `score(doc) = ln((n⁺ + ½)/(n⁻ + ½)) + Σ_{t ∈ distinct(doc)} w_t`,
  * rounded to 4 dp (the sum-of-doubles determinism contract shared
  * with the BM25 scorer). The gate is quantile-based, the production
  * shape ("keep the top half by classifier score"), not a fixed zero
  * threshold: `keep = score > median(score)` — computed on the ROUNDED
  * scores, whose cross-engine hash-stability makes the boolean exactly
  * reproducible too.
  *
  * Scale shape: one explode → two token-keyed hash aggregates (the
  * vocab-sized weights table stays distributed; it is never collected
  * or broadcast) → one token-keyed join back onto (doc, token) pairs —
  * 1:N against single-row weights, so hot stopword tokens fan out
  * without skewing a build side — → one doc-keyed sum. The class
  * totals ride along as a broadcast one-row frame. The only
  * corpus-cardinality aggregate is the threshold: the default EXACT
  * median buffers the per-doc score frame into one aggregator and is
  * the oracle-checkable form; at billions of docs pass
  * `exactThreshold = false` to gate on `approx_percentile` instead
  * (mergeable sketch, bounded state — the same exact/approx twinning
  * as the q_percentiles/_tol pair).
  */
object Classify {

  /** The curated reference slice on the synthetic testdata: documents
    * in the pipeline's target language (the C4-style keep-language
    * gate, here learned from tokens rather than asserted).
    */
  def defaultPositive: Column = col("lang") === "en"

  /** Per-document NB quality scores:
    * (doc_id, curated BOOLEAN — the training label, score DOUBLE 4 dp,
    * keep BOOLEAN — score above the corpus median). Self-trained on
    * `d`'s documents against the `positive` predicate.
    */
  def nbQuality(s: SparkSession, d: String,
      positive: Column = defaultPositive,
      exactThreshold: Boolean = true): DataFrame = {
    val docs = Tables.parallelized(Tables.documents(s, d))
    val labeled = docs.select(col("doc_id"),
      positive.cast("boolean").as("pos"),
      TextOps.tokens(col("text")).as("ts"))
    // distinct (doc, token) pairs — Bernoulli NB counts document
    // frequency, not term frequency
    val docTokens = labeled.select(col("doc_id"), col("pos"),
      explode(array_distinct(col("ts"))).as("token"))
    val cls = labeled.agg(
      sum(when(col("pos"), 1L).otherwise(0L)).cast("double").as("npos"),
      count(lit(1)).cast("double").as("n"))
    val weights = docTokens.groupBy("token")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).cast("double")
        .as("dfpos"),
        count(lit(1)).cast("double").as("dfall"))
      .crossJoin(broadcast(cls))
      .select(col("token"),
        (log((col("dfpos") + 0.5) / (col("npos") + 1.0)) -
          log((col("dfall") - col("dfpos") + 0.5) /
            (col("n") - col("npos") + 1.0))).as("w"))
    val sums = docTokens.join(weights, "token")
      .groupBy("doc_id").agg(sum("w").as("sumw"))
    val scored = labeled.select(col("doc_id"), col("pos"))
      .join(sums, Seq("doc_id"), "left")
      .crossJoin(broadcast(cls))
      .select(col("doc_id"), col("pos").as("curated"),
        r4(log((col("npos") + 0.5) / (col("n") - col("npos") + 0.5)) +
          coalesce(col("sumw"), lit(0.0d))).as("score"))
    val thr =
      if (exactThreshold)
        scored.agg(expr("percentile(score, 0.5)").as("thr"))
      else
        scored.agg(expr("approx_percentile(score, 0.5, 10000)").as("thr"))
    scored.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("curated"), col("score"),
        (col("score") > col("thr")).as("keep"))
  }

  /** The production keep decision: majority vote of the three quality
    * signals — heuristic (stopword ratio ≤ 0.12 on the rounded value,
    * ≥ 5 tokens), the learned NB gate, and the perplexity filter
    * (bucket ≠ tail). Each leg is the exact oracle-pinned operator, so
    * the composed decision carries one full cross-engine oracle too —
    * the ensemble is where the filters earn their keep together
    * (papers consistently find the union beats any single gate).
    * Scale shape: three independent doc-keyed frames joined on doc_id
    * — the legs pipeline in parallel, and the joins reuse one
    * partitioning.
    */
  def qualityEnsemble(s: SparkSession, d: String): DataFrame = {
    val heur = TextOps.textStats(s, d).select(col("doc_id"),
      coalesce(col("stopword_ratio") <= 0.12 && col("n_tokens") >= 5,
        lit(false)).as("heur_keep"))
    val nb = nbQuality(s, d)
      .select(col("doc_id"), col("keep").as("nb_keep"))
    val ppl = Perplexity.perplexityFilter(s, d)
      .select(col("doc_id"), (col("bucket") =!= "tail").as("ppl_keep"))
    val votes = col("heur_keep").cast("int") +
      col("nb_keep").cast("int") + col("ppl_keep").cast("int")
    heur.join(nb, "doc_id").join(ppl, "doc_id")
      .select(col("doc_id"), col("heur_keep"), col("nb_keep"),
        col("ppl_keep"), votes.cast("int").as("votes"),
        (votes >= 2).as("keep"))
  }
}
