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

  /** DSIR-style data selection via importance resampling (Xie et al.
    * 2023, arXiv:2302.03169): weight every raw document by how much
    * more likely its n-gram features are under the TARGET distribution
    * than under the raw-crawl distribution, then keep the top weights.
    * Complements [[nbQuality]] — NB learns a discriminative per-token
    * log-odds; DSIR is the generative ratio of two feature LMs, the
    * formulation the paper shows matches target-domain downstream
    * accuracy better than heuristic filtering.
    *
    * Faithful-but-oracle-able variant: the paper's hashed n-gram
    * features would make the weights engine-specific hash values, so
    * features here are the RAW bigrams (with BOS) of the shared
    * [[Perplexity.bigramsOf]] tokenization — same information before
    * the hashing trick compresses it, and fully recomputable by the
    * DuckDB oracle. Per-feature Lidstone (α = ½) estimates over an
    * (F+1)-slot event space, F = distinct bigrams in the whole corpus:
    * `p(f) = (c(f) + α) / (n + α·(F+1))`; per-document weight is the
    * MEAN per-occurrence log ratio `(1/|doc|) Σ ln(p_tgt/p_raw)` (the
    * sum the paper resamples by correlates with length; the mean is
    * the length-debiased form, rounded 4 dp under the shared
    * sum-of-doubles contract). The keep gate replaces the paper's
    * Gumbel-noise sampling with its deterministic limit — top-20% by
    * weight (`llw > p80`), the same exact/approx quantile twinning as
    * the NB median gate.
    *
    * Scale shape: one explode; two feature-keyed count aggregates
    * (F-bounded, kept distributed); the per-feature log-ratio table
    * joins the occurrence stream 1:N — hot stopword bigrams fan out
    * without skewing a build side — then one doc-keyed mean. Totals
    * ride along as broadcast one-row frames. Raw counts ⊇ target
    * counts (the target slice IS part of the raw corpus), so scoring
    * never meets an unseen feature.
    */
  def dsirWeights(s: SparkSession, d: String,
      target: Column = defaultPositive,
      alpha: Double = 0.5,
      exactThreshold: Boolean = true): DataFrame = {
    val labeled = Perplexity.labeledDocs(s, d, target)
    val feats = Perplexity.bigramsOf(labeled)
      .withColumnRenamed("ref", "curated")
    val cRaw = feats.groupBy("w1", "w2")
      .agg(count(lit(1)).cast("double").as("cr"),
        sum(when(col("curated"), 1L).otherwise(0L)).cast("double")
          .as("ct"))
    val totals = cRaw.agg(sum(col("cr")).as("nraw"),
      sum(col("ct")).as("ntgt"),
      count(lit(1)).cast("double").as("f"))
    val weights = cRaw.crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"),
        (log((col("ct") + alpha) /
            (col("ntgt") + lit(alpha) * (col("f") + 1.0))) -
          log((col("cr") + alpha) /
            (col("nraw") + lit(alpha) * (col("f") + 1.0)))).as("lw"))
    val perDoc = feats.join(weights, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(r4(sum(col("lw")) / count(lit(1))).as("llw"))
    val scored = labeled
      .select(col("doc_id"), col("ref").as("curated"))
      .join(perDoc, Seq("doc_id"), "left")
    val thr =
      if (exactThreshold)
        scored.agg(expr("percentile(llw, 0.8)").as("thr"))
      else
        scored.agg(expr("approx_percentile(llw, 0.8, 10000)").as("thr"))
    scored.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("curated"), col("llw"),
        coalesce(col("llw") > col("thr"), lit(false)).as("keep"))
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
