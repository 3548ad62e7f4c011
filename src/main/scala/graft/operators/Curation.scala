package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level curation report — the one-row-per-source audit a data
  * team reads before committing a training mix: how much each curation
  * pass would remove, measured by the SAME operators the suite runs
  * (the oracle recomputes every component from scratch in DuckDB, so
  * the report is gate-checked, not a dashboard estimate).
  *
  * Columns per source:
  *  - `n_docs` / `ws_tokens` — corpus mass;
  *  - `exact_dup_docs` — non-keeper exact copies (doc_id ≠ min over
  *    identical text, the q_dedup_exact keep rule);
  *  - `near_dup_docs` — docs that are the LARGER member of some
  *    n-gram-Jaccard ≥ 0.5 pair (q_ngram_jaccard's blocked detector;
  *    its oracle proves exhaustive recall on this data);
  *  - `substr_cut_tokens` — token mass the exact-substring scrub cuts
  *    (q_substring_scrub's keep-smallest-id span rule);
  *  - `pii_docs` — docs carrying any PII class (q_pii_scan's
  *    patterns; exactly zero on the synthetic corpus, which pins the
  *    false-positive rate);
  *  - `contaminated_docs` — docs sharing a probe n-gram
  *    (q_contamination's verify-scale 4-gram window);
  *  - `repetitive_docs` — Gopher-class duplicate-bigram ratio > 0.2
  *    (q_repetition's per-doc signal).
  *
  * Scale shape: one corpus pass computes the per-doc flags (the
  * window over the 8-byte content hash is the q_dedup_exact shuffle);
  * the component frames (spans, pairs, matches) are each the
  * already-audited operator's plan; everything meets at doc_id-keyed
  * left joins — the component sides are duplicate/violation-sized,
  * far smaller than the corpus — and one per-source aggregate.
  * Nothing here introduces a new scale risk beyond its components.
  */
object Curation {

  def report(s: SparkSession, d: String): DataFrame =
    reportFrom(s, d, Substring.substringScrub(s, d))

  /** The report SERVED from the standing lake indexes (r16): the
    * substring component — the family's expensive span machinery —
    * reads the persisted full-corpus position index
    * ([[Substring.substringScrubFromIndex]]: no corpus re-gram) instead
    * of recomputing it inline. The scan-side components (exact-dup
    * window, PII, repetition) are per-doc map work with no index to
    * serve from, and the n-gram-Jaccard pair detector is
    * blocked-exhaustive by construction — both run as in the inline
    * form. Spans from the index are bit-identical to the inline
    * recompute (the q_substring_scrub_served parity), so the served
    * report shares the inline full oracle.
    */
  def reportServed(s: SparkSession, d: String,
      substrIndexDir: String): DataFrame =
    reportFrom(s, d, Substring.substringScrubFromIndex(s, substrIndexDir,
      Tables.documents(s, d).select(col("doc_id"), col("text"))))

  /** The shared per-document flag frame every report derives from:
    * (doc_id, source, ws, n_cut, exact_dup, near_dup, pii,
    * contaminated, repetitive) — one row per doc, joined-in component
    * flags coalesced to 0.
    */
  private def flagsFrom(s: SparkSession, d: String,
      scrub: DataFrame): DataFrame = {
    val toksC = col("t")
    val bigrams = TextOps.bigramsOf(toksC)
    val pii = col("text").rlike(Scrub.EmailRe) ||
      col("text").rlike(Scrub.PhoneRe) ||
      col("text").rlike(Scrub.Ipv4Re)
    val w = Window.partitionBy(col("__h"))
    val perDoc = Tables.parallelized(Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text")))
      .withColumn("t", TextOps.tokens(col("text")))
      .withColumn("__h", xxhash64(col("text")))
      .select(col("doc_id"), col("source"),
        size(toksC).cast("long").as("ws"),
        when(col("doc_id") =!= min(col("doc_id")).over(w), 1L)
          .otherwise(0L).as("exact_dup"),
        when(pii, 1L).otherwise(0L).as("pii"),
        when(size(bigrams) > 0 &&
          (lit(1.0) - size(array_distinct(bigrams)).cast("double")
            / size(bigrams)) > 0.2, 1L)
          .otherwise(0L).as("repetitive"))
    val nearDup = Dedup.ngramJaccardPairs(s, d)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("near_dup", lit(1L))
    val cut = scrub.select(col("doc_id"), col("n_cut"))
    val contam = Scrub.contamination(s, d, nProbes = 3, ngramSize = 4)
      .select(col("doc_id")).withColumn("contaminated", lit(1L))
    perDoc
      .join(nearDup, Seq("doc_id"), "left")
      .join(cut, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("ws"),
        coalesce(col("n_cut"), lit(0L)).as("n_cut"),
        col("exact_dup"),
        coalesce(col("near_dup"), lit(0L)).as("near_dup"),
        col("pii"),
        coalesce(col("contaminated"), lit(0L)).as("contaminated"),
        col("repetitive"))
  }

  private def reportFrom(s: SparkSession, d: String,
      scrub: DataFrame): DataFrame =
    flagsFrom(s, d, scrub)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).cast("bigint").as("ws_tokens"),
        sum(col("exact_dup")).cast("bigint").as("exact_dup_docs"),
        sum(col("near_dup")).cast("bigint").as("near_dup_docs"),
        sum(col("n_cut")).cast("bigint").as("substr_cut_tokens"),
        sum(col("pii")).cast("bigint").as("pii_docs"),
        sum(col("contaminated")).cast("bigint").as("contaminated_docs"),
        sum(col("repetitive")).cast("bigint").as("repetitive_docs"))

  /** The training-mix MANIFEST — the artifact a pretraining run is
    * actually configured from, composing the audited components into
    * one row per source:
    *  - `raw_docs` / `raw_tokens` — corpus mass before curation;
    *  - `kept_docs` / `clean_tokens` — post-curation mass: documents
    *    carrying NO flag (exact/near dup, PII, contamination,
    *    repetition — the report's drop set), token mass net of their
    *    substring cuts;
    *  - `clean_share` — each source's share of the total clean mass;
    *  - `q_share` — the temperature-smoothed sampling weight over
    *    clean TOKENS (q ∝ p^α, α = 0.3 — [[Sampling.temperatureMix]]'s
    *    rule applied to the mass a shard writer actually draws from,
    *    not raw doc counts);
    *  - `alloc_tokens` — this source's slice of the run's token
    *    budget (q_share × budget);
    *  - `epochs` — alloc / clean: how many times the source's clean
    *    data is traversed (> 1 = upsampling repeats).
    * All derived doubles at 4 dp (the pow() ulp contract). Scale
    * shape: the flag frame is the report's (one corpus pass + the
    * component operators); everything after is source-cardinality.
    */
  def mixManifest(s: SparkSession, d: String, alpha: Double = 0.3,
      budgetTokens: Long = 50000L): DataFrame = {
    import graft.functions.Fns.r4
    val per = flagsFrom(s, d, Substring.substringScrub(s, d))
      .withColumn("dropped",
        when(col("exact_dup") + col("near_dup") + col("pii") +
          col("contaminated") + col("repetitive") > 0, 1L)
          .otherwise(0L))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("raw_docs"),
        sum(col("ws")).cast("bigint").as("raw_tokens"),
        sum(when(col("dropped") === 0, 1L).otherwise(0L))
          .cast("bigint").as("kept_docs"),
        sum(when(col("dropped") === 0, col("ws") - col("n_cut"))
          .otherwise(0L)).cast("bigint").as("clean_tokens"))
    val tot = per.agg(
      sum(col("clean_tokens")).cast("double").as("ct_total"))
    val sm = per.crossJoin(broadcast(tot))
      .withColumn("p", col("clean_tokens") / col("ct_total"))
      .withColumn("pa", pow(col("p"), lit(alpha)))
    val z = sm.agg(sum(col("pa")).as("z"))
    sm.crossJoin(broadcast(z))
      .select(col("source"), col("raw_docs"), col("raw_tokens"),
        col("kept_docs"), col("clean_tokens"),
        r4(col("p")).as("clean_share"),
        r4(col("pa") / col("z")).as("q_share"),
        r4(col("pa") / col("z") * lit(budgetTokens.toDouble))
          .as("alloc_tokens"),
        r4(col("pa") / col("z") * lit(budgetTokens.toDouble)
          / col("clean_tokens")).as("epochs"))
  }
}
