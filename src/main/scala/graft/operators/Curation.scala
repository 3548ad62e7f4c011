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

  private def reportFrom(s: SparkSession, d: String,
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
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).cast("bigint").as("ws_tokens"),
        sum(col("exact_dup")).cast("bigint").as("exact_dup_docs"),
        sum(coalesce(col("near_dup"), lit(0L))).cast("bigint")
          .as("near_dup_docs"),
        sum(coalesce(col("n_cut"), lit(0L))).cast("bigint")
          .as("substr_cut_tokens"),
        sum(col("pii")).cast("bigint").as("pii_docs"),
        sum(coalesce(col("contaminated"), lit(0L))).cast("bigint")
          .as("contaminated_docs"),
        sum(col("repetitive")).cast("bigint").as("repetitive_docs"))
  }
}
