package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus curation pipeline — the LLM tier's
  * capstone: one declarative plan from raw documents to
  * packed-training-window assignments, composing the individually
  * driver-verified stages in their production order:
  *
  *  1. PII scrub ([[Scrub.redactPii]]) — downstream stages read the
  *     redacted text;
  *  2. quality filter — minimum token count and the Gopher-class
  *     duplicate-bigram ratio cap ([[TextOps.repetitionStats]]'s
  *     signal, applied per doc);
  *  3. exact dedup — one survivor (smallest doc_id) per distinct
  *     clean text ([[Dedup.exact]]'s keep rule);
  *  4. per-source token-budget admission in portable-hash order
  *     ([[Sampling.tokenMixture]]'s exact admission contract);
  *  5. sequence-packing assignment — each admitted doc's training
  *     window index ([[TextOps.seqPackStats]]'s integer-div math).
  *
  * Returns one row per ADMITTED document: (doc_id, source, n_tokens,
  * window_id).
  *
  * Scale shape: stages 1–2 are narrow column expressions; the keyed
  * shuffles are the dedup window (on the 8-byte content hash — the
  * [[Dedup.exact]] trick, so the exchange carries longs, not
  * documents), the ADMISSION prefix sum — the one full-corpus
  * per-source running total, computed as the two-level sharded form
  * ([[Prefix.shardedRunningSum]]) so a dominant source's sort spreads
  * across hash-range shards instead of one task — and the packing
  * window. The packing window stays in its plain single-window form
  * deliberately: its input is the ADMITTED set, bounded by
  * construction at ~`perSourceBudget` tokens per source, so the
  * per-source sort it runs is over a budget-sized (not corpus-sized)
  * partition at any corpus scale. The whole plan is one pass: no
  * stage materializes.
  */
object Curate {

  def curate(s: SparkSession, d: String,
      maxDupBigramRatio: Double = 0.2, minTokens: Int = 5,
      perSourceBudget: Long = 2000, packBudget: Int = 512): DataFrame = {
    // stage clean_text and its token array as REAL columns BEHIND AN
    // EXCHANGE before anything references them: alias substitution
    // (CollapseProject + pushdowns) otherwise inlines the producer
    // into every consumer — measured 45 regexp_replace sites in the
    // collapsed physical plan (15 re-evaluations of the 3-pass
    // redaction per row, ~2 s of the query). Tables.parallelized's
    // round-robin exchange is the family's established barrier
    // (TextOps.fingerprints); past it, downstream operators see plain
    // attributes.
    val docs = Tables.parallelized(Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          Scrub.redactPii(col("text")).as("clean_text")))
      .select(col("doc_id"), col("source"), col("clean_text"),
        TextOps.tokens(col("clean_text")).as("toks"))
    val toks = col("toks")
    val bigrams = TextOps.bigramsOf(toks)
    val quality = docs
      .withColumn("ws", size(toks).cast("long"))
      .withColumn("bigrams", bigrams)
      .withColumn("dup_bigram",
        when(size(col("bigrams")) > 0,
          lit(1.0) - size(array_distinct(col("bigrams"))).cast("double")
            / size(col("bigrams"))).otherwise(0.0))
      .drop("bigrams", "toks")
    // The dedup window keys on the 8-byte content hash (the
    // Dedup.exact trick), not the text: the exchange and sort carry
    // longs instead of documents — the only shape that survives
    // 100 TB. The oracle groups by the text itself; equal results
    // absent 64-bit collisions (the same equivalence q_dedup_exact
    // pins). The quality filter sits ABOVE this window, fused with the
    // rank filter: below it, predicate pushdown substitutes the alias
    // chains into the pushed Filter — measured 13 re-inlined copies of
    // the 3-pass redaction (45 regexp_replace sites in the physical
    // plan, ~2 s of the query at sf0.1); a Window on other keys is a
    // pushdown barrier, so the flags are computed exactly once.
    // Identical texts carry identical quality features, so filtering
    // after the rank keeps the same survivors: a duplicate GROUP is
    // dropped or kept atomically, and the group's min-id row is the
    // survivor either way.
    val dw = Window.partitionBy(xxhash64(col("clean_text")))
      .orderBy(col("doc_id"))
    val deduped = quality
      .withColumn("rn", row_number().over(dw))
      .filter(col("rn") === 1 && col("ws") >= minTokens &&
        col("dup_bigram") <= maxDupBigramRatio)
    // admission: per-source token prefix sum in portable-hash order —
    // sharded by constant-width hash ranges (the order key is uniform
    // over [0, 2³¹−1) by construction, so no bounds scan)
    val admitted = Prefix.shardedRunningSum(
        deduped.withColumn("h", Sampling.portableHash(col("doc_id"))),
        "source", Seq("h", "doc_id"), "ws", "cum_adm",
        bounds = Some((0L, 2147483646L)))
      .withColumn("prior", col("cum_adm") - col("ws"))
      .filter(col("prior") < perSourceBudget)
    val pw = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    admitted
      .withColumn("cum", sum(col("ws")).over(pw))
      .withColumn("window_id", expr(s"(cum - ws) div $packBudget"))
      .select(col("doc_id"), col("source"), col("ws").as("n_tokens"),
        col("window_id"))
  }
}
