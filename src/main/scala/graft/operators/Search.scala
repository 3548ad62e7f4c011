package graft.operators

import graft.Tables
import graft.functions.Fns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword search over the document corpus: a distributed inverted
  * index with Okapi BM25 ranking — the retrieval leg of the
  * training-data pipeline (contamination triage, corpus exploration,
  * targeted sampling) alongside the ANN family's embedding search.
  *
  * Two paths share one scorer, so they are identical by construction:
  *  - inline: postings/df/corpus-stats recomputed from `documents`;
  *  - served: the same frames read back from a persisted index.
  *
  * Scale shape: the postings build is one explode + two-phase hash
  * aggregate keyed on (term, doc) — high-cardinality, skew-safe; the
  * index is partitioned BY TERM on disk, so a query's scan statically
  * prunes to its terms' partitions (verified in the serve plan) and
  * the scored join is a broadcast of the tiny (query × term) frame
  * against only those postings. Document length is denormalized into
  * each posting row — the classic search-engine trick that removes the
  * corpus-sized doc-stats join from the serve path entirely. Corpus
  * scalars (N, Σdl) ride along as a broadcast 1-row frame. Ranking
  * rounds to 4 dp BEFORE the per-query top-k window (ties broken by
  * doc_id), so the ranking is deterministic across engines and
  * partition layouts.
  *
  * At 100 TB: partition postings by a term HASH BUCKET (bounded
  * partition count) instead of the raw term, same pruning math; the
  * per-query work after pruning is proportional to the query terms'
  * posting lists, never the corpus.
  */
object Search {
  private val K1 = 1.2
  private val B = 0.75

  /** Fixed deterministic query set over the testdata vocabulary:
    * two common terms, a mid phrase, and a rare+common contrast
    * ("dup" has ~40× lower document frequency than the rest).
    */
  val defaultQueries: Seq[(Int, String)] = Seq(
    1 -> "hash", 1 -> "join",
    2 -> "window", 2 -> "agg", 2 -> "stream",
    3 -> "dup", 3 -> "scan")

  private def tokensOf(s: SparkSession, d: String): DataFrame =
    Tables.parallelized(Tables.documents(s, d))
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))

  /** Inverted-index rows (term, doc_id, dl, tf) — dl denormalized. */
  private def postingsOf(toks: DataFrame): DataFrame =
    toks.select(col("doc_id"), size(col("ts")).as("dl"),
        explode(col("ts")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))

  /** Document frequency per term: postings are unique per (term, doc). */
  private def termstatsOf(postings: DataFrame): DataFrame =
    postings.groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** Corpus scalars: N and Σdl (integer-exact, so avgdl = Σdl/N is the
    * same double in every engine).
    */
  private def statsOf(toks: DataFrame): DataFrame =
    toks.agg(count(lit(1)).as("n"),
      sum(size(col("ts"))).cast("double").as("sumdl"))

  /** Persist the index: term-partitioned postings + df + corpus stats. */
  def buildIndex(s: SparkSession, d: String, indexDir: String): Unit = {
    val toks = tokensOf(s, d)
    val post = postingsOf(toks)
    post.write.mode("overwrite").partitionBy("term")
      .parquet(s"$indexDir/postings")
    termstatsOf(post).coalesce(1).write.mode("overwrite")
      .parquet(s"$indexDir/termstats")
    statsOf(toks).coalesce(1).write.mode("overwrite")
      .parquet(s"$indexDir/stats")
  }

  /** Shared BM25 scorer: Lucene's idf = ln(1 + (N-df+.5)/(df+.5)),
    * tf-norm with k1=1.2, b=0.75.
    */
  private def score(s: SparkSession, postings: DataFrame,
      termstats: DataFrame, stats: DataFrame,
      queries: Seq[(Int, String)], k: Int): DataFrame = {
    import s.implicits._
    val terms = queries.map(_._2).distinct
    val qdf = queries.toDF("query_id", "term")
    val tstats = termstats.filter(col("term").isin(terms: _*))
    val scored = postings
      .join(broadcast(qdf), "term")
      .join(broadcast(tstats), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) +
        (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * (col("tf") * lit(K1 + 1)) /
          (col("tf") + lit(K1) * (lit(1.0 - B) +
            lit(B) * col("dl") / (col("sumdl") / col("n")))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(r4(sum(col("contrib"))).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }

  /** Inline twin: everything recomputed from the corpus. */
  def bm25(s: SparkSession, d: String,
      queries: Seq[(Int, String)] = defaultQueries,
      k: Int = 10): DataFrame = {
    val toks = tokensOf(s, d)
    val post = postingsOf(toks)
    score(s, post, termstatsOf(post), statsOf(toks), queries, k)
  }

  /** Serve twin: reads the persisted index; the term filter statically
    * prunes the term-partitioned postings scan.
    */
  def bm25FromIndex(s: SparkSession, indexDir: String,
      queries: Seq[(Int, String)] = defaultQueries,
      k: Int = 10): DataFrame = {
    val terms = queries.map(_._2).distinct
    val post = s.read.parquet(s"$indexDir/postings")
      .filter(col("term").isin(terms: _*))
    score(s, post, s.read.parquet(s"$indexDir/termstats"),
      s.read.parquet(s"$indexDir/stats"), queries, k)
  }
}
