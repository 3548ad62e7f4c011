package graft.registry

import graft.operators.{Dedup, Multimodal, Sampling, Similarity, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-contract registry for the text / dedup / similarity families.
  * Hash-based operators (minhash, simhash, LSH, lang-id profiles) have
  * engine-specific values → no oracle entry (driver records a rows-only
  * check); everything else gets exact DuckDB SQL.
  */
object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tokens" -> (TextOps.tokenCounts _),
    "q_head_tokens" -> (TextOps.headTokenCounts _),
    "q_text_stats" -> (TextOps.textStats _),
    "q_lang_stats" -> (TextOps.langSourceStats _),
    "q_fingerprint" -> (TextOps.fingerprints _),
    "q_lang_id" -> (TextOps.langId _),
    "q_dedup_exact" -> (Dedup.exact _),
    "q_minhash_pairs" -> ((s: SparkSession, d: String) =>
      Dedup.minhashPairs(s, d)),
    "q_ngram_jaccard" -> ((s: SparkSession, d: String) =>
      Dedup.ngramJaccardPairs(s, d)),
    "q_embedding_stats" -> (Similarity.labelStats _),
    "q_ann_brute" -> ((s: SparkSession, d: String) =>
      Similarity.bruteForceTopK(s, d)),
    "q_ann_brute_agg" -> ((s: SparkSession, d: String) =>
      Similarity.bruteForceTopKAgg(s, d)),
    "q_ann_lsh" -> ((s: SparkSession, d: String) =>
      Similarity.annTopK(s, d)),
    "q_ann_ivf" -> ((s: SparkSession, d: String) =>
      Similarity.ivfTopK(s, d)),
    "q_simhash_pairs" -> ((s: SparkSession, d: String) =>
      Dedup.simhashPairs(s, d)),
    "q_embedding_neardups" -> ((s: SparkSession, d: String) =>
      Dedup.embeddingNearDups(s, d, threshold = 0.8)),
    "q_stratified_sample" -> (Sampling.stratifiedDocSample _),
    "q_multimodal_stats" -> (Multimodal.docAssetStats _)
  )

  /** q_ann_brute_agg produces identical results to q_ann_brute (the
    * aggregate formulation changes the plan, not the semantics), so it
    * shares the same oracle SQL.
    */
  lazy val oracle: Map[String, String] =
    baseOracle + ("q_ann_brute_agg" -> baseOracle("q_ann_brute"))

  private lazy val baseOracle: Map[String, String] = Map(
    "q_tokens" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(list_filter(string_split(text, ' '),
        |                            t -> t <> '')) AS token
        |  FROM documents)
        |GROUP BY token""".stripMargin,
    "q_head_tokens" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(list_slice(list_filter(string_split(text, ' '),
        |                                       t -> t <> ''), 1, 5))
        |    AS token
        |  FROM documents)
        |GROUP BY token""".stripMargin,
    "q_text_stats" ->
      """SELECT doc_id, n_chars,
        | CAST(length(toks) AS INT) AS n_tokens,
        | CAST(length(list_distinct(toks)) AS INT) AS n_uniq_tokens,
        | round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |       / length(toks), 4) AS avg_token_len,
        | round(CAST(length(list_filter(toks,
        |         t -> t IN ('the', 'a'))) AS DOUBLE)
        |       / length(toks), 4) AS stopword_ratio
        |FROM (
        |  SELECT doc_id, n_chars, text,
        |   list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents)""".stripMargin,
    "q_lang_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        | round(avg(n_chars), 4) AS avg_chars,
        | round(avg(least(n_chars / 500.0, 1.0)), 4) AS avg_quality
        |FROM documents GROUP BY lang, source""".stripMargin,
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,
    "q_stratified_sample" ->
      """SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_id
        |FROM documents WHERE doc_id % 10 = 0
        |GROUP BY lang""".stripMargin,
    "q_multimodal_stats" ->
      """SELECT CAST(doc_id % 3 AS INT) AS kind_id,
        | count(*) AS n_assets,
        | CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT)
        |   AS total_bytes,
        | round(avg(octet_length(CAST(text AS BLOB))), 4) AS avg_bytes,
        | count(DISTINCT lang) AS n_langs
        |FROM documents GROUP BY 1""".stripMargin,
    "q_embedding_stats" ->
      """SELECT label, count(*) AS n,
        | round(avg(sqrt(list_sum(list_transform(embedding,
        |   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS avg_norm
        |FROM embeddings GROUP BY label""".stripMargin,
    "q_ann_brute" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qv
        |  FROM embeddings WHERE vec_id < 5),
        |pairs AS (
        |  SELECT q.query_id, e.vec_id,
        |   list_sum(list_transform(e.embedding,
        |     (x, i) -> CAST(x AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
        |   / (sqrt(list_sum(list_transform(e.embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |      * sqrt(list_sum(list_transform(q.qv,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id)
        |SELECT query_id, vec_id, round(sim, 4) AS sim, CAST(rk AS INT) AS rk
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |            ORDER BY sim DESC, vec_id) AS rk
        |  FROM pairs)
        |WHERE rk <= 10""".stripMargin
  )
}
