package graft.registry

import graft.operators.{Dedup, Multimodal, Sampling, Similarity, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-contract registry for the text / dedup / similarity families.
  * Hash-VALUED operators (simhash, fingerprints, LSH/IVF rankings,
  * lang-id profiles) have engine-specific values → no oracle entry
  * (driver records a rows-only check; ScalaTest covers semantics).
  *
  * The near-dup PAIR operators do get full oracles even though their
  * candidate generation is hash-based: the emitted (pair, metric) rows
  * are pure data facts — DuckDB recomputes the exhaustive shingle
  * Jaccard / cosine sets over the same parquet and the driver
  * hash-compares. This also pins LSH recall at 1.0 on the driver data
  * (verified: 25/25 minhash pairs at sf0.01); a recall regression now
  * fails correctness instead of hiding in a rows-only check.
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
    "q_weighted_sample" -> ((s: SparkSession, d: String) =>
      Sampling.weightedDocSample(s, d)),
    "q_reservoir" -> ((s: SparkSession, d: String) =>
      Sampling.reservoirEventSample(s, d)),
    "q_multimodal_stats" -> (Multimodal.docAssetStats _),
    "q_dup_clusters" -> ((s: SparkSession, d: String) =>
      Dedup.dupClusters(s, d))
  )

  /** q_ann_brute_agg produces identical results to q_ann_brute (the
    * aggregate formulation changes the plan, not the semantics), so it
    * shares the same oracle SQL.
    */
  lazy val oracle: Map[String, String] =
    baseOracle + ("q_ann_brute_agg" -> baseOracle("q_ann_brute"))

  /** Word-3-gram shingle sets per document, as a DuckDB CTE — mirrors
    * Dedup.shinglesFromTokens (whitespace tokens, empties dropped,
    * short docs collapse to one whole-text shingle, distinct).
    */
  private val shingleCte =
    """WITH toks AS (
      |  SELECT doc_id, lang, source,
      |   list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id, lang, source,
      |   list_distinct(CASE WHEN len(t) < 3
      |     THEN [array_to_string(t, ' ')]
      |     ELSE list_transform(range(1, len(t) - 1),
      |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS sh
      |  FROM toks
      |)""".stripMargin

  /** Sequential-order cosine over two float lists in double — same
    * accumulation order as Similarity.cosine / FusedCosineSimilarity,
    * so values are bit-identical.
    */
  private def cosineSql(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b),
       |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
       |    (acc, x) -> acc + x)
       |  / (sqrt(list_reduce(list_transform($a,
       |       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
       |       (acc, x) -> acc + x))
       |     * sqrt(list_reduce(list_transform($b,
       |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
       |         (acc, x) -> acc + x)))""".stripMargin

  private lazy val baseOracle: Map[String, String] = Map(
    // exhaustive blocked jaccard — the Spark side's small-block path is
    // exhaustive too, so the sets are identical by construction
    "q_ngram_jaccard" ->
      s"""$shingleCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         | CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |   / len(list_distinct(a.sh || b.sh)) AS jaccard
         |FROM sh a JOIN sh b
         |  ON a.lang = b.lang AND a.source = b.source
         |  AND a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |   / len(list_distinct(a.sh || b.sh)) >= 0.5""".stripMargin,
    // exhaustive jaccard at the minhash threshold: equality asserts the
    // banded-LSH candidate stage has recall 1.0 on this data
    "q_minhash_pairs" ->
      s"""$shingleCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         | CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |   / len(list_distinct(a.sh || b.sh)) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |   / len(list_distinct(a.sh || b.sh)) >= 0.7""".stripMargin,
    // connected components over the exhaustive-jaccard pair set via a
    // recursive reachability CTE: label(n) = min id reachable from n.
    // Hash-equality therefore checks pair recall AND the transitive
    // clustering in one row set.
    "q_dup_clusters" ->
      s"""${shingleCte.replace("WITH toks", "WITH RECURSIVE toks")},
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |     / len(list_distinct(a.sh || b.sh)) >= 0.7),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(node, lab) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.lab FROM edges e JOIN reach r
         |    ON r.node = e.dst)
         |SELECT cluster_id, count(*) AS n_members,
         | array_to_string(list_sort(list(node)), ',') AS members
         |FROM (SELECT node, min(lab) AS cluster_id FROM reach
         |      GROUP BY node)
         |GROUP BY cluster_id""".stripMargin,
    // exhaustive cosine at the near-dup threshold (empty on the driver
    // data — the oracle still catches false positives and threshold
    // drift)
    "q_embedding_neardups" ->
      s"""SELECT * FROM (
         |  WITH e AS (SELECT vec_id, embedding FROM embeddings)
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |   ${cosineSql("a.embedding", "b.embedding")} AS cosine
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |WHERE cosine >= 0.8""".stripMargin,
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
    // Efraimidis–Spirakis weighted k-sample per lang, w = n_chars.
    // Uniform is the portable Lehmer hash (see Sampling.weightedDocSample)
    // so pow(u, 1/w) is bit-identical across engines; ties break on
    // doc_id like TopKByScoreAgg.
    "q_weighted_sample" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |   row_number() OVER (PARTITION BY lang ORDER BY
        |     pow(((doc_id * 2654435761) % 2147483647 + 0.5)
        |          / 2147483648.0,
        |         1.0 / CAST(n_chars AS DOUBLE)) DESC,
        |     doc_id) AS rk
        |  FROM documents WHERE n_chars > 0)
        |WHERE rk <= 5""".stripMargin,
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
