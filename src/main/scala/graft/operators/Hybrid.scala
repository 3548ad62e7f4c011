package graft.operators

import graft.Tables
import graft.functions.FusedCosineSimilarity.fusedCosine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: the BM25 keyword leg ([[Search]]) and the dense
  * embedding leg (the ANN family) fused with reciprocal-rank fusion —
  * the production serving shape for corpus exploration and RAG-style
  * lookup, where neither lexical match nor embedding similarity alone
  * ranks well.
  *
  * RRF (Cormack & Clarke's parameter-free fusion): each leg
  * contributes `1 / (C + rank)` for its top-`kLeg` docs, C = 60 the
  * canonical constant; docs found by both legs sum both terms. The
  * fused score is rounded to 6 dp BEFORE the final ranking (ties by
  * doc_id), the same round-then-rank determinism contract as BM25's
  * scorer, so the ranking is identical across engines and layouts.
  *
  * Probe convention: hybrid query `i` = the BM25 query set's terms for
  * qid `i` paired with embedding vec_id = `i` as the dense probe (the
  * corpus embedding standing in for an encoded query vector; it is
  * excluded from its own candidates, mirroring
  * [[Similarity.bruteForceTopK]]).
  *
  * Scale shape: fusion runs entirely on leg OUTPUTS — ≤ kLeg rows per
  * query per leg — so its cost is independent of corpus size; the legs
  * themselves carry the scale machinery (term-partitioned postings,
  * quantized shortlist + re-rank). The served form composes the two
  * persisted indexes: BM25 postings for the sparse leg, the int8 codes
  * tier for the dense leg — whose exact-recall re-rank is what lets
  * the served hybrid answer the same full cross-engine oracle as the
  * inline brute-force form (a lossy dense leg would need goldens).
  */
object Hybrid {
  /** Canonical RRF constant (TREC fusion literature). */
  val C = 60

  /** Dense-probe ids = the BM25 query ids (vec_id `i` probes qid `i`). */
  private def probes(s: SparkSession, d: String,
      queries: Seq[(Int, String)]): DataFrame = {
    val ids = queries.map(_._1.toLong).distinct.sorted
    Tables.embeddings(s, d).filter(col("vec_id").isin(ids: _*))
  }

  /** Inline hybrid: BM25 recomputed from the corpus + exact
    * brute-force dense leg, fused. Full DuckDB oracle.
    */
  def rrf(s: SparkSession, d: String, k: Int = 10, kLeg: Int = 10,
      queries: Seq[(Int, String)] = Search.defaultQueries): DataFrame =
    fuse(Search.bm25(s, d, queries, k = kLeg),
      denseLeg(s, d, kLeg, queries), k)

  /** Served hybrid from the persisted indexes: BM25 postings
    * (identical to inline by the shared-scorer construction) + the
    * int8 quantized tier with exact re-rank (recall-1.0 pinned by
    * q_ann_int8's oracle) — so this answers the SAME oracle as [[rrf]].
    */
  def rrfFromIndexes(s: SparkSession, d: String, bm25Dir: String,
      int8Dir: String, k: Int = 10, kLeg: Int = 10,
      queries: Seq[(Int, String)] = Search.defaultQueries): DataFrame =
    fuse(
      Search.bm25FromIndex(s, bm25Dir, queries, k = kLeg),
      ScalarQuant.sqTopKFromIndex(s, int8Dir, probes(s, d, queries),
        Tables.embeddings(s, d), k = kLeg),
      k)

  /** [[rrfFromIndexes]] with the binary bit tier ([[BinaryQuant]]) as
    * the dense leg instead of the int8 codes: the Hamming shortlist's
    * exact re-rank recovers the same exact dense ranking (at the
    * registry refine width), so the fusion is oracle-identical to the
    * inline form — the cheapest-storage serve shape of the cascade
    * (bit table + postings; the raw store is touched only by the
    * k·queries re-rank fetch).
    */
  def rrfFromIndexesBq(s: SparkSession, d: String, bm25Dir: String,
      bqDir: String, k: Int = 10, kLeg: Int = 10,
      queries: Seq[(Int, String)] = Search.defaultQueries): DataFrame =
    fuse(
      Search.bm25FromIndex(s, bm25Dir, queries, k = kLeg),
      BinaryQuant.bqTopKFromIndex(s, bqDir, probes(s, d, queries),
        Tables.embeddings(s, d), k = kLeg),
      k)

  /** Exact dense top-`kLeg` for the hybrid probes: fused-cosine scores,
    * bounded map-side TopK per query ([[Similarity.bruteForceTopKAgg]]'s
    * exchange shape — ≤ kLeg rows per query per partition).
    */
  private def denseLeg(s: SparkSession, d: String, kLeg: Int,
      queries: Seq[(Int, String)]): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val qs = probes(s, d, queries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    emb.join(broadcast(qs), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        fusedCosine(col("q"), col("embedding")).as("sim"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(new Sampling.TopKByScoreAgg[Long](kLeg).toColumn.name("topk"))
      .toDF("query_id", "topk")
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), col("col._1").as("vec_id"),
        (col("pos") + 1).cast("int").as("rk"))
  }

  /** Cross-encoder-STYLE rerank of the RRF shortlist — the standard
    * retrieval cascade's last stage (BM25/ANN recall → cheap fusion →
    * expensive pairwise scorer over the shortlist). A real neural
    * cross-encoder is a model call; this deterministic stand-in keeps
    * the cascade's exact SHAPE and cost profile — a richer score
    * computed on the (query, doc) PAIR jointly, affordable only
    * because the shortlist is k·queries rows, not the corpus:
    *
    *   score = round(1e-9 + 0.6·cosine(q_emb, d_emb)
    *                       + 0.4·jaccard(q_terms, doc_tokens), 6)
    *
    * re-ranked (score desc, doc_id) within each query — the
    * round-then-rank determinism contract everywhere here, so the
    * full DuckDB oracle recomputes the cascade end-to-end.
    *
    * Scale shape: the shortlist (k·queries rows) BROADCASTS onto the
    * corpus-sized token/embedding lookups — the corpus streams through
    * narrow projections once each and never shuffles; every join
    * below the window is a broadcast hash join, and the final window
    * partitions the shortlist only.
    */
  def rerank(s: SparkSession, d: String, k: Int = 10, kCand: Int = 10,
      queries: Seq[(Int, String)] = Search.defaultQueries): DataFrame =
    rerankShortlist(s, d,
      rrf(s, d, k = kCand, kLeg = kCand, queries = queries), k, queries)

  /** Served cascade: the same rerank stage over [[rrfFromIndexes]]'s
    * shortlist — retrieve from the PERSISTED indexes (BM25 postings +
    * int8 codes tier), fuse, rerank. Because the served RRF answers
    * the same oracle as the inline form (exact-recall int8 re-rank),
    * the whole served cascade shares [[rerank]]'s full oracle. This is
    * the production shape: the r14 inline `q_rerank` rebuilt both
    * retrieval legs from the raw corpus per call (~2.6 s isolated);
    * here the per-query cost is the shortlist features only.
    */
  def rerankFromIndexes(s: SparkSession, d: String, bm25Dir: String,
      int8Dir: String, k: Int = 10, kCand: Int = 10,
      queries: Seq[(Int, String)] = Search.defaultQueries): DataFrame =
    rerankShortlist(s, d,
      rrfFromIndexes(s, d, bm25Dir, int8Dir, k = kCand, kLeg = kCand,
        queries = queries), k, queries)

  /** [[rerankFromIndexes]] with the binary bit tier as the dense leg
    * ([[rrfFromIndexesBq]]): the whole cascade — postings + bit table
    * shortlist, RRF fusion, pairwise rerank — served from the two
    * cheapest persisted artifacts; oracle-identical to the inline
    * cascade because the bq leg's exact re-rank recovers the exact
    * dense ranking.
    */
  def rerankFromIndexesBq(s: SparkSession, d: String, bm25Dir: String,
      bqDir: String, k: Int = 10, kCand: Int = 10,
      queries: Seq[(Int, String)] = Search.defaultQueries): DataFrame =
    rerankShortlist(s, d,
      rrfFromIndexesBq(s, d, bm25Dir, bqDir, k = kCand, kLeg = kCand,
        queries = queries), k, queries)

  /** The cascade's scoring stage, shared by the inline and served
    * forms: pairwise-score a (query_id, doc_id, rrf) shortlist and
    * re-rank (round-then-rank at 6 dp, ties by doc_id).
    */
  private def rerankShortlist(s: SparkSession, d: String,
      shortlist: DataFrame, k: Int,
      queries: Seq[(Int, String)]): DataFrame = {
    import s.implicits._
    val cands = shortlist
      .select(col("query_id"), col("doc_id"), col("rrf"))
    val qTerms = queries.groupBy(_._1).toSeq
      .map { case (qid, ts) => (qid.toLong, ts.map(_._2).distinct.sorted) }
      .toDF("query_id", "qts")
    // tokenize AFTER the shortlist join, not before: Catalyst does not
    // reorder an expensive projection below a join on its own, so a
    // corpus-wide tokens/array_distinct projection would run on every
    // document only for the join to discard 98% of it (r15 — measured
    // 0.9 s of q_rerank_served's isolated cost). The shortlist
    // broadcasts into the corpus scan, the joined k·queries rows carry
    // the token arrays, and that feature frame (consumed once) then
    // broadcasts onto the embedding stream — documents and embeddings
    // each scanned exactly once, the shortlist cascade computed once.
    val feat = Tables.parallelized(Tables.documents(s, d)
        .select(col("doc_id"), col("text")))
      .join(broadcast(cands), Seq("doc_id"))
      .select(col("query_id"), col("doc_id"), col("rrf"),
        array_distinct(graft.operators.TextOps.tokens(col("text")))
          .as("dts"))
    val dEmb = Tables.embeddings(s, d)
      .select(col("vec_id").as("doc_id"), col("embedding").as("dv"))
    val qEmb = Tables.embeddings(s, d)
      .filter(col("vec_id")
        .isin(queries.map(_._1.toLong).distinct.sorted: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val overlap =
      size(array_intersect(col("dts"), col("qts"))).cast("double") /
        size(array_union(col("dts"), col("qts")))
    // 1e-9 leads the sum so the fold order matches the oracle's
    // centrally-rewritten round(1e-9 + 0.6·cos + 0.4·jac, 6) exactly
    val score = round(lit(1e-9) +
      lit(0.6) * fusedCosine(col("qv"), col("dv")) +
      lit(0.4) * overlap, 6)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rerank_score").desc, col("doc_id"))
    dEmb.join(broadcast(feat), Seq("doc_id"))
      .join(broadcast(qTerms), Seq("query_id"))
      .join(broadcast(qEmb), Seq("query_id"))
      .select(col("query_id"), col("doc_id"), col("rrf"),
        score.as("rerank_score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("doc_id"), col("rerank_score"), col("rrf"))
  }

  /** RRF proper. `sparse`: (query_id, rank, doc_id, ...) — [[Search]]
    * output; `dense`: (query_id, vec_id, ..., rk) — ANN output, vec_id
    * keyed to doc_id by the corpus convention (one embedding per doc,
    * same id).
    */
  private def fuse(sparse: DataFrame, dense: DataFrame,
      k: Int): DataFrame = {
    val legs = sparse
      .select(col("query_id").cast("long").as("query_id"), col("doc_id"),
        col("rank").cast("int").as("rank"))
      .unionByName(dense.select(col("query_id"), col("vec_id").as("doc_id"),
        col("rk").cast("int").as("rank")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    legs.groupBy("query_id", "doc_id")
      .agg(round(sum(lit(1.0) / (lit(C) + col("rank"))) + lit(1e-12), 6)
        .as("rrf"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf"))
  }
}
