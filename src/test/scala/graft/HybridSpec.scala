package graft

import graft.operators.{Hybrid, ScalarQuant, Search}

/** Hybrid RRF retrieval: hand-computed fusion on a planted corpus
  * where one doc ranks in BOTH legs (the overlap-sum path the driver
  * data never hits), the rounded-tie doc_id break, and inline ≡ served
  * parity through the two persisted indexes.
  */
class HybridSpec extends SparkSuite {
  import spark.implicits._

  private def plant(): String = {
    val dir = tmpDir("hybrid")
    Seq(
      (1L, "filler filler", "en", "src0", 13L),
      (2L, "cat", "en", "src0", 3L),
      (3L, "cat cat cat", "en", "src0", 11L),
      (4L, "dog dog", "en", "src0", 7L),
      (5L, "bird", "en", "src0", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0), // the probe
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f), 0),
      (3L, Array(0.8f, 0.2f, 0.0f, 0.0f), 0),
      (4L, Array(0.0f, 1.0f, 0.0f, 0.0f), 0),
      (5L, Array(0.0f, 0.0f, 1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("rrf fuses overlapping legs, sums both contributions, breaks " +
      "rounded ties by doc_id") {
    val d = plant()
    // sparse leg (qid 1, term "cat"): doc3 rank 1 (tf 3), doc2 rank 2.
    // dense leg (probe = vec 1, self excluded): doc2 rank 1 (cos .994),
    // doc3 rank 2 (.970), doc4 rank 3 (0.0), doc5 rank 4 (0.0 — the
    // zero tie breaks by vec_id).
    // fused: doc2 = 1/62 + 1/61 and doc3 = 1/61 + 1/62 — EQUAL, so the
    // rounded tie breaks by doc_id; then doc4 = 1/63, doc5 = 1/64.
    val got = Hybrid.rrf(spark, d, queries = Seq(1 -> "cat"))
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    def r6(x: Double) = math.rint((x + 1e-12) * 1e6) / 1e6
    val both = r6(1.0 / 61 + 1.0 / 62)
    assert(got.toSeq === Seq(
      (1L, 1, 2L, both),
      (1L, 2, 3L, both),
      (1L, 3, 4L, r6(1.0 / 63)),
      (1L, 4, 5L, r6(1.0 / 64))))
  }

  test("cross-encoder-style rerank reorders the shortlist by " +
      "0.6*cosine + 0.4*term-jaccard, zero-feature docs tie by doc_id") {
    val d = plant()
    val got = Hybrid.rerank(spark, d, queries = Seq(1 -> "cat"))
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    def score(cos: Double, jac: Double) =
      math.rint((1e-9 + 0.6 * cos + 0.4 * jac) * 1e6) / 1e6
    // doc2 "cat" [0.9,0.1]: jac("cat" vs {cat}) = 1, cos = .9/sqrt(.82)
    // doc3 "cat cat cat": jac 1, cos = .8/sqrt(.68) — rrf had doc2 and
    // doc3 TIED; the richer score separates them. doc4/doc5 share no
    // term and are orthogonal: score 0.0, tie broken by doc_id.
    assert(got.toSeq === Seq(
      (1, 2L, score(0.9 / math.sqrt(0.82), 1.0)),
      (2, 3L, score(0.8 / math.sqrt(0.68), 1.0)),
      (3, 4L, 0.0),
      (4, 5L, 0.0)))
  }

  test("served hybrid (bm25 + int8 indexes) equals inline on sf0.001") {
    val d = "/root/testdata/sf0.001"
    val root = tmpDir("hybrid_idx")
    Search.buildIndex(spark, d, s"$root/bm25")
    ScalarQuant.sqWriteIndex(spark, d, s"$root/int8")
    val inline = Hybrid.rrf(spark, d).collect().map(_.toSeq).toSeq
    val served = Hybrid.rrfFromIndexes(spark, d, s"$root/bm25",
      s"$root/int8").collect().map(_.toSeq).toSeq
    assert(served.sortBy(_.toString) === inline.sortBy(_.toString))
    assert(inline.nonEmpty)
  }

  test("served rerank cascade equals the inline cascade on sf0.001") {
    val d = "/root/testdata/sf0.001"
    val root = tmpDir("rerank_idx")
    Search.buildIndex(spark, d, s"$root/bm25")
    ScalarQuant.sqWriteIndex(spark, d, s"$root/int8")
    val inline = Hybrid.rerank(spark, d).collect().map(_.toSeq).toSeq
    val served = Hybrid.rerankFromIndexes(spark, d, s"$root/bm25",
      s"$root/int8").collect().map(_.toSeq).toSeq
    assert(served.sortBy(_.toString) === inline.sortBy(_.toString))
    assert(inline.nonEmpty)
  }
}
