package graft

import graft.operators.{Dedup, Multimodal, Sampling, Similarity}
import org.apache.spark.sql.functions._

/** LLM-pipeline operator tests: dedup families, similarity search,
  * multimodal plumbing.
  */
class DedupSimilaritySpec extends SparkSuite {
  import spark.implicits._

  test("exact dedup: one keep row per distinct text, copies counted") {
    val d = Dedup.exact(spark, sf())
    val nDocs = Tables.documents(spark, sf()).count()
    val agg = d.agg(sum("n_copies"), count(lit(1))).collect().head
    assert(agg.getLong(0) === nDocs) // copies partition the corpus
    assert(agg.getLong(1) <= nDocs)
  }

  test("shingles: distinct word 3-grams; short docs collapse to one") {
    val sh = Seq("a b c d", "x y").toDF("text")
      .select(Dedup.shingles(col("text")).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(sh(0).toSet === Set("a b c", "b c d"))
    assert(sh(1).toSeq === Seq("x y"))
  }

  test("minhash LSH finds a planted near-duplicate pair") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 40).map(i =>
      if (i == 20) "CHANGED" else s"tok$i").mkString(" ")
    val far = (1 to 40).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, base), (2L, near), (3L, far))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = tmpDir("minhash")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Dedup.minhashPairs(spark, dir, threshold = 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((1L, 2L)))
    val j = pairs.head.getAs[Double]("jaccard")
    assert(j > 0.8 && j < 1.0)
    // and the blocked exact-jaccard path agrees
    val exact = Dedup.ngramJaccardPairs(spark, dir, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact === Set((1L, 2L)))
  }

  test("novelty scores: copy of an earlier doc 0.0, fresh doc 1.0, " +
      "half-overlap hand-computed") {
    // doc1 "a b c d e" → shingles {abc,bcd,cde}; doc2 identical copy;
    // doc3 disjoint; doc4 "a b c d x y z" → {abc,bcd,cdx,dxy,xyz}:
    // abc,bcd first seen in doc1 → 3/5 novel
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "p q r s"),
      (4L, "a b c d x y z"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = tmpDir("novelty")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.novelty(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got(1L) === ((3L, 3L, 1.0)))
    assert(got(2L) === ((3L, 0L, 0.0)))
    assert(got(3L) === ((2L, 2L, 1.0)))
    assert(got(4L) === ((5L, 3L, 0.6)))
    // skew guard: hotDocs = 2 pushes the shared grams (abc, bcd — in
    // 3 docs each) onto the broadcast leg; the split must be invisible
    val split = Dedup.novelty(spark, dir, hotDocs = 2).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(split === got)
  }

  test("novelty erasure: erasing the first-seen copy PROMOTES the " +
      "earliest survivor (min is not subtractable — the re-derivation " +
      "path); serve and compaction equal a survivors-only rebuild") {
    // doc1 is the first-seen of the shared shingles {abc,bcd,cde};
    // docs 2,3 are copies; doc4 is disjoint and arrives as an append
    // batch. Erasing doc1 must make doc2 the cluster's novel copy.
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d e"),
      (4L, "p q r s t"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = tmpDir("novelty_del")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val idx = s"$dir/idx"
    Dedup.noveltyWriteIndex(spark, dir, idx,
      buildOnly = Some(col("doc_id") <= 3))
    Dedup.noveltyAppendBatch(spark, idx,
      docs.filter(col("doc_id") === 4).select("doc_id", "text"),
      batchId = 1L)
    Dedup.noveltyDeleteDocs(spark, idx,
      docs.filter(col("doc_id") === 1).select("doc_id", "text"),
      batchId = 1L)
    val survivors = Tables.documents(spark, dir)
      .filter(col("doc_id") =!= 1)
    def served(from: String) = Dedup.noveltyFromIndex(spark, from,
      survivors).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    val got = served(idx)
    assert(got(2L) === ((3L, 3L, 1.0))) // promoted to first-seen
    assert(got(3L) === ((3L, 0L, 0.0)))
    assert(got(4L) === ((3L, 3L, 1.0)))
    // parity: a survivors-only from-scratch index serves identically
    val ref = s"$dir/ref"
    Dedup.noveltyWriteIndex(spark, dir, ref,
      buildOnly = Some(col("doc_id") =!= 1))
    assert(served(ref) === got)
    // compaction pays the one corpus pass (affected grams re-min from
    // the survivor corpus), retires tombstones + batch dirs, and the
    // rewritten base equals the survivors-built base row-for-row
    Dedup.compactNoveltyDeletes(spark, idx, survivors)
    assert(!new java.io.File(s"$idx/tombstones").exists)
    assert(!new java.io.File(s"$idx/firstseen_batches").exists)
    assert(served(idx) === got)
    val baseRows = spark.read.parquet(s"$idx/firstseen").collect()
      .map(_.toSeq).toSet
    assert(baseRows === spark.read.parquet(s"$ref/firstseen").collect()
      .map(_.toSeq).toSet)
    Dedup.compactNoveltyDeletes(spark, idx, survivors) // no-op re-run
    assert(served(idx) === got)
  }

  test("incremental minhash: finds new-vs-index and new-vs-new pairs, " +
    "never re-pairs the index with itself") {
    import spark.implicits._
    def doc(seed: Int, change: Int = -1): String =
      (1 to 40).map(i =>
        if (i == change) "CHANGED" else s"w${seed}_$i").mkString(" ")
    // index: docs 1,2 are near-dups of each other (an OLD pair), 3 far
    val index = Seq((1L, doc(7)), (2L, doc(7, change = 5)), (3L, doc(9)))
      .toDF("doc_id", "text")
    // new batch: 10 near-dups index doc 1; 11 and 12 near-dup each
    // other; 13 matches nothing
    val fresh = Seq((10L, doc(7, change = 31)), (11L, doc(4)),
      (12L, doc(4, change = 8)), (13L, doc(5))).toDF("doc_id", "text")
    val got = Dedup.incrementalMinhashPairs(index, fresh,
      threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,2) — the index self-pair — must NOT re-emit; 10 also matches
    // doc 2 (both are 1-token edits of the same base)
    assert(got === Set((1L, 10L), (2L, 10L), (11L, 12L)))
    // parity with the full-corpus operator restricted to new-involved
    // pairs: write the union as a corpus and compare
    val dir = tmpDir("incdedup")
    index.unionByName(fresh)
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val full = Dedup.minhashPairs(spark, dir, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === full.filter(_._2 >= 10L))
    // the production path: the index's banded buckets persisted to
    // parquet (the lake artifact a daily run appends to) and read back
    // — identical pairs without re-shingling the standing corpus
    val idxDir = s"$dir/minhash_index"
    Dedup.minhashBuckets(index).write.mode("overwrite").parquet(idxDir)
    val fromIndex = Dedup.incrementalMinhashPairsFromIndex(
      spark.read.parquet(idxDir), index, fresh, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromIndex === got)
  }

  test("ngram jaccard block guard: a dominant block routes through LSH " +
    "and still finds the planted pairs") {
    def doc(ns: String, n: Int) = (1 to 40).map(i => s"$ns$n-$i")
      .mkString(" ")
    def nearDoc(ns: String, n: Int) = (1 to 40).map(i =>
      if (i == 20) "CHANGED" else s"$ns$n-$i").mkString(" ")
    // dominant block: 60 docs, 3 planted near-dup pairs, rest unrelated
    val dominant = (0 until 54).map(i => (i.toLong, doc("w", i))) ++
      (0 until 3).flatMap(c => Seq(
        (100L + 2 * c, doc("dup", c)), (101L + 2 * c, nearDoc("dup", c))))
    val small = Seq((200L, doc("s", 0)), (201L, nearDoc("s", 0)))
    val docs =
      dominant.map { case (id, t) => (id, t, "en", "web") } ++
        small.map { case (id, t) => (id, t, "de", "wiki") }
    val df = docs.toDF("doc_id", "text", "lang", "source")
    val expected = Set((100L, 101L), (102L, 103L), (104L, 105L),
      (200L, 201L))
    // cap 10 forces the 60-doc block onto the LSH path (the 2-doc block
    // stays exhaustive); result must match the unguarded exhaustive run
    val guarded = Dedup.ngramJaccardPairsOf(df, threshold = 0.5,
      maxBlockSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exhaustive = Dedup.ngramJaccardPairsOf(df, threshold = 0.5,
      maxBlockSize = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exhaustive === expected)
    assert(guarded === expected)
  }

  test("fused minhash signature is bit-identical to the composed " +
    "k-pass form (incl. empty and null-element arrays)") {
    import graft.functions.FusedMinHashSignature.fusedMinhash
    val k = 16
    // real shingle hashes from the corpus + crafted edge rows
    val real = Tables.documents(spark, sf())
      .select(Dedup.shingles(col("text")).as("sh"))
      .select(transform(col("sh"), x => xxhash64(x)).as("shh"))
    val edges = Seq(
      Seq[Option[Long]](),                       // empty → k nulls
      Seq[Option[Long]](None),                   // null element
      Seq[Option[Long]](Some(0L), None, Some(-1L)))
      .toDF("shh")
    for (df <- Seq(real, edges)) {
      val rows = df.select(
        Dedup.composedMinhashSignature(col("shh"), k).as("composed"),
        fusedMinhash(col("shh"), k).as("fused")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Any](0) === r.getSeq[Any](1))
      }
    }
    // and the planted-pair behavior is unchanged end-to-end (LSH path)
    val guardEdge = edges.count() // force evaluation of edge plan
    assert(guardEdge === 3)
  }

  test("clusterPairs: transitive chains collapse to one component " +
    "with the min id as canonical") {
    // chain 1-2-3 (NO direct 1-3 edge: tests transitivity), pair 10-11,
    // triangle 20-21-22
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("doc_a", "doc_b")
    // driverEdgeCap = 0 forces the DISTRIBUTED star contraction; the
    // default would take the driver union-find fast path here
    val got = Dedup.clusterPairs(pairs, driverEdgeCap = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
    // the fast path must produce the identical labeling
    val fast = Dedup.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === got)
    // end-to-end: planted near-dup pair forms a 2-cluster over documents
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 40).map(i =>
      if (i == 20) "CHANGED" else s"tok$i").mkString(" ")
    val far = (1 to 40).map(i => s"other$i").mkString(" ")
    val docs = Seq((5L, base), (9L, near), (3L, far))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = tmpDir("dupclust")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val clusters = Dedup.dupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(clusters.toSeq === Seq((5L, 2L, "5,9")))
  }

  test("clusterPairs: a 100-node path converges inside the round " +
    "budget (star contraction is O(log n), not O(diameter))") {
    // the adversarial shape for label propagation: a single chain —
    // min-label would need 99 rounds; large-star/small-star needs ~log
    val pairs = (1L until 100L).map(i => (i, i + 1))
      .toDF("doc_a", "doc_b")
    val got = Dedup.clusterPairs(pairs, maxIters = 20,
        driverEdgeCap = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length === 100)
    assert(got.forall(_._2 == 1L),
      s"unconverged labels: ${got.filter(_._2 != 1L).take(5).toSeq}")
  }

  test("dupClustersSample: bounded member sample + exact count") {
    val labels = ((1L to 50L).map(i => (i, 1L)) ++ Seq((100L, 100L)))
      .toDF("doc_id", "cluster_id")
    val got = Dedup.dupClustersSample(labels, sampleSize = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      .sortBy(_._1)
    assert(got === Seq(
      (1L, 50L, (1L to 10L).mkString(",")),
      (100L, 1L, "100")))
  }

  test("simhash bands find a planted near-duplicate; far docs excluded") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = ((1 to 59).map(i => s"tok$i") :+ "CHANGED").mkString(" ")
    val far = (1 to 60).map(i => s"zz$i").mkString(" ")
    val docs = Seq((1L, base), (2L, near), (3L, far))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = tmpDir("simhash")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Dedup.simhashPairs(spark, dir, maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("embedding near-dups finds a planted duplicate vector") {
    val rnd = new scala.util.Random(1)
    def vec() = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val v0 = vec()
    val nearV = v0.clone(); nearV(0) = nearV(0) + 0.01f
    val rows = Seq((0L, v0, 0), (1L, nearV, 0)) ++
      (2L until 50L).map(i => (i, vec(), 1))
    val dir = tmpDir("embdup")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val dups = Dedup.embeddingNearDups(spark, dir, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dups === Set((0L, 1L)))
  }

  test("embeddingOutliers: hand-computed centroid, distances, and " +
      "interpolated threshold flag exactly the planted far vector") {
    // nine vectors at (1,0,0,0) and one at (1,0,10,0): centroid is
    // exactly (1,0,1,0), so dists are nine 1.0s and one 9.0; the p90
    // interpolated threshold is 1 + 0.1*(9-1) = 1.8 — only the far
    // vector clears it
    val rows = (0L until 9L).map(i => (i, Array(1f, 0f, 0f, 0f), 0)) :+
      ((9L, Array(1f, 0f, 10f, 0f), 0))
    val dir = tmpDir("emboutl")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.embeddingOutliers(spark, dir, dim = 4, p = 0.9)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq === Seq((9L, 9.0, 1.8)))
  }

  test("ndcg@k: perfect ranking scores 1.0; a miss at rank 2 " +
      "hand-computes to 0.613147") {
    val truth = Seq((0L, 10L), (0L, 11L)).toDF("query_id", "vec_id")
    val perfect = Seq((0L, 10L, 1), (0L, 11L, 2))
      .toDF("query_id", "vec_id", "rk")
    val got1 = Similarity.ndcgAt(perfect, truth, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got1 === Seq((0L, 2L, 1.0)))
    // hit at rank 1, miss at rank 2: dcg = 1/log2(2) = 1,
    // idcg = 1 + 1/log2(3) = 1.6309297536 → ndcg 0.613147
    val part = Seq((0L, 10L, 1), (0L, 99L, 2))
      .toDF("query_id", "vec_id", "rk")
    val got2 = Similarity.ndcgAt(part, truth, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got2 === Seq((0L, 1L, 0.613147)))
    // rankings deeper than k truncate to the metric's cutoff — a
    // perfect 3-deep ranking at k=2 scores exactly 1.0, never above
    val deep = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
      .toDF("query_id", "vec_id", "rk")
    val deepTruth = Seq((0L, 10L), (0L, 11L), (0L, 12L))
      .toDF("query_id", "vec_id")
    val got3 = Similarity.ndcgAt(deep, deepTruth, 2).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(got3 === Seq((2L, 1.0)))
  }

  test("novelty index lifecycle: grown serve == inline, promote folds " +
      "min-per-gram and re-runs as a no-op") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "p q r s"),
      (4L, "a b c d x y z"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = tmpDir("novelty_idx")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val inline = Dedup.novelty(spark, dir).collect()
      .map(_.toSeq).sortBy(_.toString).toSeq
    val idx = s"$dir/novelty"
    // 80/20-style split: docs 1,2 indexed at build, 3,4 arrive as a
    // batch — doc 4 shares grams with doc 1, so the min-fold across
    // base and batch is exercised, not just disjoint concat
    Dedup.noveltyWriteIndex(spark, dir, idx,
      buildOnly = Some(col("doc_id") <= 2))
    Dedup.noveltyAppendBatch(spark, idx,
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") > 2), batchId = 1L)
    def served() = Dedup.noveltyFromIndex(spark, idx,
      spark.read.parquet(s"$dir/documents.parquet")).collect()
      .map(_.toSeq).sortBy(_.toString).toSeq
    assert(served() === inline) // grown index == one-shot recompute
    // retry idempotency: re-landing the same batch changes nothing
    Dedup.noveltyAppendBatch(spark, idx,
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") > 2), batchId = 1L)
    assert(served() === inline)
    Dedup.promoteNoveltyBatches(spark, idx)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(
      new org.apache.hadoop.fs.Path(s"$idx/firstseen_batches")))
    assert(served() === inline) // promoted: one-scan plan, same rows
    Dedup.promoteNoveltyBatches(spark, idx) // completed: no-op
    assert(served() === inline)
  }

  test("novelty served on docs the index never absorbed: unseen grams " +
      "count as first-seen-here, partially-covered docs score the " +
      "uncovered remainder as novel") {
    val docs = Seq((1L, "a b c d e"), (2L, "p q r s"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = tmpDir("novelty_unseen")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val idx = s"$dir/novelty"
    Dedup.noveltyWriteIndex(spark, dir, idx) // index knows docs 1, 2
    // probe docs NOT in the index: 10 is fully novel (every gram
    // unseen — previously vanished from the output entirely); 11
    // half-overlaps doc 1 ({abc,bcd} seen, {cdx,dxy,xyz} unseen)
    val probes = Seq((10L, "m n o p q"), (11L, "a b c d x y z"))
      .toDF("doc_id", "text")
    val got = Dedup.noveltyFromIndex(spark, idx, probes).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got(10L) === ((3L, 3L, 1.0)))
    assert(got(11L) === ((5L, 3L, 0.6)))
  }

  test("farthest-point coreset replays the hand-computed greedy " +
      "trajectory: orthogonal picks first, tie by vec_id, dup-direction " +
      "vector last with distance 0") {
    // vec 0 = e1 (the min-id seed), vec 1 = 2·e1 (same direction:
    // distance 0 to the seed), vecs 2/3 = e2/e3 (orthogonal: distance
    // 1, tied — vec_id breaks the tie toward 2)
    val rows = Seq(
      (0L, Array(1f, 0f, 0f), 0), (1L, Array(2f, 0f, 0f), 0),
      (2L, Array(0f, 1f, 0f), 0), (3L, Array(0f, 0f, 1f), 0))
    val dir = tmpDir("coreset")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Sampling.coreset(spark, dir, k = 4).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got === Seq((0, 0L, None), (1, 2L, Some(1.0)),
      (2, 3L, Some(1.0)), (3, 1L, Some(0.0))))
  }

  test("filtered search is PRE-filtering: a wrong-label near-identical " +
    "decoy never appears and never displaces qualifying vectors") {
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(32)(rnd.nextFloat() * 2 - 1)
    val q = vec()
    val decoy = q.clone(); decoy(0) = decoy(0) + 0.01f // cos≈1, label 1
    val sameA = q.map(_ * 0.5f).zipWithIndex.map { case (x, i) =>
      if (i < 16) x else -x } // moderate-sim, label 0
    val rows = Seq((0L, q, 0), (1L, decoy, 1), (2L, sameA, 0)) ++
      (3L until 20L).map(i => (i, vec(), (i % 2).toInt))
    val dir = tmpDir("annfilter")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.filteredBruteTopK(spark, dir, nQueries = 1, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // only label-0 vectors (even ids ≥ 2 here) may appear; the decoy —
    // the GLOBAL nearest neighbor — must not
    assert(got.nonEmpty)
    assert(!got.map(_._2).contains(1L))
    assert(got.forall { case (_, v) => v % 2 === 0 && v >= 2 })
  }

  test("filteredIvfTopK with exhaustive probing equals " +
    "filteredBruteTopK row-for-row (composite key loses nothing)") {
    val ivf = Similarity.filteredIvfTopK(spark, sf(), nCells = 8,
      nProbe = 8, nQueries = 5, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    val brute = Similarity.filteredBruteTopK(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    assert(ivf === brute)
  }

  test("maxsim ranks the all-aspects document above a stronger " +
    "single-aspect match (the behavior pooling averages away)") {
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(32)(rnd.nextFloat() * 2 - 1)
    // query doc 0 = vectors 0..1 (vecsPerDoc=2): two distinct aspects
    val a1 = vec(); val a2 = vec()
    // doc 1 (vecs 2..3) matches BOTH aspects moderately (cos≈1 after
    // small perturbation); doc 2 (vecs 4..5) matches aspect 1 exactly
    // (scaled copy ⇒ cos=1) but aspect 2 not at all (orthogonal-ish)
    def near(v: Array[Float]) = {
      val c = v.clone(); c(0) = c(0) + 0.05f; c }
    val rows = Seq(
      (0L, a1), (1L, a2),
      (2L, near(a1)), (3L, near(a2)),
      (4L, a1.map(_ * 2.0f)), (5L, vec()))
    val dir = tmpDir("maxsim")
    rows.toDF("vec_id", "embedding").withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.maxSimTopK(spark, dir, vecsPerDoc = 2,
      nQueryDocs = 1, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    // doc 1 scores ≈ 2.0 (both maxes ≈ 1); doc 2 ≈ 1 + small
    assert(got.toSeq === Seq((0L, 1L, 1), (0L, 2L, 2)))
  }

  test("maxSimTopKPruned with exhaustive probing equals maxSimTopK " +
    "row-for-row (pruning changes the candidate set, never the math)") {
    val full = Similarity.maxSimTopK(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    val pruned = Similarity.maxSimTopKPruned(spark, sf(), nCells = 8,
      nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    assert(pruned === full)
  }

  test("semDedup dominance policy: lower-id survivor, scale-invariant " +
    "drops, threshold gates — exact on a single-cell corpus") {
    val rnd = new scala.util.Random(5)
    def vec() = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val v0 = vec()
    val near = v0.clone(); near(0) = near(0) + 0.01f // cos ≈ 1 with v0
    val scaled = v0.map(_ * 3.0f) // cosine is scale-invariant: drops
    val other = vec() // unrelated: kept
    val dir = tmpDir("semdedup")
    Seq((10L, v0, 0), (11L, near, 0), (12L, scaled, 0), (13L, other, 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // nCells=1 ⇒ one cell, dominance is exact and hand-checkable
    val got = Dedup.semDedup(spark, dir, nCells = 1, threshold = 0.99)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq === Seq((4L, 2L, "11,12")))
    // a threshold above every pairwise cosine keeps everything
    val all = Dedup.semDedup(spark, dir, nCells = 1, threshold = 1.01)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(all.toSeq === Seq((4L, 4L, "")))
  }

  test("corpus-scaled LSH planes keep candidate counts ~linear on a " +
    "growing clustered corpus") {
    val dim = 16
    // deterministic pseudo-random float in [-1, 1) — no RNG state
    def h(a: Int, b: Int): Float = {
      var z = a.toLong * 0x9e3779b97f4a7c15L + b.toLong + 17
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      ((z ^ (z >>> 31)).toDouble / Long.MaxValue.toDouble).toFloat
    }
    // fixed-size clusters whose COUNT grows with n — the regime where
    // candidate pairs should stay linear-in-n if buckets scale with the
    // corpus (a single growing cluster is genuinely quadratic output)
    def write(n: Int): String = {
      val clusterSize = 20
      val rows = (0 until n).map { i =>
        val c = i / clusterSize
        val emb = Array.tabulate(dim)(j => h(c, j) + 0.05f * h(i, j + 999))
        (i.toLong, emb, c)
      }
      val dir = tmpDir(s"lshscale$n")
      rows.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      dir
    }
    val (n1, n2) = (2000, 8000)
    val (d1, d2) = (write(n1), write(n2))
    val occupancy = 64L
    val pSmall = Similarity.planesFor(n1, occupancy) // 5 planes, 32 buckets
    val pBig = Similarity.planesFor(n2, occupancy)   // 7 planes, 128 buckets
    assert(pBig > pSmall) // the knob actually moves with corpus size
    val candSmall =
      Dedup.embeddingCandidates(spark, d1, dim, pSmall).count()
    val candBig = Dedup.embeddingCandidates(spark, d2, dim, pBig).count()
    val candBigFixed =
      Dedup.embeddingCandidates(spark, d2, dim, pSmall).count()
    // 4× the corpus with scaled planes: ~4× the candidates (slack 8× for
    // bucket unevenness), NOT the ~16× a fixed plane count trends toward
    assert(candBig <= 8L * candSmall,
      s"candidates not ~linear: $candSmall -> $candBig")
    assert(candBig < candBigFixed,
      s"scaled planes ($pBig) should prune vs fixed ($pSmall): " +
        s"$candBig >= $candBigFixed")
    // recall safety: every same-cluster near-dup pair a full scan finds
    // is still found through the banded candidates
    import graft.functions.FusedCosineSimilarity.fusedCosine
    val emb = Tables.embeddings(spark, d2)
    val exhaustive = emb.select(col("vec_id").as("vec_a"),
        col("embedding").as("ea"), col("label").as("la"))
      .join(emb.select(col("vec_id").as("vec_b"),
        col("embedding").as("eb"), col("label").as("lb")),
        col("vec_a") < col("vec_b") && col("la") === col("lb"))
      .filter(fusedCosine(col("ea"), col("eb")) >= 0.995)
      .select(col("vec_a"), col("vec_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Dedup.embeddingNearDups(spark, d2, dim, pBig,
        threshold = 0.995)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall =
      if (exhaustive.isEmpty) 1.0
      else (exhaustive & found).size.toDouble / exhaustive.size
    AccuracyLedger.assertAtLeast("embedding_banded_lsh_recall", recall,
      0.9, band = 0.05)
  }

  test("IVF top-k recall vs brute force is usable (>= 0.5)") {
    val brute = Similarity.bruteForceTopK(spark, sf(), nQueries = 5, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // sf0.001 embeddings are isotropic random vectors — neighbors barely
    // cluster, so IVF recall tracks the probed-cell fraction; probe half
    // the cells to test the machinery, not embedding-space luck
    val ivf = Similarity.ivfTopK(spark, sf(), nQueries = 5, k = 10,
      nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("NearestCentroids matches the literal struct-argmax composition " +
      "bit-for-bit, ties included") {
    import graft.functions.NearestCentroids.nearestCells
    import graft.functions.FusedCosineSimilarity.fusedCosine
    // 7 centroids of dim 4; cells 2 and 5 are IDENTICAL so equal sims
    // exercise the (sim, cell)-descending tie rule (max cell id wins)
    val cents: Array[Array[Float]] = Array.tabulate(7, 4) { (c, i) =>
      val cc = if (c == 5) 2 else c
      ((cc * 31 + i * 7) % 17 - 8) / 8f
    }
    val vecs = spark.range(50).select(col("id"),
      transform(sequence(lit(0), lit(3)), i =>
        ((pmod(xxhash64(col("id"), i), lit(1000)).cast("double") / 500.0)
          - 1.0).cast("float")).as("v"))
      // plus an exact centroid hit (sim = 1 against two identical cells)
      .union(spark.range(1).select(lit(999L).as("id"),
        array(cents(2).map(lit(_)).toIndexedSeq: _*).cast("array<float>")
          .as("v")))
    val structs = array(cents.zipWithIndex.map { case (c, i) =>
      struct(fusedCosine(col("v"),
        array(c.map(lit(_)).toIndexedSeq: _*).cast("array<float>"))
        .as("sim"), lit(i).as("cell"))
    }.toIndexedSeq: _*)
    val got = vecs.select(col("id"),
        nearestCells(col("v"), cents, 3).as("top3"),
        element_at(nearestCells(col("v"), cents, 1), 1).as("argmax"),
        slice(reverse(array_sort(structs)), 1, 3).getField("cell")
          .as("lit_top3"),
        array_max(structs).getField("cell").as("lit_argmax"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Int](1) === r.getSeq[Int](3),
        s"top3 mismatch for id=${r.getLong(0)}")
      assert(r.getInt(2) === r.getInt(4),
        s"argmax mismatch for id=${r.getLong(0)}")
    }
    // the exact-hit row must pick the LARGER of the two identical cells
    val hit = got.find(_.getLong(0) == 999L).get
    assert(hit.getInt(2) === 5)
  }

  test("ivfTopKSharded with one shard degenerates to ivfTopK " +
      "bit-for-bit") {
    // same hash sample, same cellsFor geometry, same fit, same scoring
    // — the sharded pipeline must add nothing but the (no-op) shard key
    val single = Similarity.ivfTopK(spark, sf(), nQueries = 5, k = 10)
      .collect().map(_.toString).sorted.toSeq
    val sharded = Similarity.ivfTopKSharded(spark, sf(), nShards = 1,
        nQueries = 5, k = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(sharded === single)
  }

  test("persisted IVF index serves queries bit-identical to the " +
      "inline fit") {
    // production path: fit+assign ONCE (ivfWriteIndex), serve every
    // query from the lake artifacts — deterministic fit means the
    // round-trip must reproduce ivfTopK exactly
    val dir = tmpDir("ivfidx")
    Similarity.ivfWriteIndex(spark, sf(), dir)
    val queries = Tables.embeddings(spark, sf())
      .filter(col("vec_id") < 5)
    val fromIndex = Similarity.ivfTopKFromIndex(spark, dir, queries)
      .collect().map(_.toString).sorted.toSeq
    val inline = Similarity.ivfTopK(spark, sf(), nQueries = 5, k = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(fromIndex === inline)
    // the centroids artifact is bounded (one row per cell)
    val nCentroids =
      spark.read.parquet(s"$dir/centroids").count()
    assert(nCentroids === Similarity.cellsFor(
      Tables.embeddings(spark, sf()).count()))
  }

  test("ivfAppendBatch under frozen geometry: grown index serves " +
      "bit-identical to the one-shot build, idempotent under re-runs, " +
      "and compaction preserves it") {
    // the production growth pattern: fit geometry once (full corpus),
    // index 80%, let the held-out 20% arrive as append batches —
    // assignment is a pure function of (embedding, centroids), so the
    // grown index must serve the one-shot build's exact ranking
    val full = tmpDir("ivffull")
    val grown = tmpDir("ivfgrown")
    Similarity.ivfWriteIndex(spark, sf(), full)
    Similarity.ivfWriteIndex(spark, sf(), grown,
      assignOnly = Some(col("vec_id") % 5 =!= 4))
    val heldOut = Tables.embeddings(spark, sf())
      .filter(col("vec_id") % 5 === 4)
    Similarity.ivfAppendBatch(spark, grown,
      heldOut.filter(col("vec_id") % 2 === 0), batchId = 1L)
    Similarity.ivfAppendBatch(spark, grown,
      heldOut.filter(col("vec_id") % 2 =!= 0), batchId = 2L)
    val queries = Tables.embeddings(spark, sf())
      .filter(col("vec_id") < 5)
    def serve(dir: String): Seq[String] =
      Similarity.ivfTopKFromIndex(spark, dir, queries)
        .collect().map(_.toString).sorted.toSeq
    val oneShot = serve(full)
    assert(serve(grown) === oneShot)
    // a retried batch must REPLACE its own partitions, not duplicate
    // rows (dynamic partition overwrite keyed by batch=<id>)
    Similarity.ivfAppendBatch(spark, grown,
      heldOut.filter(col("vec_id") % 2 =!= 0), batchId = 2L)
    assert(serve(grown) === oneShot)
    // compaction folds the committed batch dirs into one; the served
    // ranking is unchanged and the base assignments stay untouched
    val batchesRoot = new java.io.File(s"$grown/assignments_batches")
    def batchDirs: Seq[String] = batchesRoot.listFiles().toSeq
      .map(_.getName).filter(_.startsWith("batch=")).sorted
    assert(batchDirs === Seq("batch=1", "batch=2"))
    Similarity.compactIvfAppends(spark, grown, upToBatch = 2L)
    assert(batchDirs === Seq("batch=2"))
    assert(serve(grown) === oneShot)
  }

  test("promoteBatches folds ANN appends into base: serve unchanged, " +
      "re-run a no-op, and the PQ codes table promotes the same way") {
    val full = tmpDir("ivfpromfull")
    val grown = tmpDir("ivfpromgrown")
    Similarity.ivfWriteIndex(spark, sf(), full)
    Similarity.ivfWriteIndex(spark, sf(), grown,
      assignOnly = Some(col("vec_id") % 5 =!= 4))
    val heldOut = Tables.embeddings(spark, sf())
      .filter(col("vec_id") % 5 === 4)
    Similarity.ivfAppendBatch(spark, grown, heldOut, batchId = 1L)
    val queries = Tables.embeddings(spark, sf())
      .filter(col("vec_id") < 5)
    def serve(dir: String): Seq[String] =
      Similarity.ivfTopKFromIndex(spark, dir, queries)
        .collect().map(_.toString).sorted.toSeq
    val want = serve(full)
    assert(serve(grown) === want)
    Similarity.promoteBatches(spark, grown)
    // side dirs retired, all rows in base, answers bit-identical
    assert(!new java.io.File(s"$grown/assignments_batches").exists())
    assert(spark.read.parquet(s"$grown/assignments").count() ===
      Tables.embeddings(spark, sf()).count())
    assert(serve(grown) === want)
    Similarity.promoteBatches(spark, grown) // completed: no-op
    assert(serve(grown) === want)
    // the compressed tier promotes through the same generic fold
    val pqFull = tmpDir("pqpromfull")
    val pqGrown = tmpDir("pqpromgrown")
    Similarity.ivfPqWriteIndex(spark, sf(), pqFull)
    Similarity.ivfPqWriteIndex(spark, sf(), pqGrown,
      assignOnly = Some(col("vec_id") % 5 =!= 4))
    Similarity.ivfPqAppendBatch(spark, pqGrown, heldOut, batchId = 1L)
    def servePq(dir: String): Seq[String] =
      Similarity.ivfPqTopKFromIndex(spark, dir, queries)
        .collect().map(_.toString).sorted.toSeq
    val wantPq = servePq(pqFull)
    assert(servePq(pqGrown) === wantPq)
    Similarity.promoteBatches(spark, pqGrown, table = "codes")
    assert(!new java.io.File(s"$pqGrown/codes_batches").exists())
    assert(servePq(pqGrown) === wantPq)
  }

  test("LSH lifecycle: frozen-plane appends serve the one-shot " +
      "ranking, and the buckets table promotes through the same fold") {
    val full = tmpDir("lshlcfull")
    val grown = tmpDir("lshlcgrown")
    Similarity.lshWriteIndex(spark, sf(), full)
    // plane set from the FULL corpus, 80% indexed
    Similarity.lshWriteIndex(spark, sf(), grown,
      assignOnly = Some(col("vec_id") % 5 =!= 4))
    val heldOut = Tables.embeddings(spark, sf())
      .filter(col("vec_id") % 5 === 4)
    Similarity.lshAppendBatch(spark, grown, heldOut, batchId = 1L)
    val queries = Tables.embeddings(spark, sf())
      .filter(col("vec_id") < 5)
    def serve(dir: String): Seq[String] =
      Similarity.annTopKFromIndex(spark, dir, queries)
        .collect().map(_.toString).sorted.toSeq
    val want = serve(full)
    assert(serve(grown) === want) // bucket = f(embedding, planes): exact
    // retry: the same batch id overwrites itself, nothing double-counts
    Similarity.lshAppendBatch(spark, grown, heldOut, batchId = 1L)
    assert(serve(grown) === want)
    Similarity.promoteBatches(spark, grown, table = "buckets",
      partitionCol = "bucket")
    assert(!new java.io.File(s"$grown/buckets_batches").exists())
    assert(spark.read.parquet(s"$grown/buckets").count() ===
      Tables.embeddings(spark, sf()).count())
    assert(serve(grown) === want)
  }

  test("drift-triggered refit: a hot append batch trips the " +
      "concentration signal, the refit reproduces the one-shot " +
      "geometry of the accreted corpus, and batches are retired") {
    val dim = 16
    def h(a: Int, b: Int): Float = { // deterministic pseudo-random
      var z = a.toLong * 0x9e3779b97f4a7c15L + b.toLong + 29
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      ((z ^ (z >>> 31)).toDouble / Long.MaxValue.toDouble).toFloat
    }
    val base = (0 until 320).map(i =>
      (i.toLong, Array.tabulate(dim)(j => h(i, j)), 0))
    // the drifted arrival: one tight cluster, all landing in one cell
    val hot = (320 until 620).map(i =>
      (i.toLong, Array.tabulate(dim)(j => h(7, j) + 0.01f * h(i, j)), 1))
    val baseDir = tmpDir("driftbase")
    base.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$baseDir/embeddings.parquet")
    val unionDir = tmpDir("driftunion")
    (base ++ hot).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$unionDir/embeddings.parquet")
    val idx = tmpDir("driftidx")
    Similarity.ivfWriteIndex(spark, baseDir, idx)
    // balanced index: below threshold, the policy must NOT refit
    assert(Similarity.ivfConcentration(spark, idx) < 4.0)
    assert(!Similarity.refitIvfIfDrifted(spark, idx))
    val frozenCentroids = spark.read.parquet(s"$idx/centroids")
      .collect().map(_.toString).sorted.toSeq
    Similarity.ivfAppendBatch(spark, idx,
      Tables.embeddings(spark, unionDir).filter(col("vec_id") >= 320),
      batchId = 1L)
    // ~half the corpus now sits in one frozen cell
    assert(Similarity.ivfConcentration(spark, idx) >= 4.0)
    assert(Similarity.refitIvfIfDrifted(spark, idx))
    // swap completed: batches retired, geometry actually changed
    assert(!new java.io.File(s"$idx/assignments_batches").exists())
    assert(spark.read.parquet(s"$idx/centroids")
      .collect().map(_.toString).sorted.toSeq !== frozenCentroids)
    // the deterministic fit over the accreted content reproduces the
    // one-shot geometry of the union corpus ⇒ serves bit-identically
    val queries = Tables.embeddings(spark, unionDir)
      .filter(col("vec_id") < 5)
    val served = Similarity.ivfTopKFromIndex(spark, idx, queries)
      .collect().map(_.toString).sorted.toSeq
    val inline = Similarity.ivfTopK(spark, unionDir, nQueries = 5)
      .collect().map(_.toString).sorted.toSeq
    assert(served === inline)
  }

  test("persisted SHARDED IVF index serves queries bit-identical to " +
      "the inline sharded fit") {
    val dir = tmpDir("ivfshidx")
    Similarity.ivfWriteIndexSharded(spark, sf(), dir, nShards = 2)
    val queries = Tables.embeddings(spark, sf())
      .filter(col("vec_id") < 5)
    val fromIndex = Similarity
      .ivfTopKShardedFromIndex(spark, dir, queries)
      .collect().map(_.toString).sorted.toSeq
    val inline = Similarity.ivfTopKSharded(spark, sf(), nShards = 2,
        nQueries = 5, k = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(fromIndex === inline)
  }

  test("persisted LSH index serves queries bit-identical to the " +
      "inline path") {
    // the one-row meta (planes, dim) is the whole model — seeded
    // hyperplanes — so the round-trip must reproduce annTopK exactly
    val dir = tmpDir("lshidx")
    Similarity.lshWriteIndex(spark, sf(), dir)
    val queries = Tables.embeddings(spark, sf())
      .filter(col("vec_id") < 5)
    val fromIndex = Similarity.annTopKFromIndex(spark, dir, queries)
      .collect().map(_.toString).sorted.toSeq
    val inline = Similarity.annTopK(spark, sf(), nQueries = 5, k = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(fromIndex === inline)
  }

  test("ivfTopKSharded keeps usable recall across shards and returns " +
      "exactly k ranked rows per query") {
    val brute = Similarity.bruteForceTopK(spark, sf(), nQueries = 5, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = Similarity.ivfTopKSharded(spark, sf(), nShards = 3,
      nQueries = 5, k = 10).collect()
    // shape: 5 queries × 10 rows, ranks 1..10, no self-matches
    assert(rows.length === 50)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq === (1 to 10),
        s"ranks not 1..10 for query $q")
      assert(rs.forall(_.getLong(1) != q))
    }
    val found = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & found).size.toDouble / brute.size
    // isotropic test vectors: recall tracks probed fraction per shard;
    // the floor proves cross-shard merge surfaces real neighbors from
    // every shard, not that this corpus clusters
    assert(recall >= 0.4, s"recall $recall")
  }

  test("empty shards are skipped, not probed: oversharded tiny corpus " +
      "still answers every query") {
    // 64 shards over a tiny corpus leaves many shards with NO vectors
    // (balls-in-bins, deterministic under the fixed xxhash64): the fit
    // returns empty centroid slices for them and both dispatch and
    // query fan-out must skip those shards outright — the old sentinel
    // matrix relied on NearestCentroids null-propagating a dimension
    // mismatch. Occupied shards here are small enough to get one cell
    // each, so the probe is exhaustive and must equal brute force.
    val brute = Similarity.bruteForceTopK(spark, sf(), nQueries = 3, k = 5)
      .collect().map(_.toString).sorted.toSeq
    val sharded = Similarity.ivfTopKSharded(spark, sf(), nShards = 64,
        nQueries = 3, k = 5)
      .collect().map(_.toString).sorted.toSeq
    assert(sharded === brute)
  }

  test("shardsFor holds per-shard occupancy at the measured regime") {
    assert(Similarity.shardsFor(500L) === 1)
    assert(Similarity.shardsFor(65536L) === 1)
    assert(Similarity.shardsFor(65537L) === 2)
    assert(Similarity.shardsFor(1000000L) === 16)
    // capped dispatch width: shards stop growing at maxShards
    assert(Similarity.shardsFor(100000000L) === 32)
  }

  test("ivfTopK reference-object and literal-centroid paths are " +
      "bit-identical") {
    def rows(literal: Boolean) =
      Similarity.ivfTopK(spark, sf(), nQueries = 5, k = 10, nProbe = 8,
          literalCentroids = literal)
        .collect().map(_.toString).sorted.toSeq
    assert(rows(literal = false) === rows(literal = true))
  }

  test("NearestCentroids keeps whole-stage codegen under the JVM method " +
      "limit at 256 cells (the r8 literal-plan ceiling)") {
    import graft.functions.NearestCentroids.nearestCells
    import org.apache.spark.sql.execution.debug._
    val cents: Array[Array[Float]] = Array.tabulate(256, 64) { (c, i) =>
      ((c * 31 + i * 7) % 17 - 8) / 8f
    }
    val df = spark.range(200).select(
        transform(sequence(lit(0), lit(63)), i =>
          ((pmod(xxhash64(col("id"), i), lit(1000)).cast("double") / 500.0)
            - 1.0).cast("float")).as("v"))
      .select(nearestCells(col("v"), cents, 32).as("cells"))
    // positive compile assertion: every whole-stage subtree compiles and
    // no generated method approaches the 64 KB bytecode limit that
    // silently dropped the 98-literal-centroid plan to interpreted eval
    val stats = codegenStringSeq(df.queryExecution.executedPlan)
    assert(stats.nonEmpty)
    stats.foreach { case (_, _, s) =>
      assert(s.maxMethodCodeSize < 16000,
        s"generated method ${s.maxMethodCodeSize} bytes — too close to " +
          "the 65535 whole-stage fallback threshold")
    }
    // and the result is sane: 32 distinct cells per row
    val first = df.collect()
    assert(first.length === 200)
    first.foreach { r =>
      val cells = r.getSeq[Int](0)
      assert(cells.length === 32)
      assert(cells.distinct.length === 32)
    }
  }

  test("cosine: self-similarity is 1, orthogonal is 0") {
    val df = Seq((Array(1f, 0f, 2f), Array(1f, 0f, 2f)),
      (Array(1f, 0f, 0f), Array(0f, 3f, 0f)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c")).collect()
    assert(math.abs(df(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(df(1).getDouble(0)) < 1e-12)
  }

  test("brute-force top-k: k rows per query, descending similarity") {
    val tk = Similarity.bruteForceTopK(spark, sf(), nQueries = 3, k = 5)
      .collect()
    val byQ = tk.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet === Set(0L, 1L, 2L))
    byQ.values.foreach { rows =>
      assert(rows.length === 5)
      val sims = rows.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("sim"))
      assert(sims.toSeq === sims.sorted.reverse.toSeq)
    }
  }

  test("ANN top-k recall vs brute force is usable (>= 0.5)") {
    val brute = Similarity.bruteForceTopK(spark, sf(), nQueries = 5, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(spark, sf(), nQueries = 5, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("fused cosine Expression is bit-identical to the composed form " +
    "and SQL-registrable") {
    import graft.functions.FusedCosineSimilarity
    val emb = Tables.embeddings(spark, sf())
    val pairs = emb.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(emb.filter(col("vec_id") < 3)
        .select(col("embedding").as("b")))
    val diff = pairs.select(
      (Similarity.cosine(col("a"), col("b")) -
        FusedCosineSimilarity.fusedCosine(col("a"), col("b"))).as("d"))
      .agg(max(abs(col("d")))).collect().head.getDouble(0)
    assert(diff === 0.0) // same accumulation order → bit-identical
    FusedCosineSimilarity.register(spark)
    emb.createOrReplaceTempView("emb_v")
    val viaSql = spark.sql(
      "SELECT fused_cosine(embedding, embedding) AS c FROM emb_v LIMIT 5")
      .collect().map(_.getDouble(0))
    viaSql.foreach(c => assert(math.abs(c - 1.0) < 1e-12))
  }

  test("fused cosine matches composed-form null semantics " +
    "(ragged arrays, null elements) and rejects wrong arity") {
    import graft.functions.FusedCosineSimilarity
    import spark.implicits._
    val df = Seq(
      (Seq(Option(1.0f), Option(2.0f)), Seq(Option(3.0f), Option(4.0f))),
      (Seq(Option(1.0f), Option(2.0f)), Seq(Option(3.0f))),
      (Seq(Option(1.0f), None), Seq(Option(3.0f), Option(4.0f))),
      // zero-norm divisor: composed Divide yields null (non-ANSI),
      // fused must match, not NaN
      (Seq(Option(0.0f), Option(0.0f)), Seq(Option(3.0f), Option(4.0f))),
      (Seq(Option(1.0f), Option(2.0f)), Seq(Option(0.0f), Option(0.0f))),
      (Seq.empty[Option[Float]], Seq.empty[Option[Float]]))
      .toDF("a", "b")
      .select(col("a").cast("array<float>").as("a"),
        col("b").cast("array<float>").as("b"))
    val rows = df.select(
      Similarity.cosine(col("a"), col("b")).as("composed"),
      FusedCosineSimilarity.fusedCosine(col("a"), col("b")).as("fused"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1),
        s"null parity broken: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) === r.getDouble(1))
    }
    assert(!rows(0).isNullAt(1)) // equal-length non-null → a number
    assert(rows(1).isNullAt(1))  // ragged → null, like zip_with padding
    assert(rows(2).isNullAt(1))  // null element → null propagates
    assert(rows(3).isNullAt(1))  // all-zero left vector → null, not NaN
    assert(rows(4).isNullAt(1))  // all-zero right vector → null, not NaN
    assert(rows(5).isNullAt(1))  // empty arrays (0/0) → null, not NaN
    FusedCosineSimilarity.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT fused_cosine(array(CAST(1.0 AS FLOAT)))")
    }
    assert(e.getMessage.contains("fused_cosine"))
  }

  test("aggregate top-k equals the window top-k exactly") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
    val win = Similarity.bruteForceTopK(spark, sf(), nQueries = 4, k = 7)
      .collect().map(key).toSet
    val agg = Similarity.bruteForceTopKAgg(spark, sf(), nQueries = 4, k = 7)
      .collect().map(key).toSet
    assert(agg === win)
    assert(agg.size === 28)
  }

  test("hash sampling is deterministic, key-coherent, near-rate") {
    val docs = Tables.documents(spark, sf())
    val s1 = Sampling.hashSample(docs, "doc_id", 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(docs, "doc_id", 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 === s2) // stable across runs
    val rate = s1.size.toDouble / docs.count()
    assert(rate > 0.1 && rate < 0.3, s"rate $rate")
    // monotone: a smaller fraction is a subset of a larger one
    val s3 = Sampling.hashSample(docs, "doc_id", 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s3.subsetOf(s1))
  }

  test("token mixture: admits per-source docs in hash order until the " +
    "budget, including the crossing doc") {
    import spark.implicits._
    val dir = tmpDir("mixture")
    // one source, 5 docs of 10 tokens each; hash order is a fixed
    // permutation of the ids, so budget=25 admits the first 3 docs in
    // that order (10+10 < 25 admits the third, 30 >= 25 stops the 4th)
    (0L to 4L).map(i => (i, (1 to 10).map(j => s"t${i}_$j").mkString(" "),
        "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val row = Sampling.tokenMixture(spark, dir, perSourceBudget = 25)
      .head()
    assert(row.getLong(1) === 3L) // n_docs: two under budget + crossing
    assert(row.getLong(2) === 30L)
    // whole-corpus sanity on driver data: every source hits >= budget
    // or returns all of its docs, and the result is deterministic
    val a = Sampling.tokenMixture(spark, sf(), perSourceBudget = 100)
      .collect().map(_.toString).sorted.toSeq
    val b = Sampling.tokenMixture(spark, sf(), perSourceBudget = 100)
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("weighted sampling: heavy weights dominate, deterministic") {
    val df = spark.range(200)
      .select(col("id"),
        (col("id") % 2).as("grp"),
        when(col("id") < 4, lit(1e9)).otherwise(lit(1e-3)).as("wt"))
    val picked = Sampling.weightedSample(df, "grp", "id", "wt", k = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    // ids 0-3 carry ~all the weight (two per group) → always selected
    assert(picked === Set(0L, 1L, 2L, 3L))
    val again = Sampling.weightedSample(df, "grp", "id", "wt", k = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again === picked)
    // equal weights: still exactly k per group, stable
    val eq = df.withColumn("wt", lit(1.0))
    val eqPick = Sampling.weightedSample(eq, "grp", "id", "wt", k = 5)
    assert(eqPick.groupBy("grp").count().collect()
      .forall(_.getLong(1) === 5L))
    // non-positive weights are excluded (ES priority is undefined there)
    // rather than corrupting the ordering
    val mixed = spark.range(20).select(col("id"), lit(0L).as("grp"),
      when(col("id") < 10, lit(-1.0))
        .when(col("id") < 15, lit(0.0))
        .otherwise(lit(1.0)).as("wt"))
    val mixedPick = Sampling.weightedSample(mixed, "grp", "id", "wt",
      k = 20).select("id").collect().map(_.getLong(0)).toSet
    assert(mixedPick === (15L until 20L).toSet)
    // aggregator form ≡ window-oracle form on less-degenerate weights,
    // and its plan is a partial aggregation, not a full window sort
    val varied = spark.range(500).select(col("id"),
      (col("id") % 7).as("grp"),
      (pmod(xxhash64(col("id")), lit(97)) + 1).cast("double").as("wt"))
    val aggIds = Sampling.weightedSample(varied, "grp", "id", "wt", k = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    val winIds = Sampling
      .weightedSampleWindow(varied, "grp", "id", "wt", k = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(aggIds === winIds)
    val plan = Sampling.weightedSample(varied, "grp", "id", "wt", k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec") && !plan.contains("Window "),
      s"weightedSample should not rank with a window:\n$plan")
  }

  test("typed reservoir Aggregator: k per group, deterministic, valid") {
    val sample1 = Sampling.sampledEventIds(spark, sf(), k = 5).collect()
      .map { case (t, ids) => t -> ids }.toMap
    val sample2 = Sampling.sampledEventIds(spark, sf(), k = 5).collect()
      .map { case (t, ids) => t -> ids }.toMap
    assert(sample1 === sample2) // deterministic priorities → stable
    val byType = Tables.events(spark, sf())
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byType.foreach { case (t, n) =>
      val ids = sample1(t)
      assert(ids.length === math.min(5L, n))
      assert(ids.distinct.length === ids.length)
    }
    // documented multiset semantics: duplicates collapse — the sample is
    // over DISTINCT values, unaffected by repetition counts
    import spark.implicits._
    val skewed = (Seq.fill(1000)(7L) ++ (0L until 10L))
      .map(("g", _)).toDF("event_type", "event_id")
      .as[(String, Long)].groupByKey(_._1)
      .agg(new Sampling.ReservoirSampleAgg(4).toColumn.name("sample"))
      .collect().head._2
    val unique = ((0L until 10L) :+ 7L).distinct
      .map(("g", _)).toDF("event_type", "event_id")
      .as[(String, Long)].groupByKey(_._1)
      .agg(new Sampling.ReservoirSampleAgg(4).toColumn.name("sample"))
      .collect().head._2
    assert(skewed === unique)
  }

  test("language-ID: profiles fit once (cached) and separate synthetic " +
    "languages") {
    import graft.operators.TextOps
    val en = "the quick brown fox jumps over the lazy dog again and again"
    val xx = "zzq wwk qqv vvp zzq wwk vvp zzq qqv wwk zzq vvp"
    val docs = ((0L until 10L).map(i => (i, s"$en tail$i", "en")) ++
      (10L until 20L).map(i => (i, s"$xx zz$i", "xx")))
      .map { case (id, t, l) => (id, t, l, "s") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val dir = tmpDir("langid")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val p1 = TextOps.langProfiles(spark, dir)
    val p2 = TextOps.langProfiles(spark, dir)
    assert(p1 eq p2) // fit-once: second call is the cached model
    // explicit invalidation hook for in-place rewrites: next call refits
    TextOps.clearLangProfiles(dir)
    val p3 = TextOps.langProfiles(spark, dir)
    assert(!(p3 eq p1) && p3 === p1) // fresh fit, same data → same model
    assert(p1.map(_._1).toSet === Set("en", "xx"))
    val scored = TextOps
      .scoreLangId(Tables.documents(spark, dir), p1)
      .collect().map(r => (r.getString(1), r.getString(2)))
    val acc = scored.count { case (l, p) => l == p }.toDouble / scored.length
    // floor + round-over-round ledger band (synthetic corpus is
    // deterministic, so the recorded value is stable across runs)
    AccuracyLedger.assertAtLeast("lang_id_synthetic_accuracy", acc, 0.9)
  }

  test("multimodal: deterministic features, frame sampling, stats") {
    val assets = Multimodal.syntheticAssets(spark, 30)
    val feats = Multimodal.extractFeatures(assets).collect()
    assert(feats.length === 30)
    feats.foreach { f =>
      assert(f.feature.length === 8)
      assert(math.abs(f.feature.sum - 1.0f) < 1e-3)
      assert(f.width >= 1 && f.height >= 1)
    }
    // determinism: second run identical
    val again = Multimodal.extractFeatures(assets).collect()
    assert(feats.map(_.checksum).toSeq === again.map(_.checksum).toSeq)
    val frames = Multimodal.sampleFrames(assets).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 4 == 0))
    val stats = Multimodal.assetStats(assets.toDF()).collect()
    assert(stats.map(_.getAs[String]("kind")).toSet
      === Set("image", "audio", "video"))
  }

  test("minhash candidate stage is a superset of verified pairs") {
    val cand = Dedup.minhashCandidates(spark, sf("sf0.01"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairs = Dedup.minhashPairs(spark, sf("sf0.01"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.subsetOf(cand))
    assert(pairs.nonEmpty)
  }

  test("minhash hash-array verification matches the string-shingle form") {
    // the r6 single-pass verify computes jaccard over 8-byte shingle
    // hashes; recompute it over the raw string shingles for every
    // emitted pair and require identical values
    val pairs = Dedup.minhashPairs(spark, sf("sf0.01"))
    val sh = Tables.documents(spark, sf("sf0.01"))
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val recomputed = pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
        Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(array_union(col("sh_a"), col("sh_b")))).as("jaccard_str"))
      .collect()
    assert(recomputed.nonEmpty)
    recomputed.foreach { r =>
      assert(r.getDouble(2) === r.getDouble(3),
        s"hash vs string jaccard diverged for (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("parallelism floor repartitions starved scans, preserves results") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val floored = Tables.parallelized(docs)
    // the testdata is one unsplittable file -> the floor must engage
    // (local[4] session: defaultParallelism 4, scan partitions 1)
    assert(docs.rdd.getNumPartitions === 1)
    assert(floored.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    assert(floored.count() === docs.count())
    // already-parallel input passes through untouched (no extra stage)
    val wide = docs.repartition(8)
    assert(Tables.parallelized(wide).queryExecution.executedPlan
      eq wide.queryExecution.executedPlan)
  }

  test("fused jaccard: bit-equal to the composed set form, incl. dups " +
    "and interpreted/codegen parity") {
    import graft.functions.FusedJaccardSorted.fusedJaccard
    // seeded random long-sets incl. adjacent duplicates, empties, and
    // disjoint/identical extremes
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      def arr(n: Int) = Seq.fill(n)(rnd.nextInt(40).toLong)
      val a = arr(rnd.nextInt(30)).sorted
      val b = if (i % 7 == 0) a else arr(rnd.nextInt(30)).sorted
      (a, b)
    } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+ ((Seq(3L), Seq(3L)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      fusedJaccard(col("a"), col("b")).as("fused"),
      (size(array_intersect(col("a"), col("b"))).cast("double")
        / size(array_union(col("a"), col("b")))).as("composed"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) === 0,
        s"fused ${r.getDouble(0)} != composed ${r.getDouble(1)}")
    }
    // both-empty: composed 0/0 is NaN; fused must match
    val nan = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
      .select(fusedJaccard(col("a"), col("b"))).collect().head.getDouble(0)
    assert(nan.isNaN)
    // interpreted eval (codegen off) must agree with codegen
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = df.select(fusedJaccard(col("a"), col("b"))).collect()
        .map(_.getDouble(0))
      val cg = got.map(_.getDouble(0))
      interp.zip(cg).foreach { case (x, y) =>
        assert(java.lang.Double.compare(x, y) === 0)
      }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("canonicalDocs keeps the least-repetitive member, not the " +
      "first: planted cluster where the keep-best rule bites") {
    import spark.implicits._
    // doc 0 repeats its opening bigram (dup_bigram 1/13); doc 1 is the
    // same text with the repeat replaced by a fresh token (dup 0,
    // Jaccard 10/13 ≈ 0.77 — a near-dup pair). Keep-first would pick
    // 0; the quality rule must pick 1.
    val ws = (1 to 12).map(i => s"w$i")
    val a = (ws ++ Seq("w1", "w2")).mkString(" ")
    val b = (ws :+ "x").mkString(" ")
    val dir = tmpDir("canon")
    Seq((0L, a, "en", "s", 0L), (1L, b, "en", "s", 0L),
      // an exact-duplicate pair: identical features, keep min id
      (5L, "p q r s t u v p q", "en", "s", 0L),
      (6L, "p q r s t u v p q", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.Dedup.canonicalDocs(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4),
        r.getString(5))).toMap
    assert(rows(0L) === ((1L, 2L, "0,1"))) // quality beats id order
    assert(rows(5L) === ((5L, 2L, "5,6"))) // exact tie -> min doc_id
  }

  test("canonical selection and syndication served from the persisted " +
      "full-corpus bucket index equal the inline recomputes (grown " +
      "index: base + append batch)") {
    def doc(ns: String) = (1 to 12).map(i => s"$ns$i").mkString(" ")
    def nearDoc(ns: String) = ((1 to 11).map(i => s"$ns$i") :+ "x")
      .mkString(" ")
    // two cross-source near-dup pairs + one exact pair, ids straddling
    // the %5 build/append split so the batch genuinely contributes
    val dir = tmpDir("mhserve")
    Seq((0L, doc("a"), "en", "web"), (4L, nearDoc("a"), "en", "wiki"),
      (7L, doc("b"), "en", "web"), (9L, nearDoc("b"), "en", "web"),
      (10L, "p q r s t u v w", "en", "news"),
      (14L, "p q r s t u v w", "en", "web"),
      (11L, doc("z"), "en", "news"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val idx = tmpDir("mhserve_idx")
    operators.Dedup.minhashWriteIndex(spark, dir, idx,
      buildOnly = Some(col("doc_id") % 5 =!= 4))
    operators.Dedup.minhashAppendBatch(spark, idx,
      Tables.documents(spark, dir).filter(col("doc_id") % 5 === 4),
      batchId = 1L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    val pairsInline = rows(operators.Dedup.minhashPairs(spark, dir))
    assert(pairsInline.size >= 3) // non-vacuous: planted pairs found
    assert(rows(operators.Dedup.minhashPairsFromIndex(spark, dir, idx))
      === pairsInline)
    assert(rows(operators.Dedup.canonicalDocsFromIndex(spark, dir, idx))
      === rows(operators.Dedup.canonicalDocs(spark, dir)))
    val synd = rows(operators.Dedup.syndicationFromIndex(spark, dir, idx))
    assert(synd === rows(operators.Dedup.syndicationMatrix(spark, dir)))
    // the matrix must carry an off-diagonal (cross-source) cell —
    // the copy-detection signal the planner reads
    assert(synd.exists(r => r(0) != r(1)))
    // erasure: tombstone doc 9 (one member of the (7, 9) pair) — the
    // served consumers must answer the survivors-only construction
    operators.Dedup.minhashDeleteIds(spark, idx,
      Seq(9L).toDF("doc_id"), batchId = 1L)
    val survivors = tmpDir("mhserve_survivors")
    Tables.documents(spark, dir).filter(col("doc_id") =!= 9)
      .write.mode("overwrite")
      .parquet(s"$survivors/documents.parquet")
    val wantPairs = rows(operators.Dedup.minhashPairs(spark, survivors))
    assert(wantPairs.nonEmpty && wantPairs.size < pairsInline.size)
    // the serve's verify side may read the FULL corpus table — deleted
    // docs can no longer pair, so they never reach the verify stage
    def pairsDel() =
      rows(operators.Dedup.minhashPairsFromIndex(spark, dir, idx))
    assert(pairsDel() === wantPairs)
    assert(rows(operators.Dedup.canonicalDocsFromIndex(spark, dir, idx))
      === rows(operators.Dedup.canonicalDocs(spark, survivors)))
    // compaction folds the tombstones into a fresh base: same answers,
    // side dirs retired, re-run no-op
    operators.Dedup.compactBucketDeletes(spark, idx)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/tombstones")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$idx/buckets_batches")))
    assert(pairsDel() === wantPairs)
    operators.Dedup.compactBucketDeletes(spark, idx)
    assert(pairsDel() === wantPairs)
  }

  test("mmr rerank: round-0 is the relevance argmax, picks are unique, " +
      "and diversification reorders at least one query vs plain top-k") {
    val d = "/root/testdata/sf0.001"
    val mmr = operators.Similarity.mmrTopK(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(mmr.length === 25) // 5 probes × k=5
    val brute = operators.Similarity.bruteForceTopK(spark, d, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1)))
    val topByQ = brute.groupBy(_._1)
      .map { case (q, rs) => q -> rs.sortBy(_._2).map(_._3).toSeq }
    val mmrByQ = mmr.groupBy(_._1)
      .map { case (q, rs) => q -> rs.sortBy(_._3).map(_._2).toSeq }
    mmrByQ.foreach { case (q, picks) =>
      assert(picks.distinct.size === picks.size) // no repeats
      assert(picks.head === topByQ(q).head) // round 0 = top relevance
    }
    // λ=0.7 must trade relevance for diversity SOMEWHERE, or the stage
    // is a no-op at this setting
    assert(mmrByQ.exists { case (q, picks) => picks !== topByQ(q) })
    // served from the persisted int8 tier: index-exact shortlist +
    // raw-store relevance must reproduce the inline trajectory
    val idx = tmpDir("mmr_int8")
    operators.ScalarQuant.sqWriteIndex(spark, d, idx)
    val served = operators.Similarity.mmrTopKFromIndex(spark, idx, d)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(served === operators.Similarity.mmrTopK(spark, d)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq)
  }

  test("mmr greedy runs INSIDE executors: the plan groups by query_id " +
      "(no LocalTableScan from a driver collect), and a 500-query " +
      "batch — 100× the registry shape — completes with per-group " +
      "kCand-bounded state") {
    // sf0.01 has 500 vectors: every one of them queries, the scale
    // axis the r16 driver-loop design couldn't generalize along
    val d = "/root/testdata/sf0.01"
    val df = operators.Similarity.mmrTopK(spark, d, nQueries = 500,
      kCand = 12, k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan"),
      "mmr result must be computed distributed, not collected")
    assert(plan.contains("MapGroups"),
      "greedy must run per query group inside executors")
    val rows = df.collect()
    assert(rows.length === 500 * 5)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).distinct.length === rs.length)
      assert(rs.map(_.getInt(2)).sorted.toSeq === (0 until 5))
    }
  }

  test("matryoshka truncation recall: full-dim rows anchor at 1.0, " +
      "truncated rows are valid fractions of k") {
    val rows = operators.Similarity
      .truncationRecall(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 4 * 5) // |dims| × probes
    rows.foreach { r =>
      val (m, hits, recall) = (r.getInt(0), r.getLong(2), r.getDouble(3))
      assert(hits >= 0L && hits <= 10L)
      assert(math.abs(recall - hits / 10.0) < 1e-9)
      // the full-dimension ranking overlaps itself completely
      if (m === 64) assert(hits === 10L)
    }
    // truncation must lose SOMETHING on real data at the smallest dim,
    // or the report is vacuous (8 of 64 dims keeping every probe's
    // exact top-10 would mean the metric can't detect rank damage)
    val d8 = rows.filter(_.getInt(0) === 8).map(_.getLong(2)).sum
    assert(d8 < 50L)
  }
}
