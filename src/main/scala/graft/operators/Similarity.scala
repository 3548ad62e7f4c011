package graft.operators

import graft.Tables
import graft.functions.Fns._
import graft.functions.FusedCosineSimilarity.fusedCosine
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (`embedding:
  * Array[Float]`). Brute-force cosine top-k as the exact baseline, and
  * an LSH-bucketed (random-hyperplane) variant as the 100 TB scale path.
  *
  * Dot products use `zip_with` + `aggregate` column expressions —
  * sequential double accumulation, codegen'd, no UDFs. float×float is
  * exactly representable in double, so both the Spark expression and any
  * double-based oracle produce bit-identical sums for the same element
  * order.
  */
object Similarity {

  /** Sequential-order dot product of two float arrays, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Composed built-in cosine — three array passes; kept as the
    * reference implementation the fused expression is tested against.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Per-label embedding stats — count and mean L2 norm. */
  def labelStats(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        r4(avg(norm(col("embedding")))).as("avg_norm"))

  /** Brute-force cosine top-k: the query set is small (it is broadcast);
    * the corpus streams through once, each task keeps its own top-k via
    * the ranking window after a broadcast nested-loop join. Exact
    * baseline for recall measurement of the ANN variant.
    */
  def bruteForceTopK(s: SparkSession, d: String,
      nQueries: Int = 5, k: Int = 10): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    val sim = fusedCosine(col("q"), col("embedding"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), sim.as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), r4(col("sim")).as("sim"),
        col("rk"))
  }

  /** Brute-force top-k via the bounded TopK aggregator instead of a
    * ranking window: the window form shuffles and sorts every
    * (query, candidate) pair; this form partial-aggregates per
    * partition so the exchange carries at most k rows per query per
    * map partition. Same results (tie semantics match) — asserted in
    * tests; the scale path for corpus-sized candidate sets.
    */
  def bruteForceTopKAgg(s: SparkSession, d: String,
      nQueries: Int = 5, k: Int = 10): DataFrame = {
    import graft.functions.FusedCosineSimilarity.fusedCosine
    val emb = Tables.embeddings(s, d)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    val pairs = emb
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        fusedCosine(col("q"), col("embedding")).as("sim"))
    import pairs.sparkSession.implicits._
    pairs.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(new graft.operators.Sampling.TopKByScoreAgg(k)
        .toColumn.name("topk"))
      .toDF("query_id", "topk")
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), col("col._1").as("vec_id"),
        r4(col("col._2")).as("sim"), (col("pos") + 1).cast("int").as("rk"))
  }

  /** Deterministic pseudo-uniform plane weight in [-1, 1): splitmix64
    * of (plane, dim) — fixed across runs, no RNG state.
    */
  private def planeWeight(p: Int, i: Int): Double = {
    var z = p.toLong * 0x9e3779b97f4a7c15L + i.toLong + 1
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)).toDouble / Long.MaxValue.toDouble
  }

  /** Random-hyperplane LSH bucket id: sign bits of dot products against
    * `nPlanes` deterministic hyperplanes. Each plane is a literal weight
    * array, so the projection is one zip_with+aggregate per plane — a
    * compact codegen'd loop, not a dim×planes expression tree.
    */
  def lshBucket(v: Column, dim: Int, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val weights = array((0 until dim).map(i => lit(planeWeight(p, i))): _*)
      val proj = aggregate(
        zip_with(v, weights, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, t) => acc + t)
      when(proj >= 0, lit(1L << p)).otherwise(0L)
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** IVF (inverted-file) ANN top-k: the second index family. Centroids
    * are a deterministic sample of the corpus (every nth vector — at
    * 100 TB you would k-means a sample; determinism matters more here);
    * the corpus partitions into Voronoi cells by fused-cosine argmax
    * against the literal centroid arrays (a narrow pass — the "model"
    * ships inside the plan), and each query probes its `nProbe` nearest
    * cells. Cell assignment shuffles only (cell, id); candidate
    * verification fetches embeddings per cell like every other
    * candidate path here.
    */
  def ivfTopK(s: SparkSession, d: String, nCells: Int = 16,
      nQueries: Int = 5, k: Int = 10, nProbe: Int = 4): DataFrame = {
    import graft.functions.FusedCosineSimilarity.fusedCosine
    val emb = Tables.embeddings(s, d)
    // deterministic "random" sample of exactly nCells vectors: bottom-k
    // by id hash (TakeOrderedAndProject — one corpus pass, no separate
    // count() job to derive a stride)
    val centroids: Seq[(Int, Seq[Float])] = emb
      .select(col("embedding"), xxhash64(col("vec_id")).as("h"))
      .orderBy(col("h")).limit(nCells)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toSeq).zipWithIndex.map(_.swap).toSeq
    def centroidLit(c: Seq[Float]) =
      array(c.map(x => lit(x)): _*).cast("array<float>")
    // argmax over (similarity, cellId) structs — no shuffle
    def cellOf(v: Column) = array_max(array(centroids.map { case (i, c) =>
      struct(fusedCosine(v, centroidLit(c)).as("sim"),
        lit(i).as("cell"))
    }: _*)).getField("cell")
    // top-nProbe cells per query via the same struct trick, exploded
    def probeCells(v: Column) = {
      val sims = array(centroids.map { case (i, c) =>
        struct(fusedCosine(v, centroidLit(c)).as("sim"), lit(i).as("cell"))
      }: _*)
      slice(reverse(array_sort(sims)), 1, nProbe)
    }
    val assigned = emb.select(col("vec_id"), cellOf(col("embedding"))
      .as("cell"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        explode(probeCells(col("embedding")).getField("cell")).as("cell"))
    val corpus = emb.select(col("vec_id"), col("embedding"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    assigned.join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("q"), col("vec_id")).distinct()
      .join(corpus, Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        fusedCosine(col("q"), col("embedding")).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), r4(col("sim")).as("sim"),
        col("rk"))
  }

  /** ANN top-k via LSH buckets: candidates are same-bucket vectors only.
    * At 100 TB the corpus shuffles once on the bucket id (a few bytes);
    * queries are broadcast. Recall/cost tunes via nPlanes (fewer planes
    * → bigger buckets → higher recall, more compute) and probeRadius:
    * the query probes every bucket within that Hamming distance of its
    * own. Defaults (4 planes, radius 2 → 11 of 16 buckets) target
    * weakly-clustered corpora where top-k neighbors sit near cos ≈ 0.3;
    * strongly-clustered embeddings afford more planes and a smaller
    * radius.
    */
  def annTopK(s: SparkSession, d: String, dim: Int = 64,
      nQueries: Int = 5, k: Int = 10, nPlanes: Int = 4,
      probeRadius: Int = 2): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .withColumn("bucket", lshBucket(col("embedding"), dim, nPlanes))
    val masks = (0 until (1 << nPlanes))
      .filter(m => Integer.bitCount(m) <= probeRadius)
    val probes = explode(array(masks.map(m =>
      col("bucket").bitwiseXOR(lit(m.toLong))): _*))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        probes.as("bucket"))
    val sim = fusedCosine(col("q"), col("embedding"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    emb.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), sim.as("sim"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(first(col("sim")).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), r4(col("sim")).as("sim"),
        col("rk"))
  }
}
