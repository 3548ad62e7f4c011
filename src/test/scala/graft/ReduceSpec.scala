package graft

import graft.operators.Reduce

/** The JL sign random projection: the hash-seeded sign matrix
  * replicated by hand, unit-vector projections, per-dimension sign
  * balance (the reason bit 16 is sampled, not the parity-collapsing
  * low bit), and moment preservation on the real embeddings.
  */
class ReduceSpec extends SparkSuite {
  import spark.implicits._

  private def sign(i: Int, j: Int): Double = {
    val h = (i.toLong * 2654435761L + j.toLong * 1013904223L) %
      4294967296L
    if (h / 65536 % 2 == 0) 1.0 else -1.0
  }

  private def plant(rows: Seq[(Long, Seq[Float])]): String = {
    val dir = tmpDir("proj")
    rows.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("unit basis vectors project to the hash-seeded sign column " +
      "over √k") {
    val dim = 16
    val rows = (1 to 3).map { p =>
      (p.toLong, Seq.tabulate(dim)(i => if (i == p - 1) 1.0f else 0.0f))
    }
    val d = plant(rows)
    val got = Reduce.randomProjection(spark, d, k = 8)
      .orderBy("vec_id", "dim").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val expected = for (p <- 1 to 3; j <- 1 to 8) yield
      (p.toLong, j,
        math.rint((sign(p, j) / math.sqrt(8.0) + 1e-9) * 1e4) / 1e4)
    assert(got.toSeq === expected)
  }

  test("signs are balanced per output dimension at d=64") {
    for (j <- 1 to 8) {
      val pos = (1 to 64).count(i => sign(i, j) > 0)
      assert(pos >= 20 && pos <= 44, s"dim $j unbalanced: $pos/64")
    }
  }

  test("jacobiEigen recovers a hand-built spectrum and orthonormal " +
      "vectors") {
    // A = Q diag(5, 2, 1) Qᵀ with a known rotation in the (0,1) plane
    val c0 = math.cos(0.3); val s0 = math.sin(0.3)
    val q = Array(
      Array(c0, -s0, 0.0), Array(s0, c0, 0.0), Array(0.0, 0.0, 1.0))
    val diag = Array(5.0, 2.0, 1.0)
    val a = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(k => q(i)(k) * diag(k) * q(j)(k)).sum)
    val (vals, vecs) = graft.operators.Reduce.jacobiEigen(a)
    assert(vals.zip(diag).forall { case (x, y) => math.abs(x - y) < 1e-9 })
    for (i <- 0 until 3; j <- 0 until 3) {
      val dot = (0 until 3).map(k => vecs(i)(k) * vecs(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9)
    }
    // first eigenvector spans the rotated first axis (sign-normalized)
    assert(math.abs(math.abs(vecs(0)(0)) - c0) < 1e-9)
    assert(math.abs(math.abs(vecs(0)(1)) - s0) < 1e-9)
  }

  test("driver embeddings: PCA fit invariants — trace equals total " +
      "variance, projections are decorrelated with eigenvalue " +
      "variances, whitened covariance is the identity") {
    import graft.operators.Reduce
    val d = sf("sf0.001")
    val (_, vals, _) = Reduce.fitPca(spark, d)
    val trace = Reduce.gram(spark, d)
      .where($"i" === $"j").agg(
        org.apache.spark.sql.functions.sum($"c")).collect()(0).getDouble(0)
    assert(math.abs(vals.sum - trace) < 1e-2,
      s"eigenvalue sum ${vals.sum} vs covariance trace $trace")
    // projection covariance: diagonal = top eigenvalues, off-diag 0
    val proj = Reduce.pcaProject(spark, d, k = 3)
      .groupBy("vec_id").pivot("component", Seq(1, 2, 3))
      .agg(org.apache.spark.sql.functions.first($"v"))
    val cov = proj.selectExpr(
      "avg(`1`*`1`) - avg(`1`)*avg(`1`) AS c11",
      "avg(`2`*`2`) - avg(`2`)*avg(`2`) AS c22",
      "avg(`1`*`2`) - avg(`1`)*avg(`2`) AS c12",
      "avg(`1`*`3`) - avg(`1`)*avg(`3`) AS c13").collect()(0)
    assert(math.abs(cov.getDouble(0) - vals(0)) < 1e-6)
    assert(math.abs(cov.getDouble(1) - vals(1)) < 1e-6)
    assert(math.abs(cov.getDouble(2)) < 1e-6)
    assert(math.abs(cov.getDouble(3)) < 1e-6)
    // the driver-gate form: whitened covariance rounds to the identity
    val ident = Reduce.pcaWhitenCheck(spark, d).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(ident.forall { case ((i, j), c) =>
      c === (if (i == j) 1.0 else 0.0) })
  }

  test("driver embeddings: k rows per vector, second moment of the " +
      "scaled projection tracks the input (JL mean-square " +
      "preservation)") {
    val d = sf("sf0.001")
    val proj = Reduce.randomProjection(spark, d)
    val n = Tables.embeddings(spark, d).count()
    assert(proj.count() === n * 8)
    val ratio = proj.groupBy("vec_id")
      .agg(org.apache.spark.sql.functions.expr("sum(v * v)").as("p2"))
      .join(Tables.embeddings(spark, d)
        .selectExpr("vec_id",
          "aggregate(embedding, 0.0D, (a, x) -> a + CAST(x AS DOUBLE)" +
            " * CAST(x AS DOUBLE)) AS e2"), "vec_id")
      .selectExpr("avg(p2 / e2)").collect()(0).getDouble(0)
    assert(ratio > 0.4 && ratio < 2.0, s"mean |y|²/|x|² = $ratio")
  }
}
