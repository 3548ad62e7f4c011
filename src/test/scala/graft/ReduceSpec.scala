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
