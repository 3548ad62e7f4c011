package graft.operators

import graft.Tables
import graft.functions.Fns._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dimensionality reduction for the embedding column — the
  * Johnson–Lindenstrauss seeded sign random projection (Achlioptas
  * 2003, ±1 entries): `y_j = (1/√k) Σ_i x_i · s(i,j)` with the sign
  * matrix derived from a closed-form integer hash rather than stored
  * model state. The projection therefore ships as pure column
  * expressions: no fit pass, no broadcast matrix, nothing to persist or
  * version — any executor (or any other engine) regenerates the exact
  * matrix from (i, j) alone, which is what makes the full cross-engine
  * oracle possible and makes the reduced vectors reproducible across
  * reruns and clusters at 100 TB.
  *
  * Sign hash: `h(i,j) = (i·2654435761 + j·1013904223) mod 2³²`, sign =
  * +1 iff bit 16 of h is 0 (1-based i/j; the low bit of a linear form
  * in two odd constants would collapse to parity(i+j), so a middle bit
  * is the one to sample). Weyl-sequence equidistribution gives balanced
  * signs per output dimension.
  *
  * Scale shape: narrow per-row map over the scan — zero shuffles, zero
  * joins, stays in whole-stage codegen (built-in higher-order array
  * functions only). Output is long-format (vec_id, dim, v 4 dp): the
  * fixed-order `aggregate` fold keeps the float sum deterministic
  * per-engine and the 4 dp round is the shared cross-engine contract.
  */
object Reduce {

  /** Deterministic ±1 sign for (i, j), both 1-based. */
  private def sign(i: Column, j: Column): Column = {
    val h = (i * lit(2654435761L) + j * lit(1013904223L)) % lit(4294967296L)
    // `/` is double division in Spark SQL; h < 2^32 makes it exact and
    // the long cast floors it — DuckDB mirrors with `//`
    when(((h / lit(65536L)).cast("long") % lit(2L)) === 0L, lit(1.0))
      .otherwise(lit(-1.0))
  }

  /** Project `vec` (array<float>) onto `k` signed pseudo-random axes:
    * array<double> of length k, unscaled.
    */
  private def projected(vec: Column, k: Int): Column =
    transform(sequence(lit(1), lit(k)), j =>
      aggregate(sequence(lit(1), size(vec)), lit(0.0d), (acc, i) =>
        acc + element_at(vec, i).cast("double") * sign(i, j)))

  /** Long-format random projection of the embeddings table:
    * (vec_id, dim 1..k, v DOUBLE 4 dp) with the 1/√k JL scaling.
    */
  def randomProjection(s: SparkSession, d: String, k: Int = 8): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        posexplode(projected(col("embedding"), k)).as(Seq("j", "y")))
      .select(col("vec_id"), (col("j") + 1).as("dim"),
        r4(col("y") / math.sqrt(k.toDouble)).as("v"))

  // ---- PCA whitening (the learned counterpart of the JL projection:
  // PCA-whitened embeddings are the standard pre-conditioning before
  // product quantization and cosine ANN) ----

  /** One-pass moment sums: (n, Σx per dim, Σ xᵢxⱼ upper triangle).
    * Per-partition state is d + d(d+1)/2 doubles — corpus rows stream
    * through narrowly and only these fixed-size buffers merge, the same
    * bounded-state shape as the IVF centroid fits.
    */
  private class MomentAgg(d: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        Seq[Float], (Long, Array[Double], Array[Double]),
        Seq[(Int, Int, Double)]] {
    private val tri = d * (d + 1) / 2
    override def zero: (Long, Array[Double], Array[Double]) =
      (0L, new Array[Double](d), new Array[Double](tri))
    override def reduce(b: (Long, Array[Double], Array[Double]),
        x: Seq[Float]): (Long, Array[Double], Array[Double]) = {
      val xs = x.toArray
      var k = 0
      var i = 0
      while (i < d) {
        val xi = xs(i).toDouble
        b._2(i) += xi
        var j = i
        while (j < d) { b._3(k) += xi * xs(j); j += 1; k += 1 }
        i += 1
      }
      (b._1 + 1, b._2, b._3)
    }
    override def merge(a: (Long, Array[Double], Array[Double]),
        b: (Long, Array[Double], Array[Double]))
        : (Long, Array[Double], Array[Double]) = {
      var i = 0
      while (i < d) { a._2(i) += b._2(i); i += 1 }
      var k = 0
      while (k < tri) { a._3(k) += b._3(k); k += 1 }
      (a._1 + b._1, a._2, a._3)
    }
    override def finish(r: (Long, Array[Double], Array[Double]))
        : Seq[(Int, Int, Double)] = {
      val n = r._1.toDouble
      val out = Vector.newBuilder[(Int, Int, Double)]
      var k = 0
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) {
          out += ((i + 1, j + 1,
            r._3(k) / n - (r._2(i) / n) * (r._2(j) / n)))
          j += 1; k += 1
        }
        i += 1
      }
      out.result()
    }
    override def bufferEncoder
        : org.apache.spark.sql.Encoder[(Long, Array[Double], Array[Double])] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Long, Array[Double], Array[Double])]()
    override def outputEncoder
        : org.apache.spark.sql.Encoder[Seq[(Int, Int, Double)]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[(Int, Int, Double)]]()
  }

  /** Embedding dimension probe — one-row bounded collect. */
  private def dimOf(s: SparkSession, d: String): Int =
    Tables.embeddings(s, d).select(size(col("embedding")))
      .head().getInt(0)

  /** Unrounded population covariance rows — the fit input. The eigen
    * fit must see full precision: per-dim variances sit near 1/d for
    * unit-norm embeddings, so a 4 dp round here would dominate the
    * spectrum and break the exact-identity whitening contract.
    */
  private def gramRaw(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dim = dimOf(s, d)
    Tables.embeddings(s, d).select(col("embedding")).as[Seq[Float]]
      .select(new MomentAgg(dim).toColumn)
      .toDF("g")
      .select(explode(col("g")).as("e"))
      .select(col("e._1").as("i"), col("e._2").as("j"),
        col("e._3").as("c"))
  }

  /** Population covariance of the embedding columns, long-format upper
    * triangle (i ≤ j, 1-based): (i, j, c DOUBLE 4 dp). One narrow
    * corpus pass + a fixed-size aggregate; fully DuckDB-recomputable.
    */
  def gram(s: SparkSession, d: String): DataFrame =
    gramRaw(s, d).withColumn("c", r4(col("c")))

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * (eigenvalues DESC, eigenvectors as rows, sign-normalized so each
    * vector's largest-magnitude component is positive). Deterministic —
    * fixed sweep order, no pivot randomness.
    */
  private[graft] def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 50 && off > 1e-12) {
      off = 0.0
      for (p <- 0 until n - 1; q <- p + 1 until n) {
        val apq = a(p)(q)
        off += apq * apq
        if (math.abs(apq) > 1e-14) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
          val t = math.signum(theta) /
            (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
              case 0.0 => 1.0 // theta == 0 → 45° rotation
              case x   => x
            }
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val sn = t * c
          for (i <- 0 until n) {
            val aip = a(i)(p); val aiq = a(i)(q)
            a(i)(p) = c * aip - sn * aiq
            a(i)(q) = sn * aip + c * aiq
          }
          for (i <- 0 until n) {
            val api = a(p)(i); val aqi = a(q)(i)
            a(p)(i) = c * api - sn * aqi
            a(q)(i) = sn * api + c * aqi
          }
          for (i <- 0 until n) {
            val vip = v(i)(p); val viq = v(i)(q)
            v(i)(p) = c * vip - sn * viq
            v(i)(q) = sn * vip + c * viq
          }
        }
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { k =>
      val col = Array.tabulate(n)(i => v(i)(k))
      val m = col.indices.maxBy(i => (math.abs(col(i)), -i))
      if (col(m) < 0) col.map(-_) else col
    }.toArray
    (vals, vecs)
  }

  /** Driver-side PCA fit — the bounded model fit (d² doubles), like the
    * IVF centroid fits: (mean, eigenvalues DESC, eigenvector rows).
    */
  def fitPca(s: SparkSession, d: String)
      : (Array[Double], Array[Double], Array[Array[Double]]) = {
    val dim = dimOf(s, d)
    val rows = gramRaw(s, d).collect() // d(d+1)/2 rows — bounded
    val cov = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      val (i, j, c) = (r.getInt(0) - 1, r.getInt(1) - 1, r.getDouble(2))
      cov(i)(j) = c; cov(j)(i) = c
    }
    val mean = Tables.embeddings(s, d)
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i").agg(avg(col("x")).as("m"))
      .orderBy("i").collect().map(_.getDouble(1))
    val (vals, vecs) = jacobiEigen(cov)
    (mean, vals, vecs)
  }

  /** Explained-variance ratios of the top-k principal components:
    * (component, eigenvalue 4 dp, evr 4 dp, cum_evr 4 dp). The fit is
    * deterministic, so the row set is golden-pinnable (re-pin:
    * `runMain graft.GoldenDump q_pca_evr`).
    */
  def pcaExplainedVariance(s: SparkSession, d: String, k: Int = 8)
      : DataFrame = {
    import s.implicits._
    val (_, vals, _) = fitPca(s, d)
    val total = vals.sum
    val rows = (0 until k).map { c =>
      val cum = vals.take(c + 1).sum / total
      (c + 1, r4d(vals(c)), r4d(vals(c) / total), r4d(cum))
    }
    rows.toDF("component", "eigenvalue", "evr", "cum_evr")
  }

  private def r4d(x: Double): Double = math.rint((x + 1e-9) * 1e4) / 1e4

  /** PCA projection of every embedding onto the top-k components,
    * optionally whitened (unit variance per component): long-format
    * (vec_id, component, v DOUBLE). The mean/eigenvector literals ride
    * into the plan as array constants — a narrow, join-free map.
    */
  def pcaProject(s: SparkSession, d: String, k: Int = 8,
      whiten: Boolean = false): DataFrame = {
    val (mean, vals, vecs) = fitPca(s, d)
    val muLit = typedLit(mean.toSeq)
    val comps = (0 until k).map { c =>
      val vLit = typedLit(vecs(c).toSeq)
      val proj = aggregate(sequence(lit(1), lit(mean.length)), lit(0.0d),
        (acc, i) => acc +
          (element_at(col("embedding"), i).cast("double") -
            element_at(muLit, i)) * element_at(vLit, i))
      if (whiten) proj / math.sqrt(vals(c)) else proj
    }
    Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(array(comps: _*)).as(Seq("c", "y")))
      .select(col("vec_id"), (col("c") + 1).as("component"),
        col("y").as("v"))
  }

  /** Whitening integrity check — the driver-gate form of the PCA fit:
    * the covariance of the whitened top-k projections, rounded to
    * 4 dp, must be EXACTLY the k×k identity (long-format upper
    * triangle). The oracle is data-independent, so this row set
    * survives testdata regeneration.
    */
  def pcaWhitenCheck(s: SparkSession, d: String, k: Int = 4): DataFrame = {
    val proj = pcaProject(s, d, k, whiten = true)
      .groupBy("vec_id").pivot("component", (1 to k).map(Int.box).toSeq)
      .agg(first(col("v")))
    val pairs = for (i <- 1 to k; j <- i to k) yield (i, j)
    val aggs = pairs.map { case (i, j) =>
      r4((avg(col(s"$i") * col(s"$j")) -
        avg(col(s"$i")) * avg(col(s"$j")))).as(s"c_${i}_$j")
    }
    val wide = proj.agg(aggs.head, aggs.tail: _*)
    // unpivot to (i, j, c) — stack keeps it one row → k(k+1)/2 rows
    val stackArgs = pairs.map { case (i, j) => s"$i, $j, c_${i}_$j" }
      .mkString(", ")
    wide.selectExpr(
      s"stack(${pairs.length}, $stackArgs) AS (i, j, c)")
  }
}
