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
}
