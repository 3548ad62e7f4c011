package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType,
  IntegerType}

/** Top-`nProbe` nearest centroids by cosine similarity — the centroid
  * matrix rides along as a CODEGEN REFERENCE OBJECT instead of literal
  * arrays in the expression tree.
  *
  * Why this exists: [[graft.operators.Similarity.ivfTopK]] originally
  * shipped its k-means centroids as `array(lit(...))` trees — one fused
  * cosine per cell — so plan size grew O(cells × dim) and past ~98
  * cells the generated method exceeded the JVM's 64 KB limit,
  * dropping the whole stage to interpreted eval (measured r8, noted at
  * Similarity.scala's cellsFor scaladoc). Here the matrix is attached
  * via `ctx.addReferenceObj`, the generated code is one fixed-size
  * nested loop regardless of cell count, and whole-stage codegen
  * survives any geometry `cellsFor` can return (asserted at 256 cells
  * with codegen fallback disabled in DedupSimilaritySpec).
  *
  * Result parity (so the literal plan could be swapped without moving
  * q_ann_ivf's golden oracle): per-cell similarity uses EXACTLY
  * [[FusedCosineSimilarity]]'s arithmetic — sequential double
  * accumulation of dot and both norms in element order, sim =
  * dot / (sqrt(na) * sqrt(nb)) — with the centroid norm sqrt
  * precomputed once (same value bit-for-bit: same summation order,
  * same sqrt). Selection returns cells ordered by (sim, cell)
  * DESCENDING lexicographically, which reproduces both of the literal
  * plan's forms: `array_max(structs)` (nProbe = 1: greatest sim, ties
  * to the greatest cell id) and `slice(reverse(array_sort(structs)),
  * 1, n)` (general nProbe). Bit-equality against the literal
  * composition is pinned in DedupSimilaritySpec, tie cases included.
  *
  * Null semantics: null input array, a null element, a zero-norm
  * vector, or a dimension mismatch yield NULL for the whole result.
  * (The literal plan devolves into comparing structs with null sim
  * fields in those cases — a shape the IVF path never feeds it, since
  * embeddings are dense and the k-means fit rejects nothing; returning
  * null is the defensible total semantics for the seam.)
  */
case class NearestCentroids(child: Expression,
    centroids: Array[Array[Float]], nProbe: Int)
    extends UnaryExpression {

  require(centroids.nonEmpty, "centroids must be non-empty")
  require(nProbe > 0, "nProbe must be positive")

  private val nCells = centroids.length
  private val dim = centroids(0).length
  private val k = math.min(nProbe, nCells)

  /** Flat row-major copy for the codegen loop (and eval). */
  @transient private lazy val flat: Array[Float] = {
    val f = new Array[Float](nCells * dim)
    var c = 0
    while (c < nCells) {
      System.arraycopy(centroids(c), 0, f, c * dim, dim)
      c += 1
    }
    f
  }

  /** Precomputed sqrt of each centroid's squared norm, accumulated in
    * the same element order as FusedCosineSimilarity — bit-identical
    * to computing it inside the per-row loop. A zero norm marks the
    * centroid unselectable (sim would be null; it cannot win).
    */
  @transient private lazy val norms: Array[Double] = {
    val out = new Array[Double](nCells)
    var c = 0
    while (c < nCells) {
      var nb = 0.0
      var i = 0
      while (i < dim) {
        val yi = centroids(c)(i).toDouble
        nb += yi * yi
        i += 1
      }
      out(c) = math.sqrt(nb)
      c += 1
    }
    out
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids expects ARRAY<FLOAT> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "nearest_centroids"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != dim) return null
    val v = new Array[Double](n)
    var na = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      v(i) = xi
      na += xi * xi
      i += 1
    }
    if (na == 0.0) return null
    val sqa = math.sqrt(na)
    val selSim = Array.fill(k)(Double.NegativeInfinity)
    val selCell = Array.fill(k)(-1)
    var c = 0
    while (c < nCells) {
      var dot = 0.0
      var j = 0
      val off = c * dim
      while (j < dim) {
        dot += v(j) * flat(off + j).toDouble
        j += 1
      }
      if (norms(c) != 0.0) {
        val sim = dot / (sqa * norms(c))
        // descending (sim, cell) insertion into the top-k slots
        var p = k - 1
        if (sim > selSim(p) || (sim == selSim(p) && c > selCell(p))) {
          while (p > 0 && (sim > selSim(p - 1) ||
              (sim == selSim(p - 1) && c > selCell(p - 1)))) {
            selSim(p) = selSim(p - 1); selCell(p) = selCell(p - 1)
            p -= 1
          }
          selSim(p) = sim; selCell(p) = c
        }
      }
      c += 1
    }
    new GenericArrayData(selCell.takeWhile(_ >= 0))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", flat, "float[]")
    val normsRef = ctx.addReferenceObj("cnorms", norms, "double[]")
    val arrCls = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val na = ctx.freshName("na")
      val sqa = ctx.freshName("sqa")
      val selSim = ctx.freshName("selSim")
      val selCell = ctx.freshName("selCell")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val dot = ctx.freshName("dot")
      val sim = ctx.freshName("sim")
      val xi = ctx.freshName("xi")
      val off = ctx.freshName("off")
      val nSel = ctx.freshName("nSel")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |if ($n != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $v = new double[$n];
         |  double $na = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xi = (double) $a.getFloat($i);
         |    $v[$i] = $xi;
         |    $na += $xi * $xi;
         |  }
         |  if (!${ev.isNull} && $na == 0.0) ${ev.isNull} = true;
         |  if (!${ev.isNull}) {
         |    double $sqa = java.lang.Math.sqrt($na);
         |    double[] $selSim = new double[$k];
         |    int[] $selCell = new int[$k];
         |    for (int $p = 0; $p < $k; $p++) {
         |      $selSim[$p] = Double.NEGATIVE_INFINITY;
         |      $selCell[$p] = -1;
         |    }
         |    for (int $c = 0; $c < $nCells; $c++) {
         |      double $dot = 0.0;
         |      int $off = $c * $dim;
         |      for (int $j = 0; $j < $dim; $j++) {
         |        $dot += $v[$j] * (double) $centsRef[$off + $j];
         |      }
         |      if ($normsRef[$c] != 0.0) {
         |        double $sim = $dot / ($sqa * $normsRef[$c]);
         |        int $p = $k - 1;
         |        if ($sim > $selSim[$p] ||
         |            ($sim == $selSim[$p] && $c > $selCell[$p])) {
         |          while ($p > 0 && ($sim > $selSim[$p - 1] ||
         |              ($sim == $selSim[$p - 1] && $c > $selCell[$p - 1]))) {
         |            $selSim[$p] = $selSim[$p - 1];
         |            $selCell[$p] = $selCell[$p - 1];
         |            $p--;
         |          }
         |          $selSim[$p] = $sim;
         |          $selCell[$p] = $c;
         |        }
         |      }
         |    }
         |    int $nSel = 0;
         |    while ($nSel < $k && $selCell[$nSel] >= 0) $nSel++;
         |    int[] $out = new int[$nSel];
         |    System.arraycopy($selCell, 0, $out, 0, $nSel);
         |    ${ev.value} = new $arrCls($out);
         |  }
         |}
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroids {
  /** Column-API entry point: array<int> of the `nProbe` nearest
    * centroid ids, ordered by (similarity, cell) descending.
    */
  def nearestCells(v: Column, centroids: Array[Array[Float]],
      nProbe: Int): Column =
    GraftBridge.column(NearestCentroids(
      GraftBridge.expression(v), centroids, nProbe))
}
