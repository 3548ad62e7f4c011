package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType,
  DoubleType, FloatType}

/** Product-quantization codec for the IVF-PQ ANN tier
  * ([[graft.operators.Similarity.ivfPqTopK]]): a vector of dimension
  * `m × dsub` is split into `m` contiguous subvectors and each is
  * replaced by the id of its nearest subspace centroid — one BYTE per
  * subspace (`ksub ≤ 256`), so a 64-dim float vector (256 bytes +
  * array overhead) compresses to an 8-byte code. That 30×-class row
  * shrink is what makes a 100 TB vector corpus servable: the scored
  * candidate rows carry codes, not embeddings, and the scan/shuffle
  * bill falls with them.
  *
  * Both expressions carry the codebook matrix as a CODEGEN REFERENCE
  * OBJECT (the [[NearestCentroids]] pattern): plan size and generated
  * method size are O(1) in `m × ksub`, so whole-stage codegen survives
  * the production ksub = 256 geometry that a literal-array tree could
  * not (the 64 KB method-limit failure mode documented on
  * NearestCentroids).
  *
  * Distance/score arithmetic is pinned to [[FusedCosineSimilarity]]'s:
  * [[PqScore]] computes EXACTLY `fused_cosine(q, reconstruct(codes))`
  * — dot and BOTH norms accumulated sequentially in element order
  * (the reconstruction's norm² is deliberately NOT a precomputed
  * per-(subspace, code) table: float addition is non-associative, so
  * summing subtotals would drift from the sequential sum in the last
  * bits), null on dimension mismatch / null element / zero norm,
  * `try_divide` null-on-zero semantics. PqSpec pins the equivalence
  * bit-for-bit against a sequential-accumulation reference.
  */
case class PqEncode(child: Expression,
    codebooks: Array[Array[Array[Float]]]) extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.head.nonEmpty,
    "codebooks must be non-empty")
  require(codebooks.head.length <= 256,
    s"ksub must fit one byte, got ${codebooks.head.length}")

  private val m = codebooks.length
  private val ksub = codebooks.head.length
  private val dsub = codebooks.head.head.length
  private val dim = m * dsub

  /** Flat subspace-major copy: centroid c of subspace j starts at
    * ((j * ksub) + c) * dsub.
    */
  @transient private lazy val flat: Array[Float] = {
    val f = new Array[Float](m * ksub * dsub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        System.arraycopy(codebooks(j)(c), 0, f, ((j * ksub) + c) * dsub,
          dsub)
        c += 1
      }
      j += 1
    }
    f
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects ARRAY<FLOAT> input, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = true

  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) return null
      v(i) = x.getFloat(i).toDouble
      i += 1
    }
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var d = 0.0
        val off = ((j * ksub) + c) * dsub
        var t = 0
        while (t < dsub) {
          val diff = v(j * dsub + t) - flat(off + t).toDouble
          d += diff * diff
          t += 1
        }
        // strict < keeps the SMALLEST code on ties — deterministic
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", flat, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val v = ctx.freshName("v")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val off = ctx.freshName("off")
      val out = ctx.freshName("out")
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $v = new double[$dim];
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $v[$i] = (double) $a.getFloat($i);
         |  }
         |  if (!${ev.isNull}) {
         |    byte[] $out = new byte[$m];
         |    for (int $j = 0; $j < $m; $j++) {
         |      int $best = 0;
         |      double $bestD = Double.MAX_VALUE;
         |      for (int $c = 0; $c < $ksub; $c++) {
         |        double $d = 0.0;
         |        int $off = (($j * $ksub) + $c) * $dsub;
         |        for (int $t = 0; $t < $dsub; $t++) {
         |          double $diff = $v[$j * $dsub + $t]
         |            - (double) $cbRef[$off + $t];
         |          $d += $diff * $diff;
         |        }
         |        if ($d < $bestD) { $bestD = $d; $best = $c; }
         |      }
         |      $out[$j] = (byte) $best;
         |    }
         |    ${ev.value} = $out;
         |  }
         |}
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric-distance scoring: cosine of the FULL-precision query
  * against the PQ RECONSTRUCTION of a corpus vector, straight from its
  * codes — the corpus embedding never needs to be read. Bit-identical
  * to `fused_cosine(q, reconstruct(codes))` (see [[PqEncode]]'s
  * scaladoc for the arithmetic contract).
  */
case class PqScore(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Float]]]) extends BinaryExpression {

  require(codebooks.nonEmpty && codebooks.head.nonEmpty,
    "codebooks must be non-empty")
  require(codebooks.head.length <= 256,
    s"ksub must fit one byte, got ${codebooks.head.length}")

  private val m = codebooks.length
  private val ksub = codebooks.head.length
  private val dsub = codebooks.head.head.length
  private val dim = m * dsub

  @transient private lazy val flat: Array[Float] = {
    val f = new Array[Float](m * ksub * dsub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        System.arraycopy(codebooks(j)(c), 0, f, ((j * ksub) + c) * dsub,
          dsub)
        c += 1
      }
      j += 1
    }
    f
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), BinaryType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_score expects (ARRAY<FLOAT>, BINARY), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "pq_score"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[Array[Byte]]
    if (x.numElements() != dim || codes.length != m) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var j = 0
    while (j < m) {
      val c = codes(j) & 0xFF
      if (c >= ksub) return null
      val off = ((j * ksub) + c) * dsub
      var t = 0
      while (t < dsub) {
        if (x.isNullAt(j * dsub + t)) return null
        val xi = x.getFloat(j * dsub + t).toDouble
        val yi = flat(off + t).toDouble
        dot += xi * yi
        na += xi * xi
        nb += yi * yi
        t += 1
      }
      j += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", flat, "float[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val c = ctx.freshName("c")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($a.numElements() != $dim || $b.length != $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
         |    int $c = $b[$j] & 0xFF;
         |    if ($c >= $ksub) { ${ev.isNull} = true; break; }
         |    int $off = (($j * $ksub) + $c) * $dsub;
         |    for (int $t = 0; $t < $dsub; $t++) {
         |      if ($a.isNullAt($j * $dsub + $t)) {
         |        ${ev.isNull} = true;
         |        break;
         |      }
         |      double $xi = (double) $a.getFloat($j * $dsub + $t);
         |      double $yi = (double) $cbRef[$off + $t];
         |      $dot += $xi * $yi;
         |      $na += $xi * $xi;
         |      $nb += $yi * $yi;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    if ($na == 0.0 || $nb == 0.0) {
         |      ${ev.isNull} = true;
         |    } else {
         |      ${ev.value} = $dot /
         |        (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |    }
         |  }
         |}
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object PqOps {
  /** Column-API entry points. */
  def pqEncode(v: Column, codebooks: Array[Array[Array[Float]]]): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(v), codebooks))

  def pqScore(q: Column, codes: Column,
      codebooks: Array[Array[Array[Float]]]): Column =
    GraftBridge.column(PqScore(GraftBridge.expression(q),
      GraftBridge.expression(codes), codebooks))
}
