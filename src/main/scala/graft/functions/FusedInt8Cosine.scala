package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType,
  DoubleType, FloatType}

/** Fused cosine similarity between an `ARRAY<TINYINT>` int8 code
  * vector and an `ARRAY<FLOAT>` query vector — the hot scoring loop of
  * the scalar-quantized ANN tier ([[graft.operators.ScalarQuant]]).
  *
  * Because [[graft.operators.ScalarQuant]] quantizes with one uniform
  * per-vector scale `s` (code_i ≈ x_i / s), the scale cancels out of
  * cosine entirely: cos(q, s·c) = cos(q, c). The serve path therefore
  * scores raw int codes against the full-precision query and never
  * touches the stored scale — dequantization is free at ranking time.
  *
  * Same contract as [[FusedCosineSimilarity]] (the ARRAY<FLOAT> twin):
  * null on null input, unequal lengths, null elements, or a zero-norm
  * side; sequential double accumulation, one allocation-free pass,
  * full whole-stage codegen.
  */
case class FusedInt8Cosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"fused_int8_cosine expects (ARRAY<TINYINT>, ARRAY<FLOAT>), " +
          s"got ${l.simpleString}, ${r.simpleString}")
    }
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "fused_int8_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getByte(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    double $xi = (double) $a.getByte($i);
         |    double $yi = (double) $b.getFloat($i);
         |    $dot += $xi * $yi;
         |    $na += $xi * $xi;
         |    $nb += $yi * $yi;
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

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object FusedInt8Cosine {
  /** Column-API entry point. */
  def fusedInt8Cosine(codes: Column, q: Column): Column =
    GraftBridge.column(FusedInt8Cosine(
      GraftBridge.expression(codes), GraftBridge.expression(q)))

  /** SQL registration: `SELECT fused_int8_cosine(codes, q)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fused_int8_cosine",
      exprs => {
        if (exprs.length != 2) {
          throw GraftBridge.wrongNumArgsError("fused_int8_cosine", 2,
            exprs.length)
        }
        FusedInt8Cosine(exprs.head, exprs(1))
      },
      "built-in")
}
