package graft.plans

import graft.functions.FusedCosineSimilarity
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Catalyst optimizer rule: recognize the composed cosine-similarity
  * pattern
  * `aggregate(zip_with(a,b,*),0,+) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`
  * and rewrite it to the fused single-pass [[FusedCosineSimilarity]]
  * expression. Users (and SQL authors) write the natural composed form;
  * the engine runs the fused loop. The rewrite is semantics-preserving
  * bit-for-bit: both evaluate the same sequential double accumulation,
  * and the fused expression reproduces the composed form's null behavior
  * (null on unequal lengths, on null elements, and on a zero-norm
  * divisor — see FusedCosine.scala), so firing globally on user plans
  * can't change results. The one shape deliberately left untouched is a
  * Divide in ANSI eval mode: ANSI division THROWS on a zero divisor
  * (all-zero or empty embeddings) where the fused form yields null, so
  * rewriting it would swallow a user-visible error. TRY and LEGACY
  * divides both return null on zero — exactly the fused semantics — and
  * are rewritten. Anything else that doesn't match the full shape is
  * left untouched.
  */
object FuseCosineRule extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** `aggregate(zip_with(x, y, (a,b) => cast(a)*cast(b)), 0.0,
    * (acc,v) => acc+v, id)` → (x, y).
    */
  private def matchDot(e: Expression): Option[(Expression, Expression)] =
    e match {
      case ArrayAggregate(
          ZipWith(x, y, LambdaFunction(Multiply(_: Cast, _: Cast, _),
            _, _)),
          zero, LambdaFunction(_: Add, _, _), _)
          if isFloatArray(x) && isFloatArray(y) &&
            zero.foldable && zero.eval() == 0.0 =>
        Some((x, y))
      case _ => None
    }

  private object SqrtOfSelfDot {
    def unapply(e: Expression): Option[Expression] = e match {
      case Sqrt(inner) => matchDot(inner) match {
        case Some((x, y)) if x.semanticEquals(y) => Some(x)
        case _ => None
      }
      case _ => None
    }
  }

  private object ComposedCosine {
    def unapply(e: Expression): Option[(Expression, Expression)] =
      e match {
        // Divide's third member is a NumericEvalContext (its evalMode
        // holds the ANSI/TRY/LEGACY tag) — comparing the CONTEXT to an
        // EvalMode value would be always-true, silently fusing ANSI
        // divides and swallowing their divide-by-zero errors as nulls
        case Divide(dot,
            Multiply(SqrtOfSelfDot(n1), SqrtOfSelfDot(n2), _), ctx)
            if ctx.evalMode != EvalMode.ANSI =>
          matchDot(dot).collect {
            case (a, b)
                if (a.semanticEquals(n1) && b.semanticEquals(n2)) ||
                  (a.semanticEquals(n2) && b.semanticEquals(n1)) =>
              (a, b)
          }
        case _ => None
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ComposedCosine(a, b) => FusedCosineSimilarity(a, b)
    }
}

/** SparkSessionExtensions entry point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Injects the fused-cosine rewrite rule AND registers the two fused
  * kernels as SQL functions, so `spark.sql("... fused_cosine(a, b)
  * ... fused_int8_cosine(codes, q) ...")` works cluster-wide without
  * per-session `register()` calls.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier

  private def twoArg(name: String,
      build: (Expression, Expression) => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) {
          throw org.apache.spark.sql.GraftBridge
            .wrongNumArgsError(name, 2, exprs.length)
        }
        build(exprs.head, exprs(1))
      })

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => FuseCosineRule)
    e.injectFunction(twoArg("fused_cosine", FusedCosineSimilarity(_, _)))
    e.injectFunction(twoArg("fused_int8_cosine",
      graft.functions.FusedInt8Cosine(_, _)))
  }
}
