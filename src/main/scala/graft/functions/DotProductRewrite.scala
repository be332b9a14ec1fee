package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the built-in dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *               0.0d, (acc, v) -> acc + v) }}}
  *
  * into the native codegen'd [[ArrayDot]] when both inputs are
  * ARRAY<FLOAT>. Semantics are identical INCLUDING the edge cases —
  * ArrayDot returns null on unequal lengths (zip_with pads with null)
  * and on null elements (null propagates through *,+), same sequential
  * left-to-right double accumulation — so the rewrite is safe for
  * nullable and ragged user data, not just the engine's own vectors.
  * The rewrite removes the per-row intermediate
  * array and two lambda interpreters from the hot path, so code written
  * against the portable built-in formulation gets native speed
  * automatically. Injected via [[GraftExtensions]]
  * (`injectOptimizerRule`).
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** x * y where each factor is a lambda variable, possibly wrapped in
    * a cast to double. */
  private def isCastedVarProduct(
      e: Expression, vars: Seq[NamedExpression]): Boolean = e match {
    case Multiply(l, r, _) =>
      def unwrap(x: Expression): Option[ExprId] = x match {
        case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v.exprId)
        case v: NamedLambdaVariable if v.dataType == DoubleType =>
          Some(v.exprId)
        case _ => None
      }
      val ids = vars.map(_.exprId)
      (unwrap(l), unwrap(r)) match {
        case (Some(a), Some(b)) => a != b && ids.contains(a) && ids.contains(b)
        case _ => false
      }
    case _ => false
  }

  private def isZeroDouble(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case Cast(Literal(v, _), DoubleType, _, _) =>
      v != null && scala.util.Try(v.toString.toDouble == 0.0)
        .getOrElse(false)
    case _ => false
  }

  private def isAccPlusVar(
      e: Expression, vars: Seq[NamedExpression]): Boolean = e match {
    case Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _) =>
      val ids = vars.map(_.exprId)
      l.exprId != r.exprId &&
        ids.contains(l.exprId) && ids.contains(r.exprId)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
          ZipWith(left, right, LambdaFunction(mul, mulArgs, _)),
          zero, LambdaFunction(merge, mergeArgs, _), finish)
          if isFloatArray(left) && isFloatArray(right) &&
            isZeroDouble(zero) &&
            isCastedVarProduct(mul, mulArgs) &&
            isAccPlusVar(merge, mergeArgs) &&
            isIdentityFinish(finish) =>
        ArrayDot(left, right)
    }

  /** The finish lambda must be the identity (x -> x). */
  private def isIdentityFinish(e: Expression): Boolean = e match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg), _) =>
      arg match {
        case v: NamedLambdaVariable => v.exprId == body.exprId
        case _ => false
      }
    case _ => false
  }
}
