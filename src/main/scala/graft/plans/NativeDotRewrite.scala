package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.expressions.FloatDotProduct

/** Catalyst optimizer rule: rewrite the declarative dot-product fold
  *
  *   `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *              0.0d, (acc, v) -> acc + v)`
  *
  * over two `array<float>` columns into the native codegen'd
  * [[FloatDotProduct]] kernel.
  *
  * This is the (c) tier of the custom-operator ladder put to its
  * intended use: users keep writing the composable built-in form (or
  * inherit it from saved views / SQL), and the session extension swaps
  * in the tight primitive loop. The rewrite is semantics-preserving
  * for ANY `array<float>` input, not just the well-formed embedding
  * case: FloatDotProduct accumulates `double(x[i]) * double(y[i])`
  * left-to-right (bit-identical to the HOF fold on equal-length
  * null-free arrays) and returns NULL exactly where the fold does —
  * length mismatch (zip_with null-pads the shorter side) or a null
  * element. Parity on ragged/null inputs is pinned by
  * VectorExpressionSpec; anything structurally different (other zero,
  * other lambda shape, non-float arrays) is left untouched.
  */
object NativeDotRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** x * y where both factors are the lambda's own variables cast to
    * double (in either order). */
  private def isCastMulOfVars(fn: LambdaFunction): Boolean = fn match {
    case LambdaFunction(Multiply(Cast(x: NamedLambdaVariable, DoubleType, _, _),
                                 Cast(y: NamedLambdaVariable, DoubleType, _, _), _),
                        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      (x.exprId == a.exprId && y.exprId == b.exprId) ||
        (x.exprId == b.exprId && y.exprId == a.exprId)
    case _ => false
  }

  /** acc + v over exactly the lambda's variables (either order). */
  private def isPlainAddOfVars(fn: LambdaFunction): Boolean = fn match {
    case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
                        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      (x.exprId == a.exprId && y.exprId == b.exprId) ||
        (x.exprId == b.exprId && y.exprId == a.exprId)
    case _ => false
  }

  private def isIdentity(fn: Expression): Boolean = fn match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(ZipWith(a, b, mul: LambdaFunction),
                        Literal(zero, DoubleType),
                        merge: LambdaFunction,
                        finish)
        if zero == 0.0 && isFloatArray(a) && isFloatArray(b) &&
          isCastMulOfVars(mul) && isPlainAddOfVars(merge) && isIdentity(finish) =>
      FloatDotProduct(a, b)
  }
}
