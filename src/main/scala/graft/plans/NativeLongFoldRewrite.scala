package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.expressions.{LongVecDot, LongVecSqDist}

/** Catalyst optimizer rule: rewrite the declarative INTEGER vector
  * folds of the fixed-point similarity/quantization tier,
  *
  *   `aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, _+_)`
  *   `aggregate(zip_with(a, b, (x, y) -> x * y),             0L, _+_)`
  *
  * over two `array<bigint>` columns into the native codegen'd
  * [[LongVecSqDist]] / [[LongVecDot]] kernels — the
  * [[NativeDotRewrite]] pattern applied to the long-typed folds
  * (Lloyd/PQ assignment distances, power-iteration projections).
  *
  * Semantics-preserving for ANY `array<bigint>` input: the kernels
  * accumulate left-to-right (bit-identical; integer adds are
  * order-free anyway), return NULL exactly where the fold does
  * (length mismatch or a null element), and raise on overflow like
  * the ANSI-mode arithmetic they replace. Anything structurally
  * different (other zero, other lambda shape, non-long arrays) is
  * left untouched. Parity pinned by IntegerVectorExpressionSpec.
  */
object NativeLongFoldRewrite extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** (x − y) * (x − y) where both factors are the same subtraction of
    * the lambda's own variables, first minus second. */
  private def isSqDiffOfVars(fn: LambdaFunction): Boolean = fn match {
    case LambdaFunction(Multiply(Subtract(x1: NamedLambdaVariable,
                                          y1: NamedLambdaVariable, _),
                                 Subtract(x2: NamedLambdaVariable,
                                          y2: NamedLambdaVariable, _), _),
                        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      x1.exprId == a.exprId && x2.exprId == a.exprId &&
        y1.exprId == b.exprId && y2.exprId == b.exprId
    case _ => false
  }

  /** x * y over exactly the lambda's variables (either order). */
  private def isMulOfVars(fn: LambdaFunction): Boolean = fn match {
    case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
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
    case ArrayAggregate(ZipWith(a, b, term: LambdaFunction),
                        Literal(0L, LongType),
                        merge: LambdaFunction,
                        finish)
        if isLongArray(a) && isLongArray(b) &&
          isPlainAddOfVars(merge) && isIdentity(finish) && isSqDiffOfVars(term) =>
      LongVecSqDist(a, b)
    case ArrayAggregate(ZipWith(a, b, term: LambdaFunction),
                        Literal(0L, LongType),
                        merge: LambdaFunction,
                        finish)
        if isLongArray(a) && isLongArray(b) &&
          isPlainAddOfVars(merge) && isIdentity(finish) && isMulOfVars(term) =>
      LongVecDot(a, b)
  }
}
