package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst optimizer rule: rewrite the composable-but-interpreted dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * into the codegen'd [[DotProduct]] expression. Higher-order-function
  * lambdas evaluate interpreted per ELEMENT (~2 closure dispatches per
  * dimension per row), so users writing the idiomatic HOF form pay ~100x
  * over the native expression; this rule makes the natural spelling fast
  * silently — the same contract Catalyst applies to its own patterns.
  *
  * Soundness guards (the rewrite must be exact for ALL inputs — the HOF
  * fold yields null iff the arrays are ragged, a side is null, or ANY
  * element is null, while DotProduct stops at the shorter length and never
  * sees element nulls):
  *  - ragged inputs: guard with `size(a) = size(b)` (zip_with pads the
  *    shorter side with nulls, nulling the fold);
  *  - nullable-element arrays additionally guard with a per-side
  *    "no null elements" check (`size(filter(a, isnotnull)) = size(a)`) —
  *    an interpreted null-scan per element, still ~10x cheaper than the
  *    interpreted multiply+add fold it replaces; the check is omitted
  *    entirely for containsNull=false schemas;
  *  - multiply operands may carry double up-casts (the common
  *    `x.cast("double") * y` spelling) — stripped before matching.
  *
  * Registered by [[GraftExtensions]] via `injectOptimizerRule`; verified in
  * DotProductRewriteSpec (plan shape + value equality + ragged/null cases).
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isVecType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** Strip no-op-for-math double widening casts. */
  private def uncast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => uncast(c.child)
    case other => other
  }

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean =
    uncast(e) match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

  /** `size(filter(a, isnotnull)) = size(a)` for nullable-element arrays;
    * no guard needed when the schema proves elements non-null. */
  private def noNullElements(a: Expression): Option[Expression] =
    a.dataType match {
      case ArrayType(et, true) =>
        val el = NamedLambdaVariable("el", et, nullable = true)
        Some(EqualTo(
          Size(ArrayFilter(a, LambdaFunction(IsNotNull(el), Seq(el))),
            legacySizeOfNull = false),
          Size(a, legacySizeOfNull = false)))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(left, right,
              LambdaFunction(mul: Multiply, Seq(x: NamedLambdaVariable,
                y: NamedLambdaVariable), _)),
            DoubleLiteral(0.0),
            LambdaFunction(add: Add, Seq(acc: NamedLambdaVariable,
              v: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(res: NamedLambdaVariable), _))
          if isVecType(left.dataType) && isVecType(right.dataType) &&
            // DotProduct multiplies in DOUBLE; only rewrite when the
            // original multiply already did (double elements, or float
            // elements explicitly up-cast). A bare float x*y multiplies in
            // FLOAT and widens after — different low bits, so it stays.
            mul.dataType == DoubleType &&
            sameVar(mul.left, x) && sameVar(mul.right, y) &&
            sameVar(add.left, acc) && sameVar(add.right, v) &&
            sameVar(fin, res) =>
        val guards = Seq(
          EqualTo(Size(left, legacySizeOfNull = false),
            Size(right, legacySizeOfNull = false))) ++
          noNullElements(left) ++ noNullElements(right)
        If(guards.reduce(And(_, _)), DotProduct(left, right),
          Literal(null, DoubleType))
    }
}
