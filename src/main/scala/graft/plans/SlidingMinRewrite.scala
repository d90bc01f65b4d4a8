package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst optimizer rule: rewrite the composable-but-interpreted sliding
  * minimum
  *
  *   when(size(kg) >= w,
  *     transform(sequence(1, size(kg) - (w-1)), i -> array_min(slice(kg, i, w))))
  *
  * into the codegen'd O(n) [[SlidingMin]] — the winnowing inner loop. The
  * HOF spelling evaluates an interpreted lambda per WINDOW and rescans w
  * elements per window (O(n*w) with closure dispatch).
  *
  * Soundness guards:
  *  - the rewrite fires ONLY inside a conditional branch whose predicate
  *    proves `size(arr) >= w`: on a shorter array the raw HOF builds
  *    `sequence(1, stop)` with stop < 1, which runs DESCENDING (Spark's
  *    default step is -1 when start > stop) down through 0, and
  *    `slice(arr, 0, w)` then THROWS ("SQL array indices start at 1") —
  *    an unguarded spelling errors at runtime, and the rule must not turn
  *    that error into a value, so it is left untouched;
  *  - all three array references (guard, sequence bound, slice source)
  *    must be semantically equal, the slice start must be the lambda
  *    variable itself, and the sequence step (when present) must be 1;
  *  - element type must be non-null `bigint` (array_min skips null
  *    elements; SlidingMin assumes none).
  *
  * Registered by [[GraftExtensions]]; verified in SlidingMinRewriteSpec
  * (plan shape + value equality + unguarded/misguarded negatives).
  */
object SlidingMinRewrite extends Rule[LogicalPlan] {

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, false) => true
    case _ => false
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  private def stepIsOne(step: Option[Expression]): Boolean = step.forall {
    case IntegerLiteral(1) => true
    case _ => false
  }

  /** transform(sequence(1, size(arr) - (w-1)), i -> array_min(slice(arr, i, w))) */
  private object HofSlidingMin {
    def unapply(e: Expression): Option[(Expression, Int)] = e match {
      case ArrayTransform(
            Sequence(IntegerLiteral(1), stop, step, _),
            LambdaFunction(
              ArrayMin(Slice(arr2, iRef, IntegerLiteral(w))),
              Seq(i: NamedLambdaVariable), _))
          if w >= 1 && stepIsOne(step) && isVar(iRef, i) =>
        val arr1 = stop match {
          case Subtract(Size(a, _), IntegerLiteral(wm1), _) if wm1 == w - 1 =>
            Some(a)
          case Size(a, _) if w == 1 => Some(a)
          case _ => None
        }
        arr1.filter(a => a.semanticEquals(arr2) && okType(a.dataType))
          .map(a => (a, w))
      case _ => None
    }
  }

  /** Does `pred` prove size(arr) >= w? */
  private def proves(pred: Expression, arr: Expression, w: Int): Boolean =
    pred match {
      case GreaterThanOrEqual(Size(a, _), IntegerLiteral(g)) =>
        g >= w && a.semanticEquals(arr)
      case GreaterThan(Size(a, _), IntegerLiteral(g)) =>
        g >= w - 1 && a.semanticEquals(arr)
      case _ => false
    }

  private def rewriteBranch(pred: Expression, value: Expression): Expression =
    value.transformDown {
      case HofSlidingMin(arr, w) if proves(pred, arr, w) => SlidingMin(arr, w)
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case cw @ CaseWhen(branches, elseValue) =>
        val rewritten = branches.map { case (p, v) => (p, rewriteBranch(p, v)) }
        if (rewritten.zip(branches).forall { case ((_, a), (_, b)) => a.fastEquals(b) }) cw
        else CaseWhen(rewritten, elseValue)
      case iff @ If(pred, thenV, elseV) =>
        val nv = rewriteBranch(pred, thenV)
        if (nv.fastEquals(thenV)) iff else If(pred, nv, elseV)
    }
}
