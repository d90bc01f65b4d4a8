package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two `array<float|double>` columns.
  *
  * The composable formulation — `aggregate(zip_with(a, b, *), 0.0, +)` —
  * evaluates an interpreted lambda per ELEMENT (no codegen for higher-order
  * functions), which dominates ANN queries: a 64-dim cosine costs ~192
  * closure dispatches per candidate pair. This expression runs the same
  * left-to-right double accumulation as a tight primitive loop with full
  * codegen, so results are bit-identical to the lambda form (and to the
  * DuckDB `list_reduce` oracle) while candidate scoring becomes cheap.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product needs array<float|double> inputs, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // CACHED element-type flags: `dataType` on a nested child (e.g. an
  // ArrayTransform from a micro-int transform()) is a RECURSIVE tree
  // resolution, and interpreted eval calls nullSafeEval per ROW — at
  // round-13's 1600x ladder a sqrt(n)=2828-cell literal centroid array
  // blew the whole-stage codegen method limit, fell back to interpreted
  // eval, and the per-row-per-cell dataType walks burned 68 CPU-minutes
  // in ONE task (thread-dump root-caused). Resolved once here; the
  // codegen path already evaluates them at generation time.
  @transient private lazy val leftIsFloat = isFloat(left)
  @transient private lazy val rightIsFloat = isFloat(right)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    if (leftIsFloat && rightIsFloat) {
      while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    } else if (leftIsFloat) {
      while (i < n) { acc += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    } else if (rightIsFloat) {
      while (i < n) { acc += a.getDouble(i) * b.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(arr: String, e: Expression, i: String) =
        if (isFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(a, left, i)} * ${get(b, right, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  import org.apache.spark.sql.graftshim.ColumnShims
  def dotProduct(a: Column, b: Column): Column =
    ColumnShims.column(
      DotProduct(ColumnShims.expression(a), ColumnShims.expression(b)))
}
