package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Hilbert-curve index of a 2-D point (the classic iterative xy2d walk —
  * per level: extract the quadrant, add its sub-square offset, rotate the
  * frame). Unlike the Morton interleave ([[graft.operators.Layout.zorderKey]])
  * the Hilbert curve never jumps: consecutive indexes are always adjacent
  * cells, so clustering by it gives tighter row-group min/max bounds on
  * both dimensions — the layout Delta/Iceberg expose as `OPTIMIZE ...
  * HILBERT`.
  *
  * The walk carries rotation STATE across levels, so an expression-tree
  * spelling multiplies the prior level's x/y into every reference — ~3^bits
  * nodes by `bits` levels, which is why this is a native codegen'd
  * `Expression` (a tight loop, like the reference algorithm) rather than a
  * `when`/`otherwise` chain. Inputs are masked to the low `bits` bits
  * (values are expected non-negative and pre-bucketed, as with zorderKey);
  * output is in `[0, 4^bits)`. Deterministic integer math — the
  * `q_hilbert` oracle replays it level by level through materialized CTEs.
  */
case class HilbertIndex2D(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, "need 1 <= bits <= 31")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case IntegerType | LongType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_xy2d needs int/bigint inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val mask = (1L << bits) - 1L
    var x = asLong(l) & mask
    var y = asLong(r) & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) { // rotate the frame (flip when rx=1, then transpose)
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      val mask = (1L << bits) - 1L
      s"""
         |long $x = ((long) $l) & ${mask}L;
         |long $y = ((long) $r) & ${mask}L;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex2D =
    copy(left = newLeft, right = newRight)
}

object LayoutExpressions {
  import org.apache.spark.sql.graftshim.ColumnShims
  def hilbertXy2d(x: Column, y: Column, bits: Int): Column =
    ColumnShims.column(HilbertIndex2D(
      ColumnShims.expression(x), ColumnShims.expression(y), bits))
}
