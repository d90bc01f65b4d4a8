package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Sliding-window minimum over an `array<long>` column: element i of the
  * result is `min(arr[i .. i+w-1])`, for the `n - w + 1` full windows
  * (empty result when n < w).
  *
  * This is the inner loop of winnowing fingerprint selection
  * (Schleimer–Wilkerson–Aiken). The composable spelling —
  * `transform(sequence(1, n-w+1), i -> array_min(slice(kg, i, w)))` —
  * evaluates an interpreted lambda per WINDOW and rescans w elements per
  * window: O(n*w) with closure dispatch. This expression is the classic
  * monotonic-deque formulation — O(n) amortized, full codegen — and emits
  * exactly the same values (window minima are value-deterministic, so tie
  * handling cannot diverge).
  *
  * Precondition: non-null elements (the winnowing k-gram hashes are
  * md5-derived longs, never null).
  */
case class SlidingMin(child: Expression, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) if w >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sliding_min window must be >= 1, got $w")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sliding_min needs array<bigint> input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val m = math.max(0, n - w + 1)
    val out = new Array[Long](m)
    val dq = new Array[Int](math.max(n, 1))
    var head = 0
    var tail = -1
    var i = 0
    while (i < n) {
      val v = a.getLong(i)
      while (tail >= head && a.getLong(dq(tail)) >= v) tail -= 1
      tail += 1; dq(tail) = i
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = a.getLong(dq(head))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val dq = ctx.freshName("dq")
      val head = ctx.freshName("head")
      val tail = ctx.freshName("tail")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $n = $a.numElements();
         |int $m = $n - ${w - 1}; if ($m < 0) $m = 0;
         |long[] $out = new long[$m];
         |int[] $dq = new int[$n > 0 ? $n : 1];
         |int $head = 0, $tail = -1;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = $a.getLong($i);
         |  while ($tail >= $head && $a.getLong($dq[$tail]) >= $v) $tail--;
         |  $dq[++$tail] = $i;
         |  if ($dq[$head] <= $i - $w) $head++;
         |  if ($i >= ${w - 1}) $out[$i - ${w - 1}] = $a.getLong($dq[$head]);
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SlidingMin =
    copy(child = newChild)
}

object ArrayExpressions {
  import org.apache.spark.sql.graftshim.ColumnShims
  def slidingMin(a: Column, w: Int): Column =
    ColumnShims.column(SlidingMin(ColumnShims.expression(a), w))
}
