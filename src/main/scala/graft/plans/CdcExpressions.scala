package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking boundary positions by POLYNOMIAL ROLLING HASH —
  * the production inner loop of `TextOps.cdcChunksRolling` (VERDICT r7 #8).
  *
  * The composable md5 formulation (`TextOps.cdcChunks`) evaluates an
  * interpreted lambda + a full md5 per WINDOW: O(n*w) digest work per
  * document. This expression is the rsync/LBFS-style rolling recurrence —
  * each code point enters and leaves the window hash in O(1):
  *
  *   H_i = (H_{i-1} - cp[i-w] * B^(w-1)) * B + cp[i]   (mod M)
  *
  * with B = 257, M = 1e9+7, over Unicode CODE POINTS (both engines' native
  * string index: Spark `length`/`substr` and DuckDB `len`/`substr` count
  * code points, so positions line up 1:1 with the md5 variant's).
  * Output: array<bigint> of the 1-based code-point positions i (window
  * END) where `H_i % divisor == 0` — expected chunk length ~`divisor`.
  *
  * H equals the left fold `acc = (acc * B + cp) % M` over the window
  * (oldest code point takes the highest power), which is exactly what the
  * DuckDB oracle replays with `list_reduce` (`t_cdc_rolling`) — no
  * incremental state needed oracle-side, O(n*w) there is fine.
  * Boundary POSITIONS differ from the md5 variant (different hash family,
  * same contract); everything downstream — chunk assembly, span dedup —
  * is shared and identical.
  *
  * Null text yields null (wrapped by nullSafe* like every expression
  * here); empty text yields an empty array.
  */
case class CdcBoundaries(child: Expression, window: Int, divisor: Long)
    extends UnaryExpression {

  private val B = 257L
  private val M = 1000000007L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType if window >= 1 && divisor >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cdc_boundaries needs window >= 1 and divisor >= 1, got $window / $divisor")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cdc_boundaries needs string input, got ${other.simpleString}")
    }

  /** B^(w-1) mod M, computed once at plan time. */
  private lazy val bPow: Long = {
    var p = 1L
    var j = 1
    while (j < window) { p = p * B % M; j += 1 }
    p
  }

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    new GenericArrayData(CdcBoundaries.boundaries(
      cps, window, divisor, B, M, bPow))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val helper = CdcBoundaries.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val cps = ctx.freshName("cps")
      s"""
         |int[] $cps = $s.toString().codePoints().toArray();
         |${ev.value} = new ${classOf[GenericArrayData].getName}(
         |  $helper.boundaries($cps, $window, ${divisor}L, ${B}L, ${M}L, ${bPow}L));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {
  /** The O(n) rolling scan, shared by interpreted eval and codegen (the
    * loop is branch-light JVM code either way; codegen's win is staying
    * inside the WholeStageCodegen row pipeline, not re-JITing this). */
  def boundaries(cps: Array[Int], window: Int, divisor: Long,
                 b: Long, m: Long, bPow: Long): Array[Long] = {
    val n = cps.length
    if (n < window) return Array.emptyLongArray
    val out = new scala.collection.mutable.ArrayBuffer[Long](8)
    var h = 0L
    var i = 0
    while (i < n) {
      if (i >= window) {
        // drop the code point leaving the window (keep the residue >= 0)
        h = (h - cps(i - window) % m * bPow % m + m) % m
      }
      h = (h * b + cps(i)) % m
      if (i >= window - 1 && h % divisor == 0L) out += (i + 1).toLong
      i += 1
    }
    out.toArray
  }
}

object CdcExpressions {
  import org.apache.spark.sql.graftshim.ColumnShims
  def cdcBoundaries(text: Column, window: Int, divisor: Long): Column =
    ColumnShims.column(CdcBoundaries(ColumnShims.expression(text), window, divisor))
}
