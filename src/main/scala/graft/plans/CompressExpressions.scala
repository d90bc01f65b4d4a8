package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local DEFLATE helpers for the compression-ratio quality signal. */
object Zlib {
  // per-row native Deflater allocation + 8KB buffer churn would dominate
  // the hot path at corpus scale; one (Deflater, scratch) pair per executor
  // thread, reset between rows. Keyed by level (level is a constructor
  // param of the expression, so one per distinct level in the plan).
  private val pool =
    new ThreadLocal[java.util.HashMap[Int, (java.util.zip.Deflater, Array[Byte])]] {
      override def initialValue() = new java.util.HashMap
    }

  /** Size in bytes of `bytes` after raw DEFLATE at `level`. Allocation-light:
    * thread-local reused Deflater + scratch buffer, counts output without
    * materializing the compressed stream. */
  def deflatedSize(bytes: Array[Byte], level: Int): Long = {
    val m = pool.get()
    var entry = m.get(level)
    if (entry == null) {
      entry = (new java.util.zip.Deflater(level, true), new Array[Byte](8192))
      m.put(level, entry)
    }
    val (d, buf) = entry
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

/** DEFLATE-compressed size of a string/binary column — the classic
  * compression-ratio quality filter (boilerplate and template spam deflate
  * to almost nothing; clean prose sits ~0.3-0.6; random bytes exceed 1).
  * A native expression with full codegen (the work is one static call into
  * the JDK's zlib); per-row cost is linear in the value, state is a scratch
  * buffer — embarrassingly parallel at any scale.
  *
  * No SQL oracle: DEFLATE output depends on the zlib implementation, so
  * this signal is checked by unit tests (monotonicity, known prefixes,
  * within-engine determinism) and the driver's rows-only gate, not a
  * cross-engine hash. */
case class DeflatedSize(child: Expression, level: Int)
    extends UnaryExpression {
  require(level >= 1 && level <= 9, "need 1 <= level <= 9")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"deflated_size needs a string/binary input, got ${dt.simpleString}")
  }

  private def isString = child.dataType == StringType

  override protected def nullSafeEval(v: Any): Any = {
    val bytes =
      if (isString) v.asInstanceOf[UTF8String].getBytes
      else v.asInstanceOf[Array[Byte]]
    Zlib.deflatedSize(bytes, level)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bytes = if (isString) s"$v.getBytes()" else v
      s"${ev.value} = graft.plans.Zlib.deflatedSize($bytes, $level);"
    })

  override protected def withNewChildInternal(newChild: Expression): DeflatedSize =
    copy(child = newChild)
}

object CompressExpressions {
  import org.apache.spark.sql.graftshim.ColumnShims
  def deflatedSize(c: Column, level: Int = 6): Column =
    ColumnShims.column(DeflatedSize(ColumnShims.expression(c), level))
}
