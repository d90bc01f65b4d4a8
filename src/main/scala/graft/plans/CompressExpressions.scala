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

  private val inflaterPool =
    new ThreadLocal[(java.util.zip.Inflater, Array[Byte])] {
      override def initialValue() =
        (new java.util.zip.Inflater(true), new Array[Byte](8192))
    }

  /** deflate-then-inflate round trip: true iff the inflated stream is
    * byte-identical to the input. The compressed BYTES are
    * implementation-defined, but losslessness is not — this is the
    * cross-engine-checkable half of the compression signal (an oracle can
    * assert it is always true without being able to predict z_bytes). */
  def roundTripOk(bytes: Array[Byte], level: Int): Boolean = {
    val m = pool.get()
    var entry = m.get(level)
    if (entry == null) {
      entry = (new java.util.zip.Deflater(level, true), new Array[Byte](8192))
      m.put(level, entry)
    }
    val (d, dbuf) = entry
    d.reset()
    d.setInput(bytes)
    d.finish()
    val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 16)
    while (!d.finished()) {
      val n = d.deflate(dbuf)
      out.write(dbuf, 0, n)
    }
    val (inf, ibuf) = inflaterPool.get()
    inf.reset()
    inf.setInput(out.toByteArray)
    var pos = 0
    var ok = true
    while (ok && !inf.finished()) {
      val n = inf.inflate(ibuf)
      if (n == 0 && !inf.finished()) ok = false // truncated/needs-dict: fail
      else {
        var i = 0
        while (ok && i < n) {
          if (pos + i >= bytes.length || ibuf(i) != bytes(pos + i)) ok = false
          i += 1
        }
        pos += n
      }
    }
    ok && pos == bytes.length
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

  // resolved once, not per row (interpreted eval calls nullSafeEval per
  // row and dataType on a nested child is a recursive walk — the
  // VectorExpressions round-13 lesson)
  @transient private lazy val isString = child.dataType == StringType

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

/** Boolean deflate-inflate round-trip check — see [[Zlib.roundTripOk]].
  * Same codegen/pooling shape as [[DeflatedSize]]. */
case class DeflateRoundTripOk(child: Expression, level: Int)
    extends UnaryExpression {
  require(level >= 1 && level <= 9, "need 1 <= level <= 9")

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"deflate_roundtrip_ok needs a string/binary input, got ${dt.simpleString}")
  }

  // resolved once, not per row (interpreted eval calls nullSafeEval per
  // row and dataType on a nested child is a recursive walk — the
  // VectorExpressions round-13 lesson)
  @transient private lazy val isString = child.dataType == StringType

  override protected def nullSafeEval(v: Any): Any = {
    val bytes =
      if (isString) v.asInstanceOf[UTF8String].getBytes
      else v.asInstanceOf[Array[Byte]]
    Zlib.roundTripOk(bytes, level)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bytes = if (isString) s"$v.getBytes()" else v
      s"${ev.value} = graft.plans.Zlib.roundTripOk($bytes, $level);"
    })

  override protected def withNewChildInternal(newChild: Expression): DeflateRoundTripOk =
    copy(child = newChild)
}

object CompressExpressions {
  import org.apache.spark.sql.graftshim.ColumnShims
  def deflatedSize(c: Column, level: Int = 6): Column =
    ColumnShims.column(DeflatedSize(ColumnShims.expression(c), level))
  def deflateRoundTripOk(c: Column, level: Int = 6): Column =
    ColumnShims.column(DeflateRoundTripOk(ColumnShims.expression(c), level))
}
