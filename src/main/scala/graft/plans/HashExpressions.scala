package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers callable from generated code (scalac emits static
  * forwarders for the object's methods, so Janino sees plain
  * `graft.plans.HashUtil.hash60(byte[])`). */
object HashUtil {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(bytes) as a non-negative long — numerically
    * identical to `conv(substring(md5(x), 1, 15), 16, 10)::long`: the first
    * 15 hex chars are the top 60 bits of the first 8 digest bytes. */
  def hash60(bytes: Array[Byte]): Long = {
    val d = digests.get()
    d.reset()
    val m = d.digest(bytes)
    val top =
      ((m(0) & 0xffL) << 56) | ((m(1) & 0xffL) << 48) |
      ((m(2) & 0xffL) << 40) | ((m(3) & 0xffL) << 32) |
      ((m(4) & 0xffL) << 24) | ((m(5) & 0xffL) << 16) |
      ((m(6) & 0xffL) << 8) | (m(7) & 0xffL)
    top >>> 4
  }

  def hash60(s: String): Long = hash60(s.getBytes(StandardCharsets.UTF_8))
}

/** Codegen'd engine-stable 60-bit hash (the hot-path form of
  * `TextFunctions.hash60`).
  *
  * The composable formulation — `conv(substring(md5(c), 1, 15), 16, 10)`
  * — materializes a 32-char hex string, substrings it, and re-parses the
  * base-16 digits per call; it is evaluated once per token in srp / simhash /
  * minhash / fingerprint, where it dominated BENCH_r01 (s_srp 7.5 s,
  * t_minhash_lsh 5.2 s). This expression computes the identical value
  * straight from the first 8 digest bytes. Bit-for-bit equal to the string
  * pipeline (Hash60Spec proves it), so the md5-based DuckDB oracles are
  * unchanged.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hash60 needs string or binary input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => HashUtil.hash60(s.getBytes)
    case b: Array[Byte] => HashUtil.hash60(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = if (child.dataType == StringType) s"$c.getBytes()" else c
      s"${ev.value} = graft.plans.HashUtil.hash60($bytes);"
    })

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object HashExpressions {
  import org.apache.spark.sql.graftshim.ColumnShims
  def hash60(c: Column): Column =
    ColumnShims.column(Hash60(ColumnShims.expression(c)))
}
