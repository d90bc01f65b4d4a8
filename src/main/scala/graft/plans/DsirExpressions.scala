package graft.plans

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-document DSIR (score_micro, weighted_hits) against a FROZEN weight
  * model, as one codegen'd expression over the row's token array — the
  * batch-apply scoring hot path ([[graft.operators.Dsir.scoreRowLocal]]).
  *
  * Why an expression and not a composition: the value is a fold over the
  * unigram+bigram features of the token array, and Spark's higher-order
  * functions (`transform`/`aggregate`) are CodegenFallback — measured in
  * round 14, the HOF formulation dropped the whole projection out of
  * whole-stage codegen and evaluated the md5 chain as an interpreted tree
  * walk per feature (2.2x the join-based scoring it was meant to beat;
  * the first, non-staged cut re-ran the regex tokenizer per array element
  * and was 3.6x the whole apply). This expression does the same fold as
  * one compiled loop: md5 via [[HashUtil.hash60]] (identical bytes to the
  * SQL `md5`), two flat lookup arrays riding as ONE reference object
  * each.
  *
  * Value contract (the frozen-curation oracle replays it in SQL):
  *  - features = unigram tokens ++ adjacent-pair bigrams ("a b"), each
  *    hashed as hash60("dsir:" ++ feature) mod B — byte-identical to
  *    [[graft.operators.Dsir.hashedFeatures]];
  *  - score_micro = Σ over feature occurrences of w(bucket), an exact
  *    long sum (== Σ_b cnt(b)·w(b) of the join form; buckets absent from
  *    the weight table contribute 0, as the inner join dropped them);
  *  - weighted_hits counts occurrences in weighted buckets — the join
  *    form emits no score row for a doc with zero such occurrences, so
  *    callers filter `weighted_hits > 0` to keep the same doc set.
  */
case class DsirScore(toks: Expression, wMicro: Array[Long],
    hit: Array[Long]) extends UnaryExpression {
  require(wMicro.length == hit.length && wMicro.length > 0,
    "weight/hit lookup arrays must be same-length and non-empty")

  override def child: Expression = toks

  override def dataType: DataType = StructType(Seq(
    StructField("score_micro", LongType, nullable = false),
    StructField("weighted_hits", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = toks.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dsir_score needs array<string> tokens, got ${other.simpleString}")
  }

  private val Prefix = "dsir:".getBytes(StandardCharsets.UTF_8)

  @inline private def bucketOf(feature: Array[Byte]): Int =
    (HashUtil.hash60(feature) % wMicro.length).toInt // hash60 >= 0, so % == pmod

  def compute(a: ArrayData): InternalRow = {
    val n = a.numElements()
    var score = 0L
    var hits = 0L
    var prevBytes: Array[Byte] = null
    var i = 0
    while (i < n) {
      // regexp_extract_all never emits null tokens, but a caller-supplied
      // array might: the join form's hash60(concat(...)) nulled out and
      // the weight join dropped the row — skip, and break the bigram pair
      val t = a.getUTF8String(i)
      val tb = if (t == null) null else t.getBytes
      if (tb != null) {
        // unigram: "dsir:" ++ tok
        val u = new Array[Byte](Prefix.length + tb.length)
        System.arraycopy(Prefix, 0, u, 0, Prefix.length)
        System.arraycopy(tb, 0, u, Prefix.length, tb.length)
        val bu = bucketOf(u)
        score += wMicro(bu); hits += hit(bu)
        if (prevBytes != null) {
          // bigram: "dsir:" ++ prev ++ ' ' ++ tok
          val g = new Array[Byte](Prefix.length + prevBytes.length + 1 + tb.length)
          System.arraycopy(Prefix, 0, g, 0, Prefix.length)
          System.arraycopy(prevBytes, 0, g, Prefix.length, prevBytes.length)
          g(Prefix.length + prevBytes.length) = ' '
          System.arraycopy(tb, 0, g, Prefix.length + prevBytes.length + 1, tb.length)
          val bg = bucketOf(g)
          score += wMicro(bg); hits += hit(bg)
        }
      }
      prevBytes = tb
      i += 1
    }
    InternalRow(score, hits)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirScore", this, classOf[DsirScore].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirScore =
    copy(toks = newChild)
}

object DsirExpressions {
  import org.apache.spark.sql.graftshim.ColumnShims

  /** struct(score_micro, weighted_hits) of a token-array column against
    * flat per-bucket weight/presence arrays (index = bucket). */
  def dsirScore(toks: Column, wMicro: Array[Long],
                hit: Array[Long]): Column =
    ColumnShims.column(DsirScore(ColumnShims.expression(toks), wMicro, hit))
}
