package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's codegen expressions, injected the standard
  * Spark way (`SparkSessionExtensions`): set
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) and the functions are
  * callable from `spark.sql` / views / SQL files:
  *
  *   SELECT hash60(token)            -- engine-stable 60-bit md5 hash
  *   SELECT dot_product(a.emb, b.emb)
  *
  * This is the extension-point story for SURVEY §2.10: scalar semantics the
  * built-ins lack are native `Expression`s (full codegen), registered into
  * the session's FunctionRegistry — never Scala UDFs. No custom
  * Rule/Strategy/SparkPlan is injected because every operator's physical
  * shape is already expressible declaratively (verified in PLANS.md).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer: auto-vectorize HOF-spelled dot products and guarded
    // sliding minima into the codegen expressions (see each rule's
    // soundness guards)
    ext.injectOptimizerRule(_ => DotProductRewrite)
    ext.injectOptimizerRule(_ => SlidingMinRewrite)
    ext.injectFunction((
      new FunctionIdentifier("hash60"),
      new ExpressionInfo(classOf[Hash60].getName, "hash60"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "hash60(expr) takes exactly one argument")
        Hash60(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dot_product(a, b) takes two arguments")
        DotProduct(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("deflated_size"),
      new ExpressionInfo(classOf[DeflatedSize].getName, "deflated_size"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "deflated_size(value, level) takes a column and a literal level")
        val level = children(1) match {
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"deflated_size level must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "deflated_size level must be a literal")
        }
        DeflatedSize(children.head, level)
      }))
    ext.injectFunction((
      new FunctionIdentifier("hilbert_xy2d"),
      new ExpressionInfo(classOf[HilbertIndex2D].getName, "hilbert_xy2d"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "hilbert_xy2d(x, y, bits) takes two columns and a literal bit width")
        val bits = children(2) match {
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"hilbert_xy2d bits must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "hilbert_xy2d bits must be a literal")
        }
        HilbertIndex2D(children(0), children(1), bits)
      }))
    ext.injectFunction((
      new FunctionIdentifier("sliding_min"),
      new ExpressionInfo(classOf[SlidingMin].getName, "sliding_min"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "sliding_min(arr, w) takes an array and a literal window")
        val w = children(1) match {
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"sliding_min window must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "sliding_min window must be a literal")
        }
        SlidingMin(children.head, w)
      }))
  }
}
