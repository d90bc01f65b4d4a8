package graft

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The auto-vectorization rule: HOF-spelled dot products become the codegen
  * DotProduct expression (GraftExtensions injects the rule into TestSpark's
  * optimizer), with exact semantics preserved on ragged and null inputs.
  * Plan-shape assertions read from parquet — a purely-literal frame
  * constant-folds to a LocalRelation before the plan can be inspected. */
class DotProductRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def hofDotCast(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def writeRead(df: DataFrame): DataFrame = {
    val dir = Files.createTempDirectory("dp_rw").toString + "/t"
    df.write.parquet(dir)
    spark.read.parquet(dir)
  }

  test("float arrays: bare x*y NOT rewritten (float multiply differs), cast form is") {
    val base = writeRead(Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b"))
    // bare float multiply runs in FLOAT then widens — rewriting would
    // change low bits, so the rule must leave it alone
    val bare = base.select(hofDot($"a", $"b").as("d"))
    assert(!bare.queryExecution.optimizedPlan.toString.contains("dotproduct("))
    assert(bare.as[Double].head() == 11.0)
    // the up-cast spelling already multiplies in double — rewritten
    val cast = base.select(hofDotCast($"a", $"b").as("d"))
    val optimized = cast.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dotproduct("), s"rewrite did not fire:\n$optimized")
    assert(cast.as[Double].head() == 11.0)
  }

  test("cast-to-double spelling on real (nullable-element) embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = emb.select($"vec_id", hofDotCast($"embedding", $"embedding").as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dotproduct("), s"rewrite did not fire:\n$optimized")
    // values bit-identical to the native expression
    val viaHof = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaNative = emb.select($"vec_id",
      graft.plans.VectorExpressions.dotProduct($"embedding", $"embedding").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaHof == viaNative)
  }

  test("ragged arrays still yield null (zip_with padding semantics kept)") {
    val df = writeRead(Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b"))
      .select(hofDot($"a", $"b").as("d"))
    assert(df.queryExecution.optimizedPlan.toString.contains("dotproduct("))
    assert(df.collect()(0).isNullAt(0))
  }

  test("null elements still null the result (guard, not garbage)") {
    val df = writeRead(Seq(
        (Seq(Option(1.0), None), Seq(Option(2.0), Option(3.0))),
        (Seq(Option(1.0), Option(2.0)), Seq(Option(3.0), Option(4.0))))
      .toDF("a", "b"))
      .select(hofDot($"a", $"b").as("d"))
    assert(df.queryExecution.optimizedPlan.toString.contains("dotproduct("))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) == 1) // the null-element row
    assert(rows.exists(r => !r.isNullAt(0) && r.getDouble(0) == 11.0))
  }

  test("a null array side yields null, as the fold did") {
    val df = writeRead(Seq(
        (Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b"))
      .select(hofDot($"a", $"b").as("d"))
    assert(df.collect()(0).isNullAt(0))
  }
}
