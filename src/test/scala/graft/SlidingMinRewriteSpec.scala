package graft

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The guarded-sliding-min auto-vectorization rule (GraftExtensions injects
  * it into TestSpark's optimizer): the size-guarded HOF spelling becomes the
  * codegen SlidingMin; unguarded or under-guarded spellings are left alone
  * because the raw HOF runs sequence() DESCENDING on short arrays. */
class SlidingMinRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hofSlidingMin(a: Column, w: Int): Column =
    transform(sequence(lit(1), size(a) - lit(w - 1)),
      i => array_min(slice(a, i, lit(w))))

  private def writeRead(df: DataFrame): DataFrame = {
    val dir = Files.createTempDirectory("sm_rw").toString + "/t"
    df.write.parquet(dir)
    spark.read.parquet(dir)
  }

  private lazy val base =
    writeRead(Seq(Tuple1(Array(5L, 3L, 4L, 1L, 2L, 6L)),
      Tuple1(Array(9L, 8L))).toDF("a"))

  /** The rule is deliberately restricted to provably NON-NULL elements
    * (array_min skips nulls, SlidingMin assumes none — rewriting a
    * nullable-element array would change null semantics). File scans force
    * user schemas nullable, so the non-null array here is DERIVED — a
    * coalesce transform, exactly how real pipelines (winnowing's hash
    * arrays) produce containsNull=false columns. */
  private def nn(a: Column): Column = transform(a, x => coalesce(x, lit(0L)))

  test("guarded spelling rewrites to SlidingMin, values unchanged") {
    val guarded = base.select(
      when(size(nn($"a")) >= 3, hofSlidingMin(nn($"a"), 3))
        .otherwise(array().cast("array<long>")).as("m"))
    val optimized = guarded.queryExecution.optimizedPlan.toString
    assert(optimized.contains("slidingmin("), s"rewrite did not fire:\n$optimized")
    val got = guarded.as[Seq[Long]].collect().toSet
    assert(got == Set(Seq(3L, 1L, 1L, 1L), Seq.empty[Long]))
  }

  test("unguarded, under-guarded, and nullable-element spellings are NOT rewritten") {
    val bare = base.filter(size(nn($"a")) >= 6) // filter, not a branch guard
      .select(hofSlidingMin(nn($"a"), 3).as("m"))
    assert(!bare.queryExecution.optimizedPlan.toString.contains("slidingmin("))
    // guard proves size >= 2 but the window is 3: must not fire
    val weak = base.select(
      when(size(nn($"a")) >= 2, hofSlidingMin(nn($"a"), 3)).as("m"))
    assert(!weak.queryExecution.optimizedPlan.toString.contains("slidingmin("))
    // guard over a DIFFERENT array: must not fire
    val other = base.select(
      when(size(array(lit(1L))) >= 3, hofSlidingMin(nn($"a"), 3)).as("m"))
    assert(!other.queryExecution.optimizedPlan.toString.contains("slidingmin("))
    // nullable-element array straight off the scan: must not fire
    // (null semantics would change), values still correct via the HOF
    val nullable = base.select(
      when(size($"a") >= 3, hofSlidingMin($"a", 3))
        .otherwise(array().cast("array<long>")).as("m"))
    assert(!nullable.queryExecution.optimizedPlan.toString.contains("slidingmin("))
    assert(nullable.as[Seq[Long]].collect().toSet ==
      Set(Seq(3L, 1L, 1L, 1L), Seq.empty[Long]))
  }

  test("winnowing itself plans the codegen expression end to end") {
    val docs = writeRead(Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text"))
    val plan = graft.operators.Dedup.winnowFingerprints(docs, k = 3, w = 4)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("slidingmin("), s"no SlidingMin in winnow plan:\n$plan")
  }
}
