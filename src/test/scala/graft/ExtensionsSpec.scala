package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions SQL surface: `hash60` / `dot_product` usable
  * from plain SQL (injected via spark.sql.extensions in TestSpark). */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hash60 is callable from SQL and matches the Column API") {
    Seq("a", "the", "héllo").toDF("s").createOrReplaceTempView("strs")
    val viaSql = spark.sql("SELECT hash60(s) FROM strs ORDER BY s")
      .as[Long].collect().toSeq
    val viaApi = spark.table("strs").orderBy("s")
      .select(graft.functions.TextFunctions.hash60($"s")).as[Long].collect().toSeq
    assert(viaSql == viaApi)
  }

  test("dot_product is callable from SQL with codegen types") {
    Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val d = spark.sql("SELECT dot_product(a, b) FROM vecs").as[Double].head()
    assert(d == 1.0 * 4 + 2 * 5 + 3 * 6)
  }

  test("sliding_min is callable from SQL and matches the HOF spelling") {
    val viaSql = spark.sql(
      "SELECT sliding_min(array(5L, 3L, 4L, 1L, 2L, 6L), 3)")
      .as[Seq[Long]].head()
    assert(viaSql == Seq(3L, 1L, 1L, 1L))
    // short array: no full window -> empty
    assert(spark.sql("SELECT sliding_min(array(7L), 3)")
      .as[Seq[Long]].head().isEmpty)
    // window must be a literal
    intercept[Exception](
      spark.sql("SELECT sliding_min(array(1L), array(1L))").collect())
  }

  test("wrong arity fails analysis, not execution") {
    intercept[Exception](spark.sql("SELECT hash60('a', 'b')").collect())
    intercept[Exception](spark.sql("SELECT dot_product(array(1.0))").collect())
  }
}
