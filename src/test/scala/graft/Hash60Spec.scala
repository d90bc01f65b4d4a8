package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.plans.HashUtil

class Hash60Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val samples = Seq(
    "", "a", "the", "plane:0:5", "token:12",
    "héllo wörld", "日本語のテキスト", "emoji 😀 text",
    "a" * 500, "tab\tand\nnewline", "0", "-1", "NULL")

  test("Hash60 expression is bit-identical to the conv(substring(md5)) form") {
    val df = samples.toDF("s").select(
      graft.functions.TextFunctions.hash60($"s").as("fast"),
      conv(substring(md5($"s"), 1, 15), 16, 10).cast("long").as("slow"))
    df.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("Hash60 matches under codegen over a generated column") {
    // hashes computed inside a whole-stage-codegen'd projection
    val df = spark.range(2000)
      .select(concat(lit("tok:"), col("id")).as("s"))
      .select(graft.functions.TextFunctions.hash60($"s").as("fast"),
        conv(substring(md5($"s"), 1, 15), 16, 10).cast("long").as("slow"))
    assert(df.filter($"fast" =!= $"slow").count() == 0)
  }

  test("driver-side HashUtil agrees with the column expression") {
    val expected = samples.toDF("s")
      .select(graft.functions.TextFunctions.hash60($"s")).as[Long].collect()
    val actual = samples.map(HashUtil.hash60)
    assert(actual == expected.toSeq)
  }

  test("null input yields null, binary input accepted") {
    val r = Seq((Option.empty[String], "x".getBytes("UTF-8")))
      .toDF("s", "b")
      .select(graft.functions.TextFunctions.hash60($"s").as("hs"),
        graft.functions.TextFunctions.hash60($"b").as("hb"),
        conv(substring(md5($"b"), 1, 15), 16, 10).cast("long").as("hb_ref"))
      .collect()(0)
    assert(r.isNullAt(0))
    assert(r.getLong(1) == r.getLong(2))
  }

  test("values are non-negative and fit in 60 bits") {
    val vs = samples.map(HashUtil.hash60)
    assert(vs.forall(v => v >= 0 && v < (1L << 60)))
  }
}
