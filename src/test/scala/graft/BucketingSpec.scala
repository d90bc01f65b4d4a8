package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Bucketing
import graft.operators.TextOps

/** Bucketed co-located joins: the repeated-join strategy for scale — both
  * sides pre-bucketed on the key join with NO Exchange in the physical
  * plan. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed tables join with no shuffle exchange") {
    val dir = Files.createTempDirectory("nc_buckets").toString
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    Bucketing.writeBucketed(docs.select("doc_id", "lang", "source"),
      "b_docs", s"$dir/docs", "doc_id", 4)
    Bucketing.writeBucketed(TextOps.unigrams(docs),
      "b_uni", s"$dir/uni", "doc_id", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join must pick a merge/hash strategy —
      // the bucketed layout must then satisfy it without any Exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.readBucketed(spark, "b_docs")
        .join(Bucketing.readBucketed(spark, "b_uni"), "doc_id")
      val n = joined.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_uni")
    }
  }
}
