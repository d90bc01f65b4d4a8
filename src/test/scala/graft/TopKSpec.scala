package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TopK

class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bounded top-k aggregate matches the window formulation exactly") {
    // heavy ties (values 0..39 over 500 rows) force the id tie-break;
    // 8 partitions force real map-side partials + merges
    val rnd = new scala.util.Random(42)
    val df = (1 to 500).map(i =>
        (s"g${rnd.nextInt(7)}", i.toLong, rnd.nextInt(40).toLong))
      .toDF("g", "id", "v").repartition(8)
    val got = TopK.topKByGroup(df, Seq("g"), "id", "v", k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val w = Window.partitionBy("g").orderBy(desc("v"), asc("id"))
    val exp = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3).select("g", "rank", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == exp && got.nonEmpty)
  }

  test("k exceeding group size returns the whole group, ranked") {
    val df = Seq(("a", 1L, 10L), ("a", 2L, 10L), ("b", 3L, 5L))
      .toDF("g", "id", "v")
    val got = TopK.topKByGroup(df, Seq("g"), "id", "v", k = 5)
      .orderBy("g", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // value tie within 'a' breaks to the lower id
    assert(got.toSeq == Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 1L, 3L)))
  }

  test("null ids and values are dropped, not silently ranked") {
    val df = Seq((Some("a"), Some(1L), Some(3L)), (Some("a"), None, Some(9L)),
        (Some("a"), Some(2L), None))
      .toDF("g", "id", "v")
    val got = TopK.topKByGroup(df, Seq("g"), "id", "v", k = 2).collect()
    assert(got.length == 1 && got.head.getLong(2) == 1L)
  }
}
