package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference Morton interleave in plain Scala. */
  private def morton(vals: Seq[Long], bitsPer: Int): Long = {
    var z = 0L
    for (i <- 0 until bitsPer; j <- vals.indices)
      z |= ((vals(j) >> i) & 1L) << (i * vals.size + j)
    z
  }

  test("zorderKey matches the reference bit interleave") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L),
      (12345L, 54321L))
    val df = rows.toDF("x", "y")
      .withColumn("z", Layout.zorderKey(Seq(col("x"), col("y")), 16))
    df.collect().foreach { r =>
      assert(r.getLong(2) == morton(Seq(r.getLong(0), r.getLong(1)), 16),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // three columns interleave too
    val d3 = Seq((1L, 2L, 4L)).toDF("a", "b", "c")
      .withColumn("z", Layout.zorderKey(Seq(col("a"), col("b"), col("c")), 8))
      .head().getLong(3)
    assert(d3 == morton(Seq(1L, 2L, 4L), 8))
  }

  test("zorder clustering gives locality in BOTH dimensions") {
    // a 64x64 grid: single-column sort leaves the other dimension's
    // per-partition span at ~full range; z-order bounds both.
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    def spans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val s = df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(avg("sx"), avg("sy")).head()
      (s.getDouble(0), s.getDouble(1))
    }
    val (zx, zy) = spans(Layout.clusterByZorder(grid, Seq("x", "y"),
      partitions = 16, bitsPer = 6))
    val (_, sy) = spans(grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions("x"))
    // x-sorted layout: y spans the whole 0..63 range in every partition.
    assert(sy > 60.0, s"x-sort control should not bound y (got $sy)")
    // z-order: both dimensions bounded well under the full range.
    assert(zx < 32.0 && zy < 32.0, s"z-order spans too wide: ($zx, $zy)")
  }
}
