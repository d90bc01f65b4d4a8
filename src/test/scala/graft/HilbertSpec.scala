package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

class HilbertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent reference walk (the textbook xy2d loop) for cross-checking
    * the codegen'd expression. */
  private def refXy2d(bits: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("expression matches the reference walk on the full 16x16 grid") {
    val bits = 4
    val grid = for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong)
    val got = grid.toDF("x", "y")
      .select($"x", $"y", Layout.hilbertKey($"x", $"y", bits).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    grid.foreach { case (x, y) =>
      assert(got((x, y)) == refXy2d(bits, x, y), s"($x,$y)")
    }
  }

  test("curve is gap-free: a bijection whose consecutive cells are adjacent") {
    val bits = 4
    val grid = for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong)
    val byD = grid.map { case (x, y) => refXy2d(bits, x, y) -> ((x, y)) }.toMap
    assert(byD.size == 256 && byD.keys.min == 0L && byD.keys.max == 255L)
    (0L until 255L).foreach { d =>
      val ((x1, y1), (x2, y2)) = (byD(d), byD(d + 1))
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at d=$d")
    }
  }

  test("SQL surface: hilbert_xy2d registered via extensions; masks wide input") {
    val d = spark.sql(
      "SELECT hilbert_xy2d(CAST(21 AS BIGINT), CAST(5 AS BIGINT), 4) AS d")
      .head().getLong(0)
    // 21 & 15 = 5 -> same as (5, 5)
    assert(d == refXy2d(4, 5, 5))
    val err = intercept[Exception] {
      spark.sql("SELECT hilbert_xy2d(1, 2, CAST(rand()*4 AS INT))").collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("clusterByHilbert tightens per-partition bounds vs a 1-D sort") {
    // points on a diagonal band: a 1-D sort by x leaves y spread; hilbert
    // clustering bounds both. Sanity: row set is preserved.
    val pts = (0 until 512).map(i => (i.toLong % 64, (i.toLong * 7) % 64))
    val df = pts.toDF("x", "y")
    val clustered = Layout.clusterByHilbert(df, "x", "y", partitions = 4, bits = 6)
    assert(clustered.count() == 512)
    val spans = clustered
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("x") - min("x") + max("y") - min("y")).as("span"))
      .collect().map(_.getLong(1))
    // each of 4 partitions covers a sub-region, not the whole 64+64 extent
    assert(spans.forall(_ < 126), spans.mkString(","))
  }
}
