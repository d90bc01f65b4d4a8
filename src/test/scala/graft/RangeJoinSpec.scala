package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 0L), (2L, 99L), (3L, 100L), (4L, 250L), (5L, 1000L), (6L, 4999L))
    .toDF("pid", "t")
  private lazy val intervals = Seq(
    (10L, 0L, 99L),      // exactly one granule at g=100
    (20L, 100L, 300L),   // spans granules 1..3
    (30L, 250L, 250L),   // degenerate single-instant
    (40L, 5000L, 5400L)) // empty (no points)
    .toDF("iid", "lo", "hi")

  private def got(granule: Long) =
    RangeJoin.pointInInterval(points, "t", intervals, "lo", "hi", granule)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("matches the naive BETWEEN join, boundaries inclusive, at any granule") {
    val naive = points.crossJoin(intervals)
      .filter($"t" >= $"lo" && $"t" <= $"hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive == Set((1L, 10L), (2L, 10L), (3L, 20L), (4L, 20L), (4L, 30L)))
    for (g <- Seq(1L, 7L, 100L, 1000L, 100000L))
      assert(got(g) == naive, s"granule=$g")
  }

  test("no duplicate pairs: each pair matches on the point's single granule") {
    val rows = RangeJoin.pointInInterval(points, "t", intervals, "lo", "hi", 100L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.toSet.size)
  }

  test("randomized: equals the naive theta-join across seeds and granules") {
    for (seed <- 1 to 4) {
      val rng = new scala.util.Random(seed)
      val pts = Seq.tabulate(300)(i => (i.toLong, rng.nextLong(10000L)))
        .toDF("pid", "t")
      val ivs = Seq.tabulate(40) { i =>
        val lo = rng.nextLong(10000L)
        (i.toLong, lo, lo + rng.nextLong(500L))
      }.toDF("iid", "lo", "hi")
      val naive = pts.crossJoin(ivs).filter($"t" >= $"lo" && $"t" <= $"hi")
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for (g <- Seq(1L, 37L, 512L, 10000L)) {
        val fast = RangeJoin.pointInInterval(pts, "t", ivs, "lo", "hi", g)
          .select("pid", "iid").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        assert(fast.toSet == naive && fast.length == naive.size,
          s"seed=$seed granule=$g")
      }
    }
  }

  test("out-of-contract intervals fail loudly, never silently") {
    val bad = Seq((1L, 300L, 100L)).toDF("iid", "lo", "hi")
    val e1 = intercept[Exception] {
      RangeJoin.pointInInterval(points, "t", bad, "lo", "hi", 100L).collect()
    }
    assert(e1.getMessage.contains("hi < lo"))
    val wide = Seq((1L, 0L, 1000000L)).toDF("iid", "lo", "hi")
    val e2 = intercept[Exception] {
      RangeJoin.pointInInterval(points, "t", wide, "lo", "hi", 10L,
        maxGranulesPerInterval = 100).collect()
    }
    assert(e2.getMessage.contains("granules"))
  }
}
