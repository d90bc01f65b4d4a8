package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val items = Seq(
    ("the", 100L), ("cat", 40L), ("sat", 25L), ("mat", 10L), ("on", 60L))
    .toDF("token", "n")

  test("estimates never under-count; wide sketch is exact") {
    val cms = Sketches.cmsBuild(items, "token", "n", depth = 3, width = 4096)
    val est = Sketches.cmsEstimate(cms, items, "token", depth = 3, width = 4096)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    est.foreach { case (_, (exact, e)) => assert(e >= exact) }
    // 5 keys in 3x4096 cells: collisions essentially impossible -> exact
    assert(est.forall { case (_, (exact, e)) => e == exact })
  }

  test("narrow sketch over-counts on collisions but stays an upper bound") {
    val cms = Sketches.cmsBuild(items, "token", "n", depth = 2, width = 2)
    val est = Sketches.cmsEstimate(cms, items, "token", depth = 2, width = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 5 keys in 2 buckets per row must collide: total mass conserved per row
    est.foreach { case (_, (exact, e)) => assert(e >= exact && e <= 235L) }
    assert(est.exists { case (_, (exact, e)) => e > exact })
  }

  test("absent key with empty cells estimates 0 (left-join path)") {
    val one = Seq(("solo", 7L)).toDF("token", "n")
    val cms = Sketches.cmsBuild(one, "token", "n", depth = 3, width = 4096)
    val probe = Seq(Tuple1("missing")).toDF("token")
    val est = Sketches.cmsEstimate(cms, probe, "token", depth = 3, width = 4096)
      .collect()
    assert(est.length == 1 && est(0).getLong(1) == 0L)
  }

  test("merged shard sketches are cell-identical to the whole-corpus sketch") {
    val a = items.filter($"token" < "o")
    val b = items.filter($"token" >= "o")
    val merged = Sketches.merge(Seq(
      Sketches.cmsBuild(a, "token", "n", depth = 3, width = 64),
      Sketches.cmsBuild(b, "token", "n", depth = 3, width = 64)))
    val whole = Sketches.cmsBuild(items, "token", "n", depth = 3, width = 64)
    val m = merged.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w = whole.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m == w)
  }
}
