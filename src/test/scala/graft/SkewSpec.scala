package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Skew

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // heavy skew: key 1 holds 100 of 103 left rows
  private lazy val left = ((1 to 100).map(i => (1L, i)) ++
    Seq((2L, 101), (3L, 102), (4L, 103)))
    .toDF("k", "payload")
  private lazy val right = Seq((1L, "a"), (2L, "b"), (3L, "c"), (5L, "z"))
    .toDF("k", "side")

  test("salted join is row-identical to the plain inner join") {
    val plain = left.join(right, Seq("k"), "inner")
      .select("k", "payload", "side")
    val salted = Skew.saltedJoin(left, right, Seq("k"),
        salts = 8, saltBy = col("payload"))
      .select("k", "payload", "side")
    assert(salted.count() == plain.count()) // multiplicity preserved
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
    // unmatched keys on either side stay unmatched
    assert(salted.filter($"k" === 4L || $"k" === 5L).count() == 0)
  }

  test("salts=1 degenerates to the plain join; hot key actually spreads") {
    val s1 = Skew.saltedJoin(left, right, Seq("k"), salts = 1,
      saltBy = col("payload"))
    assert(s1.count() == left.join(right, Seq("k")).count())
    // the salt column distributes the hot key over several values
    val spread = left.filter($"k" === 1L)
      .select(pmod(hash($"payload"), lit(8)).as("s"))
      .distinct().count()
    assert(spread > 1)
  }
}
