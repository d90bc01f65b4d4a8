package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered driver query must run at sf0.001 (the oracle VALUE match
  * is covered by Verify + tools/check.py; this catches runtime regressions
  * fast inside `sbt test`). */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // queries whose correct result CAN be empty on tiny data
  private val mayBeEmpty = Set("t_jaccard_pairs", "t_minhash_lsh")

  Queries.all.foreach { case (name, q) =>
    test(s"$name runs at sf0.001") {
      val n = q.fn(spark, dir).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle name corresponds to a query") {
    assert(Queries.oracleSql.keySet.subsetOf(Queries.queries.keySet))
  }

  test("headline queries are registered") {
    assert(Queries.headlines.nonEmpty)
    assert(Queries.headlines.toSet.subsetOf(Queries.queries.keySet))
  }
}
