package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asofLeft: greatest right ts <= left ts, inclusive; null when none") {
    val left = Seq((1L, 10L, 100L), (1L, 25L, 101L), (2L, 5L, 102L))
      .toDF("k", "t", "lid").withColumnRenamed("k", "key")
      .withColumnRenamed("t", "ts")
    val right = Seq((1L, 10L, 900L), (1L, 20L, 901L), (1L, 30L, 902L))
      .toDF("key", "ts", "rid")
    val out = AsOfJoin.asofLeft(left, right, "key", "ts", Seq("rid"))
      .collect().map(r => r.getAs[Long]("lid") ->
        Option(r.getAs[java.lang.Long]("asof_rid")).map(_.longValue)).toMap
    assert(out(100L).contains(900L)) // inclusive: right at ts=10 matches left ts=10
    assert(out(101L).contains(901L)) // greatest <= 25 is 20
    assert(out(102L).isEmpty)        // key 2 has no right rows
  }

  test("asofLeft: deterministic tie-break among equal right timestamps") {
    val left = Seq((1L, 10L, 100L)).toDF("key", "ts", "lid")
    val right = Seq((1L, 10L, 900L), (1L, 10L, 905L), (1L, 10L, 903L))
      .toDF("key", "ts", "rid")
    val out = AsOfJoin.asofLeft(left, right, "key", "ts", Seq("rid"),
      rightTieBreak = Some("rid")).collect()
    assert(out.head.getAs[Long]("asof_rid") == 905L) // largest wins
  }
}
