package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HeavyHitters

class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // zipf-ish: key K_i has weight proportional to its construction count
  private def corpus(seed: Int) = {
    val rows = for {
      i <- 1 to 40
      r <- 1 to (if (i <= 3) 120 else if (i <= 8) 25 else 2)
    } yield (f"k$i%02d", 1L + ((i * 31 + r * 7 + seed) % 3))
    rows
  }

  test("heavyHitters equals brute-force GROUP BY/HAVING on every partitioning") {
    val rows = corpus(0)
    val total = rows.map(_._2).sum
    val exact = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .filter { case (_, c) => c * 50 >= total * 1 }.toMap
    for (parts <- Seq(1, 3, 17)) {
      val df = rows.toDF("key", "w").repartition(parts)
      val got = HeavyHitters.heavyHitters(df, "key", "w", num = 1, den = 50)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == exact, s"parts=$parts")
    }
  }

  test("MG summary: superset of heavy keys, never overcounts, bounded undercount") {
    val rows = corpus(7)
    val truth = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = rows.map(_._2).sum
    val k = 10
    val (gotTotal, summ) = HeavyHitters.summary(
      rows.toDF("key", "w").repartition(5), "key", "w", k)
    assert(gotTotal == total)
    assert(summ.size <= k)
    summ.foreach { case (key, est) =>
      assert(est <= truth(key), s"$key overcounted")
      assert(truth(key) - est <= total / (k + 1) + 1, s"$key undercount bound")
    }
    // every key heavier than total/(k+1) must be present
    truth.filter(_._2 > total / (k + 1)).keys
      .foreach(h => assert(summ.contains(h), s"missing heavy key $h"))
  }

  test("weights: non-positive and null rows are ignored; ties at threshold kept") {
    val df = Seq(("a", 6L), ("a", 0L), ("a", -5L), ("b", 3L), ("c", 1L),
      (null.asInstanceOf[String], 99L)).toDF("key", "w")
    // total = 10; threshold share 3/10 -> a(6) and b(3) qualify, c(1) not
    val got = HeavyHitters.heavyHitters(df, "key", "w", num = 3, den = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 6L, "b" -> 3L))
  }

  test("empty input yields empty output") {
    val df = Seq.empty[(String, Long)].toDF("key", "w")
    assert(HeavyHitters.heavyHitters(df, "key", "w", 1, 5).count() == 0L)
  }
}
