package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Snapshot, TextAnalysis}

class SnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val v1 = Seq(
    (1L, "alpha", "en"), (2L, "beta", "en"),
    (3L, "gamma", "de"), (4L, null.asInstanceOf[String], "en"))
    .toDF("doc_id", "text", "lang")
  private lazy val v2 = Seq(
    (1L, "alpha", "en"),         // unchanged
    (2L, "beta v2", "en"),       // changed text
    (4L, "", "en"),              // null -> empty string IS a change
    (5L, "delta", "fr"))         // added; 3 removed
    .toDF("doc_id", "text", "lang")

  test("diff classifies added/removed/changed/unchanged; null != empty") {
    val d = Snapshot.diff(v1, v2, "doc_id", Seq("text", "lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "added"))
  }

  test("delta carries exactly the new-snapshot rows needing reprocessing") {
    val ids = Snapshot.delta(v1, v2, "doc_id", Seq("text", "lang"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L, 4L, 5L))
    // column concatenation cannot alias across the separator
    val a = Seq((1L, "ab", "c")).toDF("doc_id", "text", "lang")
    val b = Seq((1L, "a", "bc")).toDF("doc_id", "text", "lang")
    val st = Snapshot.diff(a, b, "doc_id", Seq("text", "lang"))
      .collect().head.getString(1)
    assert(st == "changed")
  }

  test("cleanText strips tags and control chars, collapses whitespace") {
    val d = Seq(
      (1L, "<div class=x>Hello</div>\u0007  world\t\t!"),
      (2L, "plain")).toDF("doc_id", "text")
    val g = TextAnalysis.cleanAudit(d).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(g(1L)._1 == "Hello world !")
    assert(g(1L)._2 > g(1L)._3) // the audit shows the reduction
    assert(g(2L) == (("plain", 5L, 5L))) // clean input is a fixpoint
  }

  test("blocklist gate: token-boundary matches, micro ratio, zero-token keep") {
    val docs = Seq(
      (1L, "spam spam ham"),          // 2/3 blocked
      (2L, "classic assessment"),     // substring 'spam'/'ass' must NOT hit
      (3L, ""),                       // zero tokens -> ratio 0, kept
      (4L, "SPAM!"),                  // case-insensitive hit
      (5L, null.asInstanceOf[String]) // NULL text == zero tokens, kept
    ).toDF("doc_id", "text")
    val g = TextAnalysis.blocklistHits(docs, Seq("spam", "ass"),
        maxRatioMicro = 500000).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(g(1L) == ((3L, 2L, 666667L, false)))
    assert(g(2L) == ((2L, 0L, 0L, true)))
    assert(g(3L) == ((0L, 0L, 0L, true)))
    assert(g(4L) == ((1L, 1L, 1000000L, false)))
    assert(g(5L) == ((0L, 0L, 0L, true)))
  }
}
