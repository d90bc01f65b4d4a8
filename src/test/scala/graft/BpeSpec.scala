package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // the classic BPE example corpus: low:3 lower:2 newest:4 widest:2
  private lazy val docs = Seq(
    (1L, "low low low lower lower newest newest"),
    (2L, "newest newest widest widest")).toDF("doc_id", "text")

  test("train learns the hand-derived merge sequence with exact ties") {
    val got = Bpe.train(docs, nMerges = 6)
      .map(m => (m.step, m.lhs, m.rhs, m.n))
    // hand derivation: pair counts weighted by word frequency; ties break
    // (count desc, lhs asc, rhs asc)
    assert(got == Seq(
      (1, "e", "s", 6L),   // es: newest(4) + widest(2)
      (2, "es", "t", 6L),  // est
      (3, "l", "o", 5L),   // lo: low(3) + lower(2), beats (o,w) on lhs tie
      (4, "lo", "w", 5L),  // low
      (5, "e", "w", 4L),   // ew: newest; tie with (n,ew-parts) broken by lhs
      (6, "ew", "est", 4L) // ewest
    ))
    graft.core.CacheScope.release()
  }

  test("encode applies merges in order, leftmost-non-overlapping") {
    val merges = Bpe.train(docs, nMerges = 6)
    val enc = Seq("newest", "lowering", "LOW")
      .toDF("word")
      .withColumn("toks", Bpe.encode(col("word"), merges))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(enc("newest") == List("n", "ewest"))
    assert(enc("lowering") == List("low", "e", "r", "i", "n", "g"))
    assert(enc("LOW") == List("low")) // encode lowercases like the trainer
    graft.core.CacheScope.release()
  }

  test("train stops early when the pair supply is exhausted") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val got = Bpe.train(tiny, nMerges = 100)
    assert(got == Seq(Bpe.Merge(1, "a", "b", 2L)))
    // consecutive identical pairs merge leftmost-first: "aaa" -> [aa, a]
    val aaa = Bpe.train(Seq((1L, "aaa aaa")).toDF("doc_id", "text"), 1)
    assert(aaa == Seq(Bpe.Merge(1, "a", "a", 4L))) // 2 overlapping pairs x 2
    val enc = Seq("aaa").toDF("w")
      .select(Bpe.encode(col("w"), aaa).as("t")).head().getSeq[String](0)
    assert(enc == Seq("aa", "a"))
    graft.core.CacheScope.release()
  }
}
