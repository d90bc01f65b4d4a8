package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classifier

class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Two disjoint vocabularies -> linearly separable by construction.
  private lazy val docs = Seq(
    (1L, "good clean prose with varied useful words", "en"),
    (2L, "another good useful clean sentence of prose", "en"),
    (3L, "more varied prose words here good", "en"),
    (4L, "spam spam buy now click here spam", "xx"),
    (5L, "click buy spam now now click", "xx"),
    (6L, "", "en"), // empty text: bias-only features
    (7L, null.asInstanceOf[String], "xx") // null text: bias-only too
  ).toDF("doc_id", "text", "lang")

  test("hashedFeatures: bias row for every doc, counts summed per bucket") {
    val f = Classifier.hashedFeatures(docs, nBuckets = 16)
    val bias = f.filter(col("bucket") === 16).collect()
    assert(bias.length == 7 && bias.forall(_.getLong(2) == 1L))
    // token rows only for docs with tokens; total token mass preserved
    val tokMass = f.filter(col("bucket") < 16)
      .agg(sum("cnt")).collect()(0).getLong(0)
    assert(tokMass == 33L) // hand-counted tokens across docs 1-5
  }

  test("perceptron separates disjoint vocabularies; empty docs get bias score") {
    val out = Classifier.qualityScores(docs, positive = col("lang") === "en",
      nBuckets = 16, rounds = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // separable data: every doc with tokens classified correctly
    for (id <- Seq(1L, 2L, 3L)) assert(out(id)._3 == 1L, s"doc $id")
    for (id <- Seq(4L, 5L)) assert(out(id)._3 == -1L, s"doc $id")
    // bias-only docs share one score: the bias weight itself
    assert(out(6L)._2 == out(7L)._2)
    // labels carried through
    assert(out(1L)._1 == 1L && out(4L)._1 == -1L)
  }

  test("train is deterministic and batch-order-free") {
    val feats = Classifier.hashedFeatures(docs, nBuckets = 16)
    val lab = Classifier.labels(docs, col("lang") === "en")
    val w1 = Classifier.trainPerceptron(feats, lab, 16, rounds = 2)
    val w2 = Classifier.trainPerceptron(
      feats.repartition(7), lab, 16, rounds = 2)
    assert(w1.toSeq == w2.toSeq)
    graft.core.CacheScope.release()
  }

  test("naive bayes classifies a separable fixture and carries correctness") {
    val d = Seq(
      (1L, "cat cat dog", "a"), (2L, "cat", "a"),
      (3L, "bird bird", "b"), (4L, "bird dog", "b"))
      .toDF("doc_id", "text", "lang")
    val out = Classifier.naiveBayes(d).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    // class-defining tokens dominate: every doc routes to its own label
    assert(out == Map(
      1L -> ("a", 1L), 2L -> ("a", 1L), 3L -> ("b", 1L), 4L -> ("b", 1L)))
    graft.core.CacheScope.release()
  }

  test("naive bayes breaks exact score ties by lexicographic label") {
    // perfectly symmetric evidence: both docs score a and b equally
    val d = Seq((1L, "cat", "b"), (2L, "cat", "a"))
      .toDF("doc_id", "text", "lang")
    val out = Classifier.naiveBayes(d).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(out == Map(1L -> ("a", 0L), 2L -> ("a", 1L)))
    graft.core.CacheScope.release()
  }

  test("naive bayes is partition-order-free") {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Classifier.naiveBayes(base).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val b = Classifier.naiveBayes(base.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b)
    graft.core.CacheScope.release()
  }
}
