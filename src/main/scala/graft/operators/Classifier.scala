package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Linear quality classifier over hashed bag-of-words features — the
  * fastText-style shape (Joulin et al. 2016: hashed n-gram bag + linear
  * model) that large-scale pipelines use to score document quality against
  * a labeled seed set (e.g. GPT-3's WebText-vs-CommonCrawl filter,
  * Brown et al. 2020 §A). The reference has no trainable scorer (its
  * quality signals are fixed heuristics); this adds the trainable half.
  *
  * Everything is exact integer arithmetic: features are token COUNTS, the
  * model is a batch PERCEPTRON (w += sum of y·x over misclassified docs —
  * no learning rate, no exp/sigmoid, no float anywhere), so a fixed-round
  * train is bit-reproducible across engines and SQL-replayable
  * (`t_perceptron` replays the full 3-round train in DuckDB CTEs).
  *
  * Scale shape: one feature build (two map-side-combined aggs), then per
  * round one per-doc score agg + one per-bucket delta agg; the only
  * driver-side state is the weight vector itself — `nBuckets + 1` longs,
  * bounded by feature-hashing geometry, never by corpus size. Weights
  * enter the plan as a literal map (row-local lookup, no join, no UDF).
  */
object Classifier {

  /** Hashed bag-of-words features: (idCol, bucket, cnt) where bucket =
    * hash60(token) mod nBuckets and cnt is the token count in that doc,
    * plus a constant bias feature at bucket = nBuckets for EVERY document
    * (so empty/null-text docs still carry a scorable row). Null ids are
    * out of contract and dropped, like the split/sample operators. */
  def hashedFeatures(docs: DataFrame, nBuckets: Int = 64,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(nBuckets >= 1, "need nBuckets >= 1")
    val tok = TextOps.unigrams(docs.filter(col(idCol).isNotNull), idCol, textCol)
      .groupBy(col(idCol), pmod(hash60(col("token")), lit(nBuckets.toLong)).as("bucket"))
      .agg(sum(col("count")).cast("long").as("cnt"))
    val bias = docs.filter(col(idCol).isNotNull)
      .select(col(idCol), lit(nBuckets.toLong).as("bucket"), lit(1L).as("cnt"))
    tok.unionByName(bias)
  }

  /** ±1 labels from a boolean Column over the docs table (self-deriving,
    * like the blocklist query): (idCol, y) with y = 1 where `positive`
    * holds, else -1. */
  def labels(docs: DataFrame, positive: Column,
             idCol: String = "doc_id"): DataFrame =
    docs.filter(col(idCol).isNotNull)
      .select(col(idCol), when(positive, 1L).otherwise(-1L).as("y"))

  /** Batch perceptron: `rounds` full passes. Each round scores every doc
    * against the current weights, takes docs with margin y·score <= 0
    * (round 1 starts at w = 0, so every doc updates — the standard cold
    * start), and adds sum(y·cnt) per bucket. Returns the weight vector,
    * one long per bucket plus the bias at index nBuckets. Deterministic:
    * batch updates are order-free sums, unlike the online perceptron. */
  def trainPerceptron(feats: DataFrame, labelDf: DataFrame, nBuckets: Int,
                      rounds: Int = 3, idCol: String = "doc_id"): Array[Long] = {
    require(rounds >= 1, "need rounds >= 1")
    val base = graft.core.CacheScope.persist(
      feats.join(labelDf, idCol)
        .select(col(idCol), col("bucket"), col("cnt"), col("y")))
    val w = Array.fill(nBuckets + 1)(0L)
    for (_ <- 1 to rounds) {
      val wLit = typedlit(w.zipWithIndex.map { case (v, b) => (b.toLong, v) }.toMap)
      val deltas = base
        .withColumn("sc", col("cnt") * element_at(wLit, col("bucket")))
        .withColumn("mis",
          (sum(col("sc")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col(idCol))) * col("y")) <= 0)
        .filter(col("mis"))
        .groupBy(col("bucket"))
        .agg(sum(col("y") * col("cnt")).as("d"))
        .collect() // <= nBuckets + 1 rows: feature geometry, never data size
      deltas.foreach(r => w(r.getLong(0).toInt) += r.getLong(1))
    }
    w
  }

  /** Score docs against a trained weight vector: (idCol, score, pred) with
    * score = sum(cnt · w(bucket)) and pred = sign (0 scores -1, matching
    * the train-time margin rule y·score <= 0). Row-local literal-map
    * lookup + one map-side-combined agg. */
  def scoreLinear(feats: DataFrame, weights: Array[Long],
                  idCol: String = "doc_id"): DataFrame = {
    val wLit = typedlit(weights.zipWithIndex.map {
      case (v, b) => (b.toLong, v) }.toMap)
    feats
      .select(col(idCol),
        (col("cnt") * element_at(wLit, col("bucket"))).as("sc"))
      .groupBy(col(idCol))
      .agg(sum(col("sc")).cast("long").as("score"))
      .withColumn("pred", when(col("score") > 0, 1L).otherwise(-1L))
  }

  /** The composed train-and-score pipeline: hash features, derive labels
    * from `positive`, train `rounds` perceptron passes, score every doc.
    * Output: (idCol, y, score, pred). */
  def qualityScores(docs: DataFrame, positive: Column, nBuckets: Int = 64,
                    rounds: Int = 3, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val feats = hashedFeatures(docs, nBuckets, idCol, textCol)
    val lab = labels(docs, positive, idCol)
    val w = trainPerceptron(feats, lab, nBuckets, rounds, idCol)
    scoreLinear(feats, w, idCol).join(lab, idCol)
      .select(col(idCol), col("y"), col("score"), col("pred"))
  }
}
