package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** DSIR-style importance resampling for pretraining-data selection
  * (Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling"): score every raw document by how target-like its hashed
  * n-gram feature distribution is, then keep the top slice.
  *
  * Pipeline shape (all corpus-sized stages are single aggregates):
  *
  *  1. [[hashedFeatures]] — unigram + bigram token features hashed into a
  *     fixed `numBuckets` space (feature hashing closes the vocabulary:
  *     the model is `numBuckets` counters regardless of corpus size).
  *  2. [[importanceWeights]] — per-bucket log-likelihood ratio
  *     `ln(p_target(b) / p_raw(b))` under add-one smoothing, carried as
  *     integer MICRO-nats so downstream sums are exact and
  *     order-independent. The weight table has at most `numBuckets` rows —
  *     broadcast-sized by construction, independent of corpus size.
  *  3. [[scoreDocuments]] — per-document score = Σ count(b) · w(b) via a
  *     broadcast join of the weight table onto the per-doc bucket counts:
  *     the corpus-sized side shuffles ONCE (the groupBy(doc, bucket)),
  *     never for the join.
  *  4. [[selectTop]] — deterministic top-k by (score desc, id asc), a
  *     TakeOrdered — no global sort.
  *
  * Cross-engine determinism: bucket = hash60("dsir:" ++ feature) mod B
  * (md5-derived, engine-stable); weights are `round(ln(rational) * 1e6)`
  * where the rational's numerator/denominator are exact integers, the same
  * micro-nat contract the TF-IDF / Kneser-Ney / BM25 oracles use.
  *
  * The reference engine has no data-selection stage; this extends its
  * corpus model (corpus.py:1-60) the way a 100 TB pretraining pipeline
  * needs. 2^53 headroom: doc scores are Σ cnt·|w| ≤ n_tokens · ln(B)·1e6
  * ≈ n_tokens · 2e7 — safe for documents under ~4e8 tokens.
  */
object Dsir {

  /** Per-document hashed feature COUNTS: (idCol, bucket, cnt).
    *
    * Features are the unigram tokens plus adjacent-pair bigrams
    * ("a b", space-joined), each hashed into [0, numBuckets) with the
    * engine-stable hash60 under a "dsir:" salt. Row-local explode + one
    * hash aggregate; no joins, no windows.
    */
  def hashedFeatures(docs: DataFrame, numBuckets: Int,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val toks = docs.select(col(idCol), tokens(col(textCol)).as("toks"))
    // unigrams ++ bigrams, built row-locally from the one token array
    val bi = transform(
      sequence(lit(1), size(col("toks")) - lit(1)),
      i => concat(element_at(col("toks"), i), lit(" "),
        element_at(col("toks"), i + lit(1))))
    val feats = concat(
      col("toks"),
      when(size(col("toks")) >= 2, bi).otherwise(array()))
    toks.select(col(idCol), explode(feats).as("f"))
      .select(col(idCol),
        pmod(hash60(concat(lit("dsir:"), col("f"))), lit(numBuckets.toLong))
          .as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-bucket importance weights in integer micro-nats:
    *
    *   w(b) = round( ln( (c_t(b)+1) · (C_r+B) / ((c_r(b)+1) · (C_t+B)) ) · 1e6 )
    *
    * where c_t/c_r are target/raw bucket counts, C_t/C_r their totals and
    * B = numBuckets (add-one smoothing over the hashed space). Emits one
    * row per bucket OBSERVED in the raw corpus — buckets absent from raw
    * can never contribute to a raw document's score, so the table stays
    * ≤ min(numBuckets, distinct-features) rows. Output: (bucket, w_micro).
    */
  def importanceWeights(targetFeats: DataFrame, rawFeats: DataFrame,
                        numBuckets: Int): DataFrame =
    weightsFromCounts(bucketCounts(targetFeats), bucketCounts(rawFeats),
      numBuckets)

  /** The model's SUFFICIENT STATISTICS for one corpus (shard): per-bucket
    * total counts `(bucket, c)` of a [[hashedFeatures]] table — at most
    * `numBuckets` rows however large the shard. Counts are ADDITIVE, so
    * statistics of disjoint shards merge exactly (see [[mergeCounts]]):
    * the incremental-maintenance property a 100 TB pipeline needs — new
    * data updates the model without re-reading old data. */
  def bucketCounts(feats: DataFrame): DataFrame =
    feats.groupBy("bucket").agg(sum("cnt").as("c"))

  /** EXACT merge of per-shard bucket-count statistics: additive union.
    * `weightsFromCounts(mergeCounts(shards))` is value-identical to the
    * weights of the concatenated corpus — the DSIR analog of the
    * vocabulary's `mergeVocab` (per-shard daily stats fold into the
    * running model; nothing is recomputed). Shuffle volume: shards x
    * numBuckets rows, corpus-size-independent. */
  def mergeCounts(shards: Seq[DataFrame]): DataFrame = {
    require(shards.nonEmpty, "need at least one statistics shard")
    shards.reduce(_ unionByName _).groupBy("bucket").agg(sum("c").as("c"))
  }

  /** [[importanceWeights]] in its model-maintenance form: weights from
    * bucket-count STATISTICS tables rather than doc-level feature tables.
    * Same arithmetic to the bit (one fixed double chain per bucket);
    * scalar totals now come from the numBuckets-row statistics (a
    * geometry-sized aggregate) instead of a second corpus-sized pass —
    * the cheaper plan for free. An EMPTY target yields n_t = 0 (all-raw
    * smoothing), not a null-poisoned table. */
  def weightsFromCounts(targetCounts: DataFrame, rawCounts: DataFrame,
                        numBuckets: Int): DataFrame = {
    val totT = targetCounts.agg(coalesce(sum("c"), lit(0L)).as("n_t"))
    val totR = rawCounts.agg(coalesce(sum("c"), lit(0L)).as("n_r"))
    rawCounts.select(col("bucket"), col("c").as("c_r"))
      .join(targetCounts.select(col("bucket"), col("c").as("c_t")),
        Seq("bucket"), "left")
      .na.fill(0L, Seq("c_t"))
      .crossJoin(broadcast(totT)).crossJoin(broadcast(totR))
      .select(col("bucket"),
        round(log(
          (col("c_t") + lit(1)).cast("double") * (col("n_r") + lit(numBuckets)) /
            ((col("c_r") + lit(1)).cast("double") * (col("n_t") + lit(numBuckets)))
        ) * lit(1e6), 0).cast("long").as("w_micro"))
  }

  /** `docs` with (score_micro, weighted_hits) columns appended: the
    * `scoreDocuments(hashedFeatures(...))` values computed ROW-LOCALLY
    * against a COLLECTED weight table — zero shuffles, zero joins: the
    * per-doc bucket multiset never leaves the row. The weight model is
    * geometry-sized by construction (≤ numBuckets rows), so it rides as
    * two literal lookup arrays (one reference object each, O(1)
    * element_at — never a MapType probe, which scans linearly).
    *
    * Value contract, replicated EXACTLY from the join form (the frozen
    * curation oracle depends on it):
    *  - score = Σ over feature OCCURRENCES of w(bucket) — the same exact
    *    long sum as Σ_b cnt(b)·w(b); buckets absent from the weight
    *    table contribute 0 (the inner join dropped those rows);
    *  - `weighted_hits` counts occurrences in WEIGHTED buckets: the join
    *    form emits a score row only for docs with ≥ 1 such occurrence
    *    (an all-unweighted or token-free doc vanished at the inner
    *    join), so callers must filter `weighted_hits > 0` to keep the
    *    same doc set.
    *
    * This is the batch-apply scoring shape ([[graft.streaming.
    * CurationStream.curateBatch]]): the round-14 per-stage ladder showed
    * DSIR resample at 70-80% of apply wall time, and its only shuffles
    * were the (doc, bucket) feature aggregate and the score aggregate —
    * both eliminated here. [[scoreDocuments]] stays for model-side uses
    * (training replays, incremental maintenance) where the feature table
    * already exists. */
  def scoreRowLocal(docs: DataFrame, weights: DataFrame, numBuckets: Int,
                    textCol: String = "text"): DataFrame = {
    val wArr = new Array[Long](numBuckets)
    val hArr = new Array[Long](numBuckets)
    weights.collect().foreach { r =>
      val b = r.getAs[Long]("bucket").toInt
      // geometry guard (ADVICE r14): a weights table built under a LARGER
      // numBuckets than the caller's would index past the lookup arrays —
      // name the mismatch instead of throwing a bare AIOOBE from deep in
      // the fill loop.
      require(b >= 0 && b < numBuckets,
        s"DSIR weight table bucket $b is outside [0, $numBuckets): the " +
          "weights were built under a different numBuckets than the one " +
          "passed to scoreRowLocal (model/caller geometry mismatch)")
      wArr(b) = r.getAs[Long]("w_micro")
      hArr(b) = 1L
    }
    // ONE codegen'd fold over the token array ([[graft.plans.DsirScore]]).
    // Not a transform/aggregate HOF composition: HOFs are CodegenFallback,
    // and the interpreted per-feature md5 tree walk measured 2.2x the
    // join-based scoring this function replaces (and the first, non-staged
    // HOF cut re-ran the regex tokenizer per element — 3.6x the whole
    // apply). The struct is staged as a column so the two field reads
    // cannot re-evaluate it.
    docs
      .withColumn("__dsir", graft.plans.DsirExpressions.dsirScore(
        tokens(col(textCol)), wArr, hArr))
      .withColumn("score_micro", col("__dsir.score_micro"))
      .withColumn("weighted_hits", col("__dsir.weighted_hits"))
      .drop("__dsir")
  }

  /** Per-document importance score: Σ_b cnt(b) · w_micro(b), via a
    * BROADCAST join of the (≤ numBuckets)-row weight table — the
    * corpus-sized feature table is never reshuffled for the join.
    * Output: (idCol, score_micro). Buckets with no weight row cannot occur
    * when `weights` was built from the same raw corpus (inner join is
    * therefore lossless — but CAN occur for an arriving batch scored
    * against a frozen reference model; see [[scoreRowLocal]]). */
  def scoreDocuments(rawFeats: DataFrame, weights: DataFrame,
                     idCol: String = "doc_id"): DataFrame =
    rawFeats.join(broadcast(weights), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt") * col("w_micro")).as("score_micro"))

  /** Per-document DSIR scores when the TARGET IS A PREDICATE over the same
    * corpus (the self-supervised form the driver rows use): the flag rides
    * along from the first projection, so target and raw bucket counts fall
    * out of ONE conditional aggregate, and both totals come from the
    * numBuckets-row bucket table — no semi joins, no extra corpus passes.
    * Exactly three corpus-sized stages: the feature aggregate, the bucket
    * aggregate (map-combined to ≤ partitions × numBuckets rows), and the
    * score aggregate. Same arithmetic as [[importanceWeights]] +
    * [[scoreDocuments]] (a null predicate counts as non-target, matching
    * SQL filter semantics). Output: (idCol, score_micro).
    *
    * For a genuinely SEPARATE target corpus (the classic Wikipedia-vs-crawl
    * setup), compose the building blocks instead: [[hashedFeatures]] on
    * each corpus, [[importanceWeights]], [[scoreDocuments]]. */
  def scoreAll(docs: DataFrame, targetPred: Column, numBuckets: Int,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val toks = docs.select(col(idCol), targetPred.as("__t"),
      tokens(col(textCol)).as("toks"))
    val bi = transform(
      sequence(lit(1), size(col("toks")) - lit(1)),
      i => concat(element_at(col("toks"), i), lit(" "),
        element_at(col("toks"), i + lit(1))))
    val feats = concat(
      col("toks"),
      when(size(col("toks")) >= 2, bi).otherwise(array()))
    val perDoc = graft.core.CacheScope.persist(
      toks.select(col(idCol), col("__t"), explode(feats).as("f"))
        .select(col(idCol), col("__t"),
          pmod(hash60(concat(lit("dsir:"), col("f"))), lit(numBuckets.toLong))
            .as("bucket"))
        .groupBy(col(idCol), col("__t"), col("bucket"))
        .agg(count(lit(1)).as("cnt")))
    val bucketStats = perDoc.groupBy("bucket").agg(
      sum("cnt").as("c_r"),
      sum(when(col("__t"), col("cnt")).otherwise(lit(0L))).as("c_t"))
    val tot = bucketStats.agg(sum("c_r").as("n_r"), sum("c_t").as("n_t"))
    val w = bucketStats.crossJoin(broadcast(tot))
      .select(col("bucket"),
        round(log(
          (col("c_t") + lit(1)).cast("double") * (col("n_r") + lit(numBuckets)) /
            ((col("c_r") + lit(1)).cast("double") * (col("n_t") + lit(numBuckets)))
        ) * lit(1e6), 0).cast("long").as("w_micro"))
    perDoc.join(broadcast(w), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt") * col("w_micro")).as("score_micro"))
  }

  /** The [[scoreAll]] weight table alone, from ONE bucket-keyed corpus
    * aggregate (round 18, guide §2.3/§2.4): when scoring happens
    * row-locally ([[scoreRowLocal]]), nothing downstream needs the
    * per-document feature counts — only the per-bucket totals — so the
    * corpus-sized (doc, bucket) exchange scoreAll pays disappears: the
    * feature explode map-combines straight to ≤ numBuckets rows before
    * its single tiny exchange. Arithmetic is byte-identical to
    * [[scoreAll]]'s: c_r/c_t are occurrence totals per bucket (grouping
    * occurrences directly ≡ summing scoreAll's per-doc counts), n_r/n_t
    * their sums, and the w_micro expression is the same double chain. A
    * null target predicate counts as non-target, matching scoreAll.
    * Output: (bucket, w_micro), one row per bucket observed in `docs`. */
  def weightTable(docs: DataFrame, targetPred: Column, numBuckets: Int,
                  textCol: String = "text"): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val toks = docs.select(targetPred.as("__t"),
      tokens(col(textCol)).as("toks"))
    val bi = transform(
      sequence(lit(1), size(col("toks")) - lit(1)),
      i => concat(element_at(col("toks"), i), lit(" "),
        element_at(col("toks"), i + lit(1))))
    val feats = concat(
      col("toks"),
      when(size(col("toks")) >= 2, bi).otherwise(array()))
    val bucketStats = toks.select(col("__t"), explode(feats).as("f"))
      .select(col("__t"),
        pmod(hash60(concat(lit("dsir:"), col("f"))), lit(numBuckets.toLong))
          .as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("c_r"),
        sum(when(col("__t"), lit(1L)).otherwise(lit(0L))).as("c_t"))
    val tot = bucketStats.agg(sum("c_r").as("n_r"), sum("c_t").as("n_t"))
    bucketStats.crossJoin(broadcast(tot))
      .select(col("bucket"),
        round(log(
          (col("c_t") + lit(1)).cast("double") * (col("n_r") + lit(numBuckets)) /
            ((col("c_r") + lit(1)).cast("double") * (col("n_t") + lit(numBuckets)))
        ) * lit(1e6), 0).cast("long").as("w_micro"))
  }

  /** End-to-end selection: target = `docs` rows matching `targetPred`; raw
    * = all of `docs`. Returns the top-k most target-like documents as
    * (idCol, score_micro, score) ordered (score desc, id asc) — a
    * TakeOrdered, not a global sort. */
  def selectTop(docs: DataFrame, targetPred: Column, numBuckets: Int, k: Int,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val scored = scoreAll(docs, targetPred, numBuckets, idCol, textCol)
    val top = scored.orderBy(desc("score_micro"), col(idCol).asc).limit(k)
    top.select(col(idCol), col("score_micro"),
      round(col("score_micro") / lit(1e6), 6).as("score"))
  }

  /** The RESAMPLING half of DSIR: keep each scored document with
    * probability `p = exp((score - maxScore) / temperature)` (shifted by
    * the corpus max so p ≤ 1; temperature in nats widens/narrows the
    * band), decided by a DETERMINISTIC hash-uniform — no RNG state, so
    * membership is stable under reprocessing and exactly replayable by
    * the oracle, the same contract as [[Sampling]].
    *
    * Integer decision grid: `p_micro = round(p * 1e6)` vs
    * `u_micro = hash60(id ++ salt) mod 1e6` — the comparison happens on
    * exact longs, keeping the one engine-sensitive operation (`exp`) a
    * single rounded scalar per row. maxScore arrives via a one-row
    * broadcast crossJoin (scalar-compose pattern); everything else is
    * row-local — no shuffle at any corpus size.
    *
    * Output: the kept rows of `scored` plus (p_micro, u_micro).
    */
  def importanceResample(scored: DataFrame, temperature: Double = 1.0,
                         salt: String = "dsir", idCol: String = "doc_id",
                         scoreCol: String = "score_micro"): DataFrame = {
    require(temperature > 0, s"temperature must be positive, got $temperature")
    val mx = scored.agg(max(col(scoreCol)).as("__max_micro"))
    scored.crossJoin(broadcast(mx))
      .withColumn("p_micro",
        round(exp((col(scoreCol) - col("__max_micro")).cast("double") /
          lit(1e6 * temperature)) * lit(1e6), 0).cast("long"))
      .withColumn("u_micro",
        pmod(hash60(concat(col(idCol).cast("string"), lit(":resample:" + salt))),
          lit(1000000L)))
      .filter(col("u_micro") < col("p_micro"))
      .drop("__max_micro")
  }
}
