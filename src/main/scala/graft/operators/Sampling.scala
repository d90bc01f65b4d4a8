package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deterministic sampling and splitting for training-data pipelines.
  *
  * Everything here derives from the engine-stable `hash60` of the document
  * id (+ a salt), NOT from RNG state: the same row lands in the same
  * split/sample on every run, machine, and engine — the property that makes
  * train/val/test splits leakage-safe under reprocessing, and lets the
  * DuckDB oracle replay the exact membership. Pure row-local projections or
  * filters: no shuffle, no sort, no driver state at any corpus size.
  */
object Sampling {

  /** Hash bucket in [0, buckets) for an id column + salt. */
  def hashBucket(id: Column, salt: String, buckets: Int): Column =
    hash60(concat(id.cast("string"), lit(":" + salt))) % buckets

  /** Train/val/test (or any weighted) split assignment: a `split` column
    * from cumulative weight boundaries over a 10000-bucket hash space.
    * Weights need not sum to 1 — they are normalized.
    *
    * Null-id contract: a null id has no stable hash, so its `split` is NULL
    * — explicitly, never silently the last split (every `bucket < bound`
    * comparison on a null bucket is null, which used to fall through to the
    * `otherwise` branch). Callers wanting to fail instead can assert
    * `split IS NOT NULL`; silently mis-binning unkeyed rows is the one
    * behavior a leakage-safe splitter must not have. */
  def assignSplits(df: DataFrame, idCol: String,
                   weights: Seq[(String, Double)],
                   salt: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val total = weights.map(_._2).sum
    val bounds = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .tail.map(b => math.round(b * 10000).toInt)
    val bucket = hashBucket(col(idCol), salt, 10000)
    val expr = weights.zip(bounds).reverse.tail.foldLeft(
      lit(weights.last._1): Column) {
      case (acc, ((name, _), bound)) =>
        when(bucket < bound, lit(name)).otherwise(acc)
    }
    df.withColumn("split",
      when(col(idCol).isNull, lit(null).cast("string")).otherwise(expr))
  }

  /** Training-mix solver: per-stratum keep-rates that hit a TARGET
    * composition (e.g. 60% en / 30% de / 10% fr) at the largest total the
    * data allows. The feasible total is `T = min_s(n_s / target_s)` over
    * the targeted strata (the scarcest stratum binds); each stratum then
    * keeps `target_s * T / n_s` of its rows. Counts are one bounded
    * aggregate (|strata| rows to the driver); rates are exact driver
    * doubles. Strata not in `targets` are dropped (rate 0). */
  def mixRates(df: DataFrame, strataCol: String,
               targets: Map[String, Double]): Map[String, Double] = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "targets must be positive")
    val counts = df.filter(col(strataCol).isInCollection(targets.keys.toSeq))
      .groupBy(strataCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    targets.keys.foreach(s => require(counts.getOrElse(s, 0L) > 0L,
      s"stratum '$s' has no rows — target mix infeasible"))
    val t = targets.map { case (s, w) => counts(s) / w }.min
    targets.map { case (s, w) => s -> math.min(1.0, w * t / counts(s)) }
  }

  /** Sqrt-temperature mixture sampling (temperature alpha = 0.5 — the
    * multilingual-pretraining standard, Lample & Conneau 2019 §3.1):
    * deterministic per-stratum downsampling to a composition proportional
    * to count^alpha. The scarcest stratum binds (keep rate 1.0); every
    * other stratum keeps rate (n_min/n_s)^(1-alpha) = sqrt(n_min/n_s).
    * Alpha is FIXED at 0.5 on purpose: IEEE sqrt is correctly rounded in
    * every engine, a general pow is not — so the rates, and therefore
    * per-row membership, are bit-identical cross-engine (`t_temperature`
    * re-derives them in SQL). Null strata are dropped (no stable rate).
    *
    * Scale shape: one strata-count collect (stratum-cardinality geometry)
    * + the [[stratifiedSample]] row-local hash filter — zero extra
    * shuffles over the data. */
  def temperatureSample(df: DataFrame, idCol: String, strataCol: String,
                        salt: String = "temp"): DataFrame = {
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(strataCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    if (counts.isEmpty) return df.limit(0)
    val nMin = counts.map(_._2).min
    val rates = counts.map { case (st, n) =>
      st -> math.sqrt(nMin.toDouble / n) }.toMap
    stratifiedSample(df, idCol, strataCol, rates, defaultRate = 0.0, salt)
  }

  /** [[mixRates]] + [[stratifiedSample]] in one call: deterministic sample
    * whose stratum composition matches `targets` (to hash-bucket
    * granularity) at the maximum feasible size. */
  def mixSample(df: DataFrame, idCol: String, strataCol: String,
                targets: Map[String, Double],
                salt: String = "sample"): DataFrame =
    stratifiedSample(df, idCol, strataCol,
      mixRates(df, strataCol, targets), defaultRate = 0.0, salt = salt)

  /** Per-stratum deterministic sampling: keep a row iff its hash bucket
    * falls under the stratum's rate (rate 1.0 keeps everything; strata not
    * in `rates` use `defaultRate`). The standard training-mix knob —
    * "downsample lang X to 10%" — as one row-local filter.
    *
    * Null-id contract: a null id has no stable hash bucket, so the row is
    * DROPPED regardless of rate (a null bucket fails every comparison).
    * This is deliberate and documented — membership of an unkeyed row could
    * never be reproduced across runs, which defeats the point of
    * deterministic sampling. Pre-filter or synthesize ids to keep them. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Double], defaultRate: Double = 1.0,
                       salt: String = "sample"): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val bucket = hashBucket(col(idCol), salt, 10000)
    val rateExpr = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate): Column) {
      case (acc, (stratum, r)) =>
        when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(bucket < round(rateExpr * 10000, 0).cast("long"))
  }

  /** Weighted (probability-proportional-to-size) sampling, deterministic
    * and all-integer: classic SYSTEMATIC PPS — lay every row's integer
    * weight end to end on a line, drop a sampling point every `step` units,
    * keep the rows whose interval contains a point. Selection probability
    * is w/step (rows with w >= step are always kept — the PPS contract for
    * oversize units); expected sample mass is total_w/step.
    *
    * Scale shape: ONE global line would need a global running sum (a
    * single-partition window — the non-scalable shape), so rows are first
    * hash-bucketed by id into `nBuckets` independent lines, each with its
    * own hash-derived point offset — statistically identical (each bucket
    * is an unbiased PPS sample of its own mass) and the running sum becomes
    * a hash-partitioned window, the [[graft.operators.TextOps.packSequences]]
    * pattern. All arithmetic is positive-integer (hash offsets, truncating
    * division identical to floor), so membership is engine-exact and
    * SQL-replayable — no u^(1/w) float keys, whose libm `ln`/`pow` differ
    * across engines.
    *
    * Null-id rows are dropped, like [[stratifiedSample]] (no stable hash =
    * no reproducible membership); null/negative weights are treated as 0
    * (never selected, occupy no line).
    *
    * Determinism contract: the per-bucket line orders rows by (id, weight).
    * With ids unique the selection is fully deterministic; with duplicate
    * ids the weight tiebreaker still makes the selected MULTISET of
    * (id, weight) rows deterministic (rows tied on both columns are
    * indistinguishable, so whichever of them takes a sampling point yields
    * the same output rows). Extra payload columns on rows tied on
    * (id, weight) are the one remaining ambiguity — give such rows
    * distinct ids if that matters. */
  def ppsSample(df: DataFrame, idCol: String, weightCol: String, step: Long,
                nBuckets: Int = 32, salt: String = "pps"): DataFrame = {
    require(step >= 1 && nBuckets >= 1, "need step >= 1 and nBuckets >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__bucket").orderBy(col(idCol), col("__w"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wt = greatest(coalesce(col(weightCol).cast("long"), lit(0L)), lit(0L))
    val off = hash60(concat(lit(salt + ":off:"), col("__bucket").cast("string"))) % step
    // interval [cum, cum+w) contains a point  <=>  floor((B-1)/step) >
    // floor((A-1)/step) with A = cum + step - off (>= 1, so truncating DIV
    // == floor in every engine), B = A + w.
    df.filter(col(idCol).isNotNull)
      .withColumn("__bucket", hashBucket(col(idCol), salt, nBuckets))
      .withColumn("__w", wt)
      .withColumn("__cum", coalesce(sum(col("__w")).over(w), lit(0L)))
      .withColumn("__a", col("__cum") + lit(step) - off)
      .filter(expr(s"(__a + __w - 1) DIV ${step}L > (__a - 1) DIV ${step}L"))
      .drop("__bucket", "__w", "__cum", "__a")
  }

  /** Deterministic uniform k-sample: the k rows whose salted id hash is
    * smallest — the hash-based analog of a reservoir sample, with the
    * reservoir property (any k' < k prefix of the ordering is the k'-sample,
    * so growing/shrinking k never reshuffles membership). All-integer
    * ordering over the FULL 60-bit hash (id as total tie-break) — a
    * bucketed hash (e.g. mod 1e6) would collide heavily past ~1e6 rows and
    * the tie-break would then bias the "uniform" sample toward low ids;
    * at 2^60 the collision term is negligible at any corpus size.
    * Executed as a TakeOrdered top-k — no global sort, no RNG state,
    * exact SQL replay.
    *
    * Null-id rows are dropped ([[stratifiedSample]] contract). */
  def uniformK(df: DataFrame, idCol: String, k: Int,
               salt: String = "uniform"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.filter(col(idCol).isNotNull)
      .withColumn("__h", hash60(concat(col(idCol).cast("string"), lit(":" + salt))))
      .orderBy(col("__h"), col(idCol))
      .limit(k)
      .drop("__h")
  }

  /** Weighted k-sample WITHOUT replacement (Efraimidis–Spirakis 2006): each
    * row draws key = ln(u) / w with a hash-deterministic uniform
    * u ∈ (0,1); the k LARGEST keys are the sample. Inclusion probability is
    * proportional-to-size without replacement — the classic one-pass
    * distributed weighted sampler (the u^(1/w) max-key form, taken in log
    * space so big weights don't collapse into 1.0 ulp territory).
    *
    * Determinism: u = (hash60(id ++ salt) mod 1e6 + 0.5) / 1e6 — exact
    * integer hash, then ONE libm call per row rounded onto an integer
    * NANO-key grid (`key_nano = round(ln(u) * 1e9 / w)`), with id as total
    * tie-break. Nano, not micro: |ln(u)| <= ~13.8, so a micro grid
    * degenerates to a handful of distinct keys once weights reach ~1e6
    * (every row ties, and the id tie-break — not the weights — decides
    * the sample); the nano grid keeps ~13.8e9/w distinct key values, so
    * ties stay rare up to ~1e9-scale weights. Executed as TakeOrdered
    * top-k: no global sort.
    *
    * WEIGHT CONTRACT: weights are INTEGER multiplicities. A fractional
    * weight column is rounded half-up (never silently truncated), so
    * w = 0.7 participates as 1 and w = 0.4 rounds to 0 and is dropped
    * with the null/zero/negative rows (PPS semantics: non-positive
    * rounded weight = zero inclusion mass). Callers with genuinely
    * fractional weights should pre-scale them to integers (e.g. x1000)
    * to keep their ratios. Null-id rows are dropped. */
  def weightedSampleK(df: DataFrame, idCol: String, weightCol: String, k: Int,
                      salt: String = "es"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (hashBucket(col(idCol), salt, 1000000).cast("double") + lit(0.5)) /
      lit(1e6)
    val wInt = round(col(weightCol).cast("double"), 0).cast("long")
    df.filter(col(idCol).isNotNull)
      .filter(coalesce(wInt, lit(0L)) > 0)
      .withColumn("__key_nano",
        round(log(u) * lit(1e9) / wInt.cast("double"), 0).cast("long"))
      .orderBy(desc("__key_nano"), col(idCol))
      .limit(k)
      .drop("__key_nano")
  }
}
