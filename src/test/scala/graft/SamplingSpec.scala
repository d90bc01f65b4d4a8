package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("splits partition every row, deterministically, near the weights") {
    val s = Sampling.assignSplits(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).cache()
    val n = docs.count()
    val byName = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.values.sum == n) // total partition, no loss/dup
    assert(byName("train").toDouble / n > 0.7 && byName("train").toDouble / n < 0.9)
    // rerun = identical membership (hash-deterministic, no RNG)
    val again = Sampling.assignSplits(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(s.select("doc_id", "split").except(
      again.select("doc_id", "split")).count() == 0)
  }

  test("unnormalized weights behave like their normalized form") {
    val a = Sampling.assignSplits(docs, "doc_id", Seq("x" -> 8.0, "y" -> 2.0))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Sampling.assignSplits(docs, "doc_id", Seq("x" -> 0.8, "y" -> 0.2))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("stratified sampling downsamples only the named strata") {
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.5), defaultRate = 1.0).cache()
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // non-named strata untouched
    full.keys.filter(_ != "en").foreach(l => assert(kept(l) == full(l)))
    // named stratum roughly halved
    val ratio = kept("en").toDouble / full("en")
    assert(ratio > 0.3 && ratio < 0.7, s"en keep ratio $ratio")
    // rate 0 removes, rate 1 keeps everything
    assert(Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.0)).filter($"lang" === "en").count() == 0)
    assert(Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map.empty, defaultRate = 1.0).count() == docs.count())
  }

  test("mix solver: sample composition approaches the target mix") {
    val targets = Map("en" -> 0.6, "de" -> 0.3, "fr" -> 0.1)
    val rates = Sampling.mixRates(docs, "lang", targets)
    assert(rates.values.forall(r => r > 0 && r <= 1.0))
    assert(rates.values.exists(_ == 1.0)) // the binding stratum keeps all
    val mixed = Sampling.mixSample(docs, "doc_id", "lang", targets).cache()
    val got = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == targets.keySet) // untargeted strata dropped
    val total = got.values.sum.toDouble
    targets.foreach { case (lang, w) =>
      val frac = got(lang) / total
      assert(math.abs(frac - w) < 0.1, s"$lang frac=$frac target=$w")
    }
    // infeasible mix (stratum absent) fails fast, not silently
    intercept[IllegalArgumentException] {
      Sampling.mixRates(docs, "lang", Map("xx" -> 1.0))
    }
  }

  test("temperature sampling: scarcest stratum whole, big strata at sqrt rate") {
    val rows = (1 to 160).map(i => (i.toLong, "big")) ++
      (161 to 170).map(i => (i.toLong, "small")) ++
      Seq((171L, null.asInstanceOf[String]))
    val df = rows.toDF("doc_id", "lang")
    val kept = graft.operators.Sampling
      .temperatureSample(df, "doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // the scarcest stratum binds: all 10 "small" rows survive
    assert(kept.count(_._2 == "small") == 10)
    // big stratum downsampled to ~sqrt(10/160) = 25% — hash granularity
    // keeps it loose, but it must be a strict subset and non-empty
    val nBig = kept.count(_._2 == "big")
    assert(nBig > 0 && nBig < 160)
    // null stratum has no stable rate: dropped
    assert(!kept.exists(_._2 == null))
    // deterministic across runs
    val again = graft.operators.Sampling
      .temperatureSample(df.repartition(13), "doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(again.sortBy(_._1).toSeq == kept.sortBy(_._1).toSeq)
  }

  test("null ids: explicit null split, dropped from samples — never binned") {
    val withNulls = Seq(
      (Some("a"), "en"), (Some("b"), "en"), (None, "en"), (None, "de"))
      .toDF("doc_id", "lang")
    val splits = Sampling.assignSplits(withNulls, "doc_id",
      Seq("train" -> 0.9, "test" -> 0.1))
    // a null id must surface as split NULL, not silently land in "test"
    assert(splits.filter($"doc_id".isNull).collect()
      .forall(_.isNullAt(splits.columns.indexOf("split"))))
    assert(splits.filter($"doc_id".isNotNull && $"split".isNull).count() == 0)
    // stratifiedSample drops unkeyed rows even at rate 1.0 (documented)
    val kept = Sampling.stratifiedSample(withNulls, "doc_id", "lang",
      Map.empty, defaultRate = 1.0)
    assert(kept.count() == 2 && kept.filter($"doc_id".isNull).count() == 0)
  }

  test("ppsSample: probability proportional to weight, heavy rows always kept") {
    // 2000 unit-weight rows + 5 rows heavier than the step
    val light = (0 until 2000).map(i => (i.toLong, 10L))
    val heavy = (10000 until 10005).map(i => (i.toLong, 1000L))
    val df = (light ++ heavy).toDF("doc_id", "w")
    val sel = Sampling.ppsSample(df, "doc_id", "w", step = 500, nBuckets = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // w >= step rows are ALWAYS selected (their interval spans a point)
    (10000 until 10005).foreach(i => assert(sel.contains(i.toLong), s"heavy $i"))
    // expected light selections = 2000*10/500 = 40; allow generous slack
    val nLight = sel.count(_._1 < 10000)
    assert(nLight >= 15 && nLight <= 80, s"implausible light-row count $nLight")
    // deterministic: identical membership on a rerun
    val again = Sampling.ppsSample(df, "doc_id", "w", step = 500, nBuckets = 8)
      .collect().map(r => r.getLong(0)).toSet
    assert(again == sel.keySet)
  }

  test("ppsSample: duplicate ids select a deterministic multiset across partitionings") {
    // same id, different weights: the (id, weight) window tiebreaker makes
    // the selected multiset independent of physical row order (ADVICE r5)
    val rows = (0 until 500).flatMap(i => Seq((i.toLong, 7L), (i.toLong, 13L)))
    val df = rows.toDF("doc_id", "w")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.ppsSample(d, "doc_id", "w", step = 97, nBuckets = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(identity).view.mapValues(_.length).toMap
    val a = run(df.repartition(3))
    val b = run(df.orderBy($"w".desc, $"doc_id".desc).repartition(11))
    assert(a == b, "selection multiset changed with physical row order")
    assert(a.nonEmpty)
  }

  test("ppsSample: zero/null weights never selected, null ids dropped") {
    val df = Seq((Some(1L), Some(0L)), (Some(2L), None), (None, Some(100L)),
      (Some(3L), Some(1000L))).toDF("doc_id", "w")
    val sel = Sampling.ppsSample(df, "doc_id", "w", step = 100, nBuckets = 4)
      .collect().map(_.getLong(0)).toSet
    assert(sel == Set(3L))
  }

  test("uniformK: exact k, deterministic, prefix-stable in k, null ids dropped") {
    val k20 = Sampling.uniformK(docs, "doc_id", 20).collect().map(_.getLong(0))
    val k40 = Sampling.uniformK(docs, "doc_id", 40).collect().map(_.getLong(0))
    assert(k20.length == 20 && k40.length == 40)
    // reservoir/prefix property: the 20-sample IS the first 20 of the 40-sample
    assert(k20.toSeq == k40.take(20).toSeq)
    // rerun identical
    assert(Sampling.uniformK(docs, "doc_id", 20).collect()
      .map(_.getLong(0)).toSeq == k20.toSeq)
    val withNull = Seq(Option(1L), Option(2L), None).toDF("doc_id")
    assert(Sampling.uniformK(withNull, "doc_id", 10).count() == 2)
  }

  test("cluster-keyed splits: near-duplicates always land in ONE split") {
    // the leakage-safe pattern: split on the duplicate-CLUSTER label, not
    // the doc id, so a train/test cut can never separate two near-dups.
    // Build textual near-dups, resolve clusters, split on the label.
    import graft.operators.Dedup
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (0L until 40L).map { i =>
      val fam = i / 4 // 10 families of 4 near-identical docs
      (i, s"family $fam says $base variant ${i % 2}")
    }.toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(docs, k = 3, threshold = 0.5)
    val clusters = Dedup.duplicateClusters(pairs) // (id, cluster_id, size)
      .withColumnRenamed("id", "doc_id")
    val keyed = docs.join(clusters, Seq("doc_id"), "left")
      .withColumn("split_key",
        coalesce(col("cluster_id"), col("doc_id"))) // singletons: own key
    val split = Sampling.assignSplits(keyed, "split_key",
      Seq("train" -> 0.8, "test" -> 0.2))
    // every cluster is entirely inside one split
    val perCluster = split.filter(col("cluster_id").isNotNull)
      .groupBy("cluster_id").agg(countDistinct("split").as("nsplits"))
      .collect().map(_.getLong(1))
    assert(perCluster.nonEmpty && perCluster.forall(_ == 1L),
      s"clusters straddle splits: ${perCluster.toSeq}")
    graft.core.CacheScope.release()
  }

  test("weightedSampleK: heavy rows favored, zero/null weights excluded") {
    // 200 light rows (w=1) + 10 heavy rows (w=10000): a 10-sample should be
    // dominated by heavy rows (each heavy row's key ln(u)/1e4 is ~1e4 closer
    // to zero than any light row's)
    val rows = (0L until 200L).map((_, 1L)) ++ (1000L until 1010L).map((_, 10000L))
    val df = rows.toDF("doc_id", "w")
    val sel = Sampling.weightedSampleK(df, "doc_id", "w", k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(sel.count(_ >= 1000L) == 10, s"expected all heavy, got $sel")
    // zero/null weights and null ids can never appear
    val edge = Seq((Some(1L), Some(0L)), (Some(2L), None), (None, Some(5L)),
      (Some(3L), Some(5L)), (Some(4L), Some(5L))).toDF("doc_id", "w")
    val picked = Sampling.weightedSampleK(edge, "doc_id", "w", k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(picked == Set(3L, 4L))
    // determinism across physical orderings
    val a = Sampling.weightedSampleK(df.repartition(7), "doc_id", "w", k = 25)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedSampleK(df.orderBy($"doc_id".desc), "doc_id", "w",
      k = 25).collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("weightedSampleK: fractional weights round half-up, never truncate") {
    // w=0.7 rounds to 1 (selectable); w=0.4 rounds to 0 (dropped). The old
    // long-cast TRUNCATED both to 0 and silently excluded w=0.7 rows.
    val df = Seq((1L, 0.7), (2L, 0.4), (3L, 0.7)).toDF("doc_id", "w")
    val sel = Sampling.weightedSampleK(df, "doc_id", "w", k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(sel == Set(1L, 3L), s"expected rounded-weight rows, got $sel")
  }

  test("weightedSampleK: large weights keep distinct keys (nano grid)") {
    // at w ~ 1e6 the old MICRO key grid collapsed to ~14 distinct values
    // and the id tie-break, not the weights, decided the sample; the nano
    // grid must keep the keys distinct enough that two disjoint-id runs
    // over identical weights select by key, not id order
    val heavy = (0L until 500L).map(i => (i, 1000000L + i)).toDF("doc_id", "w")
    val keys = heavy
      .withColumn("u", (graft.functions.TextFunctions.hash60(
        concat($"doc_id".cast("string"), lit(":es"))) % 1000000 + lit(0.5)) / 1e6)
      .withColumn("k", round(log($"u") * 1e9 / $"w".cast("double"), 0).cast("long"))
      .select("k").collect().map(_.getLong(0))
    assert(keys.distinct.length > 400,
      s"nano keys collapsed: ${keys.distinct.length} distinct of ${keys.length}")
  }

  test("uniformK: full-hash ordering is unbiased toward low ids") {
    // 100k sequential ids, k=1000: under the old hash60 % 1e6 ordering a
    // collision's id tie-break favors low ids; with the full 60-bit hash
    // the sample mean of the selected ids must sit near the population
    // mean (binomial bound: +/- ~3 sigma ~ 2700 at n=1000)
    val ids = spark.range(0L, 100000L).toDF("doc_id")
    val sel = Sampling.uniformK(ids, "doc_id", 1000)
      .collect().map(_.getLong(0))
    val mean = sel.sum.toDouble / sel.length
    assert(math.abs(mean - 50000.0) < 3000.0, s"biased sample mean $mean")
  }
}
