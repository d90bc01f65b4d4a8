package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val items = Seq(
    ("the", 100L), ("cat", 40L), ("sat", 25L), ("mat", 10L), ("on", 60L))
    .toDF("token", "n")

  test("estimates never under-count; wide sketch is exact") {
    val cms = Sketches.cmsBuild(items, "token", "n", depth = 3, width = 4096)
    val est = Sketches.cmsEstimate(cms, items, "token", depth = 3, width = 4096)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    est.foreach { case (_, (exact, e)) => assert(e >= exact) }
    // 5 keys in 3x4096 cells: collisions essentially impossible -> exact
    assert(est.forall { case (_, (exact, e)) => e == exact })
  }

  test("narrow sketch over-counts on collisions but stays an upper bound") {
    val cms = Sketches.cmsBuild(items, "token", "n", depth = 2, width = 2)
    val est = Sketches.cmsEstimate(cms, items, "token", depth = 2, width = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 5 keys in 2 buckets per row must collide: total mass conserved per row
    est.foreach { case (_, (exact, e)) => assert(e >= exact && e <= 235L) }
    assert(est.exists { case (_, (exact, e)) => e > exact })
  }

  test("absent key with empty cells estimates 0 (left-join path)") {
    val one = Seq(("solo", 7L)).toDF("token", "n")
    val cms = Sketches.cmsBuild(one, "token", "n", depth = 3, width = 4096)
    val probe = Seq(Tuple1("missing")).toDF("token")
    val est = Sketches.cmsEstimate(cms, probe, "token", depth = 3, width = 4096)
      .collect()
    assert(est.length == 1 && est(0).getLong(1) == 0L)
  }

  test("merged shard sketches are cell-identical to the whole-corpus sketch") {
    val a = items.filter($"token" < "o")
    val b = items.filter($"token" >= "o")
    val merged = Sketches.merge(Seq(
      Sketches.cmsBuild(a, "token", "n", depth = 3, width = 64),
      Sketches.cmsBuild(b, "token", "n", depth = 3, width = 64)))
    val whole = Sketches.cmsBuild(items, "token", "n", depth = 3, width = 64)
    val m = merged.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w = whole.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m == w)
  }

  // ------------------------------------------------------------------ bloom

  private lazy val keys100 = (0 until 100).map(i => Tuple1(s"key$i")).toDF("k")

  test("bloom has no false negatives and a sane false-positive rate") {
    val bloom = Sketches.bloomBuild(keys100, "k", numBits = 4096, numHashes = 5)
    val probes = (0 until 300).map(i => Tuple1(s"key$i")).toDF("k")
    val res = Sketches.bloomMightContain(bloom, probes, "k", 4096, 5)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    (0 until 100).foreach(i => assert(res(s"key$i"), s"false negative key$i"))
    // 100 keys * 5 hashes in 4096 bits -> fp rate ~ (1-e^-0.122)^5 ~ 2e-5;
    // 200 absent probes should essentially all read false.
    val fps = (100 until 300).count(i => res(s"key$i"))
    assert(fps <= 2, s"implausible false-positive count $fps")
  }

  test("duplicate probe rows keep the no-false-negative contract") {
    // a duplicated member row used to accumulate 2*numHashes hits and read
    // FALSE under the old sum(hit) == numHashes formulation (ADVICE r5)
    val bloom = Sketches.bloomBuild(keys100, "k", 1024, 3)
    val dupProbes = Seq("key1", "key1", "key1", "absent", "absent").map(Tuple1(_)).toDF("k")
    val res = Sketches.bloomMightContain(bloom, dupProbes, "k", 1024, 3)
      .collect().map(r => r.getString(0) -> r.getBoolean(1))
    assert(res.length == 2) // duplicates collapse to one row per distinct probe
    val m = res.toMap
    assert(m("key1"), "false negative on duplicated member probe")
    assert(!m("absent"))
  }

  test("merged shard blooms are word-identical to the whole-set bloom") {
    val a = keys100.filter($"k" < "key5")
    val b = keys100.filter($"k" >= "key5")
    val merged = Sketches.bloomMerge(Seq(
      Sketches.bloomBuild(a, "k", 1024, 3), Sketches.bloomBuild(b, "k", 1024, 3)))
    val whole = Sketches.bloomBuild(keys100, "k", 1024, 3)
    val m = merged.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = whole.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == w)
  }

  test("bloom null keys contribute no bits and probe as not-contained") {
    val withNull = Seq(Some("a"), None, Some("b")).map(Tuple1(_)).toDF("k")
    val bloom = Sketches.bloomBuild(withNull, "k", 1024, 3)
    val clean = Sketches.bloomBuild(Seq("a", "b").map(Tuple1(_)).toDF("k"), "k", 1024, 3)
    assert(bloom.collect().toSet == clean.collect().toSet)
    val probed = Sketches.bloomMightContain(bloom, withNull, "k", 1024, 3)
      .collect().map(r => Option(r.getString(0)) -> r.getBoolean(1)).toMap
    assert(probed(Some("a")) && probed(Some("b")) && !probed(None))
  }

  test("bloomPrune keeps row multiplicity and schema; join result identical") {
    val bloom = Sketches.bloomBuild(keys100, "k", 4096, 5)
    // 3 copies of a member + absent keys, extra payload column
    val probes = (Seq("key1", "key1", "key1") ++ (100 until 200).map(i => s"key$i"))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "payload")
    val pruned = Sketches.bloomPrune(bloom, probes, "k", 4096, 5)
    assert(pruned.columns.toSeq == Seq("k", "payload"))
    val kept = pruned.collect()
    // all 3 duplicate member rows survive (no false negatives, no collapse)
    assert(kept.count(_.getString(0) == "key1") == 3)
    // composed with the exact join, pruning never changes the result
    val members = keys100.withColumnRenamed("k", "m")
    val plain = probes.join(members, $"k" === $"m").collect().toSeq
    val viaBloom = pruned.join(members, $"k" === $"m").collect().toSeq
    assert(plain.sortBy(_.toString) == viaBloom.sortBy(_.toString))
  }

  test("bloomPrune with an empty filter passes nothing") {
    val none = Sketches.bloomBuild(
      Seq.empty[Tuple1[String]].toDF("k"), "k", 1024, 3)
    val probes = Seq("a", "b").map(Tuple1(_)).toDF("k")
    assert(Sketches.bloomPrune(none, probes, "k", 1024, 3).count() == 0)
  }

  test("bloomPrune null keys never pass") {
    val bloom = Sketches.bloomBuild(keys100, "k", 1024, 3)
    val probes = Seq(Some("key1"), None, Some("key2")).map(Tuple1(_)).toDF("k")
    val kept = Sketches.bloomPrune(bloom, probes, "k", 1024, 3).collect()
    assert(kept.map(_.getString(0)).toSet == Set("key1", "key2"))
  }

  // -------------------------------------------------------------------- hll

  test("hll registers merge across shards; estimate tracks exact distinct") {
    val keys = (0 until 5000).map(i => Tuple1(s"u$i")).toDF("k")
    val a = keys.filter($"k" < "u3")
    val b = keys.filter($"k" >= "u3")
    val merged = Sketches.hllRegisters(a, "k", p = 8)
      .unionByName(Sketches.hllRegisters(b, "k", p = 8))
      .groupBy("register").agg(org.apache.spark.sql.functions.max("r").as("r"))
    val whole = Sketches.hllRegisters(keys, "k", p = 8)
    assert(merged.collect().toSet == whole.collect().toSet)
    val est = Sketches.hllEstimate(whole, p = 8)
      .select("est_distinct").head().getDouble(0)
    // p=8 raw estimator: sigma ~ 1.04/sqrt(256) = 6.5%; allow 4 sigma.
    assert(math.abs(est - 5000) / 5000 < 0.26, s"estimate $est too far from 5000")
  }

  test("hll duplicate keys do not move the estimate") {
    val once = (0 until 1000).map(i => Tuple1(s"u$i")).toDF("k")
    val thrice = ((0 until 1000) ++ (0 until 1000) ++ (0 until 1000))
      .map(i => Tuple1(s"u$i")).toDF("k")
    val e1 = Sketches.hllEstimate(Sketches.hllRegisters(once, "k", 8), 8).collect()
    val e3 = Sketches.hllEstimate(Sketches.hllRegisters(thrice, "k", 8), 8).collect()
    assert(e1.toSeq == e3.toSeq)
  }

  test("hll intersection estimates overlap from sketches alone") {
    val a = (0 until 2000).map(i => Tuple1(s"u$i")).toDF("k")
    val b = (1000 until 3000).map(i => Tuple1(s"u$i")).toDF("k") // 1000 shared
    val ra = Sketches.hllRegisters(a, "k", p = 8)
    val rb = Sketches.hllRegisters(b, "k", p = 8)
    // union merge is EXACT sketch algebra: == sketch of concatenated input
    val merged = Sketches.hllMerge(Seq(ra, rb))
    val whole = Sketches.hllRegisters(a.unionByName(b), "k", p = 8)
    assert(merged.collect().toSet == whole.collect().toSet)
    val row = Sketches.hllIntersect(ra, rb, p = 8).head()
    val inter = row.getDouble(3)
    // true overlap 1000; three raw estimates each carry ~6.5% sigma
    assert(inter > 400 && inter < 1600, s"implausible overlap estimate $inter")
  }

  test("grouped hll: each group's registers equal an independent global sketch") {
    val ab = ((0 until 800).map(i => ("a", s"u$i")) ++
      (0 until 50).map(i => ("b", s"v$i"))).toDF("g", "k")
    val grouped = Sketches.hllRegistersBy(ab, Seq("g"), "k", p = 6)
    val aOnly = Sketches.hllRegisters(ab.filter($"g" === "a"), "k", p = 6)
    val bOnly = Sketches.hllRegisters(ab.filter($"g" === "b"), "k", p = 6)
    assert(grouped.filter($"g" === "a").drop("g").collect().toSet ==
      aOnly.collect().toSet)
    assert(grouped.filter($"g" === "b").drop("g").collect().toSet ==
      bOnly.collect().toSet)
    val est = Sketches.hllEstimateBy(grouped, Seq("g"), p = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // raw estimator at p=6: sigma ~ 13%; just check the groups separate
    assert(est("a") > 4 * est("b"))
  }

  // -------------------------------------------------------------- histogram

  test("histogram merge equals whole-data histogram; quantiles are exact bin edges") {
    val vals = (1 to 1000).map(i => Tuple1(i.toDouble)).toDF("v")
    val a = vals.filter($"v" <= 500)
    val b = vals.filter($"v" > 500)
    val merged = Sketches.histogram(a, "v", 10000L)
      .unionByName(Sketches.histogram(b, "v", 10000L))
      .groupBy("bin", "lo_cents").agg(org.apache.spark.sql.functions.sum("n").as("n"))
    val whole = Sketches.histogram(vals, "v", 10000L)
    assert(merged.collect().toSet == whole.collect().toSet)
    // values 1..1000 dollars in $100 bins: bin k holds [100k, 100(k+1)),
    // so cum(bin 4) = 99 + 4*100 = 499 < 500 and p50 lands in bin 5;
    // p100.0 needs cum >= 1000, first reached at bin 10 (the lone v=1000).
    val qs = Sketches.histogramQuantiles(whole, Seq(500, 1000))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(qs(500) == 50000L)
    assert(qs(1000) == 100000L)
  }

  test("adaptive Bloom sizing holds the ~1% FP design point at two set " +
       "sizes (VERDICT r10 #2)") {
    import spark.implicits._
    // geometry first: 10 bits/key rounded to words, floored, capped
    assert(Sketches.adaptiveBloomBits(0) == 4096)
    assert(Sketches.adaptiveBloomBits(100) == 4096)
    assert(Sketches.adaptiveBloomBits(1000) == 10016) // ceil(10000/32)*32
    assert(Sketches.adaptiveBloomBits(20000) == 200000)
    assert(Sketches.adaptiveBloomBits(1L << 40) == (1 << 27)) // capped, loud
    // measured FP at the adaptive size, two sizes an order apart: build
    // over n keys, probe n DISJOINT keys, every hit is a false positive.
    // Expected (1 - e^{-1/2})^5 ~ 0.9%; assert under 2% (binomial noise).
    for (n <- Seq(1000, 20000)) {
      val bits = Sketches.adaptiveBloomBits(n.toLong)
      val keys = (0 until n).map(i => s"in_$i").toDF("k")
      val bloom = Sketches.bloomBuild(keys, "k", bits, 5)
      val probes = (0 until n).map(i => s"out_$i").toDF("k")
      val fp = Sketches
        .bloomPrune(bloom, probes, "k", bits, 5).count()
      assert(fp <= (0.02 * n).toLong,
        s"FP rate ${fp.toDouble / n} above the 2% bound at n=$n (bits=$bits)")
      // and the filter is not vacuous either: it prunes almost everything
      assert(fp < n / 2, s"Bloom at n=$n prunes nothing")
    }
  }

  test("bloomMightContain drops the broadcast hint past 2^24 bits: same " +
       "verdicts, no multi-GB filter broadcast") {
    import spark.implicits._
    val keys = (0 until 500).map(i => s"in_$i").toDF("k")
    val probes = (0 until 1000).map(i => s"in_$i").toDF("k")
    def verdicts(bits: Int) = {
      val bloom = Sketches.bloomBuild(keys, "k", bits, 5)
      val got = Sketches.bloomMightContain(bloom, probes, "k", bits, 5)
      (got, got.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap)
    }
    val (_, small) = verdicts(1 << 13)
    val (bigDf, big) = verdicts(1 << 25) // past the broadcast budget
    // both geometries: every build key answers true (no false negatives)
    for (m <- Seq(small, big); i <- 0 until 500)
      assert(m(s"in_$i"), s"false negative at in_$i")
    // the wide-geometry filter is sparse enough that non-members miss
    assert((500 until 1000).count(i => big(s"in_$i")) == 0)
    // and the big path really did avoid broadcasting the filter
    bigDf.count()
    val broadcasts = bigDf.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.exchange
            .BroadcastExchangeExec => b
    }
    assert(broadcasts.isEmpty,
      s"2^25-bit filter still broadcast:\n${bigDf.queryExecution.executedPlan}")
  }

  test("bloomShards splits only past the per-filter budget") {
    assert(Sketches.bloomShards(0) == 1)
    assert(Sketches.bloomShards(13_000_000L) == 1) // 130M bits < 2^27
    assert(Sketches.bloomShards(13_421_772L) == 1) // 134,217,720 <= 2^27
    assert(Sketches.bloomShards(13_421_773L) == 2) // 2 bits over the budget
    assert(Sketches.bloomShards(100_000_000L) == 8)
    assert(Sketches.bloomShards(10_000_000_000L) == 746) // the 10^10 story
    assert(Sketches.bloomShards(1000, bitsPerKey = 16, maxBits = 4096) == 4)
  }

  test("sharded bloom with 1 shard is the unsharded filter plus a zero " +
       "shard column; prune delegates bit-identically") {
    import spark.implicits._
    val keys = (0 until 500).map(i => s"k_$i").toDF("k")
    val flat = Sketches.bloomBuild(keys, "k", 4096, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sharded = Sketches.bloomBuildSharded(keys, "k", 1, 4096, 5)
    assert(sharded.collect().map(r =>
        (r.getAs[Int]("shard"), r.getAs[Long]("word")) -> r.getAs[Long]("bits"))
      .toMap == flat.map { case (w, b) => (0, w) -> b })
    val probes = (0 until 1000).map(i => s"k_$i").toDF("k")
    val a = Sketches.bloomPrune(
        Sketches.bloomBuild(keys, "k", 4096, 5), probes, "k", 4096, 5)
      .collect().map(_.getString(0)).sorted.toSeq
    val b = Sketches.bloomPruneSharded(sharded, probes, "k", 1, 4096, 5)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(a == b)
  }

  test("sharded bloom: no false negatives across shards; merge across " +
       "batches == whole-set filter; empty shards prune their probes") {
    import spark.implicits._
    val n = 20000
    val keys = (0 until n).map(i => s"in_$i").toDF("k")
    val shards = 7
    val bloom = Sketches.bloomBuildSharded(keys, "k", shards, 8192, 5)
    // every shard under its budget
    val perShard = bloom.groupBy("shard").count().collect()
      .map(r => r.getAs[Int]("shard") -> r.getAs[Long]("count")).toMap
    assert(perShard.keys.forall(s => s >= 0 && s < shards))
    assert(perShard.values.forall(_ <= 8192 / 32))
    // membership: probing the build set keeps EVERY row (no false
    // negatives, the property the exact-confirm composition relies on)
    assert(Sketches.bloomPruneSharded(bloom, keys, "k", shards, 8192, 5)
      .count() == n)
    // batch merges compose: two halves merged == whole set, shard-exact
    val h1 = keys.filter(expr("substring(k, 4) % 2 = 0"))
    val h2 = keys.filter(expr("substring(k, 4) % 2 = 1"))
    val merged = Sketches.bloomMergeSharded(Seq(
      Sketches.bloomBuildSharded(h1, "k", shards, 8192, 5),
      Sketches.bloomBuildSharded(h2, "k", shards, 8192, 5)))
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("word")) ->
        r.getAs[Long]("bits")).toMap
    assert(m(merged) == m(bloom))
    // a filter over few keys leaves some shards empty: probes landing in
    // an empty shard are definitely-new and must be dropped, not error
    val tiny = Seq(Tuple1("one")).toDF("k")
    val tinyBloom = Sketches.bloomBuildSharded(tiny, "k", 64, 4096, 5)
    val kept = Sketches
      .bloomPruneSharded(tinyBloom, keys, "k", 64, 4096, 5).count()
    assert(kept < 100, s"near-empty sharded filter barely prunes: $kept")
    assert(Sketches.bloomPruneSharded(tinyBloom, tiny, "k", 64, 4096, 5)
      .count() == 1)
  }

  test("sharding preserves the ~1% FP design point past the per-filter " +
       "cap (VERDICT r11 #3)") {
    // The clamp scenario at suite scale: 200k keys at 10 bits/key is 2M
    // ideal bits against a 2^19-bit per-filter budget — a CAPPED single
    // filter (the old behavior) sits ~4x past its design point and its
    // FP rate collapses; SHARDED, the same budget yields 4 independent
    // in-budget filters and the design point holds. Nothing in the bit
    // math reads absolute sizes, so this is the same arithmetic that
    // splits a 10^10-key history into ~750 shards of 2^27 bits — the
    // MEASURED >>13M-key run (30M keys, 3 shards, 2M disjoint probes,
    // fp at the design point) lives in ScaleSmoke's bloom_sharded_prune
    // row at local[32], where 200M md5s are a scale row, not a unit test.
    val n = 200_000
    val bpk = 10
    val budget = 1 << 19
    val shards = Sketches.bloomShards(n.toLong, bpk, maxBits = budget)
    assert(shards == 4)
    val bits = Sketches.adaptiveBloomBits(
      (n.toLong + shards - 1) / shards, bpk, maxBits = budget)
    assert(bits <= budget, "per-shard geometry exceeds the budget")
    val keys = spark.range(n.toLong)
      .select(concat(lit("in_"), col("id")).as("k"))
    val bloom = Sketches.bloomBuildSharded(keys, "k", shards, bits, 5)
      .persist()
    assert(bloom.count() <= shards.toLong * (bits / 32))
    // probe n DISJOINT keys: every survivor is a false positive
    val probes = spark.range(n.toLong)
      .select(concat(lit("out_"), col("id")).as("k"))
    val fp = Sketches
      .bloomPruneSharded(bloom, probes, "k", shards, bits, 5).count()
    assert(fp <= (0.02 * n).toLong,
      s"FP rate ${fp.toDouble / n} above 2% at n=$n (sharded)")
    assert(fp > 0, "suspiciously perfect — is the probe actually running?")
    // the capped SINGLE filter at the same budget is measurably past its
    // design point — the failure mode sharding removes
    val capped = Sketches.bloomBuild(keys, "k", budget, 5)
    val fpCapped = Sketches.bloomPrune(capped, probes, "k", budget, 5)
      .count()
    assert(fpCapped > 5L * fp,
      s"capped filter FP ($fpCapped) should be far above sharded ($fp)")
    // and no false negatives across shards at this size either
    assert(Sketches.bloomPruneSharded(bloom, keys, "k", shards, bits, 5)
      .count() == n)
    // the JOIN-based path (what history-sized filters route to: per-probe
    // element_at is a LINEAR scan of the map, so big filters must probe
    // by equi-join) is verdict-identical to the broadcast-map path on
    // the same filter — forced here via a tiny mapBits threshold
    val viaJoin = Sketches.bloomPruneSharded(bloom, probes, "k", shards,
      bits, 5, mapBits = 1L)
    assert(viaJoin.count() == fp)
    assert(viaJoin.collect().map(_.getString(0)).sorted.toSeq ==
      Sketches.bloomPruneSharded(bloom, probes, "k", shards, bits, 5)
        .collect().map(_.getString(0)).sorted.toSeq)
    // multiplicity preserved by the semi-join back (duplicate probe rows
    // stay duplicated)
    val dupProbes = keys.limit(3).unionAll(keys.limit(3))
    assert(Sketches.bloomPruneSharded(bloom, dupProbes, "k", shards, bits,
      5, mapBits = 1L).count() == 6)
    bloom.unpersist(blocking = false)
  }

  test("bloomPruneSharded join path evaluates the probe lineage ONCE — " +
       "it feeds both the distinct-key explode and the final semi-join " +
       "(VERDICT r12 #5)") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("probe_evals")
    val evalCount = udf { (s: String) => acc.add(1L); s }
    val n = 1000L
    val base = spark.range(0, n)
      .select(concat(lit("key"), col("id")).as("k"))
    val bloom = Sketches
      .bloomBuildSharded(base.limit(200), "k", nShards = 3,
        shardBits = 4096, numHashes = 5)
      .persist()
    bloom.count()
    // the UDF marks every evaluation of a probe ROW: an unpersisted
    // expensive upstream (md5/shingle pipelines in extendSeen /
    // decontaminateBloom) would previously run TWICE per prune
    val probes = base.select(evalCount(col("k")).as("k"))
    val pruned = Sketches.bloomPruneSharded(bloom, probes, "k",
      nShards = 3, shardBits = 4096, numHashes = 5, mapBits = 0L)
    val survivors = pruned.count()
    assert(survivors >= 200, "true members must survive the prune")
    assert(acc.value == n,
      s"probe lineage evaluated ${acc.value} times for $n rows — " +
        "expected exactly one evaluation per row")
    bloom.unpersist(blocking = false)
    graft.core.CacheScope.release()
  }

  test("bloomShards: the CEILED per-shard key load always fits maxBits — " +
       "the adaptive clamp cannot fire on sharded geometry (ADVICE r12)") {
    // the r12 formula overshot at exact-boundary cardinalities: n=2048,
    // 10 bits/key, 4096-bit budget gave 5 shards but ceil(2048/5)*10 =
    // 4100 > 4096, firing the loud "shard the filter" warning on an
    // already-sharded filter
    for ((n, bpk, maxB) <- Seq(
        (2048L, 10, 4096), (409L, 10, 4096), (13421773L, 10, 1 << 27),
        (1L, 10, 4096), (0L, 10, 4096), (1000000L, 7, 65536))) {
      val s = Sketches.bloomShards(n, bpk, maxB)
      assert(s >= 1)
      if (n > 0)
        assert(((n + s - 1) / s) * bpk <= maxB,
          s"n=$n bpk=$bpk maxB=$maxB -> shards=$s: ceiled per-shard " +
            s"load ${((n + s - 1) / s) * bpk} exceeds the budget")
    }
    // and the sized filter emits NO clamp warning at the boundary case
    val errBuf = new java.io.ByteArrayOutputStream()
    val prevErr = System.err
    System.setErr(new java.io.PrintStream(errBuf, true))
    try {
      val s = Sketches.bloomShards(2048L, 10, 4096)
      Sketches.adaptiveBloomBits((2048L + s - 1) / s, 10, 4096)
    } finally System.setErr(prevErr)
    assert(!errBuf.toString.contains("capped"),
      s"boundary-cardinality sharding still warns: ${errBuf.toString}")
  }

  test("bloomShards rejects bitsPerKey > maxBits up front — the " +
       "degenerate config would otherwise loop ~n times and overflow " +
       "negative (ADVICE r13)") {
    val e = intercept[IllegalArgumentException] {
      // pre-fix this ran ~10^10 increments (an effective hang) and then
      // s.toInt went negative; the require must fire immediately
      Sketches.bloomShards(10_000_000_000L, bitsPerKey = 8192,
        maxBits = 4096)
    }
    assert(e.getMessage.contains("bitsPerKey"), e.getMessage)
    // the boundary itself is legal: one key exactly fills a shard
    assert(Sketches.bloomShards(10L, bitsPerKey = 4096, maxBits = 4096) == 10)
  }
}
