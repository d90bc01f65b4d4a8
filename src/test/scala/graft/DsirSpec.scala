package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir

class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Target (en) docs share a vocabulary; off-target (xx) docs another; one
  // mixed doc sits between. DSIR must rank pure-target docs above the mixed
  // doc above pure-off-target docs.
  private lazy val docs = Seq(
    (1L, "alpha beta gamma alpha beta", "en"),
    (2L, "beta gamma alpha gamma", "en"),
    (3L, "alpha alpha beta gamma beta", "en"),
    (4L, "zork quux blarg zork quux", "xx"),
    (5L, "quux blarg zork blarg", "xx"),
    (6L, "alpha beta zork quux", "xx"), // mixed: half target-like
    (7L, "", "en"), // empty: no features, no score row
    (8L, null.asInstanceOf[String], "xx") // null text: no features either
  ).toDF("doc_id", "text", "lang")

  test("hashedFeatures: unigrams + adjacent bigrams, mass preserved") {
    val f = Dsir.hashedFeatures(docs, numBuckets = 1 << 20)
    // doc 1: 5 tokens -> 5 unigrams + 4 bigrams = 9 feature occurrences
    val mass = f.groupBy("doc_id").agg(sum("cnt").as("m")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mass(1L) == 9L && mass(2L) == 7L && mass(6L) == 7L)
    assert(!mass.contains(7L) && !mass.contains(8L))
    // with a huge bucket space, distinct features rarely collide: doc 1 has
    // 3 distinct unigrams + 3 distinct bigrams (alpha-beta x2 merges)
    assert(f.filter(col("doc_id") === 1L).count() == 6L)
  }

  test("importanceWeights: one row per raw bucket, target buckets weigh more") {
    val feats = Dsir.hashedFeatures(docs, numBuckets = 1 << 20)
    val tf = feats.join(docs.filter(col("lang") === "en").select("doc_id"),
      Seq("doc_id"), "semi")
    val w = Dsir.importanceWeights(tf, feats, 1 << 20)
    assert(w.count() == feats.select("bucket").distinct().count())
    // every weight a finite long; target-exclusive buckets positive,
    // off-target-exclusive buckets all share the ln((0+1)/(c_r+1))-driven
    // minimum end of the range
    val joined = feats.join(w, Seq("bucket"))
    val tMin = joined.join(docs.filter(col("lang") === "en")
        .select("doc_id"), Seq("doc_id"), "semi")
      .agg(min("w_micro")).collect()(0).getLong(0)
    val xMax = joined.filter(col("doc_id") === 4L)
      .agg(max("w_micro")).collect()(0).getLong(0)
    assert(tMin > xMax, s"target-min $tMin should exceed off-target-max $xMax")
  }

  test("selectTop ranks target-like docs first, mixed doc in between") {
    val top = Dsir.selectTop(docs, col("lang") === "en",
      numBuckets = 1 << 20, k = 6).collect()
    val order = top.map(_.getLong(0)).toSeq
    // pure target docs (1,2,3) before the mixed doc (6) before pure xx (4,5)
    assert(order.take(3).toSet == Set(1L, 2L, 3L), order.toString)
    assert(order(3) == 6L, order.toString)
    assert(order.drop(4).toSet == Set(4L, 5L), order.toString)
    // scores strictly ordered and score == score_micro/1e6 rounded
    val micros = top.map(_.getLong(1)).toSeq
    assert(micros == micros.sorted.reverse)
    top.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getLong(1) / 1e6) < 1e-6 + 1e-9)
    }
    graft.core.CacheScope.release()
  }

  test("scoreAll == hashedFeatures∘importanceWeights∘scoreDocuments (two paths, one result)") {
    val viaBlocks = {
      val feats = Dsir.hashedFeatures(docs, numBuckets = 512)
      val tf = feats.join(docs.filter(col("lang") === "en").select("doc_id"),
        Seq("doc_id"), "semi")
      Dsir.scoreDocuments(feats, Dsir.importanceWeights(tf, feats, 512))
    }
    val viaFlag = Dsir.scoreAll(docs, col("lang") === "en", numBuckets = 512)
    assert(viaFlag.exceptAll(viaBlocks).count() == 0 &&
      viaBlocks.exceptAll(viaFlag).count() == 0)
    graft.core.CacheScope.release()
  }

  test("importanceResample: max-score doc always kept, membership deterministic") {
    val feats = Dsir.hashedFeatures(docs, numBuckets = 1 << 20)
    val tf = feats.join(docs.filter(col("lang") === "en").select("doc_id"),
      Seq("doc_id"), "semi")
    val scored = Dsir.scoreDocuments(feats,
      Dsir.importanceWeights(tf, feats, 1 << 20))
    val kept = Dsir.importanceResample(scored, temperature = 2.0).collect()
    // p is monotone in score: the max-score doc has p_micro = 1e6 > any
    // u_micro, so it is always kept
    val maxDoc = scored.orderBy(desc("score_micro")).first().getLong(0)
    assert(kept.map(_.getLong(0)).contains(maxDoc))
    // deterministic: second run keeps the identical set
    val kept2 = Dsir.importanceResample(scored, temperature = 2.0).collect()
    assert(kept.map(_.getLong(0)).sorted.toSeq ==
      kept2.map(_.getLong(0)).sorted.toSeq)
    // evidence columns honor the keep rule
    kept.foreach { r =>
      val (p, u) = (r.getAs[Long]("p_micro"), r.getAs[Long]("u_micro"))
      assert(u < p && p >= 0 && p <= 1000000L && u >= 0 && u < 1000000L)
    }
  }

  test("incremental statistics merge == monolithic model, bit-for-bit") {
    // shard by parity; target slice (lang=en) within each shard. The
    // merged per-shard (bucket, c) statistics must reproduce EXACTLY the
    // weights importanceWeights derives from the whole corpus at once —
    // additive counts make incremental maintenance exact, not approximate.
    val b = 64
    val tgt = docs.filter(col("lang") === "en").select("doc_id")
    val even = Dsir.hashedFeatures(docs.filter(col("doc_id") % 2 === 0), b)
    val odd = Dsir.hashedFeatures(docs.filter(col("doc_id") % 2 === 1), b)
    def tc(f: org.apache.spark.sql.DataFrame) =
      Dsir.bucketCounts(f.join(tgt, Seq("doc_id"), "left_semi"))
    val incremental = Dsir.weightsFromCounts(
        Dsir.mergeCounts(Seq(tc(even), tc(odd))),
        Dsir.mergeCounts(Seq(Dsir.bucketCounts(even),
          Dsir.bucketCounts(odd))), b)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val monolithic = Dsir.importanceWeights(
        Dsir.hashedFeatures(docs, b)
          .join(tgt, Seq("doc_id"), "left_semi"),
        Dsir.hashedFeatures(docs, b), b)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incremental == monolithic)
    assert(incremental.nonEmpty)
    // a single-shard merge is the identity
    val one = Dsir.weightsFromCounts(
        Dsir.mergeCounts(Seq(tc(even))),
        Dsir.mergeCounts(Seq(Dsir.bucketCounts(even))), b)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = Dsir.weightsFromCounts(tc(even),
        Dsir.bucketCounts(even), b)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == direct)
  }

  test("weightsFromCounts: empty target gives all-raw smoothing, not nulls") {
    val b = 64
    val raw = Dsir.bucketCounts(Dsir.hashedFeatures(docs, b))
    val emptyT = Dsir.bucketCounts(
      Dsir.hashedFeatures(docs.filter(col("doc_id") < 0), b))
    val w = Dsir.weightsFromCounts(emptyT, raw, b).collect()
    assert(w.nonEmpty)
    assert(w.forall(!_.isNullAt(1)), "no null-poisoned weights")
    // c_t = 0 everywhere: weight = ln((1 * (n_r + B)) / ((c_r + 1) * B))
    val nR = raw.agg(sum("c")).head().getLong(0)
    val cByBucket = raw.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    w.foreach { r =>
      val expect = math.round(math.log(
        1.0 * (nR + b) / ((cByBucket(r.getLong(0)) + 1.0) * b)) * 1e6)
      assert(r.getLong(1) == expect)
    }
  }

  test("scoreRowLocal == join-form scoring, bit-exact incl. doc-drop " +
       "semantics (round 14: the codegen'd apply hot path)") {
    val b = 512
    val feats = Dsir.hashedFeatures(docs, b)
    val tf = feats.join(
      docs.filter(col("lang") === "en").select("doc_id"), Seq("doc_id"), "semi")
    val weights = Dsir.importanceWeights(tf, feats, b)
    val joinForm = Dsir.scoreDocuments(feats, weights).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rowLocal = Dsir.scoreRowLocal(docs, weights, b)
      .filter(col("weighted_hits") > 0)
      .select(col("doc_id"), col("score_micro")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rowLocal == joinForm,
      s"row-local scores diverge from the join form: $rowLocal vs $joinForm")
    // the empty (7) and null-text (8) docs produce NO score row in the
    // join form; the hits filter must reproduce that drop exactly
    assert(!rowLocal.contains(7L) && !rowLocal.contains(8L))
    // a weight table MISSING some buckets (an arriving batch against a
    // frozen reference model hits unweighted buckets): absent buckets
    // contribute 0 to the sum, and a doc with NO weighted occurrence drops
    val partial = weights.limit(3)
    val arriving = Seq((100L, "alpha beta zork"), (101L, "nosuchtoken"))
      .toDF("doc_id", "text")
    val pw = partial.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Dsir.hashedFeatures(arriving, b).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        val hits = rows.filter(r => pw.contains(r.getLong(1)))
        id -> (hits.map(r => r.getLong(2) * pw(r.getLong(1))).sum,
          hits.map(_.getLong(2)).sum)
      }
      .collect { case (id, (s, h)) if h > 0 => id -> s }
    val got = Dsir.scoreRowLocal(arriving, partial, b)
      .filter(col("weighted_hits") > 0)
      .select(col("doc_id"), col("score_micro")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect, s"partial-model scoring diverges: $got vs $expect")
    graft.core.CacheScope.release()
  }

  test("bucket collisions stay in-range at tiny bucket counts") {
    val f = Dsir.hashedFeatures(docs, numBuckets = 4)
    val bks = f.select("bucket").distinct().collect().map(_.getLong(0))
    assert(bks.forall(b => b >= 0 && b < 4))
    // end-to-end still runs (weights well-defined under heavy collision)
    val top = Dsir.selectTop(docs, col("lang") === "en", numBuckets = 4, k = 10)
    assert(top.count() == 6L) // all docs with features scored
    graft.core.CacheScope.release()
  }
}
