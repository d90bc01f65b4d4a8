package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.CacheScope
import graft.operators.{Dedup, TextRanking}

/** Operator-internal persists must be releasable: a long-lived session
  * calling ranking/dedup operators repeatedly must not accumulate cached
  * blocks forever (round-2 bench logged 'Asked to cache already cached
  * data' from exactly this leak). */
class CacheScopeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)

  test("operators register persists; release drops them; results survive") {
    CacheScope.release() // clean slate whatever ran before
    assert(CacheScope.trackedCount == 0)
    val pairs = Dedup.minhashLshPairs(docs, threshold = 0.0)
    val n1 = pairs.count()
    assert(CacheScope.trackedCount > 0) // signature table tracked
    CacheScope.release()
    assert(CacheScope.trackedCount == 0)
    // released plan recomputes instead of failing, with identical results
    assert(pairs.count() == n1)
    // collocations + cross-entropy register and release the same way
    TextRanking.collocations(docs, minCount = 1, k = 5).collect()
    TextRanking.bigramCrossEntropy(docs).count()
    assert(CacheScope.trackedCount > 0)
    CacheScope.release()
    assert(CacheScope.trackedCount == 0)
  }

  test("tfidf and repetition track their single-tokenize persists") {
    CacheScope.release()
    TextRanking.tfidf(docs).count()
    assert(CacheScope.trackedCount == 1) // the shared unigram table
    graft.operators.TextAnalysis.repetitionSignals(docs).count()
    assert(CacheScope.trackedCount == 2) // + the shared token arrays
    CacheScope.release()
    assert(CacheScope.trackedCount == 0)
  }
}
