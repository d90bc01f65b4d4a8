package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps
import graft.sources.TextSources

/** Port of the reference's transformation contract (tests/
  * test_transformations.py, test_throughput.py): doc counts, token totals,
  * Unicode tokens, ngram windows, vocabulary ranking. */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = TextSources
    .folder(spark, s"${TestSpark.fixtures}/corpora/test1/texts")
    .withColumnRenamed("@id", "doc_id")

  test("folder corpus has 3 docs including the empty one") {
    val ids = docs.select("doc_id").as[String].collect().sorted
    assert(ids.toSeq == Seq("a", "b", "c"))
  }

  test("document lengths: 10 / 6 / 0 tokens") {
    val lens = TextOps.documentLengths(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lens == Map("a" -> 10L, "b" -> 6L, "c" -> 0L))
  }

  test("total token count and unicode tokens") {
    val uni = TextOps.unigrams(docs).cache()
    assert(uni.agg(sum("count")).as[Long].head() == 16L)
    val words = uni.select("token").as[String].collect().toSet
    assert(words.contains("каждая"))
  }

  test("per-doc unigram counts: 'the' x3 in a") {
    val theCount = TextOps.unigrams(docs)
      .filter($"doc_id" === "a" && $"token" === "the")
      .select("count").as[Long].head()
    assert(theCount == 3L)
  }

  test("bigrams drop incomplete windows; counts correct") {
    val bi = TextOps.bigrams(docs).cache()
    // doc a: 10 tokens -> 9 bigrams; doc b: 6 -> 5; empty doc -> 0
    assert(bi.agg(sum("count")).as[Long].head() == 14L)
    val theCat = bi.filter($"doc_id" === "a" && $"w0" === "the" && $"w1" === "cat")
      .select("count").as[Long].head()
    assert(theCat == 2L)
  }

  test("ngrams guard: n larger than doc yields no rows, not an error") {
    val tiny = Seq(("x", "hello world")).toDF("doc_id", "text")
    assert(TextOps.ngrams(tiny, 5).count() == 0L)
  }

  test("quadgrams really are n=4 (reference bug fixed)") {
    val quad = TextOps.quadgrams(docs).filter($"doc_id" === "a")
    // 10 tokens -> 7 windows of 4
    assert(quad.agg(sum("count")).as[Long].head() == 7L)
    assert(quad.columns.count(_.startsWith("w")) == 4)
  }

  test("vocabulary: frequency-ranked, deterministic tie-break, dense ids") {
    val vocab = TextOps.totalWordcounts(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(vocab.head._1 == "the" && vocab.head._3 == 0L) // top token
    assert(vocab.map(_._3).toSeq == vocab.indices.map(_.toLong)) // dense
    // ties (count=1) must be ordered by token
    val ties = vocab.filter(_._2 == 1L).map(_._1)
    assert(ties.sorted.toSeq == ties.toSeq)
  }

  test("encoded unigrams join preserves totals and maps top token to 0") {
    val enc = TextOps.encodedUnigrams(docs, TextOps.totalWordcounts(docs)).cache()
    assert(enc.agg(sum("count")).as[Long].head() == 16L)
    assert(enc.filter($"doc_id" === "a" && $"wordid" === 0)
      .select("count").as[Long].head() == 3L)
  }

  test("encoded bigrams: every position encoded, OOV becomes null") {
    val vocab = TextOps.totalWordcounts(docs)
    val enc = TextOps.encodeNgramTable(TextOps.bigrams(docs), vocab, 2).cache()
    // same mass as the raw bigram table; all positions in-vocab here
    assert(enc.agg(sum("count")).as[Long].head() == 14L)
    assert(enc.filter($"wordid0".isNull || $"wordid1".isNull).count() == 0L)
    // 'the cat' x2 in doc a: 'the' is wordid 0
    val theCat = enc.filter($"doc_id" === "a" && $"wordid0" === 0L)
      .agg(sum("count")).as[Long].head()
    assert(theCat == 3L) // 'the cat','the cat','the mat'
    // a vocabulary missing a word yields null at that position (index_in)
    val tiny = vocab.filter($"token" =!= "cat")
    val encOov = TextOps.encodeNgramTable(TextOps.bigrams(docs), tiny, 2)
    assert(encOov.filter($"wordid0".isNull || $"wordid1".isNull)
      .agg(sum("count")).as[Long].head() > 0L)
  }

  test("encoded trigrams one-pass: mass preserved, three wordid columns") {
    val enc = TextOps.encodedNgramsOnePass(docs, n = 3)
    assert(enc.columns.toSeq == Seq("doc_id", "wordid0", "wordid1", "wordid2", "count"))
    assert(enc.agg(sum("count")).as[Long].head() == 12L) // 8 + 4 windows
  }

  test("chunked wordcounts partition every token exactly once") {
    val ch = TextOps.chunkedWordcounts(docs, chunkSize = 4)
    assert(ch.agg(sum("count")).as[Long].head() == 16L)
    // doc a: n=10, chunkSize=4 -> nchunks=round(2.5)=3, chunks 0..2
    val chunksA = ch.filter($"doc_id" === "a").select("chunk").distinct()
      .as[Long].collect().sorted
    assert(chunksA.toSeq == Seq(0L, 1L, 2L))
  }

  test("sentence segmentation: terminators kept, whitespace stripped, indexed") {
    val d = Seq(
      (1L, "Hello world. How are you?! Fine... yes"),
      (2L, "no terminators here"),
      (3L, "")).toDF("doc_id", "text")
    val s = TextOps.sentences(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val doc1 = s.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.map(_._3).toSeq ==
      Seq("Hello world.", "How are you?!", "Fine...", "yes"))
    assert(doc1.map(_._4).toSeq == Seq(2L, 3L, 1L, 1L))
    assert(s.filter(_._1 == 2L).map(_._3).toSeq == Seq("no terminators here"))
    assert(!s.exists(_._1 == 3L)) // empty doc -> no sentences
  }

  test("token chunks: full coverage with overlap, empty docs skipped") {
    val ch = TextOps.tokenChunks(docs, chunkTokens = 4, overlap = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // doc a: 10 tokens, stride 3 -> starts 1,4,7,10 -> 4 chunks
    val a = ch.filter(_._1 == "a").sortBy(_._2)
    assert(a.length == 4)
    assert(a.head._3 == "the cat sat on")
    assert(a(1)._3 == "on the mat and") // overlap of 1 token
    assert(a.last._4 == 1L) // final chunk has 1 token
    assert(!ch.exists(_._1 == "c")) // empty doc -> no chunks
  }

  test("mergeVocab: existing wordids stable, counts merged, new tokens appended") {
    val old = Seq((1L, "alpha beta alpha"), (2L, "beta gamma")).toDF("doc_id", "text")
    val existing = TextOps.totalWordcounts(old)
    val before = existing.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // new batch: boosts gamma, introduces delta + epsilon
    val fresh = Seq((3L, "gamma gamma delta"), (4L, "epsilon delta delta"))
      .toDF("doc_id", "text")
    val merged = TextOps.mergeVocab(existing, fresh).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // id stability: every pre-existing token keeps its wordid even though
    // gamma's merged count (3) now exceeds alpha's (2)
    for ((tok, (_, id)) <- before) assert(merged(tok)._2 == id, tok)
    assert(merged("gamma")._1 == 3L && merged("alpha")._1 == 2L)
    // new tokens appended after the old range, ranked by (count, token)
    val maxOld = before.values.map(_._2).max
    assert(merged("delta") == ((3L, maxOld + 1)))   // 3 occurrences
    assert(merged("epsilon") == ((1L, maxOld + 2))) // 1 occurrence
    // empty new batch is a no-op (counts and ids unchanged)
    val noop = TextOps.mergeVocab(existing,
      Seq.empty[(Long, String)].toDF("doc_id", "text")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(noop == before)
    // empty existing vocab: merge == plain vocab build on the new batch
    val fromEmpty = TextOps.mergeVocab(existing.limit(0), fresh).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = TextOps.totalWordcounts(fresh).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fromEmpty == direct)
    graft.core.CacheScope.release()
  }

  test("cdc chunks: full coverage, content-defined boundaries re-align after edits") {
    val base = "the quick brown fox jumps over the lazy dog and then " * 20
    val docs = Seq(
      (1L, base),
      (2L, "PREFIX-INSERTED " + base), // early edit: tail chunks must re-align
      (3L, "short"),                   // < window: one whole-doc chunk
      (4L, ""), (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val ch = TextOps.cdcChunks(docs, window = 8, divisor = 32).collect()
      .groupBy(_.getLong(0))
    // coverage: chunks tile the document exactly, in order
    for (id <- Seq(1L, 2L)) {
      val rows = ch(id).sortBy(_.getLong(1))
      assert(rows.head.getLong(2) == 1L)
      val total = rows.map(_.getLong(3)).sum
      val n = docs.filter(col("doc_id") === id)
        .select(length(col("text"))).collect()(0).getInt(0)
      assert(total == n.toLong, s"doc $id tiles")
      rows.sliding(2).foreach { case Array(a, b) =>
        assert(b.getLong(2) == a.getLong(2) + a.getLong(3)) }
    }
    // the defining CDC property: after an early insertion, the two docs
    // still share most chunk hashes (fixed-offset chunking would share none)
    val h1 = ch(1L).map(_.getString(4)).toSet
    val h2 = ch(2L).map(_.getString(4)).toSet
    assert((h1 intersect h2).size >= h1.size / 2,
      s"shared=${(h1 intersect h2).size} of ${h1.size}")
    // short doc: one chunk spanning everything; empty/null: no rows
    assert(ch(3L).length == 1 && ch(3L)(0).getLong(3) == 5L)
    assert(!ch.contains(4L) && !ch.contains(5L))
  }

  test("cdc rolling variant: same tiling/edit contract, O(n) hash, unicode") {
    // same contract suite as the md5 variant — the assembly is SHARED, the
    // boundary hash is the rolling polynomial (different positions, same
    // expected-chunk-length semantics)
    val base = "the quick brown fox jumps over the lazy dog and then " * 20
    val docs = Seq(
      (1L, base),
      (2L, "PREFIX-INSERTED " + base),
      (3L, "short"),
      (4L, ""), (5L, null.asInstanceOf[String]),
      (6L, "😀 😁 code points not UTF-16 units " * 10)
    ).toDF("doc_id", "text")
    val ch = TextOps.cdcChunksRolling(docs, window = 8, divisor = 32)
      .collect().groupBy(_.getLong(0))
    for (id <- Seq(1L, 2L, 6L)) {
      val rows = ch(id).sortBy(_.getLong(1))
      assert(rows.head.getLong(2) == 1L)
      val n = docs.filter(col("doc_id") === id)
        .select(length(col("text"))).collect()(0).getInt(0)
      assert(rows.map(_.getLong(3)).sum == n.toLong, s"doc $id tiles")
      rows.sliding(2).foreach { case Array(a, b) =>
        assert(b.getLong(2) == a.getLong(2) + a.getLong(3)) }
    }
    val h1 = ch(1L).map(_.getString(4)).toSet
    val h2 = ch(2L).map(_.getString(4)).toSet
    assert((h1 intersect h2).size >= h1.size / 2,
      s"shared=${(h1 intersect h2).size} of ${h1.size}")
    assert(ch(3L).length == 1 && ch(3L)(0).getLong(3) == 5L)
    assert(!ch.contains(4L) && !ch.contains(5L))
    // interpreted eval == the shared rolling scan (codegen calls the same
    // helper; this pins the recurrence against the window fold directly)
    val cps = "abcdefghij".codePoints().toArray
    val got = graft.plans.CdcBoundaries.boundaries(cps, 4, 1L, 257L,
      1000000007L, 257L * 257L * 257L % 1000000007L)
    assert(got.toSeq == (4L to 10L), "divisor=1: every full window bounds")
    val folds = (3 until cps.length).map { i =>
      cps.slice(i - 3, i + 1).foldLeft(0L)((a, c) => (a * 257L + c) % 1000000007L)
    }
    val d7 = (3 until cps.length).filter(i => folds(i - 3) % 7 == 0).map(_ + 1L)
    assert(graft.plans.CdcBoundaries.boundaries(cps, 4, 7L, 257L,
      1000000007L, 257L * 257L * 257L % 1000000007L).toSeq == d7)
  }

  test("sequence packing: contiguous per-bucket layout, exact grid arithmetic") {
    val d = Seq(("a", "one two three"), ("b", "four five"), ("c", ""),
      ("d", "six seven eight nine")).toDF("doc_id", "text")
    val packed = TextOps.packSequences(d, budget = 4, nBuckets = 1)
      .collect().map(r => (r.getString(0),
        r.getLong(r.fieldIndex("n_tokens")), r.getLong(r.fieldIndex("seq_id")),
        r.getLong(r.fieldIndex("seq_off")))).sortBy(_._1).toSeq
    // one bucket, doc order a,b,c,d; token counts 3,2,0,4 -> starts 0,3,5,5
    assert(packed == Seq(("a", 3L, 0L, 0L), ("b", 2L, 0L, 3L),
      ("c", 0L, 1L, 1L), ("d", 4L, 1L, 1L)))
    // multi-bucket: per-bucket offsets are each a contiguous layout and the
    // assignment is rerun-identical (hash-deterministic)
    val p32 = TextOps.packSequences(d, budget = 4, nBuckets = 32).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(TextOps.packSequences(d, budget = 4, nBuckets = 32).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap == p32)
    // every bucket's docs start at 0 and stack without gaps
    val byBucket = TextOps.packSequences(d, budget = 4, nBuckets = 32).collect()
      .map(r => (r.getLong(1), r.getString(0), r.getLong(2),
        r.getLong(r.fieldIndex("seq_id")) * 4 + r.getLong(r.fieldIndex("seq_off"))))
      .groupBy(_._1)
    byBucket.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      val starts = sorted.map(_._4)
      val expected = sorted.map(_._3).scanLeft(0L)(_ + _).init
      assert(starts.toSeq == expected.toSeq)
    }
  }

  test("tokenization is re-runnable (lazy plans, no shared state)") {
    val t1 = TextOps.tokenization(docs).count()
    val t2 = TextOps.tokenization(docs).count()
    assert(t1 == 3L && t2 == 3L)
  }

  test("word-model tokenizer (F2 alternative): UAX#29 words, regex tolerance") {
    import graft.functions.TextFunctions.{tokens, wordModelTokens}
    val d = Seq(
      (1L, "Don't stop the count."),
      (2L, "каждая русская буква здесь"),
      (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val wm = d.select(col("doc_id"), wordModelTokens(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // the word model keeps the contraction whole (what blingfire-style
    // models do, and the regex cannot)
    assert(wm(1L) == Seq("Don't", "stop", "the", "count"))
    assert(wm(2L) == Seq("каждая", "русская", "буква", "здесь"))
    assert(wm(3L).isEmpty && wm(4L).isEmpty)
    // supplementary-plane letters (Gothic): surrogate pairs must be judged
    // by code point, not by char, or the whole word is dropped
    val gothic = d.sparkSession.createDataFrame(Seq((5L, "𐌰𐌱 ok")))
      .toDF("doc_id", "text")
      .select(wordModelTokens(col("text")).as("t"))
      .collect()(0).getSeq[String](0)
    assert(gothic == Seq("𐌰𐌱", "ok"))
    // reference-style tolerance: tokenizers agree within a small margin on
    // ordinary text (tests/test_transformations.py:50 allows 42 <= n <= 43)
    val both = d.filter(col("text").isNotNull)
      .select(size(tokens(col("text"))).as("a"),
        size(wordModelTokens(col("text"))).as("b"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    both.foreach { case (a, b) => assert(math.abs(a - b) <= 1) }
  }

  test("lengthBatches: band-local batches, bounded padding, dense positions") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val batchSize = 8
    val bucketTokens = 16
    val rows = TextOps.lengthBatches(docs, batchSize, bucketTokens)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nTok, bucket, _, pos, paddedTo) =>
      assert(bucket == nTok / bucketTokens) // band membership
      assert(pos >= 0 && pos < batchSize)
      assert(paddedTo >= nTok)              // pad target covers every member
      // padding waste bounded by the band width, the operator's whole point
      assert(paddedTo - nTok < bucketTokens)
    }
    // positions are dense 0..k-1 within each (bucket, batch)
    rows.groupBy(t => (t._3, t._4)).foreach { case ((b, ix), g) =>
      assert(g.map(_._5).sorted.toSeq == (0L until g.length.toLong),
        s"batch ($b,$ix) positions not dense")
      assert(g.length <= batchSize)
      // the batch's pad target is its true max length
      assert(g.map(_._6).distinct.length == 1 && g.head._6 == g.map(_._2).max)
    }
    // only the LAST batch of a band may be short
    rows.groupBy(_._3).foreach { case (_, band) =>
      val sizes = band.groupBy(_._4).map { case (ix, g) => ix -> g.length }
      val lastIx = sizes.keys.max
      sizes.foreach { case (ix, n) =>
        if (ix != lastIx) assert(n == batchSize)
      }
    }
  }

  test("sourceDivergence: zero for identical sources, large for disjoint, non-negative") {
    val d = Seq(
      (1L, "a b c a b", "A"), (2L, "c a b", "A"),
      (3L, "a b c a b", "B"), (4L, "c a b", "B"), // B identical to A
      (5L, "x y z x y", "C"), (6L, "z x y", "C")) // C disjoint vocab
      .toDF("doc_id", "text", "source")
    val kl = graft.operators.TextAnalysis.sourceDivergence(d, k = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(kl.size == 6) // 3 sources, ordered pairs
    assert(math.abs(kl(("A", "B"))) < 1e-6 && math.abs(kl(("B", "A"))) < 1e-6)
    assert(kl(("A", "C")) > 0.5 && kl(("C", "A")) > 0.5)
    // proper distributions over the shared smoothed grid: KL >= 0 (up to
    // micro rounding)
    kl.values.foreach(v => assert(v > -1e-5, v.toString))
    graft.core.CacheScope.release()
  }

  test("vocabGrowth: cumulative counts exact, monotone, first-band credit") {
    // bands of 2 docs each: vocab grows only when a token first appears
    val d = Seq(
      (1L, "a b"), (2L, "a c"), // band 0: vocab {a,b,c}
      (3L, "a b c"), (4L, "d"), // band 1: +d
      (5L, "a"), (6L, "e f")) // band 2: +e +f
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.vocabGrowth(d, nBands = 3)
      .orderBy("band").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 2L, 4L, 3L), (1L, 4L, 8L, 4L),
      (2L, 6L, 11L, 6L)))
    graft.core.CacheScope.release()
  }

  test("zipfFit: exact least-squares replay on a constructed power law") {
    // counts 16/8/4/2 at ranks 1..4 -> y = ln 16 .. ln 2 against x = ln 1..ln 4
    val words = Seq("aa" -> 16, "bb" -> 8, "cc" -> 4, "dd" -> 2)
    val text = words.flatMap { case (w, c) => Seq.fill(c)(w) }.mkString(" ")
    val out = graft.operators.TextAnalysis.zipfFit(
      Seq((1L, text)).toDF("doc_id", "text"), k = 10).collect()(0)
    // independent replay: same micro grid, same sufficient statistics
    val pts = words.zipWithIndex.map { case ((_, c), i) =>
      (math.round(math.log(i + 1.0) * 1e6), math.round(math.log(c.toDouble) * 1e6))
    }
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum.toDouble, pts.map(_._2).sum.toDouble)
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(out.getAs[Long]("n") == 4L)
    assert(math.abs(out.getAs[Double]("slope") - slope) < 1e-5)
    // halving counts per rank doubling: slope = -ln2/ln2-ish scale; the
    // constructed law is count = 32 * rank^(-log2 scale) -> slope ~ -1.5
    assert(out.getAs[Double]("slope") < -1.0 &&
      out.getAs[Double]("slope") > -2.5)
    // intercept recovers roughly ln(32) = 3.47 for this law
    assert(math.abs(out.getAs[Double]("intercept") -
      (pts.map(_._2).sum / 4.0 / 1e6 - slope * (sx / 4.0 / 1e6))) < 1e-4)
  }

  test("gopherRules: every rule fires on a constructed violator, clean doc keeps") {
    import graft.operators.TextAnalysis
    val spark2 = TestSpark.spark
    import spark2.implicits._
    // letter-only unique words ([\p{L}]+ tokens split on digits, so
    // "word1" would collapse to 60 copies of "word" and trip the dup rule)
    val uniq = for (c1 <- 'a' to 'j'; c2 <- 'a' to 'j')
      yield s"word$c1$c2"
    val clean = "the quick brown fox jumps over a lazy dog and " +
      uniq.mkString(" ")
    val docs = Seq(
      (1L, clean),                                    // passes all rules
      (2L, "too short for the corpus"),               // word count
      (3L, ("the a of and to in is it " * 20).trim),  // mean len < 3
      (4L, (1 to 60).map(_ => "= 12 __ 34 !!").mkString(" ") +
        " the a of and in extraordinary vocabulary"), // alpha words < 80%
      (5L, (1 to 60).map(i => s"zz$i yy$i xx$i").mkString(" ")), // no stopwords
      (6L, (1 to 40).map(i => s"- bullet the a line $i").mkString("\n")),
      (7L, (1 to 40).map(i => s"the a trailing line $i ...").mkString("\n")),
      (8L, "the a " + ("same same same same " * 40).trim) // dup tokens
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs, minWords = 20).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getBoolean(10), "clean doc must keep")
    assert(!r(2L).getBoolean(3), "word-count rule must fire")
    assert(!r(3L).getBoolean(4), "mean-word-len rule must fire")
    assert(!r(4L).getBoolean(5), "alpha-words rule must fire")
    assert(!r(5L).getBoolean(6), "stopword rule must fire")
    assert(!r(6L).getBoolean(7), "bullet-lines rule must fire")
    assert(!r(7L).getBoolean(8), "ellipsis-lines rule must fire")
    assert(!r(8L).getBoolean(9), "dup-tokens rule must fire")
    (2L to 8L).foreach(i => assert(!r(i).getBoolean(10), s"doc $i must drop"))
  }

  test("mixtureSample: rates saturate for scarce sources, scale down rich " +
       "ones, honor explicit weights, and sample to the budget (round 11)") {
    import graft.operators.TextAnalysis
    // source A: 100 docs x 10 tokens = 1000 available
    // source B: 10 docs x 10 tokens  = 100 available (scarce)
    val docs = ((0 until 100).map(i => (i.toLong, "w " * 10, "A")) ++
      (100 until 110).map(i => (i.toLong, "w " * 10, "B")))
      .toDF("doc_id", "text", "source")
    // uniform over {A, B}, budget 400 -> 200 tokens per source:
    // A rate = 200/1000 = 0.2; B rate = min(1, 200/100) saturates at 1
    val out = TextAnalysis.mixtureSample(docs, budgetTokens = 400)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out.values.filter(_._1 == "B").forall(v => v._3 == 1000000L && v._4),
      "scarce source must saturate at rate 1 and keep everything")
    val aRate = out.values.find(_._1 == "A").get._3
    assert(aRate == 200000L, s"rich-source rate: got $aRate")
    // the lottery realizes ~rate: 100 A-docs at p=0.2 -> binomial(100,.2),
    // a 5-sigma band is [0, 40]
    val aKept = out.values.count(v => v._1 == "A" && v._4)
    assert(aKept > 0 && aKept <= 40, s"A kept $aKept of 100 at p=0.2")
    // explicit weights: all budget to B -> A rate 0, nothing kept from A
    val wOut = TextAnalysis.mixtureSample(docs, budgetTokens = 50,
        weights = Map("B" -> 1.0))
      .collect().map(r => (r.getString(1), r.getLong(3), r.getBoolean(4)))
    assert(wOut.filter(_._1 == "A").forall(v => v._2 == 0L && !v._3))
    assert(wOut.filter(_._1 == "B").forall(_._2 == 500000L)) // 50/100
    // zero-token source: rate 0, never kept, no divide-by-zero
    val empty = Seq((1L, "", "E"), (2L, "w w", "F")).toDF("doc_id", "text", "source")
    val eOut = TextAnalysis.mixtureSample(empty, budgetTokens = 10)
      .collect().map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(eOut("E") == 0L && eOut("F") == 1000000L)
    // determinism: same inputs, same verdicts, any partitioning
    val re = TextAnalysis.mixtureSample(docs.repartition(7), 400)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(re == out.map { case (k, v) => k -> v._4 })
  }
}
