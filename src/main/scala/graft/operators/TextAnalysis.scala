package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis operators for training-data pipelines: language ID, quality
  * scoring, tokenizer-cost estimation, content fingerprinting. All pure
  * column expressions (whole-stage-codegen friendly) over one scan of the
  * documents table — no UDFs, no shuffles except the final aggregates.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Order = deterministic tie-break priority. */
  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "no", "por"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "pour", "dans", "qui"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  private def stopHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words.map(_.toLowerCase))))

  /** languageId: (docId, lang_pred, confidence). Scores each candidate
    * language by stopword-hit share of tokens; argmax with list-order
    * tie-break; "und" (undetermined) when nothing hits. */
  def languageId(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    // tokenize once per row; the per-language scores read the bound column
    val toks = col("lt")
    val scored = docs
      .select(col(idCol), tokens(lower(col(textCol))).as("lt"))
      .select(
      col(idCol) +: StopwordSets.map { case (lang, words) =>
        stopHits(toks, words).as(s"hits_$lang")
      } :+ size(toks).as("n_toks"): _*)
    val best = StopwordSets.map(s => col(s"hits_${s._1}")).reduce((a, b) => greatest(a, b))
    // first language (in priority order) achieving the max — deterministic.
    val predOrdered = StopwordSets.reverse.foldLeft(lit("und"): Column) {
      case (acc, (lang, _)) =>
        when(col(s"hits_$lang") === best && best > 0, lit(lang)).otherwise(acc)
    }
    scored.select(col(idCol), predOrdered.as("lang_pred"),
      round(best.cast("double") / greatest(col("n_toks"), lit(1)), 6).as("confidence"))
  }

  /** qualityScore: per-document heuristics used to filter training data —
    * character/token counts, mean token length, punctuation & digit &
    * whitespace ratios, stopword ratio, and a composite [0,1] score.
    * All ratios rounded to 6 dp for cross-engine stability.
    *
    * Two regex passes total per document (BENCH_r01's version ran ~5):
    * one letter-token pass shared by token count / mean length / stopwords
    * (lowercase derived per token, not via a second tokenize of
    * `lower(text)`), and one combined `[punct|symbol|digit]` char-class pass
    * split arithmetically into punctuation vs digit counts (the classes are
    * disjoint). Mean token length reads `length(concat_ws("", toks))` —
    * no per-element fold. */
  def qualityScore(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    // token + mark arrays projected once per row; downstream reads bound cols
    val pre = docs.select(col(idCol), length(text).as("q_nchars"),
      tokens(text).as("q_toks"),
      regexp_extract_all(text, lit("[\\p{P}\\p{S}0-9]"), lit(0)).as("q_marks"))
    val toks = col("q_toks")
    val nChars = col("q_nchars")
    val nToks = size(toks)
    val digits = size(filter(col("q_marks"), m => m >= "0" && m <= "9"))
    val punct = size(col("q_marks")) - digits
    val stop = stopHits(transform(toks, t => lower(t)), StopwordSets.head._2)
    val meanTokLen = when(nToks > 0,
      length(concat_ws("", toks)).cast("double") / nToks)
      .otherwise(lit(0.0))
    val safeChars = greatest(nChars, lit(1)).cast("double")
    val punctRatio = punct / safeChars
    val digitRatio = digits / safeChars
    val stopRatio = stop / greatest(nToks, lit(1)).cast("double")
    // composite: reward 3..12-char mean tokens & some stopwords; penalize
    // punctuation/digit noise. Clamped to [0,1].
    val raw = lit(1.0) - punctRatio * 2 - digitRatio * 2 +
      when(meanTokLen.between(3, 12), lit(0.0)).otherwise(lit(-0.25)) +
      when(stopRatio > 0.01, lit(0.0)).otherwise(lit(-0.25))
    val score = least(greatest(raw, lit(0.0)), lit(1.0))
    pre.select(col(idCol), nChars.cast("long").as("n_chars_text"),
      nToks.cast("long").as("n_tokens"),
      round(meanTokLen, 6).as("mean_token_len"),
      round(punctRatio, 6).as("punct_ratio"),
      round(digitRatio, 6).as("digit_ratio"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(score, 6).as("quality_score"))
  }

  /** Gopher-style quality RULES (Rae et al. 2021, §A1.1) as EXPLICIT
    * per-document booleans plus the final keep decision — the
    * rule-bundle form a curation run audits (which rule rejected how
    * many docs), complementing the scalar [[qualityScore]].
    *
    * Every threshold compares exact INTEGERS (3·n ≤ chars ≤ 10·n, not a
    * float mean), so the booleans are engine-exact with no rounding
    * contract needed:
    *  - word_count: minWords ≤ letter-token count ≤ maxWords
    *  - mean_word_len in [3, 10] chars
    *  - ≥ 80% of whitespace words contain a letter
    *  - ≥ 2 distinct stopwords (the en stopword set)
    *  - ≤ 10% of lines start with a bullet (-, *, •)
    *  - ≤ 30% of lines end with an ellipsis
    *  - duplicate-token fraction ≤ 0.6 (distinct ≥ 0.4·total — natural
    *    prose repeats its function words heavily; 300-token English text
    *    sits near distinct/total ~ 0.5, so 0.7 would reject nearly all
    *    real text and the rule would never discriminate)
    * Row-local: one select, three regex extractions per row, no joins,
    * no shuffles — the 100 TB shape is a straight map over the scan. */
  def gopherRules(docs: DataFrame, minWords: Long = 50,
                  maxWords: Long = 100000, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val pre = docs.select(col(idCol),
      tokens(col(textCol)).as("g_toks"),
      regexp_extract_all(col(textCol), lit("\\S+"), lit(0)).as("g_ws"),
      split(col(textCol), "\n", -1).as("g_lines"))
    val toks = col("g_toks")
    val ws = col("g_ws")
    val lines = col("g_lines")
    val nTok = size(toks).cast("long")
    val tokChars = length(concat_ws("", toks)).cast("long")
    val alphaWords = size(filter(ws, w => w.rlike("\\p{L}"))).cast("long")
    val nWs = size(ws).cast("long")
    val nStops = size(array_intersect(
      array_distinct(transform(toks, t => lower(t))),
      array(StopwordSets.head._2.map(lit): _*))).cast("long")
    val nLines = size(lines).cast("long")
    val bulletLines =
      size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("long")
    val ellipsisLines =
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("long")
    val distinctToks = size(array_distinct(toks)).cast("long")
    val rWordCount = nTok.between(minWords, maxWords)
    val rMeanLen = (lit(3L) * nTok <= tokChars) && (tokChars <= lit(10L) * nTok)
    val rAlpha = lit(10L) * alphaWords >= lit(8L) * nWs
    val rStop = nStops >= 2L
    val rBullet = lit(10L) * bulletLines <= nLines
    val rEllipsis = lit(10L) * ellipsisLines <= lit(3L) * nLines
    val rDup = lit(10L) * distinctToks >= lit(4L) * nTok
    pre.select(col(idCol), nTok.as("n_words"), nLines.as("n_lines"),
      rWordCount.as("r_word_count"), rMeanLen.as("r_mean_word_len"),
      rAlpha.as("r_alpha_words"), rStop.as("r_stopwords"),
      rBullet.as("r_bullet_lines"), rEllipsis.as("r_ellipsis_lines"),
      rDup.as("r_dup_tokens"),
      (rWordCount && rMeanLen && rAlpha && rStop && rBullet && rEllipsis &&
        rDup).as("keep"))
  }

  /** tokenCounts: whitespace tokens, BPE-ish regex pieces, and the
    * reference's alternate words+punct tokenizer (document.py:79-80) — the
    * standard "how many tokens will this cost" estimates. */
  def tokenCounts(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      size(regexp_extract_all(col(textCol), lit("\\S+"), lit(0))).cast("long")
        .as("ws_tokens"),
      bpeTokenCount(col(textCol)).cast("long").as("bpe_tokens"),
      size(regexp_extract_all(col(textCol),
        lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]+"), lit(0))).cast("long")
        .as("alt_tokens"))

  /** PII-style scrubbing patterns (engine-portable regex: plain classes +
    * alternation, no backreferences): emails, URLs, and long digit runs
    * (phone/account numbers). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"
  val LongDigitPattern = "[0-9]{7,}"

  /** Redact emails/URLs/long digit runs with typed placeholder tokens —
    * the standard scrub pass before text ships into a training mix. URL
    * first (emails can appear inside URLs; after <URL> replacement the
    * email pattern cannot re-match the placeholder). Pure column
    * expression, one row-local pass per pattern. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlPattern, "<URL>"),
        EmailPattern, "<EMAIL>"),
      LongDigitPattern, "<NUM>")

  /** Redaction audit: per-document counts of each scrubbed category plus
    * the md5 of the redacted text (the compact equality witness for the
    * full transform). */
  def redactionAudit(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    docs.select(col(idCol),
      size(regexp_extract_all(text, lit(UrlPattern), lit(0))).cast("long")
        .as("n_urls"),
      size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long")
        .as("n_emails"),
      size(regexp_extract_all(text, lit(LongDigitPattern), lit(0))).cast("long")
        .as("n_longnums"),
      md5(redact(text)).as("redacted_md5"))
  }

  /** Gopher-style repetition signals — the standard "is this document
    * degenerate boilerplate" filters for a training mix (Rae et al. 2021,
    * §A1.1 repetition rules):
    *
    *  - `dup_token_frac`: fraction of token instances that are repeats of an
    *    earlier token (1 - distinct/total). Row-local: size + array_distinct.
    *  - `top_bigram_frac`: fraction of bigram instances taken by the single
    *    most frequent bigram.
    *  - `dup_trigram_frac`: fraction of trigram instances whose trigram
    *    occurs more than once in the document.
    *
    * Plan: the tokenizer regex runs ONCE — the token-array projection is
    * persisted (CacheScope-tracked) and feeds the row-local token signal
    * plus both n-gram branches (per-doc regex passes are the dominant
    * silent cost in this operator family). The n-gram signals reduce the
    * (doc, ngram, count) tables per document — partial+final aggregates
    * keyed by doc, no windows, no corpus-wide state, so each signal scales
    * with corpus size exactly like the n-gram counts themselves. Documents
    * too short to have bigrams/trigrams carry NULL for those fractions
    * (undefined, not zero). */
  def repetitionSignals(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val tok = graft.core.CacheScope.persist(
      docs.select(col(idCol), tokens(col(textCol)).as("r_toks")))
    val base = tok
      .select(col(idCol),
        size(col("r_toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("r_toks"))).cast("long").as("n_distinct"))
      .select(col(idCol), col("n_tokens"),
        when(col("n_tokens") > 0,
          round((col("n_tokens") - col("n_distinct")).cast("double")
            / col("n_tokens"), 6))
          .otherwise(lit(0.0)).as("dup_token_frac"))
    val bi = TextOps.ngramsFromTokens(tok, 2, idCol, "r_toks")
      .groupBy(col(idCol))
      .agg(max("count").as("top_bi"), sum("count").as("tot_bi"))
      .select(col(idCol),
        round(col("top_bi").cast("double") / col("tot_bi"), 6)
          .as("top_bigram_frac"))
    val tri = TextOps.ngramsFromTokens(tok, 3, idCol, "r_toks")
      .groupBy(col(idCol))
      .agg(sum(when(col("count") > 1, col("count")).otherwise(lit(0L)))
        .as("dup_tri"), sum("count").as("tot_tri"))
      .select(col(idCol),
        round(col("dup_tri").cast("double") / col("tot_tri"), 6)
          .as("dup_trigram_frac"))
    base.join(bi, Seq(idCol), "left").join(tri, Seq(idCol), "left")
  }

  /** Content-defined fingerprint: md5 over the sorted distinct token set.
    * Robust to token order/duplication — catches shuffled/near-identical
    * docs that exact text hashing misses; engine-stable by construction. */
  def fingerprint(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      md5(concat_ws(" ", array_sort(array_distinct(tokens(col(textCol))))))
        .as("fingerprint"))

  /** Crawl-text cleaning — the normalization pass run before any other
    * text operator sees the data: strip markup tags, drop control
    * characters, collapse whitespace runs, trim. Pure `regexp_replace`
    * chain (codegen'd, row-local, zero shuffle) and deliberately
    * conservative: no entity decoding, no case folding — those are
    * tokenizer decisions, not cleaning. The pass order matters and is
    * part of the contract (tags first, so `<br>` becomes collapsible
    * whitespace). */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(text, "<[^>]*>", " "), // markup tags -> space
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""), // control chars
      "\\s+", " ")) // collapse whitespace runs

  /** Per-document cleaning audit: cleaned text plus the byte/char
    * reduction — the observability a curation pipeline needs to spot
    * boilerplate-heavy sources (cleaning that removes half a source's
    * bytes is a signal, not just a transform). */
  def cleanAudit(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.select(col(idCol), col(textCol))
      .withColumn("clean_text", cleanText(col(textCol)))
      .select(col(idCol), col("clean_text"),
        length(col(textCol)).cast("long").as("n_chars_raw"),
        length(col("clean_text")).cast("long").as("n_chars_clean"))

  /** Compression-ratio quality signal (the CCNet/Gopher-family filter the
    * [[repetitionSignals]] heuristics approximate): DEFLATE the raw text
    * and report compressed/raw bytes at integer micro precision. Template
    * spam and boilerplate land near 0; clean prose ~0.3-0.6; random or
    * already-compressed payloads approach or exceed 1. Callers gate on
    * `[minMicro, maxMicro]` downstream. Row-local codegen'd expression
    * ([[graft.plans.DeflatedSize]]); zero-byte and null documents yield a
    * null ratio (no bytes, no signal) and are a caller policy decision.
    * In-engine deterministic; no SQL oracle (DEFLATE output is
    * implementation-defined), so the driver applies its rows-only check. */
  def compressionSignals(docs: DataFrame, level: Int = 6,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame =
    docs.select(col(idCol), octet_length(col(textCol)).cast("long").as("n_bytes"),
        graft.plans.CompressExpressions.deflatedSize(col(textCol), level)
          .as("z_bytes"))
      .withColumn("ratio_micro",
        when(col("n_bytes") > 0,
          round(col("z_bytes") * lit(1000000.0) / col("n_bytes"), 0)
            .cast("long")))

  /** Cross-engine-checkable audit of the compression signal (VERDICT r9
    * #5): the DEFLATE byte stream is implementation-defined, but three
    * things about it are NOT and an independent engine can assert them —
    * the raw byte length, losslessness (deflate-then-inflate returns the
    * input bit-for-bit), and the worst-case size bound (DEFLATE stored
    * blocks cost <= 5 bytes per 16383-byte block + a small constant, so
    * z_bytes can never exceed n + 5*(n/16383 + 1) + 10; it is also always
    * >= 1, even for empty input, which emits a final empty block). This
    * row emits exactly the oracle-computable columns: doc_id, n_bytes,
    * and the two in-engine-verified booleans the oracle pins to TRUE — a
    * violated bound or a lossy round trip hash-fails at the driver.
    * Null text propagates null (no bytes, no claim), matching the
    * oracle's CASE. */
  def compressionAudit(docs: DataFrame, level: Int = 6,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val n = octet_length(col(textCol)).cast("long")
    val z = graft.plans.CompressExpressions.deflatedSize(col(textCol), level)
    docs.select(col(idCol), n.as("n_bytes"),
      (z >= 1L && z <= n + lit(5L) * (n / 16383L + 1L) + 10L)
        .as("z_bounded"),
      graft.plans.CompressExpressions.deflateRoundTripOk(col(textCol), level)
        .as("roundtrip_ok"))
  }

  /** Blocklist filtering — the word-boundary-correct "badwords" gate every
    * corpus-curation pipeline runs (substring LIKE matching flags
    * "class(ic)" for "ass"; matching on TOKENS does not). Per document:
    * total token count, blocked-token hits, the blocked share at exact
    * integer micro precision, and the keep verdict at `maxRatioMicro`.
    *
    * The blocklist ships inside the row expression (a literal array —
    * real lists are 1e2..1e4 words, trivially broadcastable), so the scan
    * is one row-local filter pass per document: no join, no shuffle before
    * whatever aggregate the caller adds. Matching is case-insensitive
    * (lowercased tokens vs a lowercased list, the [[languageId]]
    * convention). A zero-token document has ratio 0 and is kept. */
  def blocklistHits(docs: DataFrame, words: Seq[String],
                    maxRatioMicro: Long = 100000,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(words.nonEmpty, "need a non-empty blocklist")
    val wl = words.map(_.toLowerCase).distinct
    // NULL text coalesces to zero tokens, so the "zero-token document has
    // ratio 0 and is kept" contract holds under EITHER
    // spark.sql.legacy.sizeOfNull setting — no -1/null counts downstream
    docs.select(col(idCol),
        coalesce(tokens(lower(col(textCol))),
          array().cast("array<string>")).as("lt"))
      .select(col(idCol), size(col("lt")).cast("long").as("n_tokens"),
        size(filter(col("lt"), t => t.isInCollection(wl)))
          .cast("long").as("n_blocked"))
      .withColumn("blocked_micro",
        when(col("n_tokens") > 0,
          round(col("n_blocked") * lit(1000000.0) / col("n_tokens"), 0)
            .cast("long"))
          .otherwise(lit(0L)))
      .withColumn("keep", col("blocked_micro") <= lit(maxRatioMicro))
  }

  /** Zipf-law fit — the corpus-health diagnostic: least-squares slope of
    * ln(count) against ln(rank) over the top-`k` vocabulary. Natural text
    * sits near slope −1; a corpus drifting toward 0 is boilerplate-heavy
    * (flat frequencies), far below −1 is template/spam-dominated.
    *
    * Cross-engine contract: both logs are micro-rounded LONGS before any
    * sum (the engine's micro-grid rule), the five sufficient statistics
    * are exact integer sums over ≤ k rows, and the final slope/intercept
    * are single double expressions over those longs — identical IEEE
    * trees in both engines, rounded once to 6dp. Long bounds: Σxy ≤
    * k·(ln(k)·1e6)·(ln(c_max)·1e6) — safe through k = 1e6 and counts to
    * e^300; the n·Σxy products happen in double space.
    *
    * Scale shape: one vocabulary build ([[TextOps.totalWordcounts]] — the
    * two-phase rank) + one aggregate over the k-row vocab table. Output:
    * one row (n, slope, intercept) with intercept in nats. */
  /** Pairwise SOURCE DIVERGENCE — the data-mixing diagnostic: for every
    * ordered pair of sources, the add-one-smoothed KL divergence of their
    * unigram distributions over the corpus top-`k` vocabulary:
    *
    *   KL(a‖b) = Σ_t p_a(t) · ln(p_a(t)/p_b(t)),
    *   p_s(t) = (c_s(t)+1)/(N_s+k)   over the shared top-k grid
    *
    * High KL(a‖b) = source a looks nothing like b (upweighting b won't
    * cover a); near-zero rows are redundant sources. Restricting to a
    * fixed top-k grid bounds the model at |sources|·k cells and makes the
    * smoothing well-defined (every source sees the same support).
    *
    * Cross-engine contract: each log-ratio is one ln of a rational of
    * exact int64 products, micro-rounded; the per-pair numerator
    * Σ (c_a+1)·lr_micro is an exact long; ONE double division at the end
    * ([[zipfFit]]'s pattern). Sources are assumed BOUNDED (corpus/domain
    * names, not ids) — the pair grid is |S|²·k rows of geometry.
    *
    * Output: (source_a, source_b, n_a, kl) for a ≠ b, kl in nats. */
  def sourceDivergence(docs: DataFrame, k: Int = 200,
                       sourceCol: String = "source",
                       textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import graft.functions.TextFunctions.tokens
    val uni = graft.core.CacheScope.persist(
      docs.select(col(sourceCol).as("src"),
          explode(tokens(col(textCol))).as("token"))
        .groupBy("src", "token").agg(count(lit(1)).as("c")))
    val topV = broadcast(uni.groupBy("token").agg(sum("c").as("ct"))
      .orderBy(desc("ct"), asc("token")).limit(k).select("token"))
    val grid = uni.select("src").distinct().crossJoin(topV)
    val cnt = graft.core.CacheScope.persist(
      grid.join(uni, Seq("src", "token"), "left").na.fill(0L, Seq("c")))
    val totals = cnt.groupBy("src").agg(sum("c").as("n"))
    // ENFORCED int64 guard (scaladoc bound made a loud failure, not a
    // non-ANSI wrap): the in-log product is bounded by (maxN+1)·(maxN+k)
    // and the micro-nat accumulator by (maxN+k)·ln(maxN+k)·1e6 — one tiny
    // action on the |sources|-row totals table proves both for every row.
    // NULL on an empty corpus (no sources) -> nothing to overflow
    val maxN = Option(totals.agg(max("n")).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val maxLr = math.round(math.log(maxN.toDouble + k) * 1e6) + 1
    require(BigInt(maxN + 1) * (maxN + k) <= BigInt(Long.MaxValue) &&
        BigInt(maxLr) * (maxN + k) <= BigInt(Long.MaxValue),
      s"sourceDivergence int64 headroom exceeded (max source tokens " +
        s"$maxN): shard sources or reduce k")
    val aSide = cnt.join(totals, "src")
      .select(col("src").as("source_a"), col("token"),
        col("c").as("c_a"), col("n").as("n_a"))
    val bSide = cnt.join(totals, "src")
      .select(col("src").as("source_b"), col("token"),
        col("c").as("c_b"), col("n").as("n_b"))
    aSide.join(bSide, Seq("token"))
      .filter(col("source_a") =!= col("source_b"))
      .withColumn("lr_micro",
        round(log(((col("c_a") + lit(1L)) * (col("n_b") + lit(k.toLong)))
            .cast("double") /
          ((col("c_b") + lit(1L)) * (col("n_a") + lit(k.toLong)))
            .cast("double")) * 1e6, 0).cast("long"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(max("n_a").as("n_a"),
        sum((col("c_a") + lit(1L)) * col("lr_micro")).as("num"))
      .select(col("source_a"), col("source_b"), col("n_a"),
        round(col("num").cast("double") / (col("n_a") + lit(k.toLong)) /
          lit(1e6), 6).as("kl"))
  }

  /** Vocabulary GROWTH curve (Heaps' law view): cut the corpus into
    * `nBands` equal-population document bands in id order and report, per
    * band, the CUMULATIVE document count, token count, and distinct-token
    * vocabulary up to and including that band. Natural text grows its
    * vocabulary ~ tokens^beta (beta ≈ 0.5-0.6); a flat curve means
    * near-duplicate content, a linear one gibberish/ids.
    *
    * Exact and one-pass: each document's band is floor(rank·nBands/n)
    * (the [[TextRanking.perplexityBuckets]] integer cut over the
    * two-phase rank); each TOKEN contributes to vocab growth exactly at
    * its FIRST band (min over its documents), so cumulative vocab is a
    * running sum over the nBands-row first-appearance histogram — no
    * distinct-count per prefix, no repeated scans. Output:
    * (band, n_docs, n_tokens, vocab) — all cumulative, all exact longs.
    *
    * Scale shape: one rank (single data shuffle), one per-doc aggregate,
    * one token-level min aggregate (vocab-sized), then nBands-row
    * arithmetic; the band histograms broadcast-compose. */
  def vocabGrowth(docs: DataFrame, nBands: Int = 10,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    require(nBands >= 1, s"nBands must be >= 1, got $nBands")
    import graft.functions.TextFunctions.tokens
    val ranked = graft.core.Ids.denseRankBy(
      docs.select(col(idCol), tokens(col(textCol)).as("toks")),
      Seq(col(idCol).asc), "rank0")
    val tot = ranked.agg((max("rank0") + lit(1L)).as("__n"))
    val banded = graft.core.CacheScope.persist(
      ranked.crossJoin(broadcast(tot))
        .withColumn("band", expr(s"rank0 * $nBands DIV __n"))
        .select(col(idCol), col("band"), col("toks")))
    // per-band doc/token mass
    val mass = banded.groupBy("band").agg(
      count(lit(1)).as("docs_in_band"),
      sum(size(col("toks")).cast("long")).as("tokens_in_band"))
    // per-token first band -> first-appearance histogram
    val firsts = banded
      .select(col("band"), explode(col("toks")).as("token"))
      .groupBy("token").agg(min("band").as("first_band"))
      .groupBy("first_band").agg(count(lit(1)).as("new_tokens"))
      .withColumnRenamed("first_band", "band")
    // cumulative sums over the <= nBands rows: a TRIANGULAR broadcast
    // self-join of the band histogram (band² rows of pure geometry) —
    // keeps the engine's zero-single-partition-window invariant intact
    // rather than introducing an unpartitioned window, however tiny
    val hist = mass.join(firsts, Seq("band"), "left")
      .na.fill(0L, Seq("new_tokens"))
    val contrib = hist.select(col("band").as("b2"),
      col("docs_in_band").as("d2"), col("tokens_in_band").as("t2"),
      col("new_tokens").as("v2"))
    hist.select("band").join(broadcast(contrib), col("b2") <= col("band"))
      .groupBy("band")
      .agg(sum("d2").as("n_docs"), sum("t2").as("n_tokens"),
        sum("v2").as("vocab"))
  }

  def zipfFit(docs: DataFrame, k: Int = 1000, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    require(k >= 2, s"need k >= 2 points to fit, got $k")
    val v = graft.operators.TextOps.totalWordcounts(docs, cap = k,
      idCol = idCol, textCol = textCol)
    val pts = v.select(
      round(log((col("wordid") + lit(1L)).cast("double")) * 1e6, 0)
        .cast("long").as("x"),
      round(log(col("count").cast("double")) * 1e6, 0).cast("long").as("y"))
    val sums = pts.agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val nD = col("n").cast("double")
    val den = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val slopeRaw = (nD * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) / den
    // a single distinct x (k=1 vocab, or an all-one-token corpus) makes
    // the normal-equation denominator 0: the fit is UNDEFINED — emit NULL
    // slope/intercept rather than tripping ANSI divide-by-zero
    sums.select(col("n"),
      when(den =!= lit(0.0), round(slopeRaw, 6)).as("slope"),
      when(den =!= lit(0.0),
        round((col("sy").cast("double") - slopeRaw * col("sx").cast("double")) /
          nD / lit(1e6), 6)).as("intercept"))
  }

  /** Token-budget MIXTURE SAMPLING — the per-source re-weighting step a
    * pretraining pipeline runs before packing: given a global token
    * budget and target source proportions, each source gets a
    * deterministic sampling rate `min(1, budget * prop_s / avail_s)`
    * (in exact integer micro), and every document draws its keep verdict
    * from the id-keyed hash lottery (the [[Dsir]] resample convention —
    * reproducible, engine-stable, no RNG). Sources whose share of the
    * budget exceeds their available tokens saturate at rate 1 (the
    * under-filled-source caveat every mixture spec documents — take all
    * of it, the shortfall is visible as rate_micro = 1e6).
    *
    * `weights`: target proportions by source name, normalized over the
    * sources PRESENT (a listed-but-absent source changes nothing; an
    * unlisted source gets weight 0 and is dropped). Empty map = uniform
    * over observed sources ("balance the mixture"), the common default.
    *
    * Scale shape: one map-side-combined per-source token aggregate
    * (|S| rows — hundreds, never corpus-sized), a window-total over
    * those |S| rows, and one broadcast join back; the verdict is
    * row-local. Output: (idCol, srcCol, n_tokens, rate_micro, kept) per
    * document — callers filter `kept` for the sampled corpus; emitting
    * the verdict keeps both sides oracle-checkable. */
  def mixtureSample(docs: DataFrame, budgetTokens: Long,
                    weights: Map[String, Double] = Map.empty,
                    idCol: String = "doc_id", textCol: String = "text",
                    srcCol: String = "source"): DataFrame = {
    require(budgetTokens >= 0, "need a non-negative token budget")
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val tok = docs.select(col(idCol), col(srcCol),
      coalesce(size(tokens(col(textCol))), lit(0)).cast("long")
        .as("n_tokens"))
    val w =
      if (weights.isEmpty) lit(1.0)
      else coalesce(element_at(
        typedlit(weights), col(srcCol).cast("string")), lit(0.0))
    val av = tok.groupBy(col(srcCol))
      .agg(sum("n_tokens").as("avail"))
      .withColumn("w", w)
      // |S| rows total: the single-partition window is over the per-
      // source aggregate, never the corpus
      .withColumn("sumw", sum(col("w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)))
    val rate = when(col("avail") === 0L || col("w") === 0.0 ||
        col("sumw") === 0.0, lit(0L))
      .otherwise(least(lit(1000000L),
        round(lit(budgetTokens).cast("double") * col("w") / col("sumw") /
          col("avail").cast("double") * lit(1000000.0), 0).cast("long")))
    val rates = av.select(col(srcCol), rate.as("rate_micro"))
    tok.join(broadcast(rates), Seq(srcCol))
      .withColumn("u_micro",
        pmod(graft.functions.TextFunctions.hash60(
            concat(col(idCol).cast("string"), lit(":mixture:sample"))),
          lit(1000000L)))
      .select(col(idCol), col(srcCol), col("n_tokens"), col("rate_micro"),
        (col("u_micro") < col("rate_micro")).as("kept"))
  }
}
