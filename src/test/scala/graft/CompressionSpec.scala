package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.plans.Zlib

class CompressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("expression matches the direct Deflater call; null/empty handled") {
    val docs = Seq(
      (1L, "to be or not to be " * 50),            // highly repetitive
      (2L, "The quick brown fox jumps over the lazy dog."),
      (3L, ""),                                    // zero bytes
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextAnalysis.compressionSignals(docs).collect()
      .map(r => r.getLong(0) ->
        (r.get(1), r.get(2), r.get(3))).toMap
    val expected1 =
      Zlib.deflatedSize(("to be or not to be " * 50).getBytes("UTF-8"), 6)
    assert(got(1L)._2 == expected1)
    // empty: 0 input bytes, 2 output bytes (DEFLATE's end-of-stream block),
    // ratio null — no bytes, no signal
    assert(got(3L) == ((0L, 2L, null)))
    assert(got(4L) == ((null, null, null)))
  }

  test("signal semantics: repetition compresses far below prose; junk above") {
    val rep = "spam spam spam " * 200
    val prose = (1 to 40).map(i =>
      s"Sentence number $i carries modestly varied content and wording.")
      .mkString(" ")
    val rng = new scala.util.Random(42) // fixed-seed LCG: deterministic
    val junk = Seq.fill(3000)(rng.nextPrintableChar()).mkString
    def ratio(s: String): Double =
      Zlib.deflatedSize(s.getBytes("UTF-8"), 6).toDouble / s.length
    assert(ratio(rep) < 0.05)
    assert(ratio(prose) > ratio(rep) && ratio(prose) < 0.8)
    assert(ratio(junk) > 0.8)
  }

  test("sf0.001 corpus: independent JDK path agrees row-for-row; goldens pinned") {
    // compressionSignals has no DuckDB oracle (DEFLATE output is
    // implementation-defined, so no cross-engine value check exists; its
    // former registry row `t_compression` was retired in round 11 in
    // favor of the oracle-checked `t_compression_audit`). This test
    // carries the value check instead, two ways (VERDICT r6 #4):
    //  1. recompute every z_bytes through a DIFFERENT JDK code path
    //     (DeflaterOutputStream streaming, fresh Deflater per value —
    //     nothing shared with Zlib's pooled counting loop);
    //  2. pin golden literals measured on this JDK/zlib: a golden failure
    //     with (1) passing means the ENVIRONMENT's zlib changed, not the
    //     code.
    val path = "/root/testdata/sf0.001/documents.parquet"
    assume(new java.io.File(path).exists(), "driver testdata not present")
    def independentDeflate(s: String): Long = {
      val sink = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.DeflaterOutputStream(
        sink, new java.util.zip.Deflater(6, true))
      z.write(s.getBytes("UTF-8")); z.close()
      sink.size().toLong
    }
    val rows = TextAnalysis.compressionSignals(spark.read.parquet(path))
      .join(spark.read.parquet(path).select($"doc_id", $"text"), "doc_id")
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      val expected = Option(r.getString(4)).map(independentDeflate)
      assert(Option(r.get(2)) == expected, s"doc $id z_bytes")
    }
    // goldens (JDK 17 zlib, level 6, raw deflate, measured 2026-08-13):
    assert(rows.map(r => if (r.isNullAt(2)) 0L else r.getLong(2)).sum == 72598L)
    val byId = rows.map(r => r.getLong(0) -> (r.get(1), r.get(2), r.get(3))).toMap
    assert(byId(0L) == ((128L, 84L, 656250L)))
    assert(byId(123L) == ((339L, 162L, 477876L)))
    assert(byId(499L) == ((258L, 131L, 507752L)))
  }

  test("round-trip + bound audit: lossless on every shape, null propagates") {
    import graft.plans.Zlib
    val rnd = new scala.util.Random(7)
    val inputs = Seq(
      "", "a", "abc" * 10000, "tab\tnl\nmix é中😀",
      new String(Array.fill(50000)((rnd.nextInt(94) + 33).toChar)))
    for (s <- inputs; level <- Seq(1, 6, 9)) {
      val bytes = s.getBytes("UTF-8")
      assert(Zlib.roundTripOk(bytes, level), s"level=$level len=${bytes.length}")
      val z = Zlib.deflatedSize(bytes, level)
      val n = bytes.length.toLong
      assert(z >= 1 && z <= n + 5L * (n / 16383L + 1L) + 10L,
        s"bound violated: n=$n z=$z level=$level")
    }
    // the audit operator over a frame with a null: booleans null there,
    // TRUE elsewhere — the exact contract the t_compression_audit oracle
    // pins cross-engine
    val docs = Seq((1L, Option("hello world")), (2L, None))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.compressionAudit(docs).orderBy("doc_id").collect()
    assert(rows(0).getLong(1) == 11L && rows(0).getBoolean(2)
      && rows(0).getBoolean(3))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2) && rows(1).isNullAt(3))
  }

  test("deterministic within the engine and exposed in SQL via extensions") {
    val docs = Seq((1L, "abcabcabc " * 100)).toDF("doc_id", "text")
    val a = TextAnalysis.compressionSignals(docs).collect().toSeq
    val b = TextAnalysis.compressionSignals(docs).collect().toSeq
    assert(a == b)
    docs.createOrReplaceTempView("cmp_docs")
    val viaSql = spark.sql(
      "SELECT deflated_size(text, 6) FROM cmp_docs").head().getLong(0)
    assert(viaSql == a.head.getLong(2))
  }
}
