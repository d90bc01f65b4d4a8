package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Catalog, Ids}

/** Port of the reference's catalog contract (tests/test_metadata.py):
  * id-field inference, best-form type ladder, duplicate audit, dense ids. */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val cat = Catalog.build(spark,
    s"${TestSpark.fixtures}/catalogs/diss.ndjson")

  test("id inferred from `filename`, renamed @id, cast to string") {
    assert(cat.columns.contains("@id"))
    assert(!cat.columns.contains("filename"))
    assert(cat.schema("@id").dataType == StringType)
  }

  test("nc:id is dense 0..n-1 in sorted @id order") {
    val rows = cat.select("@id", "nc:id").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    assert(rows.map(_._2).toSeq == (0L until 6L))
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
  }

  test("best-form: ints narrowed, floats to float32, dates detected") {
    assert(cat.schema("year").dataType == ShortType) // fits in int16
    assert(cat.schema("score").dataType == FloatType)
    assert(cat.schema("defended").dataType == DateType)
  }

  test("list column survives as array") {
    assert(cat.schema("keywords").dataType.isInstanceOf[ArrayType])
    val kw = cat.filter($"@id" === "003")
      .select(explode($"keywords")).as[String].collect().toSet
    assert(kw == Set("cats", "mats"))
  }

  test("dictionary gating by distinct/total < 0.5") {
    val df = Seq(
      ("1", "red", "alpha"), ("2", "red", "beta"), ("3", "blue", "gamma"),
      ("4", "red", "delta"), ("5", "blue", "epsilon"), ("6", "red", "zeta"))
      .toDF("@id", "color", "word")
    val dicts = Catalog.dictionaryColumns(Catalog.planColumns(df)).toSet
    assert(dicts.contains("color")) // 2/6 < 0.5
    assert(!dicts.contains("word")) // 6/6 — unique strings stay plain
  }

  test("duplicate ids fail the audit") {
    val dup = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("@id", "v")
    val e = intercept[IllegalArgumentException](Catalog.assertUniqueIds(dup))
    assert(e.getMessage.contains("duplicate"))
  }

  test("string<->array JSON conflict normalization wraps scalars") {
    val path = java.nio.file.Files.createTempFile("labels", ".ndjson")
    java.nio.file.Files.writeString(path,
      """{"id": "1", "labels": "x"}
        |{"id": "2", "labels": ["y", "z"]}
        |""".stripMargin)
    val df = Catalog.normalizeJsonListColumns(
      Catalog.withId(Catalog.loadNdjson(spark, path.toString)), Seq("labels"))
    val byId = df.collect().map(r =>
      r.getString(r.fieldIndex("@id")) -> r.getSeq[String](r.fieldIndex("labels"))).toMap
    assert(byId("1") == Seq("x"))
    assert(byId("2") == Seq("y", "z"))
  }

  test("build auto-detects string<->array conflicted NDJSON columns (no hints)") {
    val path = java.nio.file.Files.createTempFile("split", ".ndjson")
    java.nio.file.Files.writeString(path,
      // `labels` is conflicted (scalar vs array) -> Spark infers string;
      // `note` is prose that merely starts with '[' -> must stay a string
      """{"id": "1", "labels": "x", "note": "[sic] quoted"}
        |{"id": "2", "labels": ["y", "z"], "note": "plain"}
        |{"id": "3", "labels": "w", "note": "[draft] pending"}
        |""".stripMargin)
    val cat = Catalog.build(spark, path.toString)
    assert(cat.schema("labels").dataType.isInstanceOf[ArrayType])
    assert(cat.schema("note").dataType == StringType)
    val byId = cat.collect().map(r =>
      r.getString(r.fieldIndex("@id")) -> r.getSeq[String](r.fieldIndex("labels"))).toMap
    assert(byId("1") == Seq("x"))
    assert(byId("2") == Seq("y", "z"))
    assert(byId("3") == Seq("w"))
  }

  test("a lone JSON-looking value cannot flip a free-text column to array") {
    val path = java.nio.file.Files.createTempFile("prose", ".ndjson")
    // 30 prose rows, ONE of which happens to be a parseable JSON array —
    // 1/30 < the 5% evidence floor, so the schema must stay string.
    val lines = (1 to 29).map(i =>
      s"""{"id": "$i", "note": "prose line $i", "tags": "a"}""") :+
      """{"id": "30", "note": "[\"oops\"]", "tags": ["a","b"]}"""
    java.nio.file.Files.writeString(path, lines.mkString("", "\n", "\n"))
    val raw = Catalog.withId(Catalog.load(spark, path.toString))
    val detected = Catalog.detectListColumns(raw)
    assert(!detected.contains("note"), s"note misdetected: $detected")
    // while `tags` (1/30 array-form too) is equally below the floor here;
    // at a told-you-so fraction it IS detected
    assert(Catalog.detectListColumns(raw, minListFraction = 0.01)
      .toSet == Set("note", "tags"))
    val cat = Catalog.build(spark, path.toString)
    assert(cat.schema("note").dataType == StringType)
  }

  test("bracket-prefixed prose inside a DETECTED list column wraps, not nulls") {
    val path = java.nio.file.Files.createTempFile("mixed", ".ndjson")
    java.nio.file.Files.writeString(path,
      // labels IS detected (row 2 parses) but row 1 is a bracketed scalar:
      // it must become a 1-element list, never null
      """{"id": "1", "labels": "[sic] quoted"}
        |{"id": "2", "labels": ["y", "z"]}
        |""".stripMargin)
    val cat = Catalog.build(spark, path.toString)
    val byId = cat.collect().map(r =>
      r.getString(r.fieldIndex("@id")) -> r.getSeq[String](r.fieldIndex("labels"))).toMap
    assert(byId("1") == Seq("[sic] quoted"))
    assert(byId("2") == Seq("y", "z"))
  }

  test("ORC catalogs flow through the same build pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("orccat")
      .resolve("cat.orc").toString
    Seq(("a", 1999, "x"), ("b", 2004, "y"), ("c", 2011, "x"))
      .toDF("@id", "year", "dept").write.orc(dir)
    val cat = Catalog.build(spark, dir)
    assert(cat.count() == 3)
    assert(cat.schema("year").dataType == ShortType) // best-form ladder ran
    assert(cat.columns.contains("nc:id"))
  }

  test("stats metadata: quantiles on numerics, top values on strings, version tag") {
    val df = Seq(("1", 10, "x"), ("2", 20, "y"), ("3", 30, "x"))
      .toDF("@id", "n", "s")
    val withStats = Catalog.withStatsMetadata(df)
    val nMeta = withStats.schema("n").metadata
    assert(nMeta.getDoubleArray("quantiles").length == Catalog.StatsQuantiles.length)
    assert(nMeta.getDoubleArray("quantiles").head == 10.0)
    assert(nMeta.getDoubleArray("quantiles").last == 30.0)
    val sMeta = withStats.schema("s").metadata
    assert(sMeta.getStringArray("top_values").head == "x") // freq-ordered
    assert(withStats.schema("@id").metadata.getString("nonconsumptive") == "0.1.0")
  }

  test("profile: exact per-column rows, nulls and distincts") {
    val df = Seq(
      (1L, Some("a"), Some(1.5)),
      (2L, Some("a"), None),
      (3L, None, Some(2.5)),
      (4L, Some("b"), Some(2.5))).toDF("id", "s", "v")
    val p = Catalog.profile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(p("id") == ((4L, 0L, 4L)))
    assert(p("s") == ((4L, 1L, 2L)))
    assert(p("v") == ((4L, 1L, 2L)))
    // ordered by column name for a stable dataset-card layout
    assert(Catalog.profile(df).collect().map(_.getString(0)).toSeq ==
      Seq("id", "s", "v"))
  }

  test("Ids.assignDense is deterministic across invocations") {
    val df = Seq("q", "b", "m", "a", "z").toDF("@id")
    val a = Ids.assignDense(df).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = Ids.assignDense(df).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b)
    assert(a == Set(("a", 0L), ("b", 1L), ("m", 2L), ("q", 3L), ("z", 4L)))
  }

  test("epochNanos: NTZ conversion refuses a non-UTC session (no silent offset)") {
    import org.apache.spark.sql.functions.{col, to_timestamp_ntz, lit}
    val df = Seq("2024-01-01 00:00:00").toDF("raw")
      .select(to_timestamp_ntz(col("raw")).as("ts"))
    val key = "spark.sql.session.timeZone"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "America/New_York")
      val e = intercept[IllegalArgumentException] {
        Catalog.epochNanos(df, "ts").collect()
      }
      assert(e.getMessage.contains("UTC"))
    } finally spark.conf.set(key, saved)
    // and under UTC the wall clock IS the epoch
    val ns = Catalog.epochNanos(df, "ts").head().getLong(0)
    assert(ns == 1704067200L * 1000000000L)
    // instant-typed timestamps convert regardless of session tz
    val inst = Seq(1704067200L).toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    try {
      spark.conf.set(key, "America/New_York")
      assert(Catalog.epochNanos(inst, "ts").head().getLong(0) ==
        1704067200L * 1000000000L)
    } finally spark.conf.set(key, saved)
  }
}
