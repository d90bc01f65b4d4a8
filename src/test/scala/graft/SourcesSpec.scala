package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TextSources

/** Port of tests/test_inputs.py: each input type yields the documents with
  * correct ids, random access, first-wins dedup, gz transparency. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("folder input: ids from filenames, text preserved") {
    val df = TextSources.folder(spark, s"${TestSpark.fixtures}/corpora/test1/texts")
    val byId = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId.keySet == Set("a", "b", "c"))
    assert(byId("a").contains("the cat sat"))
    assert(byId("c") == "")
  }

  test("folder input: .txt.gz decompressed, suffixes stripped from id") {
    val df = TextSources.folder(spark, s"${TestSpark.fixtures}/corpora/gz/texts")
    val byId = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId.keySet == Set("d"))
    assert(byId("d") == "the dog ran far from the cat")
  }

  test("single-file input: id<TAB>text, duplicate ids keep FIRST") {
    val path = java.nio.file.Files.createTempFile("mallet", ".txt")
    java.nio.file.Files.writeString(path,
      "a\tfirst version of a\nb\tdoc b text\na\tsecond version of a\nc\tdoc c\n")
    val df = TextSources.singleFile(spark, path.toString)
    val byId = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId.keySet == Set("a", "b", "c"))
    assert(byId("a") == "first version of a")
  }

  test("unicode ids flow through as data (metadata-embedded source)") {
    // non-ASCII ids are data, not filenames — full Unicode fidelity
    val cat = Seq(("г", "каждая кошка спит"), ("a", "the cat"))
      .toDF("@id", "body")
    val df = TextSources.fromMetadata(cat, "body")
    val byId = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId("г") == "каждая кошка спит")
  }

  test("metadata-embedded text input") {
    val cat = Seq(("d1", "some text here", 1999), ("d2", "other text", 2001))
      .toDF("@id", "dissertation", "year")
    val df = TextSources.fromMetadata(cat, "dissertation")
    assert(df.columns.toSeq == Seq("@id", "text"))
    assert(df.count() == 2)
  }

  test("bookstacks: nc: columns are features, rest is metadata") {
    val dir = java.nio.file.Files.createTempDirectory("stacks").toString
    Seq(("p1", "the cat sat", 1990, 1), ("p2", "a dog ran", 1991, 2))
      .toDF("@id", "nc:text", "year", "paragraph")
      .write.mode("overwrite").parquet(dir)
    val stacks = TextSources.bookstacks(spark, dir)
    val meta = TextSources.bookstackMetadata(stacks)
    assert(meta.columns.toSet == Set("@id", "year", "paragraph"))
    val text = TextSources.bookstackText(stacks)
    assert(text.filter($"@id" === "p1").select("text").as[String].head() == "the cat sat")
  }

  test("folder empty-file recovery self-invalidates on tree changes " +
       "(ADVICE r10)") {
    // the empty-file listing is memoized per (dir, format) with a
    // content-summary fingerprint: a late-arriving empty file, a deleted
    // empty file, or an empty file gaining content must all be picked up
    // WITHOUT the manual refreshEmptyScan flag — the main scan re-lists
    // per action, and the recovery path may not desync from it.
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("folder_inval").toString
    Files.writeString(Paths.get(s"$dir/full.txt"), "some text")
    Files.writeString(Paths.get(s"$dir/e1.txt"), "")
    def ids() = TextSources.folder(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ids().keySet == Set("full", "e1"))
    // late-arriving empty file (in a SUBDIR: the fingerprint must see
    // nested changes, not just the top level)
    Files.createDirectory(Paths.get(s"$dir/sub"))
    Files.writeString(Paths.get(s"$dir/sub/e2.txt"), "")
    assert(ids().keySet == Set("full", "e1", "e2"),
      "late-arriving empty file was served from a stale cache")
    // an empty file gains content: must move from recovery to main scan
    // (exactly one row, with the text)
    Files.writeString(Paths.get(s"$dir/e1.txt"), "now full")
    val after = ids()
    assert(after.keySet == Set("full", "e1", "e2"))
    assert(after("e1") == "now full", "filled file still resurrected empty")
    // deleted empty file: must not be resurrected
    Files.delete(Paths.get(s"$dir/sub/e2.txt"))
    assert(ids().keySet == Set("full", "e1"),
      "deleted empty file resurrected from a stale cache")
  }
}
