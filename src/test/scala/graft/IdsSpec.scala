package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Catalog, Ids}

class IdsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("prefixChunks: respects min/max, prefers prefix divergence breaks") {
    val ids = (Vector.tabulate(40)(i => f"aa$i%03d") ++
      Vector.tabulate(40)(i => f"bb$i%03d")).sorted
    val chunks = Ids.prefixChunks(ids, minSize = 10, maxSize = 60)
    assert(chunks.map(_.size).sum == 80)
    assert(chunks.forall(_.size <= 60))
    assert(chunks.flatten == ids) // order preserved, nothing lost
    // the preferred break is the aa/bb boundary (common prefix 0)
    assert(chunks.head.last.startsWith("aa") && chunks(1).head.startsWith("bb"))
  }

  test("prefixChunks: single small corpus is one chunk") {
    val ids = Vector("a", "b", "c")
    assert(Ids.prefixChunks(ids) == Seq(ids))
  }

  test("messy parquet: mergeSchema + cast map resolves drift") {
    val dir = java.nio.file.Files.createTempDirectory("messy").toString
    Seq(("a", 1)).toDF("@id", "v").write.parquet(s"$dir/p1")
    Seq(("b", "2")).toDF("@id", "v").write.parquet(s"$dir/p2")
    // move part files into one dir
    val target = java.nio.file.Files.createTempDirectory("messy_all").toString
    for (sub <- Seq("p1", "p2");
         f <- new java.io.File(s"$dir/$sub").listFiles() if f.getName.endsWith(".parquet"))
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(target, s"$sub-${f.getName}"))
    val df = Catalog.loadMessyParquet(spark, target, Map("v" -> IntegerType))
    assert(df.schema("v").dataType == IntegerType)
    val vals = df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(vals == Map("a" -> 1, "b" -> 2))
  }
}
