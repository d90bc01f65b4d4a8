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

  test("denseRankBy: dense deterministic ids from a shuffled input") {
    val rows = (0 until 500).map(i => (f"id$i%03d", i % 7))
    val df = scala.util.Random.shuffle(rows).toDF("k", "grp").repartition(5)
    val ranked = Ids.denseRankBy(df, Seq(df("grp").desc, df("k").asc), "rid")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // dense 0..n-1, and rid order == (grp desc, k asc) order
    assert(ranked.map(_._3).sorted.toSeq == (0L until 500L))
    val expected = rows.sortBy { case (k, g) => (-g, k) }.map(_._1)
    assert(ranked.sortBy(_._3).map(_._1).toSeq == expected)
  }

  test("denseRankBy: plan stays in the SQL engine at full parallelism") {
    val df = (0 until 100).map(i => (s"k$i", i)).toDF("k", "v")
    val plan = Ids.denseRankBy(df, Seq(df("v").asc, df("k").asc), "rid")
      .queryExecution.executedPlan.toString
    // the r6 implementation round-tripped through an RDD (Tungsten
    // deserialization + an eager job); the plan must never regress to it
    assert(!plan.contains("Scan ExistingRDD"), "rank left the SQL engine")
    // the only window is the offsets prefix-sum over per-partition counts
    // (bounded by shuffle-partition count); no data-sized global window
    assert(!plan.contains("row_number"), "data-sized rank window reappeared")
    assert(plan.contains("rangepartitioning"), "global order lost")
  }

  test("denseRankBy: the input is range-shuffled ONCE (pinned cache)") {
    // The two-phase rank's single-computation property (VERDICT r7 #6,
    // hardened): the data branch and the per-partition-counts branch MUST
    // read one physical range partitioning — RangePartitioner boundaries
    // are sampled with an rdd.id seed, so two independent exchanges
    // DIVERGE and corrupt the offsets (observed over a cached input at
    // sf0.1 before the internal persist). Both consumers must now read
    // the pinned InMemoryRelation, whose cached plan holds the single
    // range exchange.
    val df = (0 until 1000).map(i => (s"k$i", i)).toDF("k", "v")
    val ranked = Ids.denseRankBy(df, Seq(df("v").asc, df("k").asc), "rid")
    ranked.collect() // finalize any adaptive plan before reading it
    // the only range exchange lives INSIDE the pinned cache's build plan
    // (printed under InMemoryRelation); the outer plan consumes the cache.
    // Count DISTINCT exchange instances (plan_id) — nested/initial plan
    // sections reprint the same instance.
    val plan = ranked.queryExecution.executedPlan.toString
    val ranges = raw"Exchange rangepartitioning[^\n]*plan_id=(\d+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(ranges.size == 1,
      s"expected ONE physical range shuffle (inside the cache build), got $ranges:\n$plan")
    assert(plan.contains("InMemoryTableScan"),
      s"rank no longer reads the pinned ranged cache:\n$plan")
    graft.core.CacheScope.release()
  }

  test("denseRankBy: correct dense ranks over a CACHED input (regression)") {
    // The bug this pins: with a cached InMemoryRelation input,
    // ReuseExchange silently failed, the two branches drew DIFFERENT
    // sampled range boundaries, and 104/5000 sf0.1 rows got duplicate /
    // inverted ranks. The fix (internal pinned persist) must hold the
    // ranks dense and order-correct regardless of input caching.
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val base = graft.core.CacheScope.persist(
      docs.select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok"))
        .withColumn("bucket", (col("n_tok") / lit(16)).cast("long")))
    val rows = Ids.denseRankBy(base,
        Seq(col("bucket").asc, col("n_tok").asc, col("doc_id").asc), "__rid")
      .collect()
      .map(r => (r.getLong(2), r.getLong(1), r.getLong(0), r.getLong(3)))
      .sortBy(_._4)
    assert(rows.map(_._4).toSeq == (0L until rows.length.toLong), "ranks not dense")
    val keys = rows.map(t => (t._1, t._2, t._3))
    assert(keys.sameElements(keys.sorted), "rank order violates the sort key")
    graft.core.CacheScope.release()
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
