package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards for the round-8 operators — the properties
  * that make them 100 TB-shaped, asserted on the physical plan so a future
  * Spark upgrade or refactor that silently degrades them fails loudly
  * (the IdsSpec single-shuffle assertion pattern).
  *
  * Deliberately coarse assertions (absence of catastrophic operators,
  * presence of the broadcast model join) rather than exact node counts —
  * exact plans may legitimately change across versions; a cartesian
  * product or a corpus-sized sort-merge join of the model never should. */
class PlanGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = Queries.queries(name)(spark, dir)
    try df.queryExecution.executedPlan.toString
    finally graft.core.CacheScope.release()
  }

  test("DSIR scoring: model joins broadcast, no cartesian, no corpus SMJ") {
    val p = planOf("t_dsir")
    assert(!p.contains("CartesianProduct"), "cartesian product in t_dsir")
    assert(!p.contains("SortMergeJoin"), "sort-merge join in t_dsir")
    assert(p.contains("BroadcastHashJoin"), "weight model join not broadcast")
  }

  test("curation pipeline: lineage cuts hold — bounded exchanges, no SMJ/cartesian") {
    // The composed clean->DSIR->decontam->dedup->KN3->BPE->pack chain cuts
    // lineage at the survivor and final-doc hubs (localCheckpoint); without
    // those cuts the tree grows multiplicatively (measured: 49k Exchange
    // nodes, 1.2k SortMergeJoins, OOM at planning). Guard the cut: the
    // final packing stage's plan must stay leaf-rooted and small.
    val p = planOf("t_curation_pipeline")
    val nEx = "Exchange".r.findAllIn(p).size
    assert(nEx <= 16, s"curation pipeline final stage has $nEx exchanges — lineage cut lost")
    assert(!p.contains("SortMergeJoin"), "sort-merge join in the packing stage")
    assert(!p.contains("CartesianProduct"), "cartesian product in the pipeline")
  }

  test("two-corpus DSIR: weight model joins broadcast, no cartesian on data") {
    val p = planOf("t_dsir_two_corpus")
    assert(!p.contains("CartesianProduct"), "cartesian product in two-corpus DSIR")
    assert(p.contains("BroadcastHashJoin"), "weight model join not broadcast")
  }

  test("wide Hamming: band join is an equi-join, never a cross product") {
    val p = planOf("s_srp_hamming_wide")
    assert(!p.contains("CartesianProduct"), "cartesian product in wide hamming")
    // the verify popcount is row-local: no second data shuffle after the join
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      "band candidate join missing")
  }

  test("packed input ids: the piece-id map joins broadcast") {
    val p = planOf("t_packed_ids")
    assert(!p.contains("CartesianProduct"), "cartesian product in packing")
    assert(p.contains("BroadcastHashJoin"), "piece vocab join not broadcast")
  }

  test("source KL: pair grid joins stay equi (token-keyed), no cartesian on data") {
    // the sources x topV grid is a deliberate |S| x k cross of GEOMETRY —
    // a BroadcastNestedLoopJoin of two tiny sides is fine; what must never
    // appear is a CartesianProduct (both sides data-sized, no broadcast)
    val p = planOf("t_source_kl")
    assert(!p.contains("CartesianProduct"), "data-sized cartesian in source KL")
  }

  test("perplexity buckets: the rank is range-partitioned, not a global window") {
    val p = planOf("t_ccnet_buckets")
    assert(p.contains("rangepartitioning"), "two-phase rank lost its range exchange")
    // a data-sized unpartitioned window would print 'Window' with an empty
    // partition spec over the doc table; the only windows allowed here are
    // denseRankBy's partition-count prefix sums
    assert(!p.contains("CartesianProduct"))
  }

  test("incremental DSIR: merged statistics stay a broadcast model, no cartesian") {
    // the merge path must not lose the monolithic row's shape: the merged
    // (<= numBuckets)-row weight table still broadcasts onto the corpus
    // side, and nothing in the shard union introduces a cartesian or a
    // corpus-sized sort-merge join
    val p = planOf("t_dsir_incremental")
    assert(!p.contains("CartesianProduct"), "cartesian in t_dsir_incremental")
    assert(!p.contains("SortMergeJoin"), "sort-merge join in t_dsir_incremental")
    assert(p.contains("BroadcastHashJoin"), "merged weight join not broadcast")
  }

  test("incremental KN3: scoring joins the merged type tables, no cartesian") {
    val p = planOf("t_kn3_incremental")
    assert(!p.contains("CartesianProduct"), "cartesian in t_kn3_incremental")
  }

  test("dup source matrix: group-level self-join is an equi hash join") {
    // the per-(content, source) table self-joins on the content hash —
    // an equi join of group rows; a cartesian (or a theta-join fallback)
    // would mean the combinatorial-counting contract was lost
    val p = planOf("t_dup_source_matrix")
    assert(!p.contains("CartesianProduct"), "cartesian in dup source matrix")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "theta join in dup source matrix — equi key lost")
  }

  test("distilled quality: label join and weight scoring broadcast, no cartesian") {
    val p = planOf("t_distilled_quality")
    assert(!p.contains("CartesianProduct"), "cartesian in t_distilled_quality")
    assert(p.contains("BroadcastHashJoin"), "no broadcast join in distillation")
  }

  test("FULL registry: no CartesianProduct anywhere (VERDICT r13 #4)") {
    // The total version of the PLANS.md machine scan: every registry
    // query's physical plan, not a headline sample. A CartesianProduct
    // means both sides are data-sized with no key — never acceptable; a
    // BroadcastNestedLoopJoin is allowed only because every use in the
    // library is a geometry-sized (1-row/k-row) broadcast compose, which
    // the per-operator tests above pin individually.
    val offenders = Queries.all.map(_._1).flatMap { name =>
      val p = planOf(name)
      if (p.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"CartesianProduct in: ${offenders.mkString(", ")}")
  }
}
