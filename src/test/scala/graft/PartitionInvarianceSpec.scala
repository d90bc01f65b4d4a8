package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partition-count invariance — the distributed-correctness property the
  * oracle cannot see: every operator's RESULT must be identical whether the
  * session shuffles into 1, 4, or 13 partitions (a cluster resize, AQE
  * coalesce, or spark.sql.shuffle.partitions change must never change
  * answers). Runs a representative slice of the registry — global rank,
  * vocabulary (rank-derived ids), banded LSH join, IVF-PQ (sampled range +
  * coarse geometry), CDC, batching, streaming-fold vocab — under three
  * shuffle-partition settings and requires bit-identical sorted rows.
  *
  * 13 is deliberately prime and larger than the 4-partition test default:
  * range boundaries, band buckets and two-phase offsets all move, so any
  * partition-count leakage into VALUES shows up as a diff. */
class PartitionInvarianceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val names = Seq("q_running_total", "t_vocab", "t_length_batches",
    "t_minhash_lsh", "e_ivf_pq", "t_cdc_rolling", "t_vocab_merge",
    // round-8 third pass: DSIR model (bucket aggregates + broadcast
    // weights), rank-cut perplexity buckets, severity fractions
    "t_dsir", "t_ccnet_buckets", "t_contam_frac",
    // tokenizer chain (bucket running sums + in-doc ranks must not leak
    // partition count into sequence contents) and the band-joined
    // fingerprint pairs
    "t_input_ids", "t_packed_ids", "t_fertility", "s_srp_hamming_wide",
    // round-9: the composed curation chain (funnel = its per-stage
    // counts), the frozen-model apply, the LSH quality eval (pair-set
    // intersection counts), the BPE id round trip, the rule bundle
    "t_curation_funnel", "t_frozen_curation", "t_lsh_eval",
    "t_bpe_roundtrip", "t_gopher_rules", "t_packing_stats",
    "t_source_quality", "t_oov_curve",
    // round-10: incremental-statistics models (merge must not leak
    // partitioning into weights/scores), the provenance composites, the
    // distilled classifier (mistake-set iteration over hash aggregates)
    "t_dsir_incremental", "t_kn3_incremental", "t_dup_source_matrix",
    "t_curation_funnel_by_source", "t_distilled_quality")

  private def run(name: String, parts: Int): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      val df = Queries.queries(name)(spark, dir)
      df.collect().map(_.toString).sorted.toSeq
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      graft.core.CacheScope.release()
    }
  }

  names.foreach { name =>
    test(s"$name is invariant to the shuffle partition count") {
      val base = run(name, 4)
      assert(base.nonEmpty)
      for (parts <- Seq(1, 13)) {
        val got = run(name, parts)
        assert(got == base,
          s"$name changed results at shuffle.partitions=$parts " +
            s"(${got.size} vs ${base.size} rows)")
      }
    }
  }
}
