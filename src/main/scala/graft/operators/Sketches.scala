package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Count-min sketch: fixed-size approximate frequency counting.
  *
  * The reference bounds vocabulary-count memory with an approximate counter
  * (bounter, 4 GB budget, corpus.py:198-227); our exact groupBy replaces it
  * for correctness (SURVEY §2.4 A5), and this sketch is the distributed
  * analog held for the cases exact counting genuinely cannot afford: the
  * sketch is `depth x width` cells REGARDLESS of corpus size, so at 100 TB
  * the frequency state that matters (heavy hitters) fits in one broadcast
  * while exact counts of a multi-billion-key universe would not.
  *
  * Everything is expressed as plain aggregates over engine-stable hashes
  * (md5-derived [[graft.functions.TextFunctions.hash60]]), so sketches are:
  *  - distributed: one map-side-combined groupBy builds the table;
  *  - mergeable: sketches of corpus shards with the same geometry union and
  *    re-aggregate cell-wise (`merge`) — the classic CMS property, which is
  *    what makes per-datacenter / per-day sketches composable;
  *  - reproducible: identical cells on every run and engine (SQL-oracle
  *    checkable), unlike seed-dependent native sketch libraries.
  *
  * Standard CMS guarantee: estimate >= true count always (only over-counts
  * on collisions); with depth d and width w, the overestimate exceeds
  * total_mass * e / w with probability < e^-d.
  */
object Sketches {

  private val Sep = "\u0001"

  /** Row hash for depth row `d`: bucket = hash60("d" + SOH + key) % width.
    * hash60 is non-negative, so % is a true modulus in both engines. */
  private def bucket(key: org.apache.spark.sql.Column, d: Int, width: Int) =
    hash60(concat(lit(d.toString), lit(Sep), key)) % lit(width.toLong)

  /** Build a sketch from weighted items: (d, bucket, total) with one row per
    * NON-EMPTY cell (missing cell = 0). One groupBy over `depth` replicated
    * rows; the output is at most `depth * width` rows.
    *
    * Null keys are EXCLUDED from the sketch (a null key hashes to a null
    * bucket, which no probe can reach — its mass would be silently lost and
    * the >=-true-count guarantee broken). [[cmsEstimate]] consistently
    * estimates 0 for a null probe key. */
  def cmsBuild(items: DataFrame, keyCol: String, weightCol: String,
               depth: Int = 3, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1 and width >= 2")
    val cells = array((0 until depth).map { d =>
      struct(lit(d).as("d"), bucket(col(keyCol), d, width).as("bucket"))
    }: _*)
    items.filter(col(keyCol).isNotNull)
      .select(explode(cells).as("c"), col(weightCol).as("w"))
      .groupBy(col("c.d").as("d"), col("c.bucket").as("bucket"))
      .agg(sum(col("w").cast("long")).as("total"))
  }

  /** Merge sketches built with the SAME (depth, width) geometry: cell-wise
    * sum. Union + one groupBy — how shard-level sketches compose. */
  def merge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy("d", "bucket").agg(sum("total").as("total"))
  }

  /** Point-estimate the counts of `keys`: min over depth rows of the cell
    * totals. The sketch side is broadcast (it is <= depth*width rows by
    * construction); a LEFT join keeps keys whose cell is empty (true
    * estimate 0) instead of silently dropping them. */
  def cmsEstimate(cms: DataFrame, keys: DataFrame, keyCol: String,
                  depth: Int = 3, width: Int = 1024): DataFrame = {
    val probes = array((0 until depth).map { d =>
      struct(lit(d).as("d"), bucket(col(keyCol), d, width).as("bucket"))
    }: _*)
    keys.select(col("*"), explode(probes).as("p"))
      .join(broadcast(cms),
        col("p.d") === cms("d") && col("p.bucket") === cms("bucket"), "left")
      .groupBy(keys.columns.toIndexedSeq.map(col): _*)
      .agg(min(coalesce(col("total"), lit(0L))).as("est_count"))
  }
}
