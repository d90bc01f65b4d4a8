package graft.core

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Dense, deterministic id assignment — the reference's `nc:id`
  * (catalog.py:278-297): a 0-based row number in a stable order.
  *
  * At scale, `row_number().over(Window.orderBy(...))` collapses to a single
  * partition — unusable at 100TB (SURVEY §7.5 #1). This implements the
  * two-phase scheme instead: range-partition by the sort key, count rows per
  * partition, prefix-sum the counts on the driver (one long per partition),
  * then add partition-local offsets. `zipWithIndex` does exactly this under
  * the hood (one extra job for the counts), so we sort + zip.
  *
  * NEVER `monotonically_increasing_id` — not dense, not stable (SURVEY §1.5).
  */
object Ids {

  /** F13 id-prefix chunk planning (reference utils.py:13-54): split a SORTED
    * id list into chunks of [minSize, maxSize] docs, preferring to break
    * where adjacent ids share the shortest common prefix — so each chunk
    * spans a compact id-prefix range (good for partition pruning on id).
    * Driver-side planning over the (small) id list, like the reference. */
  def prefixChunks(sortedIds: IndexedSeq[String], minSize: Int = 256,
                   maxSize: Int = 16384): Seq[IndexedSeq[String]] = {
    require(minSize >= 1 && maxSize >= minSize, "need 1 <= minSize <= maxSize")
    def commonPrefix(a: String, b: String): Int =
      a.zip(b).takeWhile { case (x, y) => x == y }.size
    val chunks = Seq.newBuilder[IndexedSeq[String]]
    var start = 0
    while (start < sortedIds.length) {
      val remaining = sortedIds.length - start
      if (remaining <= maxSize) {
        chunks += sortedIds.slice(start, sortedIds.length)
        start = sortedIds.length
      } else {
        // best break in [start+minSize, start+maxSize]: smallest shared
        // prefix between the ids on either side of the cut (first wins).
        var best = start + maxSize
        var bestPrefix = Int.MaxValue
        var i = start + minSize
        while (i <= start + maxSize && i < sortedIds.length) {
          val p = commonPrefix(sortedIds(i - 1), sortedIds(i))
          if (p < bestPrefix) { bestPrefix = p; best = i }
          i += 1
        }
        chunks += sortedIds.slice(start, best)
        start = best
      }
    }
    chunks.result()
  }

  /** Append a dense `nc:id: long` numbered 0.. in ascending `orderCol`
    * order. Deterministic across runs given equal input data. */
  def assignDense(df: DataFrame, orderCol: String = "@id",
                  idName: String = "nc:id"): DataFrame =
    denseRankBy(df, Seq(df(orderCol)), idName)

  /** The general two-phase global rank: append `idName: long` numbered 0..
    * in `sortExprs` order (any mix of asc/desc columns; make the order
    * TOTAL — include a unique tie-break column — for run-identical ids).
    * Range-partition by the sort key, sort within partitions, then
    * `zipWithIndex` (per-partition counts prefix-summed on the driver —
    * one long per partition). Replaces `row_number() OVER (ORDER BY ...)`,
    * whose single-partition window is the classic 100 TB scale-killer.
    *
    * NOTE: `zipWithIndex` computes its partition offsets EAGERLY (one
    * job at construction time), so calling this runs the upstream plan.
    * The sorted RDD is `localCheckpoint`ed so the offset pass and the
    * downstream action(s) share ONE execution of the aggregate + range
    * shuffle + sort. Deliberately NOT `persist`/CacheScope: a persisted
    * DataFrame registers its plan in the session CacheManager, where any
    * IDENTICAL later plan (same source path) silently reuses the cached
    * rows — serving stale data after the underlying file changes and
    * breaking the corpus cache's staleness contract (CorpusSpec caught
    * exactly that). RDD-level checkpoint blocks bypass plan matching and
    * are freed by the ContextCleaner once the RDD is unreachable. */
  def denseRankBy(df: DataFrame, sortExprs: Seq[org.apache.spark.sql.Column],
                  idName: String): DataFrame = {
    val sorted = df.repartitionByRange(
        df.sparkSession.sessionState.conf.numShufflePartitions, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(idName, LongType, nullable = false))
    val rdd = sorted.rdd.localCheckpoint().zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ idx)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
