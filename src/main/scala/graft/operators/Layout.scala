package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout keys for multi-dimensional file skipping.
  *
  * A 100 TB table is pruned or scanned at the granularity of parquet
  * row-group min/max statistics. Sorting by ONE key gives tight stats on
  * that key only; interleaving the bits of SEVERAL keys (Morton / Z-order)
  * gives every participating dimension locality in every file, so a filter
  * on ANY of them skips most row groups. This is the standard layout
  * optimization (Delta/Iceberg `ZORDER BY`), expressed here as a plain
  * deterministic column: `repartitionByRange + sortWithinPartitions` on
  * [[zorderKey]] IS the clustered write.
  *
  * Pure bit arithmetic (shift/and/or on longs) — row-local, codegen'd,
  * engine-stable, SQL-replayable (`q_zorder` oracle).
  */
object Layout {

  /** Morton key: interleave the low `bitsPer` bits of each column —
    * bit `i` of column `j` lands at position `i * n + j`. Columns are
    * masked to `bitsPer` bits first (values are expected non-negative;
    * callers with wider domains pre-bucket, e.g. `col / range * 2^bits`).
    * n * bitsPer must fit a signed long. */
  def zorderKey(cols: Seq[Column], bitsPer: Int = 16): Column = {
    val n = cols.size
    require(n >= 1, "need at least one column")
    require(bitsPer >= 1 && n * bitsPer <= 63, "need 1 <= n*bitsPer <= 63")
    val terms = for {
      i <- 0 until bitsPer
      j <- 0 until n
    } yield shiftleft(
      shiftright(cols(j).cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ + _) // disjoint bit positions: + == bitwise or
  }

  /** Hilbert key over two columns: the gap-free space-filling curve (see
    * [[graft.plans.HilbertIndex2D]] — a native codegen'd expression because
    * the walk is stateful). Same masking contract as [[zorderKey]]; output
    * in `[0, 4^bits)`. Prefer over z-order when BOTH dimensions are
    * range-filtered often: Morton's quadrant jumps widen row-group min/max
    * bounds, Hilbert's adjacency keeps them tight. */
  def hilbertKey(x: Column, y: Column, bits: Int = 16): Column =
    graft.plans.LayoutExpressions.hilbertXy2d(
      x.cast("long"), y.cast("long"), bits)

  /** Cluster a frame for multi-dimensional skipping: range-partition by the
    * z-order key and sort within partitions, so a subsequent parquet write
    * yields row groups tight in EVERY interleaved dimension. `partitions`
    * sizes the output files; the sort is the only shuffle. */
  def clusterByZorder(df: DataFrame, keys: Seq[String], partitions: Int,
                      bitsPer: Int = 16): DataFrame =
    clusterBy(df, zorderKey(keys.map(col), bitsPer), partitions)

  /** [[clusterByZorder]]'s Hilbert twin for 2-D keys. */
  def clusterByHilbert(df: DataFrame, xKey: String, yKey: String,
                       partitions: Int, bits: Int = 16): DataFrame =
    clusterBy(df, hilbertKey(col(xKey), col(yKey), bits), partitions)

  private def clusterBy(df: DataFrame, key: Column, partitions: Int): DataFrame =
    df.withColumn("__ckey", key)
      .repartitionByRange(partitions, col("__ckey"))
      .sortWithinPartitions("__ckey")
      .drop("__ckey")
}
