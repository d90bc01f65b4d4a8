package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval containment join (point-in-range) — an operator Spark has no
  * native physical plan for: `points JOIN intervals ON t BETWEEN lo AND hi`
  * plans as BroadcastNestedLoopJoin (every point against every interval —
  * quadratic, and the broadcast side must fit whole). Flink and Trino ship
  * dedicated interval-join operators; here the same result comes from
  * composing Spark primitives: bucket time into fixed granules, explode
  * each interval into the granules it covers, hash-equi-join on the
  * granule, and keep exact containment.
  *
  * Why it scales: each POINT carries exactly ONE granule, so the join is a
  * plain hash shuffle on granule with no point-side blowup and NO
  * duplicate pairs to dedup (a matching interval shares the point's own
  * granule exactly once). Interval-side fanout is `span/granule + 1` rows
  * per interval — bounded by `maxGranulesPerInterval` (out-of-contract
  * intervals raise, never silently drop or explode).
  * Pick `granule` near the median interval span: fanout stays O(1) per
  * interval while each granule bucket holds only time-local points —
  * time-skew (everyone active at 9am) lands in distinct granules and AQE
  * splits any residual hot bucket.
  *
  * Timestamps and bounds must be non-negative integers (epoch ms/ns):
  * granule assignment uses integer `div`, whose truncation equals floor
  * only for non-negative values — same semantics as the DuckDB `//` the
  * oracles replay.
  */
object RangeJoin {

  /** Every (point row, interval row) pair with `lo <= t <= hi`, as the
    * cross of both frames' columns (callers disambiguate shared names
    * before the call, standard join hygiene). Intervals with `hi < lo` or
    * spanning more than `maxGranulesPerInterval` granules fail the query
    * loudly (`raise_error`) — a silent drop would be a correctness hole,
    * a silent keep a quadratic one. */
  def pointInInterval(points: DataFrame, tCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      granule: Long,
                      maxGranulesPerInterval: Int = 4096): DataFrame = {
    require(granule >= 1, "need granule >= 1")
    require(maxGranulesPerInterval >= 1, "need maxGranulesPerInterval >= 1")
    val gLo = expr(s"$loCol div ${granule}L")
    val gHi = expr(s"$hiCol div ${granule}L")
    val iv = intervals.withColumn("__granule",
      explode(
        when(col(hiCol) < col(loCol), raise_error(concat(
          lit(s"pointInInterval: interval with hi < lo: "), col(loCol),
          lit(".."), col(hiCol))))
        .when(gHi - gLo + 1 > maxGranulesPerInterval, raise_error(concat(
          lit(s"pointInInterval: interval spans more than " +
            s"$maxGranulesPerInterval granules of $granule: "), col(loCol),
          lit(".."), col(hiCol))))
        .otherwise(sequence(gLo, gHi))))
    points.withColumn("__granule", expr(s"$tCol div ${granule}L"))
      .join(iv, "__granule")
      .filter(col(tCol) >= col(loCol) && col(tCol) <= col(hiCol))
      .drop("__granule")
  }
}
