package graft.core

import org.apache.spark.sql.DataFrame

/** Co-located storage for repeated equi-joins — Spark's bucketing.
  *
  * At 100TB, a join that runs more than once on the same key should never
  * shuffle more than once: write both sides `bucketBy(n, key).sortBy(key)`
  * and every later join/aggregation on that key reads co-located,
  * pre-sorted buckets — the physical plan is a SortMergeJoin with NO
  * Exchange on either side (asserted in BucketingSpec). This is the batch
  * analog of the reference's per-bookstack file alignment, done the way a
  * cluster does it.
  *
  * Bucket counts should be sized so one bucket of the LARGER table fits an
  * executor's memory comfortably (e.g. 100TB / 4096 buckets ≈ 24GB — too
  * big; pick 32k+ buckets at that scale; testdata uses single digits).
  */
object Bucketing {

  /** Write `df` as a bucketed + per-bucket-sorted external table. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.write.mode("overwrite").option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Read a bucketed table back (bucket metadata comes from the catalog —
    * a plain `spark.read.parquet(path)` would NOT know the bucketing). */
  def readBucketed(spark: org.apache.spark.sql.SparkSession,
                   table: String): DataFrame = spark.table(table)

  /** Run `f` with auto-disabling of bucketed scans turned OFF — Spark
    * silently demotes a bucketed scan to size-packed file splits when no
    * join/aggregate "needs" the distribution, which breaks bucket-aligned
    * rewrites (compaction wants one task per bucket so the bucketBy write
    * emits one file per bucket with no shuffle). Session-scoped conf flip,
    * restored on exit. */
  def withForcedBucketedScan[T](spark: org.apache.spark.sql.SparkSession)
                               (f: => T): T = {
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try f finally spark.conf.set(key, prev)
  }
}
