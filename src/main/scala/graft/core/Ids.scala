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

  /** Append a dense `nc:id: long` numbered 0.. in ascending `orderCol`
    * order. Deterministic across runs given equal input data. */
  def assignDense(df: DataFrame, orderCol: String = "@id",
                  idName: String = "nc:id"): DataFrame = {
    val sorted = df.repartitionByRange(df.sparkSession.sessionState.conf.numShufflePartitions,
        df(orderCol))
      .sortWithinPartitions(orderCol)
    val schema = StructType(sorted.schema.fields :+ StructField(idName, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ idx)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
