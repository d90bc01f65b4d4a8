package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.plans.TopKAggregator

/** Grouped top-k without the window shuffle: see
  * [[graft.plans.TopKAggregator]] — at most k (value, id) pairs per group
  * leave each partition, vs the window formulation shuffling every row.
  */
object TopK {

  /** Top-`k` rows per group by (valueCol DESC, idCol ASC): output
    * (groupCols..., rank, idCol, valueCol) with rank 1..k. Ids and values
    * must be integral (cast to long); null ids/values are dropped — rank
    * semantics over nulls are the caller's call, not a silent order. */
  def topKByGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
                  valueCol: String, k: Int): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val agg = udaf(new TopKAggregator.TopKAgg(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    val packed = df
      .filter(col(idCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col(valueCol).cast("long"), col(idCol).cast("long"))
        .as("packed"))
    // unpack [v, id, ...] -> one row per pair; a group always holds >= 1
    // pair (it exists because at least one non-null row reduced into it)
    val n = (size(col("packed")) / 2).cast("int")
    val pairs = transform(sequence(lit(1), n), i =>
      struct(element_at(col("packed"), i * 2 - 1).as("value"),
        element_at(col("packed"), i * 2).as("id")))
    packed
      .select(groupCols.map(col) :+ posexplode(pairs).as(Seq("pos", "e")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).cast("long").as("rank"),
        col("e.id").as(idCol), col("e.value").as(valueCol)): _*)
  }
}
