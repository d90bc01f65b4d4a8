package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark lacks natively (SURVEY §2.3: none in the
  * reference either; this is an engine extension validated against DuckDB's
  * native ASOF JOIN).
  *
  * Semantics: for every left row, attach the single right row with the same
  * key and the greatest right.ts <= left.ts (inclusive), or nulls when no
  * such row exists.
  *
  * Implementation: the classic distributed formulation — tag both sides,
  * union, and run a `last_value(..., ignoreNulls)` window ordered by
  * (ts, side) per key. ONE hash shuffle on the key (the same exchange a
  * plain equi-join would need), no range explosion, no broadcast
  * requirement — this is the shape that survives 100TB on both sides.
  * Right rows sort BEFORE left rows at equal ts so the inclusive bound
  * holds.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its `valueCols` are attached)
    * @param key       equi-join key column name (both sides)
    * @param ts        ordering column name (both sides, numeric or
    *                  timestamp; ties within a side broken by its value)
    * @param valueCols right columns to carry; emitted as `asof_<name>`
    */
  def asofLeft(left: DataFrame, right: DataFrame, key: String, ts: String,
               valueCols: Seq[String],
               rightTieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns
    // side 0 = right, side 1 = left: right wins ordering at equal ts.
    val taggedRight = right.select(
      col(key) +: col(ts).as("__ts") +: lit(0).as("__side") +:
        valueCols.map(c => col(c).as(s"asof_$c")) ++:
        leftCols.toSeq.filterNot(c => c == key).map(c => lit(null).cast(
          left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      col(key) +: col(ts).as("__ts") +: lit(1).as("__side") +:
        valueCols.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"asof_$c")) ++:
        leftCols.toSeq.filterNot(c => c == key).map(col): _*)
    // deterministic choice among right rows sharing (key, ts): the largest
    // tie-break value wins (nulls — the left rows — sort first)
    val order = Seq(col("__ts"), col("__side")) ++
      rightTieBreak.map(c => col(s"asof_$c").asc_nulls_first)
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(taggedRight.unionByName(taggedLeft)) {
      (df, c) => df.withColumn(s"asof_$c",
        last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col).toSeq ++ valueCols.map(c => col(s"asof_$c")): _*)
  }
}
