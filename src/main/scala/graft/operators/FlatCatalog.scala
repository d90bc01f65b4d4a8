package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequency-ordered dictionary encoding and 1NF "flat catalog" export —
  * the reference's A9/A10 (catalog.py:375-402, metadata.py:112-182).
  *
  * Spark has no dictionary column type (Parquet dict-encodes physically), so
  * the logical design is carried explicitly: per low-cardinality column a
  * `<name>Lookup` table (value, count, id) with ids dense in descending
  * frequency (ties broken by value), and a `fastcat` projection where each
  * dictionary column is replaced by `<name>__id`.
  */
object FlatCatalog {

  /** Lookup table for one column: (value, count, id); id 0.. by freq desc,
    * value asc tie-break. The rank runs over the distinct-value table
    * (cardinality-bounded), not the corpus, and uses the two-phase
    * range-partitioned scheme (`Ids.denseRankBy`) — no single-partition
    * window even for high-cardinality dictionaries. */
  def dictionary(df: DataFrame, colName: String): DataFrame =
    graft.core.Ids.denseRankBy(
      df.groupBy(col(colName).as("value")).agg(count(lit(1)).as("count")),
      Seq(desc("count"), asc("value")), "id")

  /** fastcat: numeric-only projection — id column plus each dictionary
    * column replaced by its dense id via broadcast join (A10's
    * ints-and-dict-indices table, metadata.py:148-182). */
  def fastcat(df: DataFrame, idCol: String, dictCols: Seq[String]): DataFrame =
    dictCols.foldLeft(df.select((idCol +: dictCols).map(col): _*)) { (acc, c) =>
      acc.join(broadcast(dictionary(df, c).select(
          col("value").as(c), col("id").as(s"${c}__id"))), Seq(c), "left")
        .drop(c)
    }

  /** Flat-catalog child table for a list column: (idCol, value) exploded
    * (metadata.py:152-155). */
  def listChild(df: DataFrame, idCol: String, listCol: String): DataFrame =
    df.select(col(idCol), explode(col(listCol)).as("value"))

  /** Narrowest signed index type holding `cardinality` dictionary ids —
    * the reference's dict_encode width ladder (catalog.py:506-513:
    * int8 below 2^7, int16 below 2^15, else int32; int64 beyond that).
    * Ids stay logical longs in memory; the narrowing is applied at the
    * flat-catalog sink so the parquet carries the compact physical type. */
  def indexType(cardinality: Long): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    if (cardinality < (1L << 7)) ByteType
    else if (cardinality < (1L << 15)) ShortType
    else if (cardinality < (1L << 31)) IntegerType
    else LongType
  }
}
