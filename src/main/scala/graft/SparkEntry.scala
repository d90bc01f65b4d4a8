package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled in [[Queries]]; each entry is one
  * operator from SURVEY §2 or a training-data-pipeline extension, with a
  * DuckDB oracle where the semantics are SQL-expressible.
  */
object SparkEntry {

  /** Flagship query (SURVEY §7.3's "whale counts" shape): per-document counts
    * of one token, joined with document metadata, most-frequent first. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    operators.TextOps.unigrams(docs)
      .filter(col("token") === "data")
      .join(docs.select(col("doc_id"), col("lang"), col("source")), Seq("doc_id"))
      .orderBy(desc("count"), asc("doc_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
