package graft

/** Dev utility: run ONE registry query against a testdata dir and show a
  * sample — `runMain graft.RunQuery <query_name> <sfDir>`. The session
  * mirrors Verify's confs so a query that works here works there. */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.legacy.sizeOfNull", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Queries.queries(args(0))(spark, args(1))
    df.show(10)
    println(s"rows=${df.count()}")
    graft.core.CacheScope.release()
    spark.stop()
  }
}
