package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      // config-based extension injection — the deployment route; proves the
      // SQL function surface loads without code access to the builder
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // size(null) = null, matching DuckDB len() (default -1 would desync
      // any size() over a null text from the oracles)
      .config("spark.sql.legacy.sizeOfNull", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  val fixtures: String = new java.io.File("src/test/resources").getAbsolutePath
}
