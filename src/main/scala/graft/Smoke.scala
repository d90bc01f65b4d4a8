package graft

import org.apache.spark.sql.SparkSession

/** Local stand-in for the driver's t1 smoke: builds a plain session (no
  * special confs — entry must not depend on any) and checks entry rows>0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      // size(null) = null, matching DuckDB len() (default -1 would desync
      // any size() over a null text from the oracles)
      .config("spark.sql.legacy.sizeOfNull", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(5, false)
    println(s"SMOKE rows=${df.count()}")
    spark.stop()
  }
}
