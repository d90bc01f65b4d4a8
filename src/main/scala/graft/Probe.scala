package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main used while developing: probes Spark behaviors that the
  * oracle parity depends on (ns timestamps, regex, conv, higher-order fns).
  * Not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 1. ns timestamps in events
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.printSchema()
      ev.select(col("ts"), unix_millis(col("ts")).as("ms")).show(3, false)
    } catch { case e: Throwable => println("EVENTS ERR: " + e.getMessage.take(300)) }

    // 2. lineitem shipdate type + compare
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.printSchema()
    li.select(min("l_shipdate"), max("l_shipdate")).show(false)
    println("filter count: " + li.filter(col("l_shipdate") < lit("1999-01-01")).count())

    // 3. regex + conv + tokens
    val df = Seq(("Hello, мир! 42 foo_bar")).toDF("text")
    df.select(regexp_extract_all(col("text"), lit("[\\p{L}]+"), lit(0))).show(false)
    df.select(conv(substring(md5(lit("abc")), 1, 15), 16, 10).cast("long")).show(false)

    // 4. higher-order dot product
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    e.printSchema()
    e.select(aggregate(zip_with(col("embedding"), col("embedding"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (a, v) => a + v)).show(3, false)

    // 5. decimal arithmetic
    li.select(sum((col("l_extendedprice").cast("decimal(18,2)") *
      lit(1.0).minus(col("l_discount")).cast("decimal(18,4)"))).as("rev")).show(false)

    // 6. percentile exact
    li.select(percentile(col("l_quantity"), lit(0.5)).as("p50")).show(false)

    // 7. sequence guard
    Seq(Seq("a"), Seq("a","b","c")).toDF("toks")
      .select(when(size(col("toks")) >= 2,
        transform(sequence(lit(1), size(col("toks")) - lit(1)),
          i => slice(col("toks"), i, lit(2)))).otherwise(array()).as("ng")).show(false)
    spark.stop()
  }
}
