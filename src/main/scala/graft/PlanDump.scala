package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev utility for optimization rounds: dump the `.explain("formatted")`
  * output of NAMED registry queries to individual files —
  * `runMain graft.PlanDump <outDir> <suffix> <sfDir> <name...>` writes
  * `<outDir>/<name>_<suffix>.txt` per query. Same session confs as
  * [[Plans]] so the dumps are comparable round over round.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <outDir> <suffix> <sfDir> <name...>")
    val Array(outDir, suffix, dir) = args.take(3)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.legacy.sizeOfNull", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    for (name <- args.drop(3)) {
      try {
        val txt = Queries.queries(name)(spark, dir)
          .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
          .flatMap(c => if (c < ' ' && c != '\n' && c != '\t')
            f"\\u${c.toInt}%04x" else c.toString)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        println(s"[plandump] $outDir/${name}_$suffix.txt")
      } finally graft.core.CacheScope.release()
    }
    spark.stop()
  }
}
