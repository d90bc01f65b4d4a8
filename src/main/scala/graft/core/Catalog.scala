package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Metadata-catalog construction (reference: nonconsumptive/catalog.py).
  *
  * Pipeline: ingest (csv / ndjson / parquet) -> id-field inference ->
  * duplicate-id audit -> per-column "best form" type normalization ->
  * dense `nc:id` assignment. The reference's best_form ladder
  * (catalog.py:455-493) is reproduced as ONE stats-gathering aggregate job
  * over all columns followed by a single cast projection — the analysis is
  * distributed, only the (columns x few stats) result touches the driver.
  */
object Catalog {

  /** Id-field preference, reference catalog.py:525-535. */
  val IdCandidates = Seq("@id", "id", "filename")

  /** Normalize a time column to epoch NANOS as BIGINT, whatever the source
    * precision: ns-precision parquet already reads as a long (nanosAsLong
    * fallback) and passes through; timestamp/timestamp_ntz columns convert
    * via unix_micros * 1000 (with the session tz pinned to UTC the NTZ wall
    * clock IS the epoch, so this matches DuckDB's epoch_ms() on the same
    * file). Integer time math downstream then has ONE contract regardless
    * of how the writer chose to encode time. */
  def epochNanos(df: DataFrame, colName: String): DataFrame =
    df.schema(colName).dataType match {
      case LongType => df
      case _: TimestampType =>
        // instant-typed: unix_micros is timezone-independent
        df.withColumn(colName, unix_micros(col(colName)) * lit(1000L))
      case _: TimestampNTZType =>
        // wall-clock typed: the cast to TimestampType interprets the wall
        // clock in the session tz, so "NTZ wall clock == UTC epoch" (the
        // contract DuckDB's epoch on the same file uses) only holds under
        // UTC sessions — enforce rather than silently offset.
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"$colName: TIMESTAMP_NTZ→epoch-nanos requires " +
            s"spark.sql.session.timeZone=UTC (got $tz)")
        df.withColumn(colName,
          unix_micros(col(colName).cast(TimestampType)) * lit(1000L))
      case other => throw new IllegalArgumentException(
        s"$colName: cannot normalize ${other.simpleString} to epoch nanos")
    }

  final case class ColumnPlan(
      name: String,
      target: DataType,
      asDate: Boolean,
      dictionary: Boolean)

  // ------------------------------------------------------------- ingest

  /** S5: CSV with header, types inferred (gz transparent). */
  def loadCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S4: NDJSON. Spark resolves the reference's string-vs-array conflicts
    * (catalog.py:84-109) natively: a column that is sometimes scalar and
    * sometimes array infers as string holding the JSON form. We replicate
    * the reference's normalization (wrap scalars as 1-lists) in
    * [[normalizeJsonListColumns]]. */
  def loadNdjson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** S6/S7: parquet catalog or bookstack directory. */
  def loadParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC catalog (columnar-format parity beyond the reference's
    * feather/parquet pair — same downstream pipeline). */
  def loadOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Dispatch by extension (catalog.py:204-214). */
  def load(spark: SparkSession, path: String): DataFrame = path match {
    case p if p.endsWith(".csv") || p.endsWith(".csv.gz") => loadCsv(spark, p)
    case p if p.endsWith(".ndjson") || p.endsWith(".json") ||
      p.endsWith(".ndjson.gz") || p.endsWith(".json.gz") => loadNdjson(spark, p)
    case p if p.endsWith(".orc") => loadOrc(spark, p)
    case p => loadParquet(spark, p)
  }

  /** S8 `MessyParquetCorpus` pre-clean (catalog.py:51-79): a directory of
    * parquet files whose schemas drifted across files. True type conflicts
    * (int vs string) break `mergeSchema`, so — like the reference — each
    * file is resolved FIRST (cast map applied per file), then unioned by
    * name with missing columns as null. Driver loops over file schemas;
    * data reads stay distributed. */
  def loadMessyParquet(spark: SparkSession, dir: String,
                       castMap: Map[String, DataType]): DataFrame = {
    // Hadoop FS listing so messy directories resolve on any scheme
    // (hdfs://, s3a://), not only the local filesystem.
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"no parquet files under $dir")
    files.map { f =>
      val df = spark.read.parquet(f)
      val cols = df.schema.fields.map { fl =>
        castMap.get(fl.name) match {
          case Some(t) if t != fl.dataType => col(s"`${fl.name}`").cast(t).as(fl.name)
          case _ => col(s"`${fl.name}`")
        }
      }
      df.select(cols.toSeq: _*)
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** The reference's list-wrap recovery (catalog.py:544-557): for a column
    * that should be a list but was inferred scalar-or-JSON-string, produce a
    * proper array column (scalars become 1-element lists). A value that
    * merely STARTS with '[' but is not valid JSON ("[sic] quoted") is a
    * scalar — it falls back to the 1-element wrap instead of being nulled
    * by the failed parse. */
  def normalizeJsonListColumns(df: DataFrame, listCols: Seq[String]): DataFrame =
    listCols.foldLeft(df) { (acc, c) =>
      val parsed = from_json(col(c), ArrayType(StringType))
      acc.withColumn(c,
        when(col(c).isNull, lit(null).cast(ArrayType(StringType)))
          .when(col(c).startsWith("["), coalesce(parsed, array(col(c))))
          .otherwise(array(col(c))))
    }

  /** Auto-detection of string<->array conflicted NDJSON columns (the
    * reference discovers them via error-recovery re-parse,
    * catalog.py:314-322,544-557). Spark's JSON inference resolves a column
    * that is sometimes scalar and sometimes array to StringType, and the
    * array-shaped rows keep their raw JSON text (`["a","b"]`) — so one
    * distributed aggregate counting bracketed-and-parseable values per
    * string column finds every conflicted column; no caller hints needed.
    * The parse check (`from_json` non-null) keeps prose that merely starts
    * with '[' from being misdetected, and a column is only flagged when at
    * least `minListFraction` of its non-null values are list-shaped — one
    * JSON-looking scalar buried in a free-text column must NOT flip the
    * whole column's type data-dependently. Auto-converted columns are
    * logged so a schema change is always visible in the build log. */
  def detectListColumns(df: DataFrame,
                        minListFraction: Double = 0.05): Seq[String] = {
    val cand = df.schema.fields
      .filter(f => f.dataType == StringType && f.name != "@id")
    if (cand.isEmpty) return Seq.empty
    val aggCols = cand.flatMap { f =>
      val c = col(s"`${f.name}`")
      val isListForm = c.rlike("^\\[.*\\]$") &&
        from_json(c, ArrayType(StringType)).isNotNull
      Seq(sum(when(isListForm, 1L).otherwise(0L)).as(f.name + "\u0000list"),
        sum(when(c.isNotNull, 1L).otherwise(0L)).as(f.name + "\u0000nn"))
    }
    val row = df.agg(aggCols.head, aggCols.tail.toSeq: _*).collect()(0)
    val flagged = cand.map(_.name).filter { n =>
      val listN = Option(row.getAs[java.lang.Long](n + "\u0000list"))
        .map(_.toLong).getOrElse(0L)
      val nonNull = Option(row.getAs[java.lang.Long](n + "\u0000nn"))
        .map(_.toLong).getOrElse(0L)
      listN > 0 && nonNull > 0 && listN.toDouble / nonNull >= minListFraction
    }.toSeq
    if (flagged.nonEmpty)
      org.slf4j.LoggerFactory.getLogger("graft.Catalog").info(
        "auto-converting string columns to list: " + flagged.mkString(", "))
    flagged
  }

  // ------------------------------------------------------- id inference

  /** Choose and normalize the id column: first candidate present, else the
    * first column; cast to string and renamed `@id`
    * (catalog.py:459-461,525-535). */
  def inferIdField(df: DataFrame): String =
    IdCandidates.find(df.columns.contains).getOrElse(df.columns.head)

  def withId(df: DataFrame): DataFrame = {
    val idField = inferIdField(df)
    df.withColumn("@id", col(s"`$idField`").cast(StringType))
      .drop((if (idField == "@id") Seq.empty else Seq(idField)): _*)
  }

  /** A11 duplicate-id audit (catalog.py:248-250): fail fast on duplicates. */
  def assertUniqueIds(df: DataFrame): Unit = {
    val dups = df.groupBy("@id").count().filter(col("count") > 1).limit(5)
      .collect().map(_.getString(0))
    require(dups.isEmpty,
      s"duplicate @id values in catalog: ${dups.mkString(", ")} ...")
  }

  // --------------------------------------------------- best-form ladder

  private val DateRegex = "^[0-9]{3,4}-[0-1]?[0-9]-[0-3]?[0-9]$"

  /** One pass of per-column statistics driving the cast plan: min/max (for
    * integer narrowing), distinct counts (dictionary gating), date-pattern
    * match ratio (the reference's 95% heuristic, catalog.py:363-368). */
  def planColumns(df: DataFrame, dictThreshold: Double = 0.5): Seq[ColumnPlan] = {
    val n = math.max(df.count(), 1L)
    val statCols = df.schema.fields.flatMap { f =>
      val c = col(s"`${f.name}`")
      f.dataType match {
        case _: LongType | _: IntegerType | _: ShortType | _: ByteType => Seq(
          min(c).cast(LongType).as(s"${f.name}__min"),
          max(c).cast(LongType).as(s"${f.name}__max"))
        case _: StringType => Seq(
          approx_count_distinct(c).as(s"${f.name}__dist"),
          avg(c.rlike(DateRegex).cast(IntegerType)).as(s"${f.name}__date"))
        case _ => Seq.empty
      }
    }
    if (statCols.isEmpty) return df.schema.fields.map(f =>
      ColumnPlan(f.name, f.dataType, asDate = false, dictionary = false)).toSeq
    val stats = df.agg(statCols.head, statCols.tail.toSeq: _*).collect()(0)
    df.schema.fields.map { f =>
      f.dataType match {
        case _: LongType | _: IntegerType | _: ShortType | _: ByteType =>
          val lo = Option(stats.getAs[java.lang.Long](s"${f.name}__min"))
            .map(_.longValue).getOrElse(0L)
          val hi = Option(stats.getAs[java.lang.Long](s"${f.name}__max"))
            .map(_.longValue).getOrElse(0L)
          // narrowest signed integer type that fits (catalog.py:335-348;
          // Spark has no unsigned types, SURVEY §1.3)
          val t =
            if (lo >= Byte.MinValue && hi <= Byte.MaxValue) ByteType
            else if (lo >= Short.MinValue && hi <= Short.MaxValue) ShortType
            else if (lo >= Int.MinValue && hi <= Int.MaxValue) IntegerType
            else LongType
          ColumnPlan(f.name, t, asDate = false, dictionary = false)
        case _: DoubleType =>
          // reference coerces inferred floats to float32 (catalog.py:467-473)
          ColumnPlan(f.name, FloatType, asDate = false, dictionary = false)
        case _: TimestampType | _: TimestampNTZType =>
          // F6 timestamp -> date coercion (catalog.py:353-360)
          ColumnPlan(f.name, DateType, asDate = false, dictionary = false)
        case _: StringType if f.name != "@id" =>
          val dateRatio = Option(stats.getAs[java.lang.Double](s"${f.name}__date"))
            .map(_.doubleValue).getOrElse(0.0)
          val dist = stats.getAs[Long](s"${f.name}__dist")
          if (dateRatio > 0.95)
            ColumnPlan(f.name, DateType, asDate = true, dictionary = false)
          else
            ColumnPlan(f.name, StringType, asDate = false,
              dictionary = dist.toDouble / n < dictThreshold)
        case other => ColumnPlan(f.name, other, asDate = false, dictionary = false)
      }
    }.toSeq
  }

  /** Apply a column plan: one cast projection (dates via lenient
    * `to_date(_, yyyy-M-d)`, catalog.py:365-366). Dictionary columns stay
    * strings logically (SURVEY §1.3) — their lookup tables come from
    * [[graft.operators.FlatCatalog]]. */
  def applyPlan(df: DataFrame, plan: Seq[ColumnPlan]): DataFrame = {
    val cols = plan.map { p =>
      val c = col(s"`${p.name}`")
      val cast =
        if (p.asDate) to_date(c, "y-M-d")
        else if (p.target != df.schema(p.name).dataType) c.cast(p.target)
        else c
      cast.as(p.name)
    }
    df.select(cols: _*)
  }

  /** Full catalog build: ingest -> id -> audit -> best-form -> `nc:id`.
    * Returns the normalized catalog with a dense `nc:id` ordered by `@id`.
    * For NDJSON sources, string<->array conflicted columns are detected
    * automatically ([[detectListColumns]]) and list-normalized; `listCols`
    * adds caller-known columns on top (needed for CSV, where bracketed text
    * is not evidence of a list). */
  def build(spark: SparkSession, path: String,
            listCols: Seq[String] = Seq.empty): DataFrame = {
    val raw0 = withId(load(spark, path))
    val isJson = Seq(".ndjson", ".json", ".ndjson.gz", ".json.gz")
      .exists(path.endsWith)
    val auto = if (isJson) detectListColumns(raw0) else Seq.empty
    val raw = normalizeJsonListColumns(raw0, (listCols ++ auto).distinct)
    assertUniqueIds(raw)
    val normalized = applyPlan(raw, planColumns(raw))
    Ids.assignDense(normalized, "@id")
  }

  /** Names of plan columns flagged as dictionary-encodable — callers build
    * the `<name>Lookup` tables via FlatCatalog.dictionary. */
  def dictionaryColumns(plan: Seq[ColumnPlan]): Seq[String] =
    plan.filter(_.dictionary).map(_.name)

  /** A8/F14 per-field stats metadata (catalog.py:408-428): the reference's
    * quantile ladder for numeric fields and top-10 values for strings,
    * attached as JSON in each StructField's metadata (the Spark analog of
    * Arrow field metadata). One aggregate job for all numeric columns + one
    * small top-k job per string column. */
  val StatsQuantiles: Seq[Double] = Seq(0, .005, .05, .25, .5, .75, .95, .995, 1)

  def withStatsMetadata(df: DataFrame): DataFrame = {
    val numeric = df.schema.fields.filter(_.dataType match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
           _: FloatType | _: DoubleType => true
      case _ => false
    })
    // exact percentile, matching the reference's pc.quantile
    // (catalog.py:408-418) — approx would drift from any cross-engine check
    val qCols = numeric.map(f => percentile(col(s"`${f.name}`"),
      lit(StatsQuantiles.toArray)).as(f.name))
    val quantiles: Map[String, Seq[Double]] =
      if (qCols.isEmpty) Map.empty
      else {
        val row = df.agg(qCols.head, qCols.tail.toSeq: _*).collect()(0)
        numeric.map(f => f.name -> Option(row.getAs[scala.collection.Seq[Any]](f.name))
          .map(_.map(v => Option(v).map(_.toString.toDouble).getOrElse(Double.NaN)).toSeq)
          .getOrElse(Seq.empty)).toMap
      }
    val strings = df.schema.fields.filter(_.dataType == StringType)
      .filter(_.name != "@id")
    val topValues: Map[String, Seq[String]] = strings.map { f =>
      f.name -> df.groupBy(col(s"`${f.name}`")).count()
        .orderBy(desc("count"), col(s"`${f.name}`"))
        .limit(10).collect().map(r => Option(r.get(0)).map(_.toString).getOrElse(""))
        .toSeq
    }.toMap
    val fields = df.schema.fields.map { f =>
      val mb = new MetadataBuilder().withMetadata(f.metadata)
      quantiles.get(f.name).filter(_.nonEmpty)
        .foreach(q => mb.putDoubleArray("quantiles", q.toArray))
      topValues.get(f.name)
        .foreach(tv => mb.putStringArray("top_values", tv.toArray))
      mb.putString("nonconsumptive", "0.1.0") // version tag (catalog.py:259-260)
      f.copy(metadata = mb.build())
    }
    df.sparkSession.createDataFrame(df.rdd, StructType(fields))
  }

  /** Columnar dataset profile — the "dataset card" summary row per column:
    * (column, n_rows, n_nulls, n_distinct), exact. One aggregate job: the
    * multi-countDistinct expands the input (2 rows per column per input
    * row pre-shuffle — the standard exact-profiling cost; swap in HLL
    * sketches via [[graft.operators.Sketches]] when approximate is
    * acceptable at the 100 TB end). Output is column-count geometry,
    * built on the driver like any stats row. */
  def profile(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    // space-embedded agg aliases: cannot collide with the profiled table's
    // own column names in `row` (same idea as detectListColumns above)
    val aggs = df.columns.flatMap(c => Seq(
      sum(when(col(s"`$c`").isNull, 1L).otherwise(0L)).as(c + " nulls"),
      countDistinct(col(s"`$c`")).as(c + " distinct"))).toSeq
    val row = df.agg(count(lit(1)).as(" n"), aggs: _*).collect()(0)
    val n = row.getAs[Long](" n")
    df.columns.toSeq.map(c => (c, n, row.getAs[Long](c + " nulls"),
        row.getAs[Long](c + " distinct")))
      .toDF("column", "n_rows", "n_nulls", "n_distinct")
      .orderBy("column")
  }
}
