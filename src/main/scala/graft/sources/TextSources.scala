package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-corpus inputs (reference: nonconsumptive/inputs.py). Every source
  * yields the same canonical shape: `(@id: string, text: string)` — one row
  * per document. Order is NEVER relied upon downstream; dense ids are
  * assigned explicitly by [[graft.core.Ids]] over sorted `@id`
  * (SURVEY §1.5: reference's positional alignment becomes explicit joins).
  */
object TextSources {

  /** S1 `FolderInput` (inputs.py:100-149): a directory tree of `{id}.txt` or
    * `{id}.txt.gz` files at any nesting; id = base filename minus
    * txt/gz suffixes. Spark's text source decompresses .gz transparently and
    * `wholetext` gives one row per file; `input_file_name()` recovers the id
    * (the reference's sorted-walk order is irrelevant here — see Ids).
    */
  /** Memo of the empty-file recovery listing, keyed by (dir, format,
    * fingerprint). The recursive status scan is driver-side and runs on
    * top of Spark's own InMemoryFileIndex listing; for a corpus of
    * millions of files re-walking + name-processing the tree on EVERY
    * folder() call doubles the driver's listing cost, so the result
    * (bounded by the number of EMPTY files, never the corpus size) is
    * memoized. The key carries a CONTENT-SUMMARY FINGERPRINT
    * (fileCount, directoryCount, total length — one metadata-only pass,
    * no name regexing, no status object retention) so the cache
    * SELF-INVALIDATES when the tree changes (ADVICE r10): a
    * late-arriving or deleted empty file changes fileCount, a filled or
    * emptied file changes length — the main scan and the empty-file
    * recovery can no longer desync mid-session. `refreshEmptyScan =
    * true` still forces a re-walk (belt: a same-name same-size swap of
    * one empty file for another is fingerprint-invisible). Stale
    * fingerprints' entries are dropped on replacement, so the map holds
    * one entry per (dir, format). */
  private val emptyScanCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), ((Long, Long, Long), Seq[String])]()

  def folder(spark: SparkSession, dir: String, format: String = "txt",
             refreshEmptyScan: Boolean = false): DataFrame = {
    def idFromPath(c: org.apache.spark.sql.Column) =
      regexp_replace(regexp_extract(c, "([^/]+)$", 1), s"\\.$format(\\.gz)?$$", "")
    val raw = spark.read.option("wholetext", "true")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", s"*.$format*")
      .text(dir)
      .select(idFromPath(input_file_name()).as("@id"), col("value").as("text"))
    // Spark's scan planning silently drops 0-byte files for every file
    // source (createReadRDD keeps only length > 0), but the reference's
    // contract includes empty documents (empty-doc fixture). Recover ONLY
    // the zero-length files from a Hadoop FS recursive listing (cached —
    // see emptyScanCache) and union them in.
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def scan(): Seq[String] = {
      val suffix = raw"\.$format(\.gz)?$$".r
      val it = fs.listFiles(new Path(dir), true)
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
        .filter(_.getLen == 0)
        .map(_.getPath.getName).filter(n => suffix.findFirstIn(n).isDefined)
        .map(n => suffix.replaceAllIn(n, "")).toSeq
    }
    val key = (dir, format)
    if (refreshEmptyScan) emptyScanCache.remove(key)
    val cs = fs.getContentSummary(new Path(dir))
    val fp = (cs.getFileCount, cs.getDirectoryCount, cs.getLength)
    val emptyIds = emptyScanCache.compute(key, (_, prev) =>
      if (prev != null && prev._1 == fp) prev else (fp, scan()))._2
    import spark.implicits._
    if (emptyIds.isEmpty) raw
    else raw.unionByName(
      emptyIds.toDF("@id").select(col("@id"), lit("").as("text")))
  }

  /** S2 `SingleFileInput` (inputs.py:46-98): mallet-style file, one document
    * per line `id<TAB>text`; duplicate ids keep the FIRST occurrence (the
    * reference warns and drops later ones). Line arrival order is
    * reconstructed per-partition-monotonically via
    * `monotonically_increasing_id` (valid for a single input file: splits
    * are ordered by file offset) and first-wins applied with a window.
    */
  def singleFile(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
      .withColumn("lineno", monotonically_increasing_id())
      .filter(length(trim(col("value"))) > 0)
    val parsed = lines.select(
      substring_index(col("value"), "\t", 1).as("@id"),
      // everything after the first tab (text may contain more tabs)
      expr("substring(value, instr(value, '\t') + 1)").as("text"),
      col("lineno"))
    val w = Window.partitionBy("@id").orderBy("lineno")
    parsed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("@id"), col("text"))
  }

  /** S3 `MetadataInput` (inputs.py:164-207): the text lives in a column of
    * the metadata table. */
  def fromMetadata(catalog: DataFrame, textField: String,
                   idField: String = "@id"): DataFrame =
    catalog.select(col(idField).as("@id"), col(textField).as("text"))

  /** S7 parquet bookstacks (bookstack.py:102-138): a directory of parquet
    * files is the corpus; `nc:`-prefixed columns are features (text =
    * `nc:text`), the rest is metadata. `input_file_name` preserves stack
    * identity like the reference's per-file stacks. */
  def bookstacks(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .withColumn("nc:stack", regexp_extract(input_file_name(), "([^/]+)\\.parquet", 1))

  /** The metadata view of a bookstack dataset: all non-`nc:` columns. */
  def bookstackMetadata(stacks: DataFrame): DataFrame =
    stacks.select(stacks.columns.filterNot(_.startsWith("nc:")).toSeq.map(col): _*)

  /** The text view of a bookstack dataset. */
  def bookstackText(stacks: DataFrame): DataFrame =
    stacks.select(col("@id"), col("nc:text").as("text"))
}
