package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * content is carried as opaque `binary` payload columns with a typed
  * metadata struct, flowing through the same partition/shuffle machinery as
  * every other column.
  *
  * The actual media DECODE step is stubbed (no image/audio libraries in this
  * environment — clearly marked below); everything around it — schema,
  * batch shape, partitioning, deterministic frame sampling, feature layout —
  * is real and tested. Swapping the stub for a JNI/ffmpeg decode keeps the
  * plan identical.
  */
object Multimodal {

  /** Typed payload metadata carried next to every binary column. */
  val MetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("digest", StringType)))

  /** Attach a payload column built from raw bytes: (payload: binary,
    * payload_meta: struct). For tests the "media" is the utf-8 text itself.
    */
  def attachPayload(df: DataFrame, bytesCol: Column, mime: String): DataFrame =
    df.withColumn("payload", bytesCol)
      .withColumn("payload_meta", struct(
        lit(mime).as("mime"),
        octet_length(col("payload")).cast(LongType).as("n_bytes"),
        md5(col("payload")).as("digest")))

  /** Deterministic frame sampling: split the payload into `n` byte ranges
    * ("frames") and digest each — the plumbing shape of video frame
    * extraction (frame idx + per-frame feature), minus the codec. */
  def frameSample(df: DataFrame, n: Int, idCol: String = "doc_id"): DataFrame = {
    val len = octet_length(col("payload"))
    val frames = (0 until n).map { i =>
      val start = (floor(len * i / n) + 1).cast(IntegerType)
      val flen = (floor(len * (i + 1) / n) - floor(len * i / n)).cast(IntegerType)
      struct(lit(i).as("frame_idx"),
        md5(col("payload").substr(start, flen)).as("frame_digest"),
        flen.cast(LongType).as("frame_bytes"))
    }
    df.select(col(idCol), explode(array(frames: _*)).as("f"))
      .select(col(idCol), col("f.frame_idx"), col("f.frame_digest"),
        col("f.frame_bytes"))
  }

  /** STUB — media decode. A real implementation would decode the payload
    * (image pixels / audio samples) per partition in batches; here it emits
    * a deterministic fake feature vector derived from the payload digest so
    * the downstream schema and partition behavior are exercised end-to-end.
    *
    * Runs via mapPartitions-style batching on the JVM: the expression below
    * is whole-stage-codegen'd per row; a native decoder would swap in a
    * `mapPartitions` over Arrow batches with the same output schema.
    */
  def decodeStub(df: DataFrame, featureDims: Int = 8,
                 idCol: String = "doc_id"): DataFrame = {
    import graft.functions.TextFunctions.hash60
    // fake "features": hash60 of (digest, dim) scaled to [-0.5, 0.5)
    val feats = sequence(lit(0), lit(featureDims - 1))
    df.select(col(idCol), col("payload_meta.digest").as("digest"))
      .withColumn("features", transform(feats, d =>
        (hash60(concat(col("digest"), lit(":"), d)) % 1000000L)
          .cast(DoubleType) / 1000000.0 - 0.5))
      .select(col(idCol), col("features"))
  }

  /** The BATCHED decode plumbing — the exact execution shape a real codec
    * plugs into (the JVM analog of `mapInPandas`): rows stream through
    * `mapPartitions`, grouped into fixed-size batches; a native decoder
    * would hand each whole batch to the library in one call (amortizing
    * model/codec setup) and emit one feature row per input. The per-batch
    * "decode" here is the same deterministic stub as [[decodeStub]] — the
    * two paths produce IDENTICAL output (tested), so swapping in a real
    * decoder changes only the closure body, never the plan or schema.
    */
  def decodeStubBatched(df: DataFrame, featureDims: Int = 8,
                        batchSize: Int = 64,
                        idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload_meta.digest"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // batch-granular boundary: a real implementation decodes the
          // whole `batch` here in one library call
          batch.iterator.map { case (id, digest) =>
            val feats = Array.tabulate(featureDims)(d =>
              (graft.plans.HashUtil.hash60(s"$digest:$d") % 1000000L)
                .toDouble / 1000000.0 - 0.5)
            (id, feats)
          }
        }
      }
      .toDF(idCol, "features")
  }

  /** Container-format magic numbers: (mime, uppercase hex prefix). Order is
    * match priority — longer/more specific prefixes first (PNG's 8-byte
    * signature before the 2-byte gzip one). Public so callers (and the SQL
    * oracle) can build payloads against the same table. */
  val MagicNumbers: Seq[(String, String)] = Seq(
    "image/png" -> "89504E470D0A1A0A",
    "image/gif" -> "47494638",
    "image/jpeg" -> "FFD8FF",
    "application/pdf" -> "25504446",
    "application/zip" -> "504B0304",
    "application/gzip" -> "1F8B")

  /** MIME sniffing by magic bytes — the triage step a mixed-media crawl
    * needs BEFORE any decode is dispatched (the declared content-type of
    * crawled data lies; the first bytes don't). Pure column expression over
    * the binary payload: one `hex` of the first 8 bytes per row, compared
    * against the magic table — whole-stage-codegen'd, no UDF, no shuffle.
    * Unmatched payloads fall through to `application/octet-stream`. */
  def sniffMime(bytes: Column): Column = {
    val prefix = hex(substring(bytes, 1, 8)) // uppercase, like DuckDB's
    MagicNumbers.foldRight(lit("application/octet-stream"): Column) {
      case ((mime, magic), acc) =>
        when(substring(prefix, 1, magic.length) === magic, lit(mime))
          .otherwise(acc)
    }
  }
}
