package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming operators over the events stream (the reference has
  * no streaming — SURVEY §2.9 — so these are the engine's forward-looking
  * stream analogs of the batch queries q_events_*; the batch forms serve as
  * their correctness oracles on the same data).
  */
object EventsStreaming {

  /** Default events schema (ns timestamps read as long), used when the
    * landing directory is empty at stream start — file streams need a schema
    * up front, and a batch-read probe cannot infer one from zero files. */
  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // epoch nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of event parquet files. The file
    * schema is taken from files already staged in `dir` when present (so a
    * us-precision `ts` streams correctly), falling back to `schema` /
    * [[EventSchema]] on an empty landing directory; then `ts` is normalized
    * to epoch nanos long, so ns-long and us-timestamp encodings both stream
    * through the same downstream integer time math. Files arriving later
    * must match the ts encoding present (or assumed) at stream start. */
  def readStream(spark: SparkSession, dir: String,
                 schema: Option[StructType] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The EventSchema fallback covers exactly ONE condition: a landing
    // directory with no readable parquet yet (empty or not yet created) —
    // Spark raises AnalysisException("...unable to infer schema..." /
    // "...path does not exist...") for both. Any OTHER failure (corrupt
    // footer, permission, bad files) must propagate: silently streaming a
    // corrupt landing dir with the wrong assumed schema is worse than
    // failing at start.
    val fileSchema = schema.getOrElse(
      try spark.read.parquet(dir).schema
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if Seq("UNABLE_TO_INFER_SCHEMA", "PATH_NOT_FOUND")
              .exists(c => e.getCondition != null && e.getCondition.contains(c)) =>
          EventSchema
      })
    graft.core.Catalog.epochNanos(
        spark.readStream.schema(fileSchema).parquet(dir), "ts")
      .withColumn("event_time", timestamp_millis(expr("ts div 1000000")))
  }

  /** Hourly tumbling-window aggregation with a watermark — the streaming
    * form of q_events_hourly. Late data beyond 2h is dropped. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "2 hours")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value"), 6).cast("decimal(18,6)")).as("sum_value"))
      .select(unix_millis(col("window.start")).as("hour_ms"), col("event_type"),
        col("n"), round(col("sum_value").cast("double"), 4).as("sum_value"))

  final case class Event(event_id: Long, ts: Long, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(lastMs: Long, nSessions: Long, nEvents: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Stateful sessionization via mapGroupsWithState — the streaming form of
    * q_events_sessions (30-minute inactivity gap). Emits the running
    * per-user session count on every trigger (Update mode). */
  def sessionize(events: DataFrame, gapMs: Long = 1800000L): Dataset[UserSessions] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSessions](
        GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          // events may arrive unsorted within a micro-batch: order by ms
          val sorted = rows.toSeq.sortBy(e => (e.ts, e.event_id))
          val next = sorted.foldLeft(prev) { (st, e) =>
            val ms = e.ts / 1000000L
            val newSession = st.lastMs == Long.MinValue || ms - st.lastMs > gapMs
            SessionState(ms, st.nSessions + (if (newSession) 1 else 0), st.nEvents + 1)
          }
          state.update(next)
          UserSessions(userId, next.nSessions, next.nEvents)
      }
  }

  /** Streaming exact deduplication — the stream form of the batch content-
    * hash dedup (Dedup.exactDuplicates), for ingest pipelines where the
    * corpus arrives continuously. First occurrence of each content hash
    * passes; replays and late duplicates are dropped by state keyed on the
    * hash. The watermark bounds state: a duplicate arriving more than
    * `horizon` after its original is beyond the dedup guarantee (standard
    * `dropDuplicatesWithinWatermark` semantics — state is evictable, which
    * is what makes this runnable forever at scale).
    */
  def dedupStream(events: DataFrame, horizon: String = "2 hours",
                  hashCols: Seq[String] = Seq("event_type", "value", "props"))
      : DataFrame =
    events
      .withWatermark("event_time", horizon)
      // hash the JSON form of the column struct — field-delimited and
      // null-distinct: a skipped-null concat would let ("a", null, "c")
      // collide with ("a", "c", null)
      .withColumn("content_hash",
        md5(to_json(struct(hashCols.map(col): _*))))
      .dropDuplicatesWithinWatermark("content_hash")

  final case class PackDoc(doc_id: Long, bucket: Long, n_tokens: Long)
  final case class PackState(nextStart: Long)
  final case class PackedDoc(doc_id: Long, bucket: Long, n_tokens: Long,
                             seq_id: Long, seq_off: Long)

  /** Streaming sequence packing — the stateful stream form of
    * [[graft.operators.TextOps.packSequences]]: documents arriving
    * continuously are laid end to end on the per-bucket token grid, with
    * each bucket's next free offset kept in `flatMapGroupsWithState` state
    * (one long per bucket — state is O(nBuckets) forever, the property
    * that makes this runnable unbounded).
    *
    * Determinism contract: within a micro-batch, a bucket's documents are
    * packed in doc-id order; ACROSS batches, arrival order is the layout
    * order (a stream cannot sort the future). A replay with the same batch
    * boundaries reproduces the identical grid; batch `packSequences` over
    * the same corpus as ONE batch is the oracle (StreamingSpec).
    *
    * Input tolerance (documented divergences from the batch form, which
    * keeps null-metric rows): a null text packs as 0 tokens — the row
    * survives at the current offset; a null or non-numeric id is DROPPED,
    * the same contract as `Sampling.stratifiedSample` — an unkeyed row has
    * no stable bucket, and a typed stream row cannot carry a null key.
    *
    * Memory bound: a bucket's rows within ONE micro-batch are materialized
    * for the id-sort (flatMapGroupsWithState hands an iterator, a stream
    * cannot window-sort). Size triggers accordingly — bound the batch with
    * `maxFilesPerTrigger`/`maxBytesPerTrigger` so corpus/nBuckets rows per
    * bucket fit in executor heap; steady-state stream batches are small. */
  def packStream(docs: DataFrame, budget: Int, nBuckets: Int,
                 idCol: String = "doc_id",
                 textCol: String = "text"): Dataset[PackedDoc] = {
    require(budget >= 1 && nBuckets >= 1, "need budget >= 1 and nBuckets >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    graft.operators.TextOps.packBase(docs, nBuckets, idCol, textCol)
      .select(col(idCol).cast("long").as("doc_id"), col("bucket"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
      .filter(col("doc_id").isNotNull)
      .as[PackDoc]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[PackState, PackedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (bucket, rows, state: GroupState[PackState]) =>
          var start = state.getOption.map(_.nextStart).getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            val placed = PackedDoc(d.doc_id, bucket, d.n_tokens,
              start / budget, start % budget)
            start += d.n_tokens
            placed
          }
          state.update(PackState(start))
          out.iterator
      }
  }

  /** Watermarked STREAM-STREAM interval join: correlate each `causeType`
    * event with the same user's `effectType` events arriving within
    * `maxDelayMs` after it (view -> click attribution, signup -> purchase
    * conversion, ...). Both sides carry watermarks and the join predicate
    * bounds event-time distance, which is exactly what lets Spark expire
    * join state: a buffered cause row is droppable once the effect-side
    * watermark passes `c_time + maxDelay` — state stays proportional to
    * the delay window, never the stream history. The equi-key (`user_id`)
    * hash-partitions both sides, so the join scales out like any keyed
    * shuffle.
    *
    * Both inputs may be branches of the SAME source stream (a stream
    * self-join — supported since Spark 2.3). Output: one row per
    * (cause, effect) pair inside the window, with epoch-milli times.
    * Batch-equivalence oracle: the identical join over a static read
    * (StreamingSpec). */
  def correlateStream(events: DataFrame, causeType: String, effectType: String,
                      maxDelayMs: Long = 3600000L,
                      watermark: String = "2 hours"): DataFrame = {
    val cause = events.filter(col("event_type") === causeType)
      .select(col("user_id").as("c_user"), col("event_id").as("cause_id"),
        col("event_time").as("c_time"))
      .withWatermark("c_time", watermark)
    val effect = events.filter(col("event_type") === effectType)
      .select(col("user_id").as("e_user"), col("event_id").as("effect_id"),
        col("event_time").as("e_time"))
      .withWatermark("e_time", watermark)
    cause.join(effect,
        col("c_user") === col("e_user") &&
          col("e_time") >= col("c_time") &&
          col("e_time") <= col("c_time") + expr(s"INTERVAL $maxDelayMs MILLISECONDS"))
      .select(col("c_user").as("user_id"), col("cause_id"), col("effect_id"),
        unix_millis(col("c_time")).as("cause_ms"),
        unix_millis(col("e_time")).as("effect_ms"))
  }

  /** Stream-static enrichment join — the streaming form of dimension
    * enrichment. Each arriving micro-batch equi-joins the static dimension
    * (re-planned per batch, broadcast when it fits); stateless — no
    * watermark, state store, or shuffle of the stream side beyond the join
    * itself. At scale the static side is the broadcast-able profile/dim
    * table; unmatched events keep null dims (left join) rather than being
    * dropped. */
  def enrich(events: DataFrame, dim: DataFrame,
             keys: Seq[String] = Seq("user_id")): DataFrame =
    events.join(broadcast(dim), keys, "left")

  /** Drive a stream of the given dir to completion into a memory sink and
    * return the result table (used by tests: batch-equivalence oracle). */
  def runToMemory(spark: SparkSession, dir: String, name: String,
                  build: DataFrame => DataFrame,
                  outputMode: OutputMode = OutputMode.Append()): DataFrame = {
    val q = build(readStream(spark, dir)).writeStream
      .format("memory").queryName(name).outputMode(outputMode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
