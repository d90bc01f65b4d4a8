package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions.{hash31, tokens}

/** STATEFUL streaming near-duplicate detection — the arriving-data form of
  * [[graft.operators.Dedup.minhashLshPairs]]: every arriving document gets
  * a row-local MinHash signature, its LSH bands become state keys, and a
  * `flatMapGroupsWithState` per band bucket emits a pair the moment a new
  * document lands in a bucket containing a signature-similar earlier one —
  * including pairs that SPAN micro-batches (the case a per-batch join
  * cannot see).
  *
  * Two deliberate deltas from the batch operator, both documented
  * properties rather than bugs:
  *  - the SIGNATURE is computed row-locally (`array_min` over the
  *    transformed shingle array) instead of by explode + groupBy —
  *    identical values (min is multiplicity-blind), but it keeps the
  *    streaming query to ONE stateful operator;
  *  - a pair sharing several bands emits once PER shared band (the batch
  *    op's first-matching-band dedup needs both full signatures at plan
  *    time); consumers treat the stream as at-least-once per pair and
  *    distinct-down if needed. StreamingSpec compares SETS.
  *
  * State: per (bandIdx, bandValue) bucket, the (id, signature) list of
  * documents seen — the same memory the batch self-join materializes per
  * bucket, accumulated incrementally. Production deployments bound it
  * with a processing-time timeout (`horizonMs`), the
  * [[EventsStreaming.dedupStream]] contract: a bucket idle longer than
  * the horizon is dropped, so only in-horizon replays are guaranteed to
  * pair. */
object NearDupStream {

  final case class BandDoc(bidx: Int, bval: String, id: Long, sig: Seq[Long])
  final case class BandState(docs: List[(Long, Seq[Long])])
  final case class DupPair(id_a: Long, id_b: Long, sig_sim: Double)

  /** Row-local MinHash signatures: (idCol, sig[numPerms]) — `array_min`
    * over each permutation of the row's distinct-shingle hashes; NULL-free
    * (documents with no shingles are dropped, matching the batch groupBy's
    * absence semantics). Stateless, codegen-friendly, stream-safe. */
  def rowLocalSignatures(docs: DataFrame, shingleK: Int, numPerms: Int,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    val toks = col("__toks")
    val shingleArr =
      if (shingleK == 1) array_distinct(toks)
      else when(size(toks) >= shingleK,
        array_distinct(transform(
          sequence(lit(1), size(toks) - lit(shingleK - 1)),
          i => concat_ws(" ", slice(toks, i, lit(shingleK))))))
        .otherwise(array())
    val sig = (0 until numPerms).map { i =>
      array_min(transform(col("__sh"),
        s => (hash31(s) * lit(2L * i + 3) + lit(12289L * i + 1))
          % lit(2147483647L)))
    }
    docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), shingleArr.as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(col(idCol), array(sig: _*).as("sig"))
  }

  /** The streaming pair detector. `docs` is a STREAMING DataFrame with
    * (idCol, textCol); output is an append stream of (id_a, id_b,
    * sig_sim) with id_a < id_b and sig_sim rounded to 6 dp (the batch
    * contract). `horizonMs` <= 0 disables state expiry (tests); > 0 drops
    * buckets idle longer than the horizon. */
  def pairsStream(docs: DataFrame, shingleK: Int = 1, numPerms: Int = 12,
                  bands: Int = 2, threshold: Double = 0.75,
                  horizonMs: Long = 0L,
                  idCol: String = "doc_id",
                  textCol: String = "text"): Dataset[DupPair] = {
    require(numPerms % bands == 0, "numPerms must divide into bands")
    val spark = docs.sparkSession
    import spark.implicits._
    val rowsPerBand = numPerms / bands
    val sigs = rowLocalSignatures(docs, shingleK, numPerms, idCol, textCol)
    val bandStructs = array((0 until bands).map { b =>
      struct(lit(b).as("bidx"),
        concat_ws("-", (0 until rowsPerBand).map(r =>
          element_at(col("sig"), b * rowsPerBand + r + 1)): _*).as("bval"))
    }: _*)
    val banded = sigs
      .select(col(idCol).cast("long").as("id"), col("sig"),
        explode(bandStructs).as("bd"))
      .select(col("bd.bidx").as("bidx"), col("bd.bval").as("bval"),
        col("id"), col("sig"))
      .as[BandDoc]
    val timeoutConf =
      if (horizonMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded.groupByKey(b => (b.bidx, b.bval))
      .flatMapGroupsWithState[BandState, DupPair](
        OutputMode.Append, timeoutConf) { case (_, rows, state) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          var cur = state.getOption.map(_.docs).getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer.empty[DupPair]
          // deterministic intra-batch order
          rows.toSeq.sortBy(_.id).foreach { r =>
            cur.foreach { case (oid, osig) =>
              if (oid != r.id) {
                val matches = osig.iterator.zip(r.sig.iterator)
                  .count { case (a, b) => a == b }
                val sim = math.round(
                  matches.toDouble / numPerms * 1e6) / 1e6
                if (sim >= threshold)
                  out += (if (oid < r.id) DupPair(oid, r.id, sim)
                          else DupPair(r.id, oid, sim))
              }
            }
            cur = (r.id, r.sig) :: cur
          }
          state.update(BandState(cur))
          if (horizonMs > 0) state.setTimeoutDuration(horizonMs)
          out.iterator
        }
      }
  }
}
