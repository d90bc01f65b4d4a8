package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters: find every key whose weight share is at least
  * `num/den` of the total, with bounded memory and a DETERMINISTIC, exact
  * result.
  *
  * The reference's frequency work is exact counting (corpus.py:198-227 caps
  * it with an approximate counter when memory runs out); at 100 TB the key
  * universe (urls, shingles, n-grams) can be billions-strong, and an exact
  * global groupBy shuffles the whole universe just to read off its top. The
  * classic fix is the two-pass guaranteed design:
  *
  *  1. CANDIDATES — one pass of Misra-Gries as a typed partial aggregate:
  *     every task keeps at most `den` counters, the shuffle carries at most
  *     `den` rows per partition, and the merged summary is a superset of
  *     every true heavy hitter (MG never undercounts by more than
  *     total/(k+1), and a `num/den`-heavy key's weight strictly exceeds
  *     that, so its counter cannot reach zero).
  *  2. VERIFY — one more pass counts ONLY the (at most `den`) candidates
  *     exactly and applies the threshold as an integer comparison
  *     `cnt * den >= total * num`.
  *
  * The MG summary itself is processing-order-dependent (counter VALUES vary
  * with partitioning), which is why it never appears in the output: the
  * superset guarantee is order-independent, and the exact second pass makes
  * the final answer identical to the brute-force `GROUP BY ... HAVING` — so
  * the operator is SQL-oracle checkable even though its memory profile is
  * sketch-sized.
  *
  * Merging summaries subtracts the (k+1)-th largest counter, the mergeable-
  * summaries rule (Agarwal et al., PODS'12), which preserves the
  * total/(k+1) undercount bound under arbitrary merge trees — exactly the
  * property Spark's partial aggregation needs.
  */
object HeavyHitters {

  /** Weighted Misra-Gries summary: IN = (key, weight>0); buffer/OUT =
    * (total weight seen, surviving counters). At most `k` counters live in
    * the buffer at any time. */
  final class MgAgg(k: Int)
      extends Aggregator[(String, Long), (Long, Map[String, Long]),
                         (Long, Map[String, Long])] {
    require(k >= 1, "need k >= 1 counters")

    override def zero: (Long, Map[String, Long]) = (0L, Map.empty)

    override def reduce(buf: (Long, Map[String, Long]),
                        in: (String, Long)): (Long, Map[String, Long]) = {
      val (total, m) = buf
      val (key, w) = in
      if (w <= 0L) buf
      else {
        val grown = m.updated(key, m.getOrElse(key, 0L) + w)
        if (grown.size <= k) (total + w, grown)
        else { // k+1 counters: subtract the minimum, dropping >= 1 of them
          val d = grown.valuesIterator.min
          (total + w, grown.collect { case (s, c) if c > d => s -> (c - d) })
        }
      }
    }

    override def merge(a: (Long, Map[String, Long]),
                       b: (Long, Map[String, Long])): (Long, Map[String, Long]) = {
      val summed = b._2.foldLeft(a._2) { case (m, (s, c)) =>
        m.updated(s, m.getOrElse(s, 0L) + c)
      }
      val kept =
        if (summed.size <= k) summed
        else { // subtract the (k+1)-th largest counter value
          val d = summed.valuesIterator.toArray.sortWith(_ > _).apply(k)
          summed.collect { case (s, c) if c > d => s -> (c - d) }
        }
      (a._1 + b._1, kept)
    }

    override def finish(buf: (Long, Map[String, Long])): (Long, Map[String, Long]) = buf

    override def bufferEncoder: Encoder[(Long, Map[String, Long])] =
      Encoders.tuple(Encoders.scalaLong,
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]())
    override def outputEncoder: Encoder[(Long, Map[String, Long])] = bufferEncoder
  }

  /** Pass 1: the MG summary of `pairs` — (total weight, candidate->counter).
    * Counter values are order-dependent lower-ish estimates (est <= true,
    * true - est <= total/(k+1)); the key SET is a guaranteed superset of
    * every key with weight > total/(k+1). */
  def summary(pairs: DataFrame, keyCol: String, weightCol: String,
              k: Int): (Long, Map[String, Long]) = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs
      .select(col(keyCol).cast("string").as("k"),
        col(weightCol).cast("long").as("w"))
      .na.drop("any")
      .select(udaf(new MgAgg(k)).apply(col("k"), col("w")).as("s"))
      .select(col("s._1"), col("s._2"))
      .as[(Long, Map[String, Long])].head()
  }

  /** Guaranteed heavy hitters: keys of `pairs` whose total `weightCol`
    * satisfies `weight * den >= total * num` (i.e. share >= num/den), with
    * their EXACT totals. Two scans of `pairs`, never more than `den`
    * counters of state. Output: (key, cnt), exact and deterministic. */
  def heavyHitters(pairs: DataFrame, keyCol: String, weightCol: String,
                   num: Long, den: Int): DataFrame = {
    require(num >= 1 && den >= num, "need 1 <= num <= den (a share in (0,1])")
    // both passes see the SAME rows: null keys and non-positive weights are
    // out of contract and dropped up front (the summary pass would skip
    // them anyway; the verify pass must agree)
    // persisted: the algorithm is two scans of the pair table, and without
    // the persist the second scan would recompute the (often tokenized /
    // pre-aggregated) lineage from the raw corpus
    val cleaned = graft.core.CacheScope.persist(pairs
      .select(col(keyCol).cast("string").as("key"),
        col(weightCol).cast("long").as("w"))
      .filter(col("key").isNotNull && col("w") > 0L))
    val (total, cands) = summary(cleaned, "key", "w", den)
    // verify pass: exact counts of <= den candidate keys only — the filter
    // is a broadcast-sized IN list, the groupBy state is candidate-sized
    cleaned
      .filter(col("key").isin(cands.keys.toSeq: _*))
      .groupBy("key")
      .agg(sum("w").as("cnt"))
      .filter(col("cnt") * lit(den.toLong) >= lit(total) * lit(num))
  }
}
