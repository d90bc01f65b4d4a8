package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed aggregate — the partial-aggregation answer to
  * "top k per group".
  *
  * The window formulation (`row_number() OVER (PARTITION BY g ORDER BY v)
  * <= k`) shuffles and sorts EVERY row of every group; this Aggregator
  * carries at most k (value, id) pairs per group per partition, combines
  * map-side, and ships k pairs per (group, partition) — the same volume
  * reduction partial sums give to `sum()`, applied to ranking. At 100 TB
  * the difference is the whole group's rows vs k rows on the wire.
  *
  * Total order: value DESC, id ASC — ties are deterministic, matching the
  * `row_number(... ORDER BY v DESC, id)` oracle exactly. Integer math only.
  *
  * Buffer layout: flat longs `[v0, id0, v1, id1, ...]`, sorted, length <=
  * 2k — the primitive-array encoder round-trips it cheaply (see
  * [[ExplicitEncoders]]).
  */
object TopKAggregator {

  /** IN = (value, id); OUT = flat packed `[v, id, ...]` pairs, best first. */
  final class TopKAgg(k: Int) extends Aggregator[(Long, Long), Array[Long], Seq[Long]] {
    require(k >= 1, "need k >= 1")

    private def beats(v1: Long, i1: Long, v2: Long, i2: Long): Boolean =
      v1 > v2 || (v1 == v2 && i1 < i2)

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
      val (v, id) = in
      val n = buf.length / 2
      if (n == k && !beats(v, id, buf(2 * n - 2), buf(2 * n - 1))) return buf
      var pos = 0
      while (pos < n && beats(buf(2 * pos), buf(2 * pos + 1), v, id)) pos += 1
      val outN = math.min(k, n + 1)
      val out = new Array[Long](outN * 2)
      System.arraycopy(buf, 0, out, 0, pos * 2)
      out(2 * pos) = v
      out(2 * pos + 1) = id
      val tail = math.min(n - pos, outN - pos - 1)
      if (tail > 0) System.arraycopy(buf, pos * 2, out, pos * 2 + 2, tail * 2)
      out
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val (na, nb) = (a.length / 2, b.length / 2)
      val outN = math.min(k, na + nb)
      val out = new Array[Long](outN * 2)
      var (i, j, o) = (0, 0, 0)
      while (o < outN) {
        val takeA = j >= nb ||
          (i < na && beats(a(2 * i), a(2 * i + 1), b(2 * j), b(2 * j + 1)))
        if (takeA) { out(2 * o) = a(2 * i); out(2 * o + 1) = a(2 * i + 1); i += 1 }
        else { out(2 * o) = b(2 * j); out(2 * o + 1) = b(2 * j + 1); j += 1 }
        o += 1
      }
      out
    }

    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = ExplicitEncoders.longArray
    override def outputEncoder: Encoder[Seq[Long]] = ExplicitEncoders.longSeq
  }
}
