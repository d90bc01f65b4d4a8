package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Stable Random Projection embeddings — the reference's shareable
  * "nonconsumptive" document representation (transformations.py:134-189,
  * extensions.py:12-66; method: hash every word to a ±1 vector via md5,
  * weight by log counts, sum per document).
  *
  * Stability contract (SURVEY §7.5 #6): identical output across runs,
  * machines, and engines. Achieved by
  *  - deriving each word's ±1 pattern from md5 (`hash60`) per 60-bit block —
  *    no RNG state anywhere;
  *  - integer-scaled weights `w = round(1000 * ln(1 + count))` so per-dim
  *    sums are exact integers — immune to float summation order (a plain
  *    float sum would differ in the last ulp between engines/partitionings).
  *
  * Representation: flat `(docId, dim, value)` is canonical (scale-friendly);
  * the dense `array<float>` form is an export view.
  */
object Srp {

  /** Reference embedding width (transformations.py:147). */
  val DefaultDims = 1280

  /** Flat SRP: (docId, dim, value:double) where value =
    * sum_tokens sign(token,dim) * round(1000*ln(1+count)) / 1000.
    *
    * One pass: a typed Aggregator accumulates all `dims` integer sums in the
    * aggregation buffer (partial agg per partition), instead of exploding
    * `dims` rows per token before the shuffle — a `dims`x shuffle reduction
    * with bit-identical output. The dense->flat posexplode happens AFTER the
    * aggregate, on one row per document. */
  def srpFlat(docs: DataFrame, dims: Int = DefaultDims,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val nBlocks = (dims + 59) / 60
    val agg = udaf(new graft.plans.HashAggregators.SrpAgg(dims))
    TextOps.unigrams(docs, idCol, textCol)
      .withColumn("w", round(log(lit(1.0) + col("count")) * 1000, 0).cast("long"))
      // one md5 per (token, block), reused for its 60 dims:
      .withColumn("hs", transform(sequence(lit(0), lit(nBlocks - 1)),
        b => hash60(concat(col("token"), lit(":"), b))))
      .groupBy(col(idCol))
      .agg(agg(col("hs"), col("w")).as("sums"))
      .select(col(idCol), posexplode(col("sums")).as(Seq("dim", "s")))
      .select(col(idCol), col("dim").cast("long").as("dim"),
        (col("s").cast("double") / 1000.0).as("value"))
  }

  /** Dense export view: (docId, srp: array<double>[dims]). */
  def srpDense(docs: DataFrame, dims: Int = DefaultDims,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    srpFlat(docs, dims, idCol, textCol)
      .groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("value")))),
        s => s.getField("value")).as("srp"))

  /** Hamming near-duplicate pairs over the packed SRP sign bits (the
    * reference's SRP_bits similarity use, extensions.py:12-66): pairs of
    * documents whose 60-bit fingerprints differ in at most `maxDist` bits.
    *
    * NOT a cross join: the fingerprint is split into `maxDist + 1` blocks —
    * by pigeonhole, any pair within `maxDist` agrees exactly on at least one
    * block — so candidates come from a (blockIdx, blockValue) equi-join and
    * recall is EXACT. Linear-ish shuffle, quadratic work only inside
    * matching buckets. */
  def hammingPairs(docs: DataFrame, maxDist: Int = 3, dims: Int = 60,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(dims == 60, "hammingPairs currently packs one 60-bit word")
    val nBlocks = maxDist + 1
    val blockBits = dims / nBlocks
    val mask = (1L << blockBits) - 1
    val bits = graft.core.CacheScope.persist(
      srpBits(docs, dims, idCol, textCol)
        .select(col(idCol).as("id"), col("bits")))
    val blockStructs = array((0 until nBlocks).map { i =>
      struct(lit(i).as("blk"),
        expr(s"(shiftright(bits, ${i * blockBits}) & $mask)").as("bv"))
    }: _*)
    val banded = bits.select(col("id"), col("bits"),
        explode(blockStructs).as("bd"))
      .select(col("id"), col("bits"), col("bd.blk").as("blk"), col("bd.bv").as("bv"))
    banded.as("x").join(banded.as("y"), Seq("blk", "bv"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        expr("bit_count(x.bits ^ y.bits)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  /** SRP sign bits packed 60-per-long: (docId, word_idx, bits) — the
    * reference's 160-byte `SRP_bits` (transformations.py:176-189) as packed
    * little-endian words. Engine-stable integers. */
  def srpBits(docs: DataFrame, dims: Int = DefaultDims,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    srpFlat(docs, dims, idCol, textCol)
      .withColumn("word_idx", (col("dim") / 60).cast("long"))
      .groupBy(col(idCol), col("word_idx"))
      .agg(sum(when(col("value") > 0,
        expr("shiftleft(cast(1 as bigint), cast(dim % 60 as int))"))
        .otherwise(0L)).as("bits"))
}
