package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.plans.{ExplicitEncoders, VectorExpressions}

/** Principal-component analysis over an embedding column — the
  * dimensionality-reduction / whitening stage of an embedding pipeline
  * (dedup thresholds and ANN indexes both benefit from decorrelated,
  * variance-ranked coordinates).
  *
  * Scale shape: the ONLY data-sized job is the second-moment aggregate — a
  * typed [[Aggregator]] whose buffer is `[n, micro-sum(d), upper-tri int128
  * sumprod d(d+1)/2]` longs (EXACT integer arithmetic on the 1e-6 grid, so
  * the result is independent of partition/merge order — see [[MomentsAgg]]).
  * Partial aggregation combines map-side, so the shuffle carries one
  * ~4k-long buffer per partition REGARDLESS of row count; at 100 TB that
  * is the same wire volume as at 100 MB. Everything
  * eigen (power iteration on the d x d covariance) is O(d^2 * iters)
  * driver arithmetic on that single aggregate — no second pass, no
  * collect of row data. Projection is then one broadcast-literal dot
  * product per row, fully codegen'd (see [[graft.plans.DotProduct]]).
  *
  * Beyond the reference (nonconsumptive has SRP hashing but no PCA); the
  * deterministic fixed-iteration power method keeps a cross-engine SQL
  * oracle possible (same iterate after k steps in any engine).
  */
object Pca {

  /** Micro-grid scale shared by the moments engine and the SQL oracle:
    * every component is snapped ONCE to `round(x * 1e6)` (half away from
    * zero, the Spark-SQL/DuckDB `round` contract) and all sums are exact
    * integers from there on. This is the [[Similarity.labelCentroids]]
    * engine-exact pattern: double addition is NOT associative, so raw
    * double moment sums depend on partition/merge order and a 6-dp rounded
    * covariance can flip between two runs of the same build; integer sums
    * are order-free, so the covariance is a deterministic function of the
    * data alone. */
  private[graft] final val MicroScale = 1e6

  /** `round(x * 1e6)` half-away-from-zero — bit-for-bit the value
    * Spark SQL `round(c * 1e6, 0)` (BigDecimal HALF_UP) and DuckDB
    * `round(x * 1000000, 0)` produce for the same double. NOT
    * `floor(abs + 0.5)`: for y = 0.49999999999999994 the fp addition
    * ties UP to 1.0 while both SQL engines round the exact value to 0.
    * Instead compare the fractional part directly — `a - floor(a)` is
    * EXACT for any finite double (Sterbenz for a >= 1, trivially for
    * a < 1), so the comparison sees the true fraction. */
  @inline private[graft] def micro(x: Double): Long = sqlRound0(x * MicroScale)

  /** `round(x)` half away from zero, bit-matching SQL `round(x, 0)` in
    * both Spark (BigDecimal HALF_UP) and DuckDB — the [[micro]]
    * fraction-compare logic without the 1e6 scaling. */
  @inline private[graft] def sqlRound0(x: Double): Long = {
    val a = math.abs(x)
    val f = math.floor(a)
    val r = if (a - f >= 0.5) f + 1.0 else f
    math.copySign(r, x).toLong
  }

  /** One-pass raw second moments of a d-dim float-vector column on the
    * micro grid. Buffer layout: `[n] ++ s_0..s_{d-1} ++ int128
    * upper-triangle product sums as (hi, lo) pairs` — count, per-dim micro
    * sums (long: |x| <= 10^3 holds to ~9e9 rows), and 128-bit product
    * sums (a per-row product |x_i x_j| * 1e12 fits a long for |x| < 3000;
    * the int128 ACCUMULATOR then never overflows below ~1.7e26 rows, so
    * the aggregate is exact at any corpus size — the same width DuckDB's
    * `sum(BIGINT) -> HUGEINT` uses on the oracle side). Per-element and
    * per-row adds are overflow-CHECKED (`addExact`/`multiplyExact`), so a
    * pathological input fails loudly instead of wrapping. */
  final class MomentsAgg(dim: Int)
      extends Aggregator[Seq[Float], Array[Long], Array[Long]] {
    private val nProd = dim * (dim + 1) / 2
    private val len = 1 + dim + 2 * nProd

    override def zero: Array[Long] = new Array[Long](len)

    /** 128-bit add of the signed 64-bit value `p` into the (hi, lo) pair
      * at buffer slots (k, k+1). lo is the unsigned low word. */
    @inline private def add128(b: Array[Long], k: Int, p: Long): Unit = {
      val lo = b(k + 1)
      val newLo = lo + p
      // unsigned carry out of the low word
      val carry = ((lo & p) | ((lo | p) & ~newLo)) >>> 63
      b(k) += (p >> 63) + carry // sign-extend p to 128 bits
      b(k + 1) = newLo
    }

    override def reduce(b: Array[Long], v: Seq[Float]): Array[Long] = {
      require(v != null, "null embedding row (filter nulls before PCA)")
      require(v.length == dim, s"expected dim=$dim, got ${v.length}")
      val m = new Array[Long](dim)
      var i = 0
      while (i < dim) { m(i) = micro(v(i).toDouble); i += 1 }
      b(0) = Math.addExact(b(0), 1L)
      i = 0
      var t = 1 + dim
      while (i < dim) {
        b(1 + i) = Math.addExact(b(1 + i), m(i))
        val mi = m(i)
        var j = i
        while (j < dim) {
          add128(b, t, Math.multiplyExact(mi, m(j)))
          t += 2
          j += 1
        }
        i += 1
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i <= dim) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
      var t = 1 + dim
      var p = 0
      while (p < nProd) {
        // 128-bit + 128-bit: add b's low word unsigned, then its high word
        val lo = a(t + 1)
        val blo = b(t + 1)
        val newLo = lo + blo
        val carry = ((lo & blo) | ((lo | blo) & ~newLo)) >>> 63
        a(t) += b(t) + carry
        a(t + 1) = newLo
        t += 2
        p += 1
      }
      a
    }

    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      ExplicitEncoders.longArray
    override def outputEncoder: Encoder[Array[Long]] =
      ExplicitEncoders.longArray
  }

  /** Moments collected to the driver: (n, mean[d], full population
    * covariance matrix cov[d][d] = E[xy] - E[x]E[y] on the micro grid,
    * unrounded; muMicro[d] = the mean snapped BACK to the micro grid —
    * `round(s_i / n)`, an exact integer any engine derives identically
    * from the integer sums, used where downstream arithmetic must be
    * order-free integer math, e.g. [[Similarity.pcaGridDupPairs]] cell
    * assignment). */
  final case class Moments(n: Long, mean: Array[Double],
                           cov: Array[Array[Double]],
                           muMicro: Array[Long])

  /** Exact double value of the int128 (hi, unsigned lo) pair. Fast path:
    * when hi is lo's sign extension the value IS the signed lo. */
  @inline private def int128ToDouble(hi: Long, lo: Long): Double =
    if (hi == (lo >> 63)) lo.toDouble
    else {
      val uLo = (BigInt(lo >>> 32) << 32) + BigInt(lo & 0xFFFFFFFFL)
      ((BigInt(hi) << 64) + uLo).toDouble
    }

  /** Engine-stable moments: decodes the exact integer buffer and forms
    * mean and covariance with ONE fixed expression per cell —
    * `mean = (s/n)/1e6`, `cov = (ss/n - (sa/n)(sb/n))/1e12` — the exact
    * double chain the SQL oracle replays (same operands, same order, so
    * the IEEE result is bit-identical across engines AND across any
    * partitioning of the input). */
  def moments(df: DataFrame, vecCol: String, dim: Int): Moments = {
    val spark = df.sparkSession
    import spark.implicits._
    val buf = df.select(col(vecCol).cast("array<float>"))
      .as[Seq[Float]]
      .select(new MomentsAgg(dim).toColumn)
      .head()
    val n = buf(0)
    require(n > 0, "PCA over an empty input")
    val nD = n.toDouble
    val sOverN = Array.tabulate(dim)(i => buf(1 + i).toDouble / nD)
    val mean = Array.tabulate(dim)(i => sOverN(i) / MicroScale)
    val cov = Array.ofDim[Double](dim, dim)
    var t = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val ss = int128ToDouble(buf(t), buf(t + 1))
        val c = (ss / nD - sOverN(i) * sOverN(j)) / (MicroScale * MicroScale)
        cov(i)(j) = c
        cov(j)(i) = c
        t += 2
        j += 1
      }
      i += 1
    }
    Moments(n, mean, cov, Array.tabulate(dim)(i => sqlRound0(sOverN(i))))
  }

  /** The k-step power iterate of `cov` from the uniform positive start
    * vector `1/sqrt(d)` — deterministic (fixed step count, no convergence
    * test, no randomness), so any engine that runs the same k steps on the
    * same matrix lands on the same vector to fp noise. Returns (v, lambda)
    * with lambda the Rayleigh quotient v'Cv of the final iterate. */
  def powerIterate(cov: Array[Array[Double]], iters: Int,
                   start: Option[Array[Double]] = None): (Array[Double], Double) = {
    val d = cov.length
    var v = start.map(_.clone()).getOrElse(
      Array.fill(d)(1d / math.sqrt(d.toDouble)))
    var it = 0
    while (it < iters) {
      val w = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0d
        val row = cov(i)
        var j = 0
        while (j < d) { s += row(j) * v(j); j += 1 }
        w(i) = s
        i += 1
      }
      var nrm = 0d
      i = 0
      while (i < d) { nrm += w(i) * w(i); i += 1 }
      nrm = math.sqrt(nrm)
      require(nrm > 0, "power iteration collapsed to the zero vector")
      i = 0
      while (i < d) { w(i) /= nrm; i += 1 }
      v = w
      it += 1
    }
    var lambda = 0d
    var i = 0
    while (i < d) {
      var s = 0d
      var j = 0
      while (j < d) { s += cov(i)(j) * v(j); j += 1 }
      lambda += v(i) * s
      i += 1
    }
    (v, lambda)
  }

  /** Top-k principal components via power iteration with Hotelling
    * deflation (C <- C - lambda v v'). Driver-side O(k d^2 iters). */
  def principalComponents(cov: Array[Array[Double]], k: Int,
                          iters: Int = 24): Seq[(Array[Double], Double)] = {
    val d = cov.length
    val work = Array.tabulate(d, d)((i, j) => cov(i)(j))
    (0 until k).map { c =>
      // deterministic NON-uniform start: the uniform vector can be exactly
      // orthogonal to the dominant eigenvector of a deflated matrix (e.g.
      // when PC1 is the all-ones direction), pinning the iterate in a null
      // direction forever
      val start = Array.tabulate(d)(i => 1d + 0.001 * ((i * 31 + c * 17) % 89))
      val (v, lambda) = powerIterate(work, iters, Some(start))
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { work(i)(j) -= lambda * v(i) * v(j); j += 1 }
        i += 1
      }
      (v, lambda)
    }
  }

  /** Covariance as a DataFrame of upper-triangle entries (1-based i <= j,
    * matching SQL array subscripts), rounded for cross-engine comparison.
    * The d(d+1)/2-row result materializes from the single aggregate buffer
    * on the driver — row count depends on d only, never on data size. */
  def covarianceDF(df: DataFrame, vecCol: String, dim: Int,
                   scale: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = moments(df, vecCol, dim)
    val rows = for {
      i <- 0 until dim
      j <- i until dim
    } yield (i + 1, j + 1,
      BigDecimal(m.cov(i)(j)).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    rows.toDF("i", "j", "cov")
  }

  /** PC1 loadings as a DataFrame (1-based dim index, rounded). */
  def pc1LoadingsDF(df: DataFrame, vecCol: String, dim: Int,
                    iters: Int = 24, scale: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (v, _) = powerIterate(moments(df, vecCol, dim).cov, iters)
    v.toSeq.zipWithIndex
      .map { case (x, i) => (i + 1,
        BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .toDF("i", "loading")
  }

  private def round6(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** PC2 loadings in the exact shape the SQL oracle replays: PC1 from the
    * UNIFORM start (matching [[pc1LoadingsDF]]), Hotelling deflation with
    * its Rayleigh quotient, then `iters` more steps from the c=1
    * deterministic non-uniform start (see [[principalComponents]]). */
  def pc2LoadingsDF(df: DataFrame, vecCol: String, dim: Int,
                    iters: Int = 24, scale: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = moments(df, vecCol, dim)
    val (v1, lam1) = powerIterate(m.cov, iters)
    val work = Array.tabulate(dim, dim)((i, j) =>
      m.cov(i)(j) - lam1 * v1(i) * v1(j))
    val start = Array.tabulate(dim)(i => 1d + 0.001 * ((i * 31 + 17) % 89))
    val (v2, _) = powerIterate(work, iters, Some(start))
    v2.toSeq.zipWithIndex
      .map { case (x, i) => (i + 1, round6(x, scale)) }
      .toDF("i", "loading")
  }

  /** One-row variance summary: PC1 Rayleigh quotient, total variance
    * (covariance trace), and the explained-variance ratio. */
  def varianceSummaryDF(df: DataFrame, vecCol: String, dim: Int,
                        iters: Int = 24, scale: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = moments(df, vecCol, dim)
    val (_, lam1) = powerIterate(m.cov, iters)
    val trace = (0 until dim).map(i => m.cov(i)(i)).sum
    Seq((round6(lam1, scale), round6(trace, scale),
        round6(lam1 / trace, scale)))
      .toDF("lambda1", "trace", "var_ratio")
  }

  /** Mean-centered projection of every vector onto PC1 — ONE distributed
    * pass: `(x - mu) . v = x . v - mu . v`, the per-row dot against a
    * broadcast literal (codegen'd), minus a driver-computed constant. */
  def pc1Projection(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                    iters: Int = 24): DataFrame = {
    val m = moments(df, vecCol, dim)
    val (v, _) = powerIterate(m.cov, iters)
    var muDotV = 0d
    var i = 0
    while (i < dim) { muDotV += m.mean(i) * v(i); i += 1 }
    df.select(col(idCol),
      (VectorExpressions.dotProduct(col(vecCol).cast("array<double>"), lit(v))
        - lit(muDotV)).as("pc1"))
  }

  /** Dimensionality reduction onto the top-k principal components — the
    * ANN/whitening preprocessor (decorrelated, variance-ranked
    * coordinates; `whiten = true` additionally scales each coordinate by
    * 1/sqrt(lambda_c) so the projected cloud is isotropic). Output:
    * (idCol, pc) with `pc` an array<double> of length k.
    *
    * Same scale shape as [[pc1Projection]]: the spectrum comes from the
    * single moments aggregate + driver deflation; the data pass is k
    * codegen'd literal dots per row — no join, no shuffle, row-local. */
  def projectTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                  k: Int, iters: Int = 24, whiten: Boolean = false,
                  minLambda: Double = 1e-12): DataFrame = {
    val m = moments(df, vecCol, dim)
    val pcs = principalComponents(m.cov, k, iters)
    val x = col(vecCol).cast("array<double>")
    val coords = pcs.map { case (v, lambda) =>
      var muDotV = 0d
      var i = 0
      while (i < dim) { muDotV += m.mean(i) * v(i); i += 1 }
      val p = VectorExpressions.dotProduct(x, lit(v)) - lit(muDotV)
      if (whiten) p / lit(math.sqrt(math.max(lambda, minLambda))) else p
    }
    df.select(col(idCol), array(coords: _*).as("pc"))
  }
}
