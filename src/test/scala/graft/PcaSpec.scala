package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pca

class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 2-dim cloud with exactly computable population moments:
  // x = (0,0),(2,0),(0,2),(2,2),(4,4) -> mean (1.6, 1.6),
  // E[x0^2] = 24/5, cov00 = 4.8 - 2.56 = 2.24 (= cov11 by symmetry),
  // E[x0*x1] = 20/5, cov01 = 4 - 2.56 = 1.44.
  private lazy val tiny = Seq(
    (1L, Array(0f, 0f)), (2L, Array(2f, 0f)), (3L, Array(0f, 2f)),
    (4L, Array(2f, 2f)), (5L, Array(4f, 4f))).toDF("vec_id", "embedding")

  test("moments: exact mean and population covariance on a hand fixture") {
    val m = Pca.moments(tiny, "embedding", 2)
    assert(m.n == 5)
    assert(m.mean.toSeq == Seq(1.6, 1.6))
    assert(math.abs(m.cov(0)(0) - 2.24) < 1e-12)
    assert(math.abs(m.cov(1)(1) - 2.24) < 1e-12)
    assert(math.abs(m.cov(0)(1) - 1.44) < 1e-12)
    assert(m.cov(0)(1) == m.cov(1)(0))
  }

  test("moments agree with the two-pass definition on real data") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = Pca.moments(df, "embedding", 64)
    // second opinion: mean and one covariance entry from plain SQL aggs
    import org.apache.spark.sql.functions._
    val ref = df.select(
        avg(element_at(col("embedding"), 1).cast("double")).as("mu0"),
        avg(element_at(col("embedding"), 3).cast("double")).as("mu2"),
        avg((element_at(col("embedding"), 1) *
          element_at(col("embedding"), 3)).cast("double")).as("e02"))
      .head()
    // the engine snaps components to the 1e-6 micro grid (engine-stable
    // integer sums), so it agrees with the raw-double two-pass definition
    // to grid resolution, not to fp noise
    assert(math.abs(m.mean(0) - ref.getDouble(0)) < 2e-6)
    val cov02 = ref.getDouble(2) - ref.getDouble(0) * ref.getDouble(1)
    assert(math.abs(m.cov(0)(2) - cov02) < 2e-6)
  }

  test("powerIterate finds the dominant eigenpair of a known 2x2 matrix") {
    // [[2.24, 1.44], [1.44, 2.24]]: eigenpairs (3.68, (1,1)/sqrt2) and
    // (0.8, (1,-1)/sqrt2)
    val c = Array(Array(2.24, 1.44), Array(1.44, 2.24))
    val (v, lambda) = Pca.powerIterate(c, iters = 50)
    assert(math.abs(lambda - 3.68) < 1e-12)
    assert(math.abs(v(0) - 1 / math.sqrt(2)) < 1e-12)
    assert(math.abs(v(1) - 1 / math.sqrt(2)) < 1e-12)
  }

  test("principalComponents: deflation recovers the full spectrum") {
    val c = Array(Array(2.24, 1.44), Array(1.44, 2.24))
    val pcs = Pca.principalComponents(c, k = 2, iters = 60)
    assert(math.abs(pcs(0)._2 - 3.68) < 1e-10)
    assert(math.abs(pcs(1)._2 - 0.8) < 1e-10)
    // orthogonality of the two eigenvectors
    val dot = pcs(0)._1.zip(pcs(1)._1).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-8)
  }

  test("eigen residual |Cv - lambda v| is small on real embeddings") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = Pca.moments(df, "embedding", 64)
    val (v, lambda) = Pca.powerIterate(m.cov, iters = 200)
    val resid = (0 until 64).map { i =>
      val cv = (0 until 64).map(j => m.cov(i)(j) * v(j)).sum
      math.pow(cv - lambda * v(i), 2)
    }.sum
    assert(lambda > 0)
    assert(math.sqrt(resid) / lambda < 1e-6,
      s"residual ${math.sqrt(resid)} vs lambda $lambda")
  }

  test("projection variance equals the PC1 eigenvalue (converged)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = Pca.moments(df, "embedding", 64)
    val (_, lambda) = Pca.powerIterate(m.cov, iters = 200)
    val p = Pca.pc1Projection(df, "vec_id", "embedding", 64, iters = 200)
      .collect().map(_.getDouble(1))
    val n = p.length.toDouble
    val mu = p.sum / n
    val varP = p.map(x => (x - mu) * (x - mu)).sum / n
    // population variance of the centered projection = Rayleigh quotient
    // (projection uses RAW components against grid-moment eigenvectors, so
    // agreement is to micro-grid resolution)
    assert(math.abs(varP - lambda) / lambda < 1e-4,
      s"var $varP vs lambda $lambda")
    // and projections are centered (we subtract mu . v)
    assert(math.abs(mu) < 1e-5)
  }

  test("covarianceDF emits the 1-based upper triangle with PSD diagonal") {
    val rows = Pca.covarianceDF(tiny, "embedding", 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(rows.keySet == Set((1, 1), (1, 2), (2, 2)))
    assert(rows((1, 1)) == 2.24 && rows((2, 2)) == 2.24)
    assert(rows((1, 2)) == 1.44)
    rows.foreach { case ((i, j), c) => if (i == j) assert(c >= 0) }
  }

  test("pc2LoadingsDF is unit-norm and orthogonal to PC1") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val v1 = Pca.pc1LoadingsDF(df, "embedding", 64, iters = 200).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val v2 = Pca.pc2LoadingsDF(df, "embedding", 64, iters = 200).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(v2.size == 64)
    assert(math.abs(v2.values.map(x => x * x).sum - 1.0) < 1e-4)
    val dot = (1 to 64).map(i => v1(i) * v2(i)).sum
    assert(math.abs(dot) < 1e-3, s"pc1.pc2 = $dot") // rounded to 6dp each
  }

  test("varianceSummaryDF: 0 < lambda1 <= trace, ratio consistent") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val r = Pca.varianceSummaryDF(df, "embedding", 64).head()
    val (lam, tr, ratio) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(lam > 0 && tr >= lam)
    assert(math.abs(ratio - lam / tr) < 1e-5)
  }

  test("projectTopK: coordinates are decorrelated with variance = lambda_c") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pcs = Pca.principalComponents(
      Pca.moments(df, "embedding", 64).cov, k = 3, iters = 300)
    val rows = Pca.projectTopK(df, "vec_id", "embedding", 64, k = 3,
      iters = 300).collect().map(_.getSeq[Double](1))
    val n = rows.length.toDouble
    for (c <- 0 until 3) {
      val xs = rows.map(_(c))
      val mu = xs.sum / n
      assert(math.abs(mu) < 1e-5) // mean-centered (to micro-grid noise)
      val v = xs.map(x => (x - mu) * (x - mu)).sum / n
      assert(math.abs(v - pcs(c)._2) / pcs(c)._2 < 1e-4,
        s"coord $c variance $v vs lambda ${pcs(c)._2}")
    }
    // decorrelation: off-diagonal covariance of the projected cloud ~ 0
    for (a <- 0 until 3; b <- a + 1 until 3) {
      val cab = rows.map(r => r(a) * r(b)).sum / n
      assert(math.abs(cab) < 1e-4, s"cov($a,$b) = $cab")
    }
  }

  test("projectTopK whitening makes every coordinate unit variance") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = Pca.projectTopK(df, "vec_id", "embedding", 64, k = 2,
      iters = 300, whiten = true).collect().map(_.getSeq[Double](1))
    val n = rows.length.toDouble
    for (c <- 0 until 2) {
      val xs = rows.map(_(c))
      val v = xs.map(x => x * x).sum / n - math.pow(xs.sum / n, 2)
      assert(math.abs(v - 1.0) < 1e-3, s"whitened coord $c variance $v")
    }
  }

  test("moments are BIT-identical across partition layouts") {
    // the r8 e_covariance lesson: double moment sums depend on merge
    // order, so "green once" is not deterministic. The integer micro-grid
    // engine must produce the exact same unrounded doubles whether the
    // input arrives in 2 partitions or 32.
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Pca.moments(df.repartition(2), "embedding", 64)
    val b = Pca.moments(df.repartition(32), "embedding", 64)
    assert(a.n == b.n)
    assert(a.mean.toSeq == b.mean.toSeq) // exact ==, no tolerance
    for (i <- 0 until 64; j <- 0 until 64)
      assert(a.cov(i)(j) == b.cov(i)(j),
        s"cov($i,$j) differs across partition layouts")
  }

  test("micro() matches BigDecimal HALF_UP bit-for-bit (the SQL round contract)") {
    // the r9-advice counterexample: 0.49999999999999994 * 1 — fp
    // floor(abs+0.5) ties UP to 1 while HALF_UP on the exact double
    // value rounds to 0. micro() must agree with the SQL engines.
    def sqlRound(x: Double): Long = {
      val y = x * 1e6
      BigDecimal(y).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val tricky = Seq(
      0.49999999999999994e-6, -0.49999999999999994e-6, // the tie-up trap
      0.5e-6, -0.5e-6, 1.5e-6, -1.5e-6, 2.5e-6, -2.5e-6, // exact ties
      0.0, -0.0, 1e-7, -1e-7, 0.123456789, -0.987654321,
      999.9999995, -999.9999995)
    for (x <- tricky)
      assert(Pca.micro(x) == sqlRound(x), s"micro($x)")
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20000) {
      val x = (rnd.nextDouble() - 0.5) * 2000.0
      assert(Pca.micro(x) == sqlRound(x), s"micro($x)")
    }
  }

  test("fixed-iteration loadings are deterministic across invocations") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Pca.pc1LoadingsDF(df, "embedding", 64).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val b = Pca.pc1LoadingsDF(df, "embedding", 64).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(a == b)
    // unit norm (to rounding)
    assert(math.abs(a.values.map(x => x * x).sum - 1.0) < 1e-4)
  }
}
