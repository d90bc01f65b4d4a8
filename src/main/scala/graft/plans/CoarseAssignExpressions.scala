package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Row-local coarse assignment against a FROZEN centroid/seed matrix —
  * the ANN hot path, as one constant-size expression.
  *
  * The previous formulation built a literal `array(struct(dist_0, 0),
  * ..., struct(dist_{nlist-1}, nlist-1))` with one dot-product expression
  * PER CELL: at the sqrt(n) cell counts a big corpus uses (~2828 cells at
  * 8M vectors), the generated code blew janino's method/class limits and
  * the WHOLE stage fell back to interpreted eval — the round-13 ladder's
  * scale-killer (VERDICT r13 #5). These expressions instead carry the
  * centroid matrix as a broadcast-style reference object (the same
  * mechanism literals use) and run ONE doubly-nested primitive loop whose
  * generated code is ~a method call, independent of nlist: whole-stage
  * codegen survives any cell count, and the loop body is the DotProduct
  * accumulation, bit-identical to the per-cell expression form.
  *
  * Both expressions keep the library's engine-exact contracts:
  *  - [[NearestCells]]: dist = (long)(|v|^2 - 2 v.c + |c|^2) over micro-int
  *    doubles, ties to the lowest cell id — the ONE definition of
  *    coarse-cell order shared by fit-side assignment and search-side
  *    probing (a change here cannot desync the two).
  *  - [[NearestSeeds]]: score = -round(cos, 6) with Spark Round's
  *    HALF_UP/NaN semantics, ties to the lowest seed INDEX (== lowest
  *    seed id: seeds are collected in ascending id order).
  */
object CoarseAssign {

  /** Insertion-sorted top-k by (score asc, index asc); `scores` is
    * filled per candidate by the caller. Shared by both expressions —
    * k is tiny (1..nprobe), so the shift is a few moves. Returns how
    * many slots are filled. */
  @inline private[plans] def insertTopK(
      bd: Array[Double], bi: Array[Int], filled: Int,
      d: Double, i: Int): Int = {
    val kk = bd.length
    if (filled == kk) {
      val last = kk - 1
      // NaN-safe: NaN never beats (Spark orders NaN greatest)
      if (!(d < bd(last) || (d == bd(last) && i < bi(last)))) return filled
    }
    var p = math.min(filled, kk - 1)
    while (p > 0 && (bd(p - 1) > d || (bd(p - 1) == d && bi(p - 1) > i))) {
      bd(p) = bd(p - 1); bi(p) = bi(p - 1); p -= 1
    }
    bd(p) = d; bi(p) = i
    math.min(filled + 1, kk)
  }
}

/** Top-`k` nearest coarse cells of a micro-int vector: returns
  * `array<struct<dist: long, cell: int>>` ordered by (dist asc, cell
  * asc) — exactly `slice(array_sort(cellArray), 1, k)` of the old
  * per-cell literal form, at constant generated-code size.
  *
  * `cents(i)` is cell `cellIds(i)`'s micro-int centroid; `c2(i)` its
  * precomputed |c|^2 (driver-side, same left-to-right sum as the old
  * `cm.map(x*x).sum` literal). Children: the micro-int vector (`vm`,
  * array<double>) and its |v|^2 (`vm2`, double). */
case class NearestCells(vm: Expression, vm2: Expression,
    cents: Array[Array[Double]], c2: Array[Double], cellIds: Array[Int],
    k: Int) extends BinaryExpression {
  require(cents.length == c2.length && cents.length == cellIds.length,
    "centroid matrix / norms / ids length mismatch")
  require(k >= 1, "need k >= 1")

  override def left: Expression = vm
  override def right: Expression = vm2

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dist", LongType, nullable = false),
    StructField("cell", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    vm.dataType match {
      case ArrayType(DoubleType, _) if vm2.dataType == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cells needs (array<double>, double), got " +
            s"${vm.dataType.simpleString} / ${vm2.dataType.simpleString}")
    }

  /** The whole argmin/top-k, called from BOTH eval paths — generated
    * code is one invocation regardless of nlist, and the JIT compiles
    * this loop as hot as codegen would. */
  def compute(a: ArrayData, v2: Double): ArrayData = {
    val n = cents.length
    val kk = math.min(k, n)
    val bd = new Array[Double](kk)
    val bi = new Array[Int](kk)
    var filled = 0
    var i = 0
    while (i < n) {
      val cm = cents(i)
      val len = math.min(a.numElements(), cm.length)
      var acc = 0.0
      var j = 0
      while (j < len) { acc += a.getDouble(j) * cm(j); j += 1 }
      // same association as the expression form:
      // ((vm2 - 2.0*dot) + c2), then cast long — exact integers < 2^53
      val dist = (v2 - 2.0 * acc + c2(i)).toLong
      // order by (dist, cellId): encode dist as double (exact below
      // 2^53 — micro-int geometry guarantees it) and tie on the id
      filled = CoarseAssign.insertTopK(bd, bi, filled, dist.toDouble,
        cellIds(i))
      i += 1
    }
    val rows = new Array[Any](filled)
    var r = 0
    while (r < filled) {
      rows(r) = InternalRow(bd(r).toLong, bi(r)); r += 1
    }
    new GenericArrayData(rows)
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData],
      r.asInstanceOf[java.lang.Number].doubleValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this,
      classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCells =
    copy(vm = newLeft, vm2 = newRight)
}

/** Top-`k` seed INDEXES of a raw vector by cosine: returns `array<int>`
  * ordered by (-round(cos, 6) asc, index asc) — the [[NearestCells]]
  * story for the cosine coarse quantizer. Seeds are collected in
  * ascending id order, so index order IS seed-id order and the caller
  * maps index -> id through one literal array lookup.
  *
  * `round(cos, 6)` replicates Spark's Round(DoubleType, HALF_UP)
  * exactly, including the NaN/Infinity pass-through, so verdicts are
  * bit-identical to the old `-round(dot/(vn*sn), 6)` expression (and to
  * the DuckDB oracle). Children: the vector (`v`, array<float|double>)
  * and its norm (`vn`, double). */
case class NearestSeeds(v: Expression, vn: Expression,
    seeds: Array[Array[Double]], sn: Array[Double], k: Int)
    extends BinaryExpression {
  require(seeds.length == sn.length, "seed matrix / norms length mismatch")
  require(k >= 1, "need k >= 1")

  override def left: Expression = v
  override def right: Expression = vn

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    v.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
          if vn.dataType == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_seeds needs (array<float|double>, double), got " +
            s"${v.dataType.simpleString} / ${vn.dataType.simpleString}")
    }

  @transient private lazy val vIsFloat =
    v.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Spark `Round(_, 6)` over a double: HALF_UP via BigDecimal.valueOf,
    * NaN/Infinity passed through (they are not representable as
    * BigDecimal and Spark short-circuits them the same way). */
  @inline private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def compute(a: ArrayData, nrm: Double): ArrayData = {
    val n = seeds.length
    val kk = math.min(k, n)
    val bd = new Array[Double](kk)
    val bi = new Array[Int](kk)
    var filled = 0
    val isF = vIsFloat
    var i = 0
    while (i < n) {
      val sv = seeds(i)
      val len = math.min(a.numElements(), sv.length)
      var acc = 0.0
      var j = 0
      if (isF) while (j < len) { acc += a.getFloat(j).toDouble * sv(j); j += 1 }
      else while (j < len) { acc += a.getDouble(j) * sv(j); j += 1 }
      val negCos = -round6(acc / (nrm * sn(i)))
      filled = CoarseAssign.insertTopK(bd, bi, filled, negCos, i)
      i += 1
    }
    val out = new Array[Int](filled)
    System.arraycopy(bi, 0, out, 0, filled)
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData],
      r.asInstanceOf[java.lang.Number].doubleValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestSeeds", this,
      classOf[NearestSeeds].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestSeeds =
    copy(v = newLeft, vn = newRight)
}

/** Nearest PQ codeword of a micro-int SUBvector, the codebook selected by
  * the row's `sub` value: returns `struct<dist: long, code: int>` — the
  * [[NearestCells]] story for the PQ encode path. The old formulation
  * (`array_min(array(struct(...)))` per codeword, chained in a
  * `when(sub === s, ...)` ladder across subspaces) generated code
  * proportional to m x codebookSize x dim and blew janino's method limit
  * at exactly the codebook sizes a big corpus trains (VERDICT r13 #5's
  * second site — pqFit/ivfPqFit/addToSavedIvfPq all encode through here).
  *
  * Engine-exact contract unchanged: dist = (long)((sv2 - 2 sv.c) + c2)
  * over integer-valued doubles (< 2^53, same association as the
  * expression form), ties to the LOWEST code — the total order the SQL
  * replay's min-of-struct uses. `books(s)(i)` is subspace s's codeword
  * with id `codeIds(s)(i)`; `c2(s)(i)` its precomputed |c|^2. */
case class NearestSubCode(sv: Expression, sv2: Expression, sub: Expression,
    books: Array[Array[Array[Double]]], c2: Array[Array[Double]],
    codeIds: Array[Array[Int]])
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  require(books.length == c2.length && books.length == codeIds.length,
    "codebook / norms / ids subspace count mismatch")

  override def first: Expression = sv
  override def second: Expression = sv2
  override def third: Expression = sub

  override def dataType: DataType = StructType(Seq(
    StructField("dist", LongType, nullable = false),
    StructField("code", IntegerType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    sv.dataType match {
      case ArrayType(DoubleType, _)
          if sv2.dataType == DoubleType && sub.dataType == IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_sub_code needs (array<double>, double, int), got " +
            s"${sv.dataType.simpleString} / ${sv2.dataType.simpleString} / " +
            s"${sub.dataType.simpleString}")
    }

  def compute(a: ArrayData, v2: Double, s: Int): InternalRow = {
    // subspace guard (ADVICE r14): callers generate sub in [0, m) today,
    // but an out-of-range sub from a geometry-mismatched caller must name
    // the mismatch, not throw AIOOBE from generated code.
    if (s < 0 || s >= books.length)
      throw new IllegalArgumentException(
        s"nearest_sub_code: subspace index $s is outside [0, " +
          s"${books.length}): the row's sub value was generated under a " +
          "different PQ subspace count m than this codebook's")
    val cms = books(s)
    val n2s = c2(s)
    val ids = codeIds(s)
    var bestD = Double.NaN
    var bestI = Int.MaxValue
    var have = false
    var i = 0
    while (i < cms.length) {
      val cm = cms(i)
      val len = math.min(a.numElements(), cm.length)
      var acc = 0.0
      var j = 0
      while (j < len) { acc += a.getDouble(j) * cm(j); j += 1 }
      val dist = (v2 - 2.0 * acc + n2s(i)).toLong
      val d = dist.toDouble // exact below 2^53 (micro-int geometry)
      // (dist, code) min with NaN greatest, ties to the lowest code —
      // array_min's total order over the old struct array
      if (!have || d < bestD || (d == bestD && ids(i) < bestI)) {
        bestD = d; bestI = ids(i); have = true
      }
      i += 1
    }
    InternalRow(bestD.toLong, bestI)
  }

  override protected def nullSafeEval(l: Any, m: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData],
      m.asInstanceOf[java.lang.Number].doubleValue(),
      r.asInstanceOf[java.lang.Number].intValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestSubCode", this,
      classOf[NearestSubCode].getName)
    nullSafeCodeGen(ctx, ev,
      (a, b, c) => s"${ev.value} = $ref.compute($a, $b, $c);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): NearestSubCode =
    copy(sv = newFirst, sv2 = newSecond, sub = newThird)
}

object CoarseAssignExpressions {
  import org.apache.spark.sql.graftshim.ColumnShims

  /** Top-`k` (dist, cell) structs for a micro-int vector against the
    * frozen cells, nearest first. */
  def nearestCells(vm: Column, vm2: Column,
                   cents: Seq[(Int, Array[Double])], k: Int): Column =
    ColumnShims.column(NearestCells(
      ColumnShims.expression(vm), ColumnShims.expression(vm2),
      cents.map(_._2).toArray,
      cents.map(_._2.map(x => x * x).sum).toArray,
      cents.map(_._1).toArray, k))

  /** Top-`k` seed indexes for a raw vector by cosine, best first. */
  def nearestSeeds(v: Column, vn: Column, seeds: Seq[Array[Double]],
                   k: Int): Column =
    ColumnShims.column(NearestSeeds(
      ColumnShims.expression(v), ColumnShims.expression(vn),
      seeds.toArray,
      seeds.map(s => math.sqrt(s.map(x => x * x).sum)).toArray, k))

  /** Best (dist, code) struct for a micro-int subvector against the
    * codebook of its row's subspace. `books(s)` must be sorted by code
    * id ascending (the pqFit collect order). */
  def nearestSubCode(sv: Column, sv2: Column, sub: Column,
      books: IndexedSeq[IndexedSeq[(Int, Array[Double])]]): Column =
    ColumnShims.column(NearestSubCode(
      ColumnShims.expression(sv), ColumnShims.expression(sv2),
      ColumnShims.expression(sub),
      books.map(_.map(_._2).toArray).toArray,
      books.map(_.map(_._2.map(x => x * x).sum).toArray).toArray,
      books.map(_.map(_._1).toArray).toArray))

  /** A centroid matrix as ONE nested-array literal — a single reference
    * object, zero per-cell generated code (the old `array(typedlit(c0),
    * ..., typedlit(c_{nlist-1}))` emitted per-element writes, another
    * nlist-proportional codegen term). Position i holds the i-th
    * centroid; callers index by a DENSE cell id (fit re-indexes
    * densely; load sorts by cell id). */
  def centroidMatrix(cents: Seq[Array[Double]]): Column =
    ColumnShims.column(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        cents.map(_.toSeq),
        ArrayType(ArrayType(DoubleType, containsNull = false),
          containsNull = false)))

  /** An id list (any id type) as ONE array literal, for index -> id
    * lookups next to [[nearestSeeds]]. */
  def idArray(ids: Seq[Any], idType: DataType): Column =
    ColumnShims.column(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        ids, ArrayType(idType)))
}
