package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftBridge

/** Dense linear-algebra kernels as fused Catalyst expressions.
  *
  * The higher-order-function formulation of a d×d rotation — one
  * `aggregate ∘ zip_with` fold per OUTPUT dimension — is semantically
  * right but evaluates interpreted: d zip arrays allocated and d boxed
  * folds per row (d² lambda invocations — 8.2 M per thousand rows at
  * d = 64). Same lesson as the text sketches (t9/t10/d12): one
  * imperative pass per row replaces all of it.
  */
object Vectors {

  /** `y = R·x` for a literal row-major matrix `R` (the OPQ rotation
    * shape). Bit-identical to the `aggregate(zip_with(x, row), 0, +)`
    * per-output-row formulation it replaces: the inner loop is the
    * same ascending-index left fold over the same doubles, so fitted
    * quantizers, index fingerprints and golden ladder values are
    * unchanged (parity-gated in spec).
    */
  def matVec(vec: Column, r: Array[Array[Double]]): Column =
    GraftBridge.toColumn(MatVecExpr(GraftBridge.toExpression(vec), r))

  /** Argmin-L2² index of `vec` against a literal centroid table — the
    * [[graft.operators.Similarity.ivfAssign]] kernel. Ties (possible
    * only for bit-identical distances) resolve to the lowest index,
    * exactly like the `array_position(dists, array_min(dists))`
    * formulation it replaces (first strict minimum wins).
    */
  def nearestCentroid(vec: Column, centroids: Array[Array[Double]],
      roundTo: Int = -1): Column =
    GraftBridge.toColumn(
      NearestCentroidExpr(GraftBridge.toExpression(vec), centroids, roundTo))

  /** The whole PQ code in one pass: per block `j`, the argmin-L2² of
    * `vec[j·dsub, (j+1)·dsub)` against codebook `j` — replaces m × ksub
    * `aggregate ∘ zip_with ∘ slice` folds (128 interpreted folds per row
    * at the probe config) with one imperative loop nest. Identical
    * per-block fold order and first-min tie rule.
    */
  def pqCode(vec: Column, codebooks: Array[Array[Array[Double]]],
      roundTo: Int = -1): Column =
    GraftBridge.toColumn(
      PqEncodeExpr(GraftBridge.toExpression(vec), codebooks, roundTo))

  /** ADC distance of a PQ code against precomputed per-block lookup
    * tables (the query-side literals): `Σ_j luts[j][code[j]]`, the same
    * left-to-right add chain as the `element_at ∘ reduce(_ + _)`
    * formulation.
    */
  def adcSum(code: Column, luts: Array[Array[Double]]): Column =
    GraftBridge.toColumn(AdcSumExpr(GraftBridge.toExpression(code), luts))

  /** `vec − table[idx]` with a literal row table — the coarse-residual
    * kernel (`x − c(x)`), replacing
    * `zip_with(v, element_at(tableLit, idx + 1), _ − _)`.
    */
  def subIndexedRow(vec: Column, idx: Column,
      table: Array[Array[Double]]): Column =
    GraftBridge.toColumn(SubIndexedRowExpr(GraftBridge.toExpression(vec),
      GraftBridge.toExpression(idx), table))

  /** Fused cosine similarity of two `array<double>` columns — the
    * exact-scan kernel (`Similarity.cosine`), replacing THREE
    * interpreted `aggregate ∘ zip_with` folds per row (dot + both
    * norms: 3·d boxed lambda invocations) with one imperative pass.
    * Bit-identical to the HOF formulation it replaces: the same three
    * ascending left folds over the same doubles, `√na·√nb` then one
    * division, and the same degenerate-input contract — NULL array,
    * null element, length mismatch (zip_with's null padding), zero
    * norm, or NaN quotient all score 0.0 (parity-gated in spec against
    * the retained HOF twin, bit-for-bit).
    */
  def cosine(a: Column, b: Column): Column =
    GraftBridge.toColumn(CosineExpr(GraftBridge.toExpression(a),
      GraftBridge.toExpression(b)))

  /** [[adcSum]] with a PER-LIST table selected in-row by `idx` (the
    * row's coarse list id): `Σ_j luts[idx][j][code[j]]` — the
    * residual-IVFADC scan kernel, where the lookup table depends on
    * which probed list the candidate lives in. `luts` is indexed by
    * centroid id directly (entries for unprobed lists are never read —
    * candidate rows are pre-filtered to probed lists). Same
    * left-to-right add chain as the `element_at` chain it replaces.
    */
  def adcSumIndexed(code: Column, idx: Column,
      luts: Array[Array[Array[Double]]]): Column =
    GraftBridge.toColumn(AdcSumIndexedExpr(GraftBridge.toExpression(code),
      GraftBridge.toExpression(idx), luts))
}

case class MatVecExpr(child: Expression, r: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "mat_vec"

  // a null-bearing array yields NULL even under a non-nullable child
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val x = VectorKernels.doublesOrNull(input.asInstanceOf[ArrayData])
    if (x == null) return null
    val n = r.length
    val out = new Array[Double](n)
    var j = 0
    while (j < n) {
      val row = r(j)
      require(x.length == row.length,
        s"mat_vec: vector length ${x.length} != matrix columns ${row.length}")
      var s = 0.0
      var i = 0
      while (i < row.length) { s += x(i) * row(i); i += 1 }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class NearestCentroidExpr(child: Expression,
    centroids: Array[Array[Double]], roundTo: Int = -1)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "nearest_centroid"

  // a null-bearing array yields NULL even under a non-nullable child
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val x = VectorKernels.doublesOrNull(input.asInstanceOf[ArrayData])
    if (x == null) null
    else VectorKernels.argminL2(x, 0, x.length, centroids, roundTo)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PqEncodeExpr(child: Expression,
    codebooks: Array[Array[Array[Double]]], roundTo: Int = -1)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "pq_encode"

  // a null-bearing array yields NULL even under a non-nullable child
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val x = VectorKernels.doublesOrNull(input.asInstanceOf[ArrayData])
    if (x == null) return null
    val m = codebooks.length
    val out = new Array[Int](m)
    var j = 0
    var off = 0
    while (j < m) {
      val book = codebooks(j)
      val dsub = book(0).length
      out(j) = VectorKernels.argminL2(x, off, dsub, book, roundTo)
      off += dsub
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class AdcSumExpr(child: Expression, luts: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "adc_sum"

  // a null-bearing array yields NULL even under a non-nullable child
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val code = input.asInstanceOf[ArrayData]
    // representation-mismatch guard: a pq_code shorter than the LUT
    // count (stale or foreign index past the fingerprint gate) must
    // fail loudly, never read past the array into garbage distances
    require(code.numElements() == luts.length,
      s"adc_sum: pq_code has ${code.numElements()} blocks, " +
        s"expected ${luts.length}")
    var i = 0
    while (i < luts.length) { // null code element -> null adist (old
      if (code.isNullAt(i)) return null // element_at-chain semantics)
      i += 1
    }
    // reduce(_ + _) parity: seed from block 0, left-add the rest
    var s = luts(0)(code.getInt(0))
    var j = 1
    while (j < luts.length) { s += luts(j)(code.getInt(j)); j += 1 }
    s
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class CosineExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  // total over degenerate inputs BY CONTRACT (never null): the HOF
  // formulation ends in coalesce(..., 0.0)
  override def nullable: Boolean = false

  // eval (not nullSafeEval): a NULL input array must score 0.0, not
  // propagate null — coalesce semantics live inside the kernel
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) return 0.0
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // zip_with pads a length mismatch with null -> null product ->
    // null fold -> 0.0 after coalesce
    if (n != y.numElements()) return 0.0
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      // a null element nulls the whole fold -> 0.0
      if (x.isNullAt(i) || y.isNullAt(i)) return 0.0
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    // try_divide: a zero divisor yields null -> 0.0; nanvl maps a NaN
    // quotient (0/0, inf/inf, NaN elements) to 0.0
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0
    else {
      val q = dot / denom
      if (java.lang.Double.isNaN(q)) 0.0 else q
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class AdcSumIndexedExpr(left: Expression, right: Expression,
    luts: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "adc_sum_indexed"

  // a null-bearing array yields NULL even under a non-nullable child
  override def nullable: Boolean = true

  override def nullSafeEval(codeAny: Any, idxAny: Any): Any = {
    val code = codeAny.asInstanceOf[ArrayData]
    val idx = idxAny.asInstanceOf[Int]
    // representation-mismatch guards, like adc_sum: a foreign list id
    // or short code must fail loudly, never read garbage distances
    require(idx >= 0 && idx < luts.length,
      s"adc_sum_indexed: list id $idx outside the ${luts.length}-entry " +
        "LUT table")
    val lut = luts(idx)
    require(code.numElements() == lut.length,
      s"adc_sum_indexed: pq_code has ${code.numElements()} blocks, " +
        s"expected ${lut.length}")
    var i = 0
    while (i < lut.length) { // null code element -> null adist
      if (code.isNullAt(i)) return null
      i += 1
    }
    var s = lut(0)(code.getInt(0))
    var j = 1
    while (j < lut.length) { s += lut(j)(code.getInt(j)); j += 1 }
    s
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class SubIndexedRowExpr(left: Expression, right: Expression,
    table: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "sub_indexed_row"

  // a null-bearing array yields NULL even under a non-nullable child
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any, i: Any): Any = {
    val x = VectorKernels.doublesOrNull(v.asInstanceOf[ArrayData])
    if (x == null) return null
    val row = table(i.asInstanceOf[Int])
    require(x.length == row.length,
      s"sub_indexed_row: vector length ${x.length} != row length ${row.length}")
    val out = new Array[Double](x.length)
    var k = 0
    while (k < x.length) { out(k) = x(k) - row(k); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Shared imperative kernels — fold order matches the HOF formulations
  * they replace exactly (ascending index, left fold, strict-< first-min
  * tie rule).
  */
private[functions] object VectorKernels {

  /** NULL-element seam: `ArrayData.toDoubleArray`/`getInt` silently
    * read a null element as 0, which would score garbage where the
    * replaced HOF formulations propagated NULL (null zip product →
    * null fold → null distance/code → the row never claims a top-k
    * slot). A null-bearing array makes the whole kernel result NULL
    * instead — same downstream effect, one O(d) check.
    */
  def doublesOrNull(a: ArrayData): Array[Double] = {
    var i = 0
    val n = a.numElements()
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    a.toDoubleArray()
  }

  /** First index of the minimal `Σ_i (x[off+i] − c[i])²` over the
    * centroid table (ascending scan, strict <) — bit-equal to
    * `array_position(dists, array_min(dists)) − 1` for the same
    * distances.
    */
  def argminL2(x: Array[Double], off: Int, len: Int,
      centroids: Array[Array[Double]], roundTo: Int = -1): Int = {
    require(off + len <= x.length,
      s"argmin_l2: slice [$off, ${off + len}) exceeds vector length ${x.length}")
    var best = 0
    var bd = Double.NaN
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      require(cent.length == len,
        s"argmin_l2: centroid length ${cent.length} != slice length $len")
      var s = 0.0
      var i = 0
      while (i < len) { val d = x(off + i) - cent(i); s += d * d; i += 1 }
      // roundTo >= 0: the oracle-checked form — compare 6-d.p.-rounded
      // distances (Spark Round semantics: decimal HALF_UP of the
      // double), so a SQL twin's rounded relational argmin ranks
      // identically (the s22 discipline)
      if (roundTo >= 0)
        s = java.math.BigDecimal.valueOf(s)
          .setScale(roundTo, java.math.RoundingMode.HALF_UP).doubleValue()
      if (c == 0 || s < bd) { bd = s; best = c }
      c += 1
    }
    best
  }
}
