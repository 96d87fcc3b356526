package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftBridge

/** Native Catalyst expressions for the dedup sketches (SURVEY.md §2.10).
  *
  * The pure higher-order-function formulation (`transform` ∘ `aggregate`
  * over shingle arrays) is semantically right but evaluates interpreted,
  * re-hashes every shingle `numHashes` times, and gets duplicated by
  * projection collapse into every LSH band — O(bands × hashes × shingles)
  * interpreted evals per document. These expressions do one imperative
  * pass per row: one 64-bit hash per shingle, then `numHashes` affine
  * transforms (the standard universal-hashing MinHash trick), so a
  * document costs O(shingles + hashes) regardless of band count.
  */
object Sketches {

  /** Deterministic odd multipliers / offsets for the affine hash family
    * h_k(x) = a_k * x + b_k (mod 2^64). Fixed seed → reproducible
    * signatures across runs and engines.
    */
  private[functions] def affineParams(numHashes: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(0x5EED5EEDL)
    val a = Array.fill(numHashes)(rnd.nextLong() | 1L) // odd → bijective mod 2^64
    val b = Array.fill(numHashes)(rnd.nextLong())
    (a, b)
  }

  def minhashSignature(shingles: Column, numHashes: Int): Column =
    GraftBridge.toColumn(
      MinHashSignatureExpr(GraftBridge.toExpression(shingles), numHashes))

  def simhash64(words: Column): Column =
    GraftBridge.toColumn(SimHash64Expr(GraftBridge.toExpression(words)))
}

/** MinHash signature of an `array<string>` shingle set: element k is
  * min over shingles of a_k * xxhash64(shingle) + b_k. Empty/null-only
  * arrays yield a signature of Long.MaxValue sentinels (no shingle
  * evidence — never collides with real minima in practice).
  */
case class MinHashSignatureExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_signature"

  private lazy val (mulA, addB) = Sketches.affineParams(numHashes)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var k = 0
        while (k < numHashes) {
          val h = mulA(k) * base + addB(k)
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of an `array<string>` token array: bit i is set when
  * the sum over tokens of ±1 (sign of bit i of the token's xxhash64) is
  * positive. One hash + 64 bit-tests per token, single pass.
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
