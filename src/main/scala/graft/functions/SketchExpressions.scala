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

  def minhashSignature(words: Column, numHashes: Int, shingleSize: Int): Column =
    GraftBridge.toColumn(
      MinHashSignatureExpr(GraftBridge.toExpression(words), numHashes, shingleSize))

  /** ENGINE-PORTABLE MinHash signature (see [[MinHashPortableExpr]]) —
    * the md5-hex hash family a DuckDB oracle re-derives relationally. */
  def minhashPortable(words: Column, numHashes: Int, shingleSize: Int): Column =
    GraftBridge.toColumn(
      MinHashPortableExpr(GraftBridge.toExpression(words), numHashes, shingleSize))

  /** ENGINE-PORTABLE 64-bit SimHash as two 32-bit halves (see
    * [[SimHashPortableExpr]]). */
  def simhashPortable(words: Column): Column =
    GraftBridge.toColumn(SimHashPortableExpr(GraftBridge.toExpression(words)))

  /** First 32 bits of a string's MD5 as an unsigned value in a Long —
    * the driver-side twin of Spark `conv(substring(md5(x),1,8),16,10)`
    * ≡ DuckDB `('0x'||substring(md5(x),1,8))::UBIGINT` (the CLAUDE.md
    * md5-hex gate recipe, here used to derive hash-family parameters
    * both engines can recompute). */
  private[functions] def md5_32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }

  def simhash64(words: Column): Column =
    GraftBridge.toColumn(SimHash64Expr(GraftBridge.toExpression(words)))

  /** SimHash straight from the text column: tokenization (lowercase
    * alphanumeric runs, same rule as `TextFunctions.words`) fused into
    * the expression — no interpreted split/filter HOF stage.
    */
  def simhash64Text(text: Column): Column =
    GraftBridge.toColumn(SimHashTextExpr(GraftBridge.toExpression(text)))

  /** Fused word-shingle strings straight from the text column (see
    * [[WordShinglesExpr]]) — drop-in for
    * `TextFunctions.wordShingles(text, n)` on hot paths.
    */
  def wordShinglesText(text: Column, n: Int): Column =
    GraftBridge.toColumn(WordShinglesExpr(GraftBridge.toExpression(text), n))

  def ngramJaccard(wordsA: Column, wordsB: Column, shingleSize: Int): Column =
    GraftBridge.toColumn(NgramJaccardExpr(
      GraftBridge.toExpression(wordsA), GraftBridge.toExpression(wordsB), shingleSize))

  /** Column form of [[shingleHashes]]: the distinct shingle-hash array of
    * a word array — the posting unit for similarity-join indexing
    * (8 B/shingle over the wire vs ~30 B shingle strings; collisions only
    * ever ADD candidates, which the exact verify then rejects).
    */
  def shingleHashArray(words: Column, shingleSize: Int): Column =
    GraftBridge.toColumn(ShingleHashesExpr(
      GraftBridge.toExpression(words), shingleSize))

  /** Jaccard of two sorted long arrays (see [[SortedLongJaccardExpr]]). */
  def sortedJaccard(a: Column, b: Column): Column =
    GraftBridge.toColumn(SortedLongJaccardExpr(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b)))

  /** Intersection size of two sorted long arrays (see
    * [[SortedLongOverlapExpr]]) — the overlap numerator for containment /
    * overlap-coefficient verifies.
    */
  def sortedOverlap(a: Column, b: Column): Column =
    GraftBridge.toColumn(SortedLongOverlapExpr(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b)))

  /** Position-indexed (non-distinct) 128-bit window digests of a word
    * array (see [[WindowDigestsExpr]]) — one imperative pass; the HOF
    * transform+slice+concat_ws formulation of the same windows measured
    * ~4× slower on d12 at sf0.1 (the t9/t10 lesson again).
    */
  def windowDigests(words: Column, n: Int): Column =
    GraftBridge.toColumn(WindowDigestsExpr(
      GraftBridge.toExpression(words), n))

  /** Distinct rolling shingle hashes of a word array: each word hashed
    * once, `n` consecutive word hashes combined with a polynomial mix —
    * no shingle strings ever materialize.
    */
  def shingleHashes(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): Array[Long] = {
    val m = arr.numElements()
    val wh = new Array[Long](m)
    var i = 0
    while (i < m) {
      wh(i) = if (arr.isNullAt(i)) 0L
      else XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      i += 1
    }
    val count = if (m == 0) 0 else math.max(m - n + 1, 1)
    val set = new java.util.HashSet[Long](count * 2)
    val out = new Array[Long](count)
    var k = 0
    i = 0
    while (i < count) {
      var h = 0L
      var j = 0
      val span = math.min(n, m - i)
      while (j < span) {
        h = h * 0x9E3779B97F4A7C15L ^ wh(i + j)
        j += 1
      }
      if (set.add(h)) { out(k) = h; k += 1 }
      i += 1
    }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }
}

/** MinHash signature of a word array: element k is min over distinct
  * `shingleSize`-gram rolling hashes of a_k * h + b_k. Shingling happens
  * inside the expression (word-hash combine, no shingle strings).
  * Empty/null-only arrays yield Long.MaxValue sentinels (no shingle
  * evidence — never collides with real minima in practice).
  */
case class MinHashSignatureExpr(child: Expression, numHashes: Int, shingleSize: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_signature"

  private lazy val (mulA, addB) = Sketches.affineParams(numHashes)

  override def nullSafeEval(input: Any): Any = {
    val shingles = Sketches.shingleHashes(input.asInstanceOf[ArrayData], shingleSize)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val base = shingles(i)
      var k = 0
      while (k < numHashes) {
        val h = mulA(k) * base + addB(k)
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ENGINE-PORTABLE MinHash signature of a word array — the seeded
  * [[MinHashSignatureExpr]]'s oracle-checkable twin (the CLAUDE.md
  * md5-hex recipe applied to a whole hash FAMILY): element k is
  * min over the document's word `shingleSize`-gram strings of
  *
  *   h_k(t) = ((a_k · md5_32(t)) mod P + b_k) mod P,  P = 4294967311
  *
  * where md5_32 is the shingle string's first 8 md5 hex chars as an
  * unsigned 32-bit value (Spark `conv(substring(md5(t),1,8),16,10)` ≡
  * DuckDB `('0x'||substring(md5(t),1,8))::UBIGINT`) and the parameters
  * are themselves md5-derived — a_k = md5_32("mh_a#k") mod 2147483646
  * + 1, b_k = md5_32("mh_b#k") mod P — so a SQL oracle re-derives the
  * ENTIRE family from the k index with no seed table. Overflow-safe by
  * construction in SIGNED 64-bit: a_k ≤ 2^31 and md5_32 < 2^32 keep
  * a·x < 2^63, and the product reduces mod P before b_k is added —
  * the same expression evaluates exactly in DuckDB BIGINT math.
  * Shingle rule matches [[WordShinglesExpr]]/`TextFunctions
  * .wordShingles` (empty → no shingles, 0 < |words| < n → one partial
  * shingle); duplicates need no dedup (minima are multiset-invariant),
  * and a no-word document yields Long.MaxValue sentinels — callers
  * exclude such docs (no shingle evidence), as does the SQL twin's
  * `len(w) > 0` filter. One imperative pass: one MD5 per window +
  * numHashes affine transforms, O(shingles + shingles × hashes).
  */
case class MinHashPortableExpr(child: Expression, numHashes: Int,
    shingleSize: Int) extends UnaryExpression with CodegenFallback {
  require(numHashes >= 1 && shingleSize >= 1,
    "numHashes and shingleSize must be at least 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_portable"

  private val P = 4294967311L // first prime above 2^32

  @transient private lazy val (mulA, addB) = {
    val a = Array.tabulate(numHashes)(j =>
      Sketches.md5_32(s"mh_a#$j") % 2147483646L + 1L)
    val b = Array.tabulate(numHashes)(j => Sketches.md5_32(s"mh_b#$j") % P)
    (a, b)
  }

  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    if (m > 0) {
      val words = new Array[Array[Byte]](m)
      var w = 0
      while (w < m) {
        words(w) =
          if (arr.isNullAt(w)) Array.emptyByteArray
          else arr.getUTF8String(w).getBytes
        w += 1
      }
      val count = math.max(m - shingleSize + 1, 1)
      var i = 0
      while (i < count) {
        md.reset()
        val span = math.min(shingleSize, m - i)
        var j = 0
        while (j < span) {
          if (j > 0) md.update(' '.toByte)
          md.update(words(i + j))
          j += 1
        }
        val d = md.digest()
        val base = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
        var k = 0
        while (k < numHashes) {
          val h = ((mulA(k) * base) % P + addB(k)) % P
          if (h < mins(k)) mins(k) = h
          k += 1
        }
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ENGINE-PORTABLE 64-bit SimHash of a word array, returned as TWO
  * 32-bit halves `[s1, s2]` (each a non-negative Long < 2^32) — the
  * seeded [[SimHash64Expr]]'s oracle-checkable twin. Per token
  * OCCURRENCE (not distinct), one MD5: half 1 votes with the digest's
  * first 4 bytes (hex chars 1–8), half 2 with bytes 4–7 (hex chars
  * 9–16) — DuckDB re-derives both via
  * `('0x'||substring(md5(t),1,8))::UBIGINT` /
  * `('0x'||substring(md5(t),9,8))::UBIGINT`. Bit b of a half is set
  * iff the token vote sum for that bit is strictly positive (integer
  * votes — exact on both engines; ties → 0). Two halves instead of
  * one packed 64-bit value because DuckDB BIGINT would overflow on
  * `hi·2^32 + lo` and UBIGINT↔BIGINT mixing differs per engine —
  * hamming(a, b) = bit_count(s1⊕s1') + bit_count(s2⊕s2') either way.
  * Null tokens are skipped (never occur after `TextFunctions.words`).
  */
case class SimHashPortableExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_portable"

  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes1 = new Array[Int](32)
    val votes2 = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        val h1 = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
        val h2 = ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
          ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
        var bit = 0
        while (bit < 32) {
          if (((h1 >>> bit) & 1L) == 1L) votes1(bit) += 1 else votes1(bit) -= 1
          if (((h2 >>> bit) & 1L) == 1L) votes2(bit) += 1 else votes2(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var s1 = 0L; var s2 = 0L
    var bit = 0
    while (bit < 32) {
      if (votes1(bit) > 0) s1 |= (1L << bit)
      if (votes2(bit) > 0) s2 |= (1L << bit)
      bit += 1
    }
    new GenericArrayData(Array(s1, s2))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash computed directly from the raw text: single pass splitting
  * lowercase alphanumeric runs and folding each word's hash into the
  * 64 bit-vote counters. ASCII-equivalent to
  * `SimHash64Expr(TextFunctions.words(text))` (parity-tested); avoids
  * materializing the word array entirely.
  */
/** Word n-gram shingle STRINGS fused into one pass — tokenize (the
  * SimHashTextExpr rule: full-string Locale.ROOT lowercase, ascii-alnum
  * runs ≡ `words(text)`) then join each n-window once. For operators
  * whose CONTRACT is exact shingle strings (corpus n-gram counts,
  * source-overlap keys) the 8-byte-hash kernel doesn't apply, and the
  * HOF formulation ([[graft.functions.TextFunctions.wordShingles]]:
  * transform + slice + concat_ws) pays per-window interpreted array
  * allocations — the t9/t10/d12 lesson. Rule matches wordShingles
  * exactly: empty → [], 0 < |words| < n → one joined partial shingle;
  * property-tested equal in GraftProperties.
  */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.toLowerCase(java.util.Locale.ROOT)
    val len = text.length
    val words = new java.util.ArrayList[String](32)
    var i = 0
    var start = -1
    while (i <= len) {
      val alnum = i < len && {
        val c = text.charAt(i)
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      }
      if (alnum) { if (start < 0) start = i }
      else if (start >= 0) { words.add(text.substring(start, i)); start = -1 }
      i += 1
    }
    val m = words.size
    val sb = new java.lang.StringBuilder(64)
    if (m == 0) new GenericArrayData(Array.empty[Any])
    else if (m < n) {
      var k = 0
      while (k < m) {
        if (k > 0) sb.append(' ')
        sb.append(words.get(k))
        k += 1
      }
      new GenericArrayData(Array[Any](
        org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)))
    } else {
      val out = new Array[Any](m - n + 1)
      var w = 0
      while (w <= m - n) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(words.get(w + k))
          k += 1
        }
        out(w) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
        w += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHashTextExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64_text"

  override def nullSafeEval(input: Any): Any = {
    // full-string lowercase first (Locale.ROOT) — per-char toLowerCase
    // diverges from Spark's lower() on chars like 'İ' (U+0130), which
    // would change tokenization vs the words(text) path
    val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.toLowerCase(java.util.Locale.ROOT)
    val len = text.length
    val votes = new Array[Int](64)
    val sb = new java.lang.StringBuilder(24)
    var i = 0
    while (i <= len) {
      val alnum = i < len && {
        val c = text.charAt(i)
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      }
      if (alnum) sb.append(text.charAt(i))
      else if (sb.length() > 0) {
        val h = XxHash64Function.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString),
          StringType, 42L)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
        sb.setLength(0)
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

/** Exact n-gram Jaccard between two word arrays, computed imperatively on
  * rolling shingle hashes (hash-set intersection — no string shingles, no
  * interpreted array_intersect).
  */
/** Distinct shingle-hash array of a word array (see
  * [[Sketches.shingleHashes]]) — one imperative pass, no shingle strings.
  * The output is SORTED ascending: downstream set operations
  * ([[SortedLongJaccardExpr]]) then run as linear merges with no
  * per-element hashing.
  */
case class ShingleHashesExpr(child: Expression, shingleSize: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val hs = Sketches.shingleHashes(input.asInstanceOf[ArrayData], shingleSize)
    java.util.Arrays.sort(hs)
    new GenericArrayData(hs)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Jaccard similarity of two SORTED distinct long arrays via a two-pointer
  * merge — O(|A|+|B|) comparisons, zero hashing, zero allocation. The
  * similarity-join verify kernel: at 100k+ candidate pairs per partition
  * this beats rebuilding a hash set per pair ([[NgramJaccardExpr]]) ~5×.
  * Inputs MUST be sorted ascending ([[ShingleHashesExpr]]'s contract).
  */
case class SortedLongJaccardExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val (na, nb) = (xa.numElements(), xb.numElements())
    if (na == 0 || nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val va = xa.getLong(i); val vb = xb.getLong(j)
      if (va == vb) { inter += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Every position-indexed word `n`-gram window of a word array as a
  * 16-byte MD5 digest — NON-distinct, one digest per position, in
  * document order (the duplicated-span counting unit: repeats within a
  * document must keep their multiplicity, unlike [[ShingleHashesExpr]]'s
  * distinct set). Digest input is the words joined by a single space —
  * byte-identical to `concat_ws(" ", slice(...))` of the same window, so
  * equal window TEXT ⇒ equal digest; 128 bits keeps corpus-wide counts
  * collision-free where a 64-bit key would bias them. Partial-window
  * rule matches [[graft.functions.TextFunctions.wordShingles]]: empty →
  * no windows, 0 < |words| < n → one window of all words.
  */
case class WindowDigestsExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0, "window size must be positive")

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "window_digests"

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val words = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      words(i) =
        if (arr.isNullAt(i)) Array.emptyByteArray
        else arr.getUTF8String(i).getBytes
      i += 1
    }
    val count = math.max(m - n + 1, 1)
    val out = new Array[Any](count)
    i = 0
    while (i < count) {
      md.reset()
      val span = math.min(n, m - i)
      var j = 0
      while (j < span) {
        if (j > 0) md.update(' '.toByte)
        md.update(words(i + j))
        j += 1
      }
      out(i) = md.digest()
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Intersection COUNT of two sorted long arrays — the same two-pointer
  * merge as [[SortedLongJaccardExpr]] but returning the raw overlap, for
  * asymmetric measures (containment, overlap coefficient) whose
  * denominator is not the union.
  */
case class SortedLongOverlapExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_overlap"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val (na, nb) = (xa.numElements(), xb.numElements())
    var i = 0; var j = 0; var inter = 0L
    while (i < na && j < nb) {
      val va = xa.getLong(i); val vb = xb.getLong(j)
      if (va == vb) { inter += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    inter
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

case class NgramJaccardExpr(left: Expression, right: Expression, shingleSize: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "ngram_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ga = Sketches.shingleHashes(a.asInstanceOf[ArrayData], shingleSize)
    val gb = Sketches.shingleHashes(b.asInstanceOf[ArrayData], shingleSize)
    if (ga.isEmpty && gb.isEmpty) return java.lang.Double.valueOf(0.0)
    val setA = new java.util.HashSet[Long](ga.length * 2)
    ga.foreach(setA.add)
    var inter = 0
    gb.foreach(h => if (setA.contains(h)) inter += 1)
    val union = ga.length + gb.length - inter
    java.lang.Double.valueOf(inter.toDouble / union)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
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
