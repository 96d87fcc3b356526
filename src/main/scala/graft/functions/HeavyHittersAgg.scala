package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving top-k heavy hitters (Metwally, Agrawal & El Abbadi,
  * ICDT'05) as a native `TypedImperativeAggregate` — the engine's
  * mergeable-summary building block for "what dominates this column"
  * questions (top domains, top tokens, top event types) at corpus
  * scale, where an exact global GROUP BY would shuffle every distinct
  * key and the answer only needs the head of the distribution.
  *
  * Contract: `heavy_hitters(col, k)` keeps at most `k` counters per
  * partial; eviction charges the evicted counter's count as the
  * newcomer's `err` (the SpaceSaving overestimate bound). Partials
  * merge with the mergeable-summaries rule (Agarwal et al., PODS'12):
  * a key absent from a FULL summary contributes that summary's minimum
  * count to both its merged count and its merged err; absent from a
  * non-full summary it contributes 0 (exact). Guarantees: any key with
  * true frequency > N/k survives, and for every reported key
  * `count − err <= true <= count`.
  *
  * Two regimes, both tested:
  *  - EXACT: while no partial ever exceeds `k` distinct keys, nothing
  *    evicts, `err` is 0 everywhere, and the result is bit-identical to
  *    GROUP BY count — which makes the sketch ORACLE-CHECKABLE against
  *    plain SQL (the a25 probe sizes k above the column's distinct
  *    count on purpose).
  *  - APPROXIMATE: over capacity, counts are (count, err)-bounded
  *    overestimates; the retained set depends on partition merge order
  *    (inherent to merged SpaceSaving — same as any sketch), but the
  *    bounds hold regardless.
  *
  * Output: `array<struct<item, count, err>>` sorted by (count DESC,
  * item ASC) — deterministic presentation, `slice(...)` for a top-n.
  * Memory: O(k) per partial; eviction scans the k counters linearly —
  * fine for the intended k ≤ a few thousand (the classic stream-summary
  * heap only matters at k ≫ that).
  */
case class HeavyHittersAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Array[Long]]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(capacity > 0, "heavy_hitters: k must be positive")

  override def prettyName: String = "heavy_hitters"
  // AbstractDataType is private[sql] in Spark 4 — let the return type infer
  override def inputTypes = Seq(StringType)
  override def nullable: Boolean = false
  override val dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Array[Long]] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[String, Array[Long]],
      input: InternalRow): mutable.HashMap[String, Array[Long]] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String may alias a reused row buffer — materialize the key
      val k = v.asInstanceOf[UTF8String].toString
      buffer.get(k) match {
        case Some(ce) => ce(0) += 1L
        case None if buffer.size < capacity => buffer(k) = Array(1L, 0L)
        case None =>
          // deterministic victim among min-count entries: smallest key
          var vk: String = null
          var vc = Long.MaxValue
          buffer.foreach { case (kk, cc) =>
            if (cc(0) < vc || (cc(0) == vc && kk < vk)) { vk = kk; vc = cc(0) }
          }
          buffer.remove(vk)
          buffer(k) = Array(vc + 1L, vc)
      }
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, Array[Long]],
      other: mutable.HashMap[String, Array[Long]])
      : mutable.HashMap[String, Array[Long]] = {
    if (other.isEmpty) return buffer
    if (buffer.isEmpty) return other
    val m1 = if (buffer.size >= capacity) buffer.valuesIterator.map(_(0)).min else 0L
    val m2 = if (other.size >= capacity) other.valuesIterator.map(_(0)).min else 0L
    val merged = mutable.HashMap[String, Array[Long]]()
    (buffer.keysIterator ++ other.keysIterator).foreach { k =>
      if (!merged.contains(k)) {
        val e1 = buffer.get(k)
        val e2 = other.get(k)
        merged(k) = Array(
          e1.map(_(0)).getOrElse(m1) + e2.map(_(0)).getOrElse(m2),
          e1.map(_(1)).getOrElse(m1) + e2.map(_(1)).getOrElse(m2))
      }
    }
    if (merged.size <= capacity) merged
    else {
      val kept = merged.toSeq.sortBy { case (k, ce) => (-ce(0), k) }.take(capacity)
      mutable.HashMap(kept: _*)
    }
  }

  override def eval(buffer: mutable.HashMap[String, Array[Long]]): Any = {
    val sorted = buffer.toSeq.sortBy { case (k, ce) => (-ce(0), k) }
    new GenericArrayData(sorted.map { case (k, ce) =>
      InternalRow(UTF8String.fromString(k), ce(0), ce(1))
    }.toArray[Any])
  }

  override def serialize(buffer: mutable.HashMap[String, Array[Long]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, ce) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(ce(0))
      out.writeLong(ce(1))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Array[Long]] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap[String, Array[Long]]()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf(new String(kb, "UTF-8")) = Array(in.readLong(), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
    copy(child = newChild)
}

object HeavyHitters {
  /** DataFrame-side entry: `heavyHitters(col("domain"), 1000)`. */
  def heavyHitters(col: Column, k: Int): Column =
    GraftBridge.toColumn(
      HeavyHittersAgg(GraftBridge.toExpression(col), k).toAggregateExpression())
}
