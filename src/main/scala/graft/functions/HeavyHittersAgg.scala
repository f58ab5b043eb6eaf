package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_heavyhitters(item, capacity)` — a mergeable Misra–Gries
  * heavy-hitters sketch over a string column.
  *
  * The exact idiom — `GROUP BY item` then rank — shuffles one row per
  * DISTINCT item per map partition; over web-scale text (vocabulary in
  * the hundreds of millions once typos and ids join in) the shuffle is
  * vocabulary-sized. This sketch holds at most `capacity` counters per
  * partial, so the shuffle carries `capacity × partitions` rows no
  * matter the vocabulary, and the standard hash-aggregation machinery
  * (partial → merge) does the rest.
  *
  * Guarantee (Misra–Gries, and the merge of Agarwal et al., "Mergeable
  * Summaries"): every item with true frequency > n/(capacity+1)
  * SURVIVES in every merged summary, and each surviving counter is a
  * LOWER bound on the item's true count undercounting by at most
  * n/(capacity+1). Items below the bar may appear or not depending on
  * merge order — so a deterministic pipeline uses the sketch for
  * CANDIDATES only and re-counts them exactly in a second (cheap,
  * candidate-filtered) pass; [[graft.text.CorpusStats.heavyTokens]] is
  * that composition. The emitted array is sorted (item asc) and NULL
  * items are skipped.
  */
case class HeavyHittersAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  override def prettyName: String = "graft_heavyhitters"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("lower_bound", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if capacity > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs capacity > 0, got $capacity")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string item, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      b: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return b
    val item = v.asInstanceOf[UTF8String]
    b.get(item) match {
      case Some(c) => b.update(item, c + 1)
      case None if b.size < capacity =>
        // the incoming UTF8String may be backed by a reused row buffer
        b.update(item.clone(), 1L)
      case None =>
        // Misra–Gries decrement step: every counter pays one; zeros drop
        b.filterInPlace((_, c) => c > 1)
        b.mapValuesInPlace((_, c) => c - 1)
    }
    b
  }

  override def merge(
      b: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (item, c) =>
      b.update(item, b.getOrElse(item, 0L) + c)
    }
    if (b.size > capacity) {
      // subtract the (capacity+1)-th largest count from everyone; what
      // drops to <= 0 leaves — the mergeable-summaries reduction
      val counts = b.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      b.filterInPlace((_, c) => c > cut)
      b.mapValuesInPlace((_, c) => c - cut)
    }
    b
  }

  override def eval(b: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = b.toArray.sortBy(_._1.toString)
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(item, c): Any
    })
  }

  override def serialize(b: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    var bytes = 4
    b.foreach { case (item, _) => bytes += 4 + item.numBytes() + 8 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(b.size)
    b.foreach { case (item, c) =>
      val ib = item.getBytes
      bb.putInt(ib.length); bb.put(ib); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val ib = new Array[Byte](len)
      bb.get(ib)
      b.update(UTF8String.fromBytes(ib), bb.getLong)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = newChildren(0))
}
