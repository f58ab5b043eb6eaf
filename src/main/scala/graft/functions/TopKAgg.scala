package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_topk(score, payload, k)` — the top-k (score, payload) pairs
  * per group, as a native partially-aggregable aggregate.
  *
  * The declarative idiom for "top k rows per key" is a window
  * `row_number()` + filter — which shuffles EVERY row to its key's
  * partition and then sorts the key's entire row set, the single most
  * common accidental O(n log n) in analytics at scale. This aggregate
  * keeps a k-bounded buffer per key, so the normal hash-aggregation
  * machinery does the work: map-side partials reduce each key to ≤ k
  * pairs BEFORE the shuffle, only (k × keys × partitions) rows travel,
  * and nothing is ever globally sorted. At 100 TB with k=3 and
  * millions of keys that is the difference between shuffling the
  * corpus and shuffling a rounding error of it.
  *
  * Results are a total order — score DESC, payload ASC on ties — so
  * the emitted array is deterministic (merge-order-independent) and
  * engine-reproducible: any engine's `row_number() OVER (ORDER BY
  * score DESC, payload)` ≤ k replays it exactly. NULL scores/payloads
  * are skipped (window idiom drops them at the same place: NULLS LAST
  * past rank k). Buffers serialize as packed longs.
  */
case class TopKAgg(
    scoreExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKAgg.Buffer] {

  override def prettyName: String = "graft_topk"
  override def children: Seq[Expression] = Seq(scoreExpr, payloadExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", LongType, nullable = false),
      StructField("payload", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, payloadExpr.dataType) match {
      case (LongType, LongType) if k > 0 => TypeCheckResult.TypeCheckSuccess
      case (LongType, LongType) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs k > 0, got $k")
      case (s, p) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (score bigint, payload bigint), got " +
          s"(${s.catalogString}, ${p.catalogString})")
    }

  override def createAggregationBuffer(): TopKAgg.Buffer = new TopKAgg.Buffer(k)

  override def update(b: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val s = scoreExpr.eval(input)
    val p = payloadExpr.eval(input)
    if (s != null && p != null)
      b.offer(s.asInstanceOf[Long], p.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKAgg.Buffer, other: TopKAgg.Buffer): TopKAgg.Buffer = {
    var i = 0
    while (i < other.size) { b.offer(other.scores(i), other.payloads(i)); i += 1 }
    b
  }

  override def eval(b: TopKAgg.Buffer): Any = {
    val rows = new Array[Any](b.size)
    var i = 0
    while (i < b.size) {
      rows(i) = InternalRow(b.scores(i), b.payloads(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: TopKAgg.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * b.size)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putLong(b.scores(i)); bb.putLong(b.payloads(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKAgg.Buffer(k)
    var i = 0
    while (i < n) { b.offer(bb.getLong, bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(scoreExpr = newChildren(0), payloadExpr = newChildren(1))
}

object TopKAgg {
  /** k-bounded insertion buffer, kept SORTED by (score desc, payload
    * asc). k is small (top-k means single digits to low hundreds), so
    * an O(k) shift insert beats heap bookkeeping and leaves the buffer
    * pre-sorted for eval/serialize. Worst element sits at `size - 1`,
    * making the common reject path ("full and not better than the
    * floor") a single comparison. */
  final class Buffer(k: Int) {
    val scores = new Array[Long](k)
    val payloads = new Array[Long](k)
    var size: Int = 0

    /** true iff (s1, p1) ranks strictly before (s2, p2). */
    @inline private def before(s1: Long, p1: Long, s2: Long, p2: Long): Boolean =
      s1 > s2 || (s1 == s2 && p1 < p2)

    def offer(s: Long, p: Long): Unit = {
      if (size == k && !before(s, p, scores(size - 1), payloads(size - 1))) return
      // find insert position (buffer is tiny; linear scan)
      var pos = if (size == k) size - 1 else size
      while (pos > 0 && before(s, p, scores(pos - 1), payloads(pos - 1))) pos -= 1
      if (size < k) size += 1
      var i = size - 1
      while (i > pos) { scores(i) = scores(i - 1); payloads(i) = payloads(i - 1); i -= 1 }
      scores(pos) = s
      payloads(pos) = p
    }
  }
}
