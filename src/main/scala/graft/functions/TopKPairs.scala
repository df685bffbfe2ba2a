package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Top-k (value, id) pairs per group, as ONE bounded-buffer aggregate — the
  * scale-correct form of "top-3 per key". The idiomatic
  * `row_number() OVER (PARTITION BY key ORDER BY v DESC)` formulation
  * sorts EVERY row of every partition before discarding all but k of them;
  * this `TypedImperativeAggregate` keeps an O(k) buffer per group, combines
  * map-side (each task ships at most k pairs per group into the shuffle),
  * and never materializes an ordering of the losers. Same plan shape as any
  * hash aggregate: partial update → k-bounded merge → final eval.
  *
  * Order: value DESC, id ASC on ties — `row_number` rank order, so the
  * exploded result is hash-identical to the window oracle. The buffer is a
  * bounded MULTISET (pair → count), so an input containing the SAME
  * (value, id) pair twice returns it twice, exactly as `row_number` ranks
  * each duplicate row — set semantics would silently shrink the top-k for
  * such callers of the registered SQL function. NULL values are skipped
  * like every SQL aggregate (the oracle filters them before ranking); NULL
  * ids are rejected loudly (a ranked pair without an identity is a data
  * bug upstream).
  */
case class TopKPairs(
    ord: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairs.TopKBuffer] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(ord, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("v", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (ord.dataType, id.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"topk_pairs expects bigint x bigint, got $a x $b")
    }

  override def createAggregationBuffer(): TopKPairs.TopKBuffer =
    new TopKPairs.TopKBuffer(k)

  override def update(buf: TopKPairs.TopKBuffer,
      input: InternalRow): TopKPairs.TopKBuffer = {
    val v = ord.eval(input)
    if (v != null) {
      val i = id.eval(input)
      require(i != null, "topk_pairs: NULL id for a non-NULL ranked value")
      buf.add((v.asInstanceOf[Long], i.asInstanceOf[Long]), 1L)
    }
    buf
  }

  override def merge(buf: TopKPairs.TopKBuffer,
      other: TopKPairs.TopKBuffer): TopKPairs.TopKBuffer = {
    val it = other.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.add(e.getKey, e.getValue)
    }
    buf
  }

  override def eval(buf: TopKPairs.TopKBuffer): Any = {
    val out = new Array[Any](buf.n.toInt)
    val it = buf.m.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      val (v, d) = e.getKey
      var c = e.getValue
      while (c > 0) { out(i) = InternalRow(v, d); i += 1; c -= 1 }
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKPairs.TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    // state lands in streaming checkpoints, so the layout is versioned:
    // a resume against bytes from a different layout must fail loudly at
    // the tag, not misread counts as pair halves
    out.writeByte(TopKPairs.StateFormat)
    out.writeInt(buf.m.size)
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val (v, d) = e.getKey
      out.writeLong(v)
      out.writeLong(d)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKPairs.TopKBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val ver = in.readByte()
    require(ver == TopKPairs.StateFormat,
      s"topk_pairs state format $ver (expected ${TopKPairs.StateFormat}); " +
        "a checkpoint written by an incompatible build cannot be resumed")
    val buf = createAggregationBuffer()
    val entries = in.readInt()
    var i = 0
    while (i < entries) {
      buf.add((in.readLong(), in.readLong()), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKPairs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairs =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(ord = newChildren(0), id = newChildren(1))
  override def prettyName: String = "topk_pairs"
}

object TopKPairs {

  /** Serialized-state layout tag: 2 = multiset entries (v, id, count).
    * Format 1 (implicit, untagged 16-byte set entries) predates the
    * multiset buffer and is intentionally unreadable.
    */
  val StateFormat: Byte = 2

  /** Rank order: better pairs FIRST — (v desc, id asc). Overflow-safe:
    * `java.lang.Long.compare`, never negation (`-Long.MinValue` overflows
    * back to `Long.MinValue`, which would rank the SMALLEST possible value
    * as the best pair).
    */
  val rankOrd: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    override def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val byV = java.lang.Long.compare(b._1, a._1)
      if (byV != 0) byV else java.lang.Long.compare(a._2, b._2)
    }
  }

  /** Bounded multiset of the best <= k pairs, ordered by [[rankOrd]]: a
    * TreeMap pair → count plus the total count `n`. `m.firstKey` is the
    * best kept pair, `m.lastKey` the currently-worst.
    */
  final class TopKBuffer(val k: Int) {
    val m = new java.util.TreeMap[(Long, Long), Long](rankOrd)
    /** Total pairs kept (sum of counts); invariant n <= k. */
    var n = 0L

    // getOrDefault, NOT get-then-null-check: the value type is a
    // primitive scala.Long, so `m.get(absent)` already unboxes null to 0
    // and a null test on it can never fire
    private def bump(p: (Long, Long), by: Long): Unit =
      m.put(p, m.getOrDefault(p, 0L) + by)

    /** Add `count` copies of `p`, evicting worst units to stay at k. */
    def add(p: (Long, Long), count: Long): Unit = {
      var c = count
      // fill the free room in one step
      if (n < k) {
        val take = math.min(c, k - n)
        bump(p, take)
        n += take
        c -= take
      }
      // displace worst units one-for-one while p strictly outranks them
      while (c > 0 && rankOrd.compare(p, m.lastKey()) < 0) {
        bump(p, 1L)
        val worst = m.lastKey()
        val wc = m.get(worst)
        if (wc == 1L) m.remove(worst) else m.put(worst, wc - 1)
        c -= 1
      }
    }
  }

  /** Column-API entry: `topk_pairs(vm, event_id, 3)` → array<struct<v,id>>
    * in rank order.
    */
  def apply(ord: Column, id: Column, k: Int): Column =
    Bridge.column(TopKPairs(Bridge.expression(ord), Bridge.expression(id), k)
      .toAggregateExpression())
}
