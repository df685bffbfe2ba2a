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
  * exploded result is hash-identical to the window oracle. NULL values are
  * skipped like every SQL aggregate (the oracle filters them before
  * ranking); NULL ids are rejected loudly (a ranked pair without an
  * identity is a data bug upstream).
  */
case class TopKPairs(
    ord: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]] {

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

  /** Rank order as a natural ordering: better pairs FIRST. (v desc, id asc)
    * — encoded so TreeSet.first is the best and .last the currently-worst
    * kept pair.
    */
  private val rankOrd: Ordering[(Long, Long)] =
    Ordering.by[(Long, Long), (Long, Long)] { case (v, i) => (-v, i) }

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](rankOrd)

  private def add(buf: java.util.TreeSet[(Long, Long)],
      p: (Long, Long)): Unit =
    if (buf.size < k) { buf.add(p); () }
    else if (rankOrd.compare(p, buf.last) < 0 && buf.add(p)) {
      // p displaced the worst kept pair (add=false would mean a duplicate
      // pair — removing the last then would silently shrink the top-k)
      buf.remove(buf.last)
      ()
    }

  override def update(buf: java.util.TreeSet[(Long, Long)],
      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val v = ord.eval(input)
    if (v != null) {
      val i = id.eval(input)
      require(i != null, "topk_pairs: NULL id for a non-NULL ranked value")
      add(buf, (v.asInstanceOf[Long], i.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[(Long, Long)],
      other: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val (v, d) = it.next()
      out(i) = InternalRow(v, d)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (v, d) = it.next()
      out.writeLong(v)
      out.writeLong(d)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add((in.readLong(), in.readLong())); i += 1 }
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
  /** Column-API entry: `topk_pairs(vm, event_id, 3)` → array<struct<v,id>>
    * in rank order.
    */
  def apply(ord: Column, id: Column, k: Int): Column =
    Bridge.column(TopKPairs(Bridge.expression(ord), Bridge.expression(id), k)
      .toAggregateExpression())
}
