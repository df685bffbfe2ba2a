package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct sketch core: the k smallest DISTINCT
  * string values of a group, as a sorted array — a
  * `TypedImperativeAggregate` with an O(k) bounded buffer.
  *
  * Over hash strings this is the classic KMV distinct-count sketch
  * (estimate `(k-1) / kth_min_fraction`): one pass, map-side partial
  * aggregation, fixed k-size merge — the scale path for distinct counts
  * where an exact `groupBy(key, value)` pre-distinct would shuffle the full
  * value space (compare q18_skew_distinct). Unlike HLL-style sketches the
  * k-min SET is order-insensitive and therefore deterministic under any
  * partitioning — which is what lets `sk_kmv_users` hash-match a DuckDB
  * oracle computing the same k minima.
  *
  * Distinctness is inherent (the buffer is a set); inputs beyond the k-th
  * smallest are rejected in O(log k) without growing the buffer.
  */
case class KMinStrings(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[String]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmin_strings expects a string column, got $t")
    }

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  private def add(buf: java.util.TreeSet[String], v: String): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last && !buf.contains(v)) {
      buf.add(v)
      buf.remove(buf.last)
      ()
    }

  override def update(buf: java.util.TreeSet[String],
      input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    // copy out of the reused UTF8String buffer before retaining
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: java.util.TreeSet[String],
      other: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[String]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    // length-prefixed raw UTF-8 (writeUTF caps at 64 KiB and this function
    // is registered for arbitrary SQL strings)
    while (it.hasNext) {
      val b = it.next().getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.add(new String(b, java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KMinStrings =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KMinStrings =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KMinStrings =
    copy(child = newChildren.head)
  override def prettyName: String = "kmin_strings"
}

object KMinStrings {
  /** Column-API entry: `kmin_strings(md5(col), 64)`. */
  def apply(c: Column, k: Int): Column =
    Bridge.column(KMinStrings(Bridge.expression(c), k).toAggregateExpression())
}
