package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** HyperLogLog register table (Flajolet et al. 2007) as a
  * `TypedImperativeAggregate`: m = 2^p byte registers; each 60-bit input
  * hash routes to register `h >>> (60-p)` and proposes
  * `rho = 1 + leading-zeros of the remaining 60-p bits`; the register
  * keeps the MAX. The buffer is m bytes regardless of cardinality,
  * map-side partial aggregation applies, and elementwise max is
  * commutative/idempotent — so the register table (unlike the float
  * estimate) is DETERMINISTIC under any partitioning and redelivery,
  * which is what lets the gate hash-match a DuckDB replay computing the
  * same registers from the same md5-derived hashes.
  *
  * Complements [[KMinStrings]]: KMV keeps k exact minima (O(k) but value
  * strings travel); HLL keeps 2^p bytes with O(1) update — the sketch a
  * 100 TB distinct-count rollup ships between stages.
  */
case class HllRegisters(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 2 && p <= 16, s"p must be in [2,16], got $p")

  private val m = 1 << p
  private val rbits = 60 - p // hash is 60 bits (15 md5 hex chars)
  private val rmask = (1L << rbits) - 1

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"hll_registers expects a 60-bit LONG hash column, got $t")
    }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h >>> rbits).toInt
      val r = h & rmask
      // highest set bit of the rbits-wide remainder; all-zero remainder
      // saturates at rbits + 1 (the classic HLL convention)
      val rho =
        if (r == 0L) rbits + 1
        else rbits - (63 - java.lang.Long.numberOfLeadingZeros(r))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt: Any))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllRegisters =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllRegisters =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegisters =
    copy(child = newChildren.head)
  override def prettyName: String = "hll_registers"
}

object HllRegisters {
  /** Column-API entry: `hll_registers(hash60(col), 6)`. */
  def apply(c: Column, p: Int): Column =
    Bridge.column(HllRegisters(Bridge.expression(c), p).toAggregateExpression())
}
