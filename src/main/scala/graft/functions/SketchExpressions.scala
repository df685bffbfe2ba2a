package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Codegen-friendly probes for driver-built sketches — the corpus-wide
  * prefilter pass of the sketch-then-exact operators ([[graft.rel.SketchOps]])
  * runs over EVERY row by design, so it must stay inside whole-stage codegen
  * rather than bounce each row through a ScalaUDF (boxing + encoder round
  * trip). The serialized sketch rides in the expression (a broadcast-sized
  * byte array), deserialized once per executor via a transient lazy.
  *
  * Probe hashing matches the build side bit-for-bit: `DataFrameStatFunctions
  * .bloomFilter`/`.countMinSketch` over a string column insert the column's
  * UTF-8 bytes, and these probes hand the sketch the incoming
  * [[UTF8String]]'s bytes — no lossy String round trip in the hot loop.
  */
case class BloomMightContain(child: Expression, bytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects a string column, got $t")
    }

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  /** Null-safe probe shared by the interpreted and generated paths. */
  def mightContain(s: UTF8String): Boolean =
    s != null && bf.mightContainBinary(s.getBytes)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    mightContain(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val self = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContain].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        final boolean ${ev.value} =
          $self.mightContain(${c.isNull} ? null : ${c.value});""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomMightContain = copy(child = newChild)
}

/** CountMin estimate of a string key's frequency — [[BloomMightContain]]'s
  * counting sibling; null keys estimate 0.
  */
case class CmsEstimate(child: Expression, bytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects a string column, got $t")
    }

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))

  /** Null-safe estimate shared by the interpreted and generated paths. */
  def estimate(s: UTF8String): Long =
    if (s == null) 0L else cms.estimateCount(s.getBytes)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    estimate(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val self = ctx.addReferenceObj("cmsProbe", this,
      classOf[CmsEstimate].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        final long ${ev.value} =
          $self.estimate(${c.isNull} ? null : ${c.value});""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CmsEstimate = copy(child = newChild)
}

object SketchExpressions {

  private def serialize(write: java.io.OutputStream => Unit): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    write(bos)
    bos.toByteArray
  }

  /** Column wrapper: codegen'd `mightContain` probe of a driver-built
    * Bloom filter over a string column.
    */
  def bloom_might_contain(bf: BloomFilter, col: Column): Column =
    Bridge.column(BloomMightContain(Bridge.expression(col),
      serialize(bf.writeTo)))

  /** Column wrapper: codegen'd CountMin frequency estimate of a string
    * column.
    */
  def cms_estimate(cms: CountMinSketch, col: Column): Column =
    Bridge.column(CmsEstimate(Bridge.expression(col),
      serialize(cms.writeTo)))
}
