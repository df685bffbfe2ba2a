package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document MinHash signature — the narrow-map replacement for
  * the explode + 8-min hash-aggregate signature pass of the LSH dedup
  * family (SURVEY §2 extension surface; reference behavior is the
  * dedup-candidate semantics of `dd_minhash_lsh`).
  *
  * The relational form shuffles every shingle of every document into a
  * corpus-wide aggregate: O(tokens) exchanged rows just to produce one
  * 8-slot row per document. This expression computes the same 8 minima —
  * `min(substr(md5(shingle), 4j+1, 4))` over the document's word 3-gram
  * shingles, j = 0..7 — in a single pass inside the scan stage, so the
  * signature relation is born document-sized and the ONLY exchange left in
  * candidate generation is the band equi-join. On a 100 TB corpus that
  * removes the largest shuffle of the whole dedup pipeline.
  *
  * Parity contract (verified by `MinHashSlicesSpec` against the relational
  * form): words split on single spaces keeping empties, shingles are
  * consecutive word triples joined by spaces, digests are MD5 over UTF-8
  * bytes, slice j is hex chars [4j, 4j+4) — compared as strings, which for
  * fixed-width lowercase hex is numeric order. Documents with fewer than
  * 3 words have no shingles and yield NULL (= absent from the relational
  * signature).
  */
case class MinHashSlices(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects string, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSlices.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashSlices.compute($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSlices = copy(child = newChild)
}

object MinHashSlices {

  /** One digest per thread, reset between uses — the expression runs once
    * per ROW, so a per-call `getInstance` would be the hot loop's largest
    * allocation.
    */
  private[functions] val MD5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Static entry shared by interpreted and generated code paths. */
  def compute(text: UTF8String): GenericArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < 3) return null
    val md = MD5.get()
    val mins = Array.fill(8)(0x10000) // sentinel above any 16-bit slice
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + 2 < words.length) {
      sb.setLength(0)
      sb.append(words(i)).append(' ').append(words(i + 1)).append(' ')
        .append(words(i + 2))
      val digest = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      md.reset()
      var j = 0
      while (j < 8) {
        val v = ((digest(2 * j) & 0xff) << 8) | (digest(2 * j + 1) & 0xff)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](8)
    var j = 0
    while (j < 8) {
      out(j) = UTF8String.fromString(f"${mins(j)}%04x")
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column builder: 8-element array of 4-hex-char slice minima, NULL for
    * documents with fewer than 3 words.
    */
  def minhash_slices(text: Column): Column =
    Bridge.column(MinHashSlices(Bridge.expression(text)))
}

/** Fused 32-bit term-frequency-weighted SimHash (Charikar) — the narrow-map
  * replacement for the word explode + 32-vote hash aggregate in the SimHash
  * dedup family. Per word OCCURRENCE: the first 32 bits of md5 (big-endian,
  * = the first 8 hex nibbles weighted 16^(8-k), exactly the relational
  * form's `v`) votes +1/-1 per bit; the hash is the positive-vote mask.
  * Same scale argument as [[MinHashSlices]]: the signature relation is born
  * document-sized in the scan stage instead of shuffling O(word
  * occurrences) rows into a corpus-wide aggregate. Parity pinned by
  * `MinHashSlicesSpec`.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects string, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash32.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): SimHash32 = copy(child = newChild)
}

object SimHash32 {

  def compute(text: UTF8String): Long = {
    val words = text.toString.split(" ", -1)
    val votes = new Array[Int](32)
    val md = MinHashSlices.MD5.get()
    var i = 0
    while (i < words.length) {
      val digest = md.digest(words(i).getBytes(StandardCharsets.UTF_8))
      md.reset()
      val v = ((digest(0) & 0xff) << 24) | ((digest(1) & 0xff) << 16) |
        ((digest(2) & 0xff) << 8) | (digest(3) & 0xff)
      var j = 0
      while (j < 32) {
        votes(j) += (if (((v >>> j) & 1) == 1) 1 else -1)
        j += 1
      }
      i += 1
    }
    var mask = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) mask |= 1L << j
      j += 1
    }
    mask
  }

  def simhash32(text: Column): Column =
    Bridge.column(SimHash32(Bridge.expression(text)))
}
