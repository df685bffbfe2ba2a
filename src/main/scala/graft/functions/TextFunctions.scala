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
  * 32-bit slices of two MD5 digests per shingle, minimized over the
  * document's word 3-gram shingles — in a single pass inside the scan
  * stage, so the signature relation is born document-sized and the ONLY
  * exchange left in candidate generation is the band equi-join. On a
  * 100 TB corpus that removes the largest shuffle of the whole dedup
  * pipeline.
  *
  * Slice width is a SCALE parameter, not a detail: with the original
  * 16-bit slices (`substr(md5(shingle), 4j+1, 4)`), the minimum of ~40
  * draws from a 65 536-value space collides between two UNRELATED
  * documents with p ≈ 3e-4 per slice, so a two-slice band collides with
  * p ≈ 1e-7 and spurious candidates grow as 4·C(n,2)·1e-7 — measured by
  * `tools/ShuffleScale` as an exactly quadratic excess that overtakes the
  * planted pairs at ~3 M documents (2.57 M spurious of 3.21 M pairs at
  * n = 3.2 M). 32-bit slices push the per-band collision to ~2.5e-17:
  * spurious pairs stay negligible past 10^8 documents, which is the
  * regime a 100 TB corpus actually occupies. MD5 yields 128 bits = four
  * 32-bit slices, so the 8 functions take slices 0-3 from `md5(shingle)`
  * and 4-7 from `md5(shingle || '#2')` (both engines can compute both).
  *
  * Parity contract (verified by `MinHashSlicesSpec` against the relational
  * form): words split on single spaces keeping empties, shingles are
  * consecutive word triples joined by spaces, digests are MD5 over UTF-8
  * bytes, slice j < 4 is hex chars [8j, 8j+8) of md5(shingle), slice
  * j >= 4 is hex chars [8(j-4), 8(j-4)+8) of md5(shingle || "#2") —
  * compared as strings, which for fixed-width lowercase hex is numeric
  * order. Documents with fewer than 3 words have no shingles and yield
  * NULL (= absent from the relational signature).
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
    val mins = Array.fill(8)(0x100000000L) // sentinel above any 32-bit slice
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + 2 < words.length) {
      sb.setLength(0)
      sb.append(words(i)).append(' ').append(words(i + 1)).append(' ')
        .append(words(i + 2))
      val bytes = sb.toString.getBytes(StandardCharsets.UTF_8)
      val d1 = md.digest(bytes) // digest() auto-resets the instance
      // second hash function family: md5(shingle || "#2") — '#' and '2'
      // are single-byte in UTF-8, so appending to the byte array equals
      // appending to the string before encoding
      val bytes2 = java.util.Arrays.copyOf(bytes, bytes.length + 2)
      bytes2(bytes.length) = '#'; bytes2(bytes.length + 1) = '2'
      val d2 = md.digest(bytes2)
      var j = 0
      while (j < 8) {
        val d = if (j < 4) d1 else d2
        val o = (j % 4) * 4
        val v = ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
          ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](8)
    var j = 0
    while (j < 8) {
      out(j) = UTF8String.fromString(f"${mins(j)}%08x")
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column builder: 8-element array of 8-hex-char slice minima, NULL for
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
