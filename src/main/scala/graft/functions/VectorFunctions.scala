package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the int64 dot product of two
  * `ArrayType(LongType)` columns — the hot scalar of the similarity-search
  * family (SURVEY §2 extension surface).
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), 0L, _+_)`) walks two
  * higher-order functions with a lambda per element; this expression is a
  * single fused primitive loop over the unsafe array data, inside
  * whole-stage codegen — preference order (b) of the build brief: a custom
  * `Expression` before any UDF.
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects array<bigint> x array<bigint>, got $l x $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += xs.getLong(i) * ys.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($xs.numElements(), $ys.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $xs.getLong($i) * $ys.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Double-precision dot product of two `ArrayType(FloatType)` columns — the
  * raw-embedding sibling of [[LongDotProduct]]. Each float is widened to
  * double and accumulated in order, the exact op sequence DuckDB's
  * `list_dot_product(CAST(v AS DOUBLE[]), ...)` performs, so results are
  * bit-identical across engines (the oracle-parity requirement).
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.FloatType, _),
            ArrayType(org.apache.spark.sql.types.FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects array<float> x array<float>, got $l x $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += xs.getFloat(i).toDouble * ys.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($xs.numElements(), $ys.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $xs.getFloat($i) * (double) $ys.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Fused product-quantization encoder: one pass over the vector against a
  * flat codebook literal (`[m][c][j]` layout, `subspaces*centroids*subDim`
  * longs) producing the packed code word `Σ code_m << (4*m)` — nearest
  * centroid per subspace by squared L2, ties to the smallest centroid id,
  * exactly the argmin the relational formulation computes with an explode +
  * aggregate over `subspaces x centroids` rows. At encode time this is the
  * difference between shuffling 128 candidate rows per vector and emitting
  * one long from whole-stage codegen.
  */
case class PqEncodeWord(left: Expression, right: Expression,
                        subspaces: Int, centroids: Int, subDim: Int)
    extends BinaryExpression {

  require(centroids <= 16, "4-bit packing supports at most 16 centroids")
  require(subspaces * 4 <= 64,
    "4-bit packing supports at most 16 subspaces per 64-bit word")

  // UnsafeArrayData.getLong does not bounds-check, so a short vector or a
  // mis-sized codebook would silently produce garbage codes; fail loudly
  // instead, from both the interpreted and the generated path.
  def checkLengths(vecLen: Int, bookLen: Int): Unit = {
    if (vecLen < subspaces * subDim)
      throw new IllegalArgumentException(
        s"pq_encode_word: vector has $vecLen elements, " +
          s"need ${subspaces * subDim} (subspaces*subDim)")
    if (bookLen < subspaces * centroids * subDim)
      throw new IllegalArgumentException(
        s"pq_encode_word: codebook has $bookLen elements, " +
          s"need ${subspaces * centroids * subDim} (subspaces*centroids*subDim)")
  }

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects array<bigint> x array<bigint>, got $l x $r")
    }

  override def nullSafeEval(v: Any, cb: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val book = cb.asInstanceOf[ArrayData]
    checkLengths(vec.numElements(), book.numElements())
    var word = 0L
    var m = 0
    while (m < subspaces) {
      var best = 0L
      var bestD = Long.MaxValue
      var c = 0
      while (c < centroids) {
        var d = 0L
        var j = 0
        while (j < subDim) {
          val diff = vec.getLong(m * subDim + j) -
            book.getLong((m * centroids + c) * subDim + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c } // strict <: ties keep min c
        c += 1
      }
      word |= best << (4 * m)
      m += 1
    }
    word
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, book) => {
      val word = ctx.freshName("word")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val self = ctx.addReferenceObj("pqEncodeWord", this, classOf[PqEncodeWord].getName)
      s"""
         |$self.checkLengths($vec.numElements(), $book.numElements());
         |long $word = 0L;
         |for (int $m = 0; $m < $subspaces; $m++) {
         |  long $best = 0L;
         |  long $bestD = Long.MAX_VALUE;
         |  for (int $c = 0; $c < $centroids; $c++) {
         |    long $d = 0L;
         |    for (int $j = 0; $j < $subDim; $j++) {
         |      long $diff = $vec.getLong($m * $subDim + $j)
         |        - $book.getLong(($m * $centroids + $c) * $subDim + $j);
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $word |= $best << (4 * $m);
         |}
         |${ev.value} = $word;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeWord =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column wrapper: `long_dot(a, b)`. */
  def long_dot(a: Column, b: Column): Column =
    Bridge.column(LongDotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Column wrapper: `float_dot(a, b)` (double result). */
  def float_dot(a: Column, b: Column): Column =
    Bridge.column(FloatDotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Column wrapper: `pq_encode_word(vec, codebookLiteral)`. */
  def pq_encode_word(vec: Column, codebook: Column,
                     subspaces: Int = 8, centroids: Int = 16,
                     subDim: Int = 8): Column =
    Bridge.column(PqEncodeWord(Bridge.expression(vec),
      Bridge.expression(codebook), subspaces, centroids, subDim))
}
