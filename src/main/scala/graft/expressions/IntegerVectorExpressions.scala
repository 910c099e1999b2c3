package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd INTEGER vector kernels — the fixed-point siblings
  * of [[FloatDotProduct]], covering the micro-unit arithmetic the
  * similarity/quantization tier runs per row:
  *
  *   - [[LongVecSqDist]]: Σ (a_i − b_i)² — the assignment distance of
  *     every Lloyd/PQ/IVF step;
  *   - [[LongVecDot]]:    Σ a_i · b_i — the projection/back-projection
  *     score of the power-iteration and JL paths.
  *
  * The built-in composition `aggregate(zip_with(a, b, f), 0L, _+_)` is
  * correct but interpreted: higher-order functions fall back from
  * whole-stage codegen and allocate a lambda frame per element. These
  * expressions generate a tight primitive loop instead.
  *
  * Semantics: exactly the built-in fold's, for ANY input — left-to-
  * right long accumulation on equal-length null-free arrays
  * (bit-identical; integer adds are order-free anyway), and NULL
  * whenever the fold is NULL: arrays of different lengths (zip_with
  * pads the shorter side with nulls, so the fold nulls out) or any
  * null element. Overflow raises (`Math.multiplyExact`/`addExact`) —
  * the ANSI-mode behaviour of the fold it replaces; the micro-unit
  * contract (|v| ≤ ~2^24, dim ≤ 2^10) keeps real inputs far below
  * 2^63 so the check never fires on engine data. The exact
  * equivalence licenses [[graft.plans.NativeSqDistRewrite]] to fire
  * on arbitrary plans (the [[graft.plans.NativeDotRewrite]] pattern).
  */
abstract class LongVecFold extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint>, array<bigint>), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  // NULL on ragged or null-element inputs, even when both arrays are
  // themselves non-null
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  /** Can either side's elements be null per the static schema? */
  protected def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  })

  /** Per-element term in Java source: long expression over `$ax`/`$bx`. */
  protected def termJava(ax: String, bx: String): String
  /** Per-element term for interpreted eval. */
  protected def termEval(a: Long, b: Long): Long

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = elementsNullable
    var s = 0L
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      s = Math.addExact(s, termEval(x.getLong(i), y.getLong(i)))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val ax = ctx.freshName("ax")
      val bx = ctx.freshName("bx")
      val nullCheck = if (elementsNullable)
        s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    long $ax = $x.getLong($i);
         |    long $bx = $y.getLong($i);
         |    $s = java.lang.Math.addExact($s, ${termJava(ax, bx)});
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
}

/** Σ (a_i − b_i)² over two `array<bigint>` columns. */
case class LongVecSqDist(left: Expression, right: Expression) extends LongVecFold {
  override def prettyName: String = "long_sqdist"
  override protected def termJava(ax: String, bx: String): String =
    s"java.lang.Math.multiplyExact(java.lang.Math.subtractExact($ax, $bx), " +
      s"java.lang.Math.subtractExact($ax, $bx))"
  override protected def termEval(a: Long, b: Long): Long =
    Math.multiplyExact(Math.subtractExact(a, b), Math.subtractExact(a, b))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ a_i · b_i over two `array<bigint>` columns. */
case class LongVecDot(left: Expression, right: Expression) extends LongVecFold {
  override def prettyName: String = "long_dot"
  override protected def termJava(ax: String, bx: String): String =
    s"java.lang.Math.multiplyExact($ax, $bx)"
  override protected def termEval(a: Long, b: Long): Long =
    Math.multiplyExact(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Deterministic fixed-point log2 in 1/2^16 units — the NATIVE form of
  * the 16-step integer square-and-extract chain
  * ([[graft.functions.TextFunctions.ilog2Fp16]]): the declarative
  * `aggregate(sequence(1, 16), struct(x, acc), ...)` fold allocates a
  * struct frame per step per row and is interpreted (HOF codegen
  * fallback); this expression runs the identical long arithmetic in a
  * 16-iteration loop.
  *
  * Bit-exact replication of the built-in chain, including out-of-
  * contract inputs: msb = length(bin(p)) − 1 (64-bit two's-complement
  * rendering, so p < 0 → 63, p = 0 → 0), x₀ = (p << 20) >> msb
  * (Java shift semantics), then 16 rounds of
  * x² >> 20 with a conditional halving appending one fraction bit.
  * Result: msb·65536 + acc. Input LONG, result LONG, null → null. */
case class Ilog2Fp16Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ilog2_fp16 expects bigint, got $t")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ilog2_fp16"

  override def nullSafeEval(input: Any): Any =
    Ilog2Fp16Expr.compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p =>
      s"graft.expressions.Ilog2Fp16Expr.compute($p)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Ilog2Fp16Expr {
  /** The exact arithmetic of the declarative chain, one tight loop.
    * `length(bin(p)) - 1`: bin renders the 64-bit two's complement
    * (java.lang.Long.toBinaryString), so the length is
    * 64 − numberOfLeadingZeros(p) for p > 0, 1 for p = 0, 64 for
    * p < 0. Shifts are Java `<<`/`>>` (the non-ANSI-checked shiftleft/
    * shiftright built-ins). */
  def compute(p: Long): Long = {
    val msb: Long =
      if (p == 0L) 0L
      else (64 - java.lang.Long.numberOfLeadingZeros(p)) - 1L
    var x: Long = (p << 20) >> msb
    var acc: Long = 0L
    var i = 0
    while (i < 16) {
      val xsq = (x * x) >> 20
      if (xsq >= 2L * (1L << 20)) {
        x = xsq >> 1
        acc = acc * 2 + 1
      } else {
        x = xsq
        acc = acc * 2
      }
      i += 1
    }
    msb * 65536L + acc
  }
}

object IntegerVectorFunctions {
  /** Codegen'd Σ(a−b)² of two `array<bigint>` columns. */
  def longSqDist(a: Column, b: Column): Column =
    ColumnInterop.column(LongVecSqDist(
      ColumnInterop.expression(a), ColumnInterop.expression(b)))
  /** Codegen'd Σ a·b of two `array<bigint>` columns. */
  def longDot(a: Column, b: Column): Column =
    ColumnInterop.column(LongVecDot(
      ColumnInterop.expression(a), ColumnInterop.expression(b)))
  /** Codegen'd 16-step fixed-point log2 (1/2^16 units) of a bigint. */
  def ilog2Fp16(p: Column): Column =
    ColumnInterop.column(Ilog2Fp16Expr(ColumnInterop.expression(p)))
}
