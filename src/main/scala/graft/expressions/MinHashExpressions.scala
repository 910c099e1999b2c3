package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Whole-signature MinHash as ONE native expression.
  *
  * Semantically identical to the built-in composition
  * `transform(sequence(0,k-1), j -> array_min(transform(shingles, ...)))`
  * with the Kirsch-Mitzenmacher family (md5 hex chars 1-15/16-30 →
  * 60-bit h1/h2, hash_j = (h1 + j·h2) mod 2^31 — the exact derivation
  * the DuckDB oracle spells out), but evaluated as a tight loop with a
  * reused MessageDigest: no per-element lambda frames, no boxing, one
  * hash per shingle. Codegen calls straight into [[eval]]'s kernel via
  * an object reference — the hashing dominates, so staying out of the
  * interpreted higher-order-function path is what matters.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  private val M = 1L << 31

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<string> (k > 0), got ($t, k=$k)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  @transient private lazy val md =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** 60-bit ints from hex chars [from, from+15) of the digest. */
  private def hex15(digest: Array[Byte], from: Int): Long = {
    var v = 0L
    var i = from
    while (i < from + 15) {
      val b = digest(i >> 1) & 0xff
      val nibble = if ((i & 1) == 0) b >> 4 else b & 0xf
      v = (v << 4) | nibble
      i += 1
    }
    v
  }

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    val digestFn = md.get()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      digestFn.reset()
      val digest = digestFn.digest(s.getBytes)
      val h1 = hex15(digest, 0) % M
      val h2 = hex15(digest, 15) % M
      var j = 0
      while (j < k) {
        val hj = (h1 + j * h2) % M
        if (hj < mins(j)) mins(j) = hj
        j += 1
      }
      i += 1
    }
    // empty shingle set → k nulls, matching the built-in composition
    // (array_min over an empty array is null per hash index)
    if (n == 0) new GenericArrayData(Array.fill[Any](k)(null))
    else new GenericArrayData(mins.map(v => v: Any))
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashExpr", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashFunctions {
  /** Native whole-signature MinHash over a distinct-shingle column. */
  def minhashSignature(shingles: Column, k: Int): Column =
    ColumnInterop.column(MinHashSignature(ColumnInterop.expression(shingles), k))
}
