package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Bloom-screen kernel for the broadcast-Bloom decontamination
  * path ([[graft.functions.TextFunctions.contaminationBloom]]): count
  * the shingles whose ALL `k` Kirsch-Mitzenmacher probes hit the
  * literal bitset.
  *
  * Replaces the declarative composition
  * `size(filter(sh, s -> forall(bloomPositions(s), p -> bit(p))))` —
  * three nested higher-order functions, all interpreted (codegen
  * fallback, a lambda frame per element per probe) with per-probe
  * md5-hex string building and base-16 `conv` parsing. This kernel
  * runs the identical derivation as one compiled loop straight off the
  * digest bytes: h1 = md5 hex chars 1–15 (the first 15 nibbles as an
  * unsigned 60-bit integer — exactly `conv(substring(md5(s),1,15),
  * 16,10)`), h2 = chars 16–30, probe i at `(h1 + i·h2) % mBits`,
  * hit iff every probe's bit is set. Null elements are skipped — the
  * `filter` lambda's NULL is not TRUE, so the built-in never counted
  * them either. Bit-identical counts by construction; parity pinned
  * by IntegerVectorExpressionSpec. */
case class BloomContamHits(child: Expression, words: Array[Long],
                           mBits: Int, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_contam_hits expects array<string>, got $t")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_contam_hits"

  override def nullSafeEval(input: Any): Any =
    BloomContamHits.count(input.asInstanceOf[ArrayData], words, mBits, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.BloomContamHits.count($c, $ref, $mBits, $k)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BloomContamHits {

  /** One compiled pass: for each non-null shingle, md5 → (h1, h2) from
    * the first 30 hex nibbles, k probes, count all-hit shingles. */
  def count(arr: ArrayData, words: Array[Long], mBits: Int, k: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var f = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(i).getBytes)
        // hex nibble j of the digest (0-based): byte j/2, high nibble
        // when j is even — md5()'s lowercase hex rendering order
        def nib(j: Int): Long = {
          val b = digest(j >> 1) & 0xff
          (if ((j & 1) == 0) b >>> 4 else b & 0xf).toLong
        }
        var h1 = 0L; var j = 0
        while (j < 15) { h1 = (h1 << 4) | nib(j); j += 1 }
        var h2 = 0L; j = 15
        while (j < 30) { h2 = (h2 << 4) | nib(j); j += 1 }
        var hit = true
        var t = 0
        while (t < k && hit) {
          val p = (h1 + t * h2) % mBits
          if (((words((p >>> 6).toInt) >>> (p & 63)) & 1L) != 1L) hit = false
          t += 1
        }
        if (hit) f += 1
      }
      i += 1
    }
    f
  }
}

object BloomFunctions {
  /** Codegen'd all-k-probes Bloom hit count over an `array<string>`
    * shingle column against a literal packed bitset. */
  def bloomContamHits(sh: Column, words: Array[Long], mBits: Int, k: Int): Column =
    ColumnInterop.column(BloomContamHits(
      ColumnInterop.expression(sh), words, mBits, k))
}
