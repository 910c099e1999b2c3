package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Spark has no unicode-normalization builtin, and a crawl corpus
  * arrives in mixed forms: "café" appears both composed (U+00E9) and
  * decomposed (e + U+0301), which silently splits exact-dedup
  * fingerprints, breaks tokenizer vocab lookups, and double-counts
  * n-grams. Canonicalizing to NFC before fingerprinting/tokenizing is
  * the standard first step of production text pipelines (and of every
  * major tokenizer's preprocessing).
  *
  * This is the (b) tier of the custom-operator preference order — a
  * scalar `Expression` with `doGenCode`, not a UDF: the generated code
  * stays inside whole-stage codegen (no Scala-lambda call per row, no
  * encoder round trip), calling the JDK's `java.text.Normalizer`
  * directly. An already-NFC string (the overwhelming hot path in
  * practice) is detected by `Normalizer.isNormalized`'s quick check
  * and returned as the SAME UTF8String — zero allocation.
  *
  * Cross-engine: DuckDB ships `nfc_normalize`; both implement Unicode
  * canonical composition, so results are byte-identical and
  * oracle-checkable (`text_nfc`).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got $other")
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code. The isNormalized
    * fast path returns the input object untouched — NFC text (almost
    * everything) costs one scan, no allocation. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column API: NFC-normalize a string column. */
  def nfcNormalize(c: Column): Column =
    ColumnInterop.column(NfcNormalize(ColumnInterop.expression(c)))
}
