package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word-shingle table generator — the engine's UDTF tier (§2.12):
  * one (pos, shingle) row per n-token window of the input text.
  *
  * Semantics match `TextFunctions.shingles` (tokens = whitespace split
  * of the trimmed lowercased text; windows of `n`; documents shorter
  * than `n` tokens yield no rows) — this is the streaming twin of
  * `posexplode(shingles(text, n))`. The difference is the memory
  * shape, which is what matters for giant documents: the HOF pipeline
  * materializes the full shingle ARRAY per row before explode unpacks
  * it (O(doc_tokens · n) transient bytes per document, concentrated in
  * one value), while the generator emits rows one at a time from a
  * token slice — O(n tokens) live at any moment regardless of document
  * size. A Generator also composes with SQL (`LATERAL VIEW` /
  * select-list, injected as `shingle_rows` by [[GraftExtensions]]).
  */
case class ShingleRows(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_rows expects (string, n >= 1), got ($t, n=$n)")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def prettyName: String = "shingle_rows"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    // UTF8String trim/lower first (Spark's collation-aware ops), then
    // the same \s+ regex split the `tokens` Column helper uses
    val toks = v.asInstanceOf[UTF8String].trim().toLowerCase().toString
      .split("\\s+", -1)
    if (toks.length < n) Nil
    else new Iterator[InternalRow] {
      private var i = 0
      private val last = toks.length - n
      private val sb = new java.lang.StringBuilder
      override def hasNext: Boolean = i <= last
      override def next(): InternalRow = {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        val row = new GenericInternalRow(
          Array[Any](i, UTF8String.fromString(sb.toString)))
        i += 1
        row
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleRows =
    copy(child = newChild)
}

object TextGenerators {
  /** Generator column: one (pos, shingle) row per n-token window. */
  def shingleRows(text: Column, n: Int): Column =
    ColumnInterop.column(ShingleRows(ColumnInterop.expression(text), n))
}
