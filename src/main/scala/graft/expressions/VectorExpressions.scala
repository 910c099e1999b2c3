package graft.expressions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd vector kernels for the similarity-search hot path.
  *
  * The built-in composition `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * is correct but interpreted (higher-order functions fall back from
  * whole-stage codegen and allocate a lambda frame per element). This
  * expression generates a tight primitive loop instead — the (b) tier
  * of the custom-operator preference order (custom `Expression` before
  * custom physical plans).
  *
  * Semantics: exactly the built-in fold's, for ANY input — double-
  * precision left-to-right accumulation on equal-length null-free
  * arrays (bit-identical), and NULL whenever the fold is NULL: arrays
  * of different lengths (zip_with pads the shorter side with nulls, so
  * the fold nulls out) or any null element. This exact equivalence is
  * what licenses [[graft.plans.NativeDotRewrite]] to fire on arbitrary
  * user plans; the per-element null branch is only generated when the
  * static schema says elements can be null, so the embedding hot path
  * (containsNull=false) keeps the tight two-instruction loop.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"float_dot expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  // NULL on ragged or null-element inputs, even when both arrays are
  // themselves non-null
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "float_dot"

  /** Can either side's elements be null per the static schema? */
  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = elementsNullable
    var s = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val nullCheck = if (elementsNullable)
        s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {
  /** Codegen'd dot product of two `array<float>` columns. */
  def floatDot(a: Column, b: Column): Column =
    ColumnInterop.column(FloatDotProduct(
      ColumnInterop.expression(a), ColumnInterop.expression(b)))
}

/** The engine's `SparkSessionExtensions` entry point — build sessions
  * `.withExtensions(new GraftExtensions)` or set
  * `spark.sql.extensions=graft.expressions.GraftExtensions`.
  *
  * Injects:
  *  - SQL functions for the native kernels — `float_dot(a, b)`,
  *    `minhash_signature(shingles, k)`, `kmv_distinct(hash60, k)`,
  *    `hll_distinct(hash60, p)` —
  *    so pure-SQL users get the codegen'd/mergeable forms;
  *  - SQL names for the Column-composed curation tier —
  *    `url_normalize/url_host/registered_domain`, `lang_id`,
  *    `ws_token_count`, `rolling_hash`, `doc_fingerprint`, and
  *    `shingle_hash` (the shared 60-bit hash the sketch UDAFs
  *    expect, so `hll_distinct(shingle_hash(w), p)` composes in SQL);
  *  - the [[graft.plans.NativeDotRewrite]] optimizer rule, which
  *    rewrites the equivalent declarative `aggregate(zip_with(...))`
  *    fold into [[FloatDotProduct]] automatically;
  *  - the [[graft.plans.CastRoundtripSimplify]] optimizer rule, which
  *    collapses exact int→double→int cast roundtrips so staging-layer
  *    double columns don't defeat parquet predicate pushdown.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer k, got $other")
  }

  /** Register a `Column`-composed engine function under a SQL name:
    * the builder wraps the call-site expressions as Columns, composes
    * the library function (pure built-in expressions — codegen'd, no
    * UDF), and hands the composed tree back to the analyzer. This is
    * what lets pure-SQL users reach the curation tier
    * (`SELECT url_normalize(url)`, `hll_distinct(shingle_hash(w), 12)`)
    * with byte-identical semantics to the Scala API. */
  private def injectColumnFn(e: SparkSessionExtensions, name: String,
                             arity: Int)(build: Seq[Column] => Column): Unit =
    e.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (exprs: Seq[Expression]) => {
        if (exprs.length != arity) throw new IllegalArgumentException(
          s"$name takes $arity argument(s), got ${exprs.length}")
        ColumnInterop.catalystExpression(build(exprs.map(ColumnInterop.column)))
      }))

  override def apply(e: SparkSessionExtensions): Unit = {
    import graft.functions.{TextFunctions, UrlFunctions}
    injectColumnFn(e, "url_normalize", 1)(cs => UrlFunctions.urlNormalize(cs.head))
    injectColumnFn(e, "url_host", 1)(cs => UrlFunctions.urlHost(cs.head))
    injectColumnFn(e, "registered_domain", 1)(cs => UrlFunctions.registeredDomain(cs.head))
    injectColumnFn(e, "lang_id", 1)(cs => TextFunctions.langId(cs.head))
    injectColumnFn(e, "nfc_normalize", 1)(cs => NfcNormalize.nfcNormalize(cs.head))
    injectColumnFn(e, "ws_token_count", 1)(cs => TextFunctions.wsTokenCount(cs.head))
    injectColumnFn(e, "rolling_hash", 1)(cs => TextFunctions.rollingHash(cs.head))
    injectColumnFn(e, "doc_fingerprint", 1)(cs => TextFunctions.fingerprint(cs.head))
    injectColumnFn(e, "shingle_hash", 1)(cs => TextFunctions.shingleHash(cs.head))
    e.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"float_dot(array<float>, array<float>) takes 2 arguments, got ${exprs.length}")
        FloatDotProduct(exprs(0), exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"minhash_signature(array<string>, k) takes 2 arguments, got ${exprs.length}")
        MinHashSignature(exprs(0), intLit(exprs(1), "minhash_signature"))
      }))
    e.injectFunction((
      new FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinctAgg].getName, "kmv_distinct"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"kmv_distinct(hash_long, k) takes 2 arguments, got ${exprs.length}")
        KmvDistinctAgg(exprs(0), intLit(exprs(1), "kmv_distinct"))
      }))
    e.injectFunction((
      new FunctionIdentifier("hll_distinct"),
      new ExpressionInfo(classOf[HllDistinctAgg].getName, "hll_distinct"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"hll_distinct(hash_long, p) takes 2 arguments, got ${exprs.length}")
        HllDistinctAgg(exprs(0), intLit(exprs(1), "hll_distinct"))
      }))
    e.injectFunction((
      new FunctionIdentifier("shingle_rows"),
      new ExpressionInfo(classOf[ShingleRows].getName, "shingle_rows"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"shingle_rows(text, n) takes 2 arguments, got ${exprs.length}")
        ShingleRows(exprs(0), intLit(exprs(1), "shingle_rows"))
      }))
    e.injectFunction((
      new FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "misra_gries"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"misra_gries(item_string, k) takes 2 arguments, got ${exprs.length}")
        MisraGriesAgg(exprs(0), intLit(exprs(1), "misra_gries"))
      }))
    e.injectFunction((
      new FunctionIdentifier("quantile_sketch"),
      new ExpressionInfo(classOf[QuantileSketchAgg].getName, "quantile_sketch"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"quantile_sketch(x_double, k) takes 2 arguments, got ${exprs.length}")
        QuantileSketchAgg(exprs(0), intLit(exprs(1), "quantile_sketch"))
      }))
    e.injectOptimizerRule(_ => graft.plans.NativeDotRewrite)
    e.injectOptimizerRule(_ => graft.plans.NativeLongFoldRewrite)
    e.injectOptimizerRule(_ => graft.plans.CastRoundtripSimplify)
    e.injectOptimizerRule(_ => graft.plans.MvAggregateRewrite)
    // AFTER the MV rewrite: that rule matches the intact GraftRelation
    // leaf for its O(1) version staleness guard; this one then splices
    // any remaining graft leaves into native vectorized scans
    e.injectOptimizerRule(_ => graft.plans.GraftScanSubstitution)
    // SQL DML over graft.`path` tables: hand parser only for the
    // statements Spark has no grammar for (OPTIMIZE/VACUUM/DESCRIBE
    // HISTORY); MERGE/UPDATE/DELETE parse natively and lower via the
    // resolution rule onto the existing TxnLog operations
    e.injectParser((_, delegate) => new graft.sources.GraftSqlParser(delegate))
    // hint batch (pre-Resolution): must convert graft.`path` DML
    // before ResolveSQLOnFile claims-and-fails the path token
    e.injectHintResolutionRule(_ => graft.sources.GraftDmlResolution)
  }
}
