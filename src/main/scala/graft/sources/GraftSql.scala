package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.types._

/** The SQL DML surface over `format("graft")` tables — the user-facing
  * half of the lakehouse tier. The reference stack's lakehouse speaks
  * SQL (`convert_to_delta.py` converts exactly so users can run
  * `MERGE INTO` / `DELETE` / `OPTIMIZE` on the warehouse); this module
  * gives the TxnLog format the same statements, addressed Delta-style
  * as `graft.`/table/root``:
  *
  * {{{
  *   DELETE FROM graft.`/t` WHERE id < 10
  *   UPDATE graft.`/t` SET s = upper(s), n = n + 1 WHERE id = 3
  *   MERGE INTO graft.`/t` AS t USING src AS s ON t.id = s.id
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT *
  *     [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE]
  *   OPTIMIZE graft.`/t` [WHERE col BETWEEN lo AND hi]
  *   OPTIMIZE graft.`/t` ZORDER BY (a, b)
  *   VACUUM graft.`/t` [RETAIN n VERSIONS]
  *   DESCRIBE HISTORY graft.`/t`
  *   DESCRIBE DETAIL graft.`/t`
  *   RESTORE [TABLE] graft.`/t` TO VERSION AS OF n | TO TIMESTAMP AS OF 'ts'
  *   CONVERT TO GRAFT parquet.`/plain/dir` AS graft.`/t` [NO STATISTICS]
  *   CREATE TABLE graft.`/dst` SHALLOW CLONE graft.`/src` [VERSION AS OF n]
  * }}}
  *
  * Architecture (the Delta connector discipline, from public source):
  * statements Spark's own parser understands (MERGE/UPDATE/DELETE)
  * parse normally and are converted by a RESOLUTION rule
  * ([[GraftDmlResolution]]) when their target is a `graft.`…`` table;
  * only the statements Spark has no grammar for (OPTIMIZE / VACUUM /
  * DESCRIBE HISTORY) get a tiny hand parser ([[GraftSqlParser]]) that
  * delegates everything else verbatim. Every statement lowers onto the
  * EXISTING TxnLog operation — the SQL layer changes how a statement
  * is written, never what it computes, so the engine's CAS/idempotency
  * /CDF semantics (and their specs and oracles) carry over untouched.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case DescribeHistoryRe(path) => GraftDescribeHistoryCommand(path)
    case DescribeDetailRe(path) => GraftDescribeDetailCommand(path)
    case RestoreVersionRe(path, v) => GraftRestoreCommand(path, Some(v.toLong), None)
    case RestoreTimestampRe(path, ts) => GraftRestoreCommand(path, None, Some(ts))
    case ConvertRe(pdir, root, nostats) =>
      GraftConvertCommand(pdir, root, collectStats = nostats == null)
    case CloneRe(dst, src, v) =>
      GraftCloneCommand(dst, src, Option(v).map(_.toLong))
    case AlterAddCheckRe(path, name, pred) => GraftAddCheckCommand(path, name, pred)
    case AlterDropCheckRe(path, name) => GraftDropCheckCommand(path, name)
    case AlterRenameColRe(path, from, to) => GraftRenameColumnCommand(path, from, to)
    case AlterDropColRe(path, name) => GraftDropColumnCommand(path, name)
    case AlterAddColRe(path, name, default) => GraftAddColumnCommand(path, name, default.trim)
    case VacuumRe(path, retain) =>
      GraftVacuumCommand(path, Option(retain).map(_.toInt).getOrElse(1))
    case OptimizeRe(path, where, zorder) =>
      val range = Option(where).map(parseRange)
      val zcols = Option(zorder).toSeq.flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
      require(range.isEmpty || zcols.isEmpty,
        "OPTIMIZE graft: WHERE and ZORDER BY are mutually exclusive " +
          "(clustering is a whole-table layout rewrite)")
      GraftOptimizeCommand(path, range, zcols)
    case _ => delegate.parsePlan(sqlText)
  }

  /** `col BETWEEN lo AND hi` (or the expanded `col >= lo AND col <= hi`)
    * — the compaction scope. Parsed by the real SQL parser so literals
    * carry their exact types. */
  private def parseRange(whereText: String): (String, Any, Any) = {
    def scalaOf(l: Literal): Any =
      CatalystTypeConverters.convertToScala(l.value, l.dataType)
    delegate.parseExpression(whereText) match {
      // Spark 4 keeps BETWEEN as its own unresolved function
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.map(_.toLowerCase) == Seq("between") =>
        f.arguments match {
          case Seq(a: UnresolvedAttribute, lo: Literal, hi: Literal) =>
            (a.nameParts.last, scalaOf(lo), scalaOf(hi))
          case other => throw new IllegalArgumentException(
            s"OPTIMIZE graft ... WHERE wants `col BETWEEN lo AND hi` with literal bounds, got: $other")
        }
      case And(GreaterThanOrEqual(a: UnresolvedAttribute, lo: Literal),
               LessThanOrEqual(b: UnresolvedAttribute, hi: Literal))
          if a.nameParts.last == b.nameParts.last =>
        (a.nameParts.last, scalaOf(lo), scalaOf(hi))
      case other => throw new IllegalArgumentException(
        s"OPTIMIZE graft ... WHERE wants `col BETWEEN lo AND hi`, got: $other")
    }
  }

  override def parseExpression(s: String): Expression = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String): TableIdentifier =
    delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String): Seq[String] =
    delegate.parseMultipartIdentifier(s)
  override def parseQuery(s: String): LogicalPlan = delegate.parseQuery(s)
  override def parseRoutineParam(s: String): StructType = delegate.parseRoutineParam(s)
  override def parseDataType(s: String): DataType = delegate.parseDataType(s)
  override def parseTableSchema(s: String): StructType = delegate.parseTableSchema(s)
}

object GraftSqlParser {
  // graft.`<path>` — the Delta path-table address shape. Backticked
  // path is required: it is the unambiguous token the regex can
  // anchor on without re-implementing identifier grammar.
  private val T = """graft\s*\.\s*`([^`]+)`"""
  private val DescribeHistoryRe = s"""(?is)\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$T\\s*;?\\s*""".r
  private val DescribeDetailRe = s"""(?is)\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$T\\s*;?\\s*""".r
  private val RestoreVersionRe =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$T\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*""".r
  private val RestoreTimestampRe =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$T\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*""".r
  private val ConvertRe =
    s"""(?is)\\s*CONVERT\\s+TO\\s+GRAFT\\s+parquet\\s*\\.\\s*`([^`]+)`\\s+AS\\s+$T(\\s+NO\\s+STATISTICS)?\\s*;?\\s*""".r
  private val CloneRe =
    s"""(?is)\\s*CREATE\\s+TABLE\\s+$T\\s+SHALLOW\\s+CLONE\\s+$T(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?\\s*;?\\s*""".r
  private val VacuumRe = s"""(?is)\\s*VACUUM\\s+$T(?:\\s+RETAIN\\s+(\\d+)\\s+VERSIONS)?\\s*;?\\s*""".r
  private val AlterAddCheckRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$T\\s+ADD\\s+CONSTRAINT\\s+(\\w+)\\s+CHECK\\s*\\((.+)\\)\\s*;?\\s*""".r
  private val AlterDropCheckRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$T\\s+DROP\\s+CONSTRAINT\\s+(\\w+)\\s*;?\\s*""".r
  private val AlterRenameColRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$T\\s+RENAME\\s+COLUMN\\s+(\\w+)\\s+TO\\s+(\\w+)\\s*;?\\s*""".r
  private val AlterDropColRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$T\\s+DROP\\s+COLUMN\\s+(\\w+)\\s*;?\\s*""".r
  private val AlterAddColRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$T\\s+ADD\\s+COLUMN\\s+(\\w+)\\s+DEFAULT\\s+(.+?)\\s*;?\\s*""".r
  private val OptimizeRe =
    s"""(?is)\\s*OPTIMIZE\\s+$T(?:\\s+WHERE\\s+(.+?))??(?:\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\))?\\s*;?\\s*""".r
}

/** Analyzer rule converting Spark-parsed DML (DELETE / UPDATE / MERGE)
  * whose target is a `graft.`…`` path table into the runnable TxnLog
  * command. Fires only on graft targets — every other table's DML
  * resolves exactly as before.
  *
  * Injected into the HINT-resolution batch, which runs BEFORE the
  * main Resolution batch: Spark's own `ResolveSQLOnFile` otherwise
  * claims the `graft.`path`` token first and fails it as an
  * unsupported direct file query (it requires a v2 TableProvider).
  * Converting early is safe because the command resolves everything
  * itself at run time: conditions/assignments become Columns resolved
  * against the table frame, and the MERGE source plan is analyzed by
  * the session when the command wraps it as a DataFrame. */
object GraftDmlResolution extends Rule[LogicalPlan] {

  /** The `graft.`path`` target under an optional alias. */
  private def graftTarget(plan: LogicalPlan): Option[(String, Set[String])] = plan match {
    case SubqueryAlias(ident, child) =>
      graftTarget(child).map { case (p, names) => (p, names + ident.name.toLowerCase) }
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
        if u.multipartIdentifier.size == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("graft") =>
      Some((u.multipartIdentifier(1), Set.empty))
    case _ => None
  }

  /** Drop a leading target-alias qualifier from column references —
    * the statement's own frame has unqualified columns. */
  private def stripQualifier(e: Expression, names: Set[String]): Expression =
    e.transform {
      case ua: UnresolvedAttribute
          if ua.nameParts.size > 1 && names.contains(ua.nameParts.head.toLowerCase) =>
        UnresolvedAttribute(ua.nameParts.tail)
    }

  private def colName(e: Expression): Option[String] = e match {
    case ua: UnresolvedAttribute => Some(ua.nameParts.last)
    case ar: AttributeReference => Some(ar.name)
    case _ => None
  }

  /** `t.k1 = s.k1 AND …` → the merge key list; anything else is not
    * the engine's key-equality MERGE shape. */
  private def mergeKeys(cond: Expression): Option[Seq[String]] = {
    def conjuncts(x: Expression): Seq[Expression] = x match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case o => Seq(o)
    }
    val ks = conjuncts(cond).map {
      case EqualTo(l, r) =>
        for { a <- colName(l); b <- colName(r); if a == b } yield a
      case _ => None
    }
    if (ks.forall(_.isDefined)) Some(ks.flatten) else None
  }

  private def unsupported(what: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_3065", // generic analysis failure carrier
      messageParameters = Map("clazz" -> "graft", "msg" ->
        (s"graft SQL MERGE supports exactly: ON key-equality conjunction, " +
          s"WHEN MATCHED THEN UPDATE SET *, WHEN NOT MATCHED THEN INSERT *, " +
          s"optional WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE — got $what")))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case DeleteFromTable(t, cond) if graftTarget(t).isDefined =>
      val (root, names) = graftTarget(t).get
      GraftDeleteCommand(root, ColumnInterop.column(stripQualifier(cond, names)))

    case UpdateTable(t, assignments, cond) if graftTarget(t).isDefined =>
      val (root, names) = graftTarget(t).get
      val sets = assignments.map { a =>
        val name = colName(a.key).getOrElse(unsupported(s"assignment target ${a.key}"))
        (name, ColumnInterop.column(stripQualifier(a.value, names)))
      }
      GraftUpdateCommand(root, sets, ColumnInterop.column(
        cond.map(stripQualifier(_, names)).getOrElse(Literal.TrueLiteral)))

    case MergeIntoTable(t, source, mergeCond, matched, notMatched, nmbs, withSchemaEvo)
        if graftTarget(t).isDefined =>
      val (root, names) = graftTarget(t).get
      if (withSchemaEvo) unsupported("WITH SCHEMA EVOLUTION")
      val keys = mergeKeys(mergeCond).getOrElse(unsupported(s"ON $mergeCond"))
      matched match {
        case Seq(_: UpdateStarAction) => ()
        case Seq(UpdateAction(None, Nil, _)) => ()
        case other => unsupported(s"matched actions $other")
      }
      notMatched match {
        case Seq(_: InsertStarAction) => ()
        case Seq(InsertAction(None, Nil)) => ()
        case other => unsupported(s"not-matched actions $other")
      }
      val nmbsDelete = nmbs match {
        case Nil => None
        case Seq(DeleteAction(condOpt)) => Some(ColumnInterop.column(
          condOpt.map(stripQualifier(_, names)).getOrElse(Literal.TrueLiteral)))
        case other => unsupported(s"not-matched-by-source actions $other")
      }
      GraftMergeCommand(root, source, keys, nmbsDelete)

    // INSERT INTO graft.`/path`: the statement holds its target as a
    // NON-CHILD field, so the relation case below never sees it —
    // convert explicitly; Spark then lowers through InsertableRelation
    case i: InsertIntoStatement if pathRelation(i.table).isDefined =>
      i.copy(table = pathRelation(i.table).get)

    // QUERY-position references — `SELECT … FROM graft.`/path``, a
    // MERGE source, a join leg — resolve to the connector relation
    // directly (Delta's path-table read shape); reads then go through
    // the scan-substitution rule like any connector read.
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
        if pathRelation(u).isDefined =>
      pathRelation(u).get
  }

  /** `graft.`/path`` in query position → the connector relation.
    * Gated on a '/' in the identifier so a genuine catalog database
    * named `graft` is never shadowed. */
  private def pathRelation(p: LogicalPlan): Option[LogicalPlan] = p match {
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
        if u.multipartIdentifier.size == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("graft") &&
          u.multipartIdentifier(1).contains("/") && !u.isStreaming =>
      Some(SparkSession.active.read.format("graft")
        .load(u.multipartIdentifier(1)).queryExecution.analyzed)
    case _ => None
  }
}

/** DML commands carry their predicates/assignments as OPAQUE
  * [[org.apache.spark.sql.Column]]s, not Expression fields: the
  * expressions are deliberately unresolved here (they resolve against
  * the table frame inside the TxnLog call at run time), and
  * CheckAnalysis would fail any unresolved Expression constructor arg
  * it can see. A Column is invisible to the tree walkers — the same
  * reason the whole engine's operator API speaks Column. */
case class GraftDeleteCommand(root: String, cond: org.apache.spark.sql.Column)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxnLog.delete(spark, root, cond)))
}

case class GraftUpdateCommand(root: String,
                              sets: Seq[(String, org.apache.spark.sql.Column)],
                              cond: org.apache.spark.sql.Column)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxnLog.update(spark, root, sets, cond)))
}

case class GraftMergeCommand(root: String, source: LogicalPlan,
                             keys: Seq[String],
                             nmbsDelete: Option[org.apache.spark.sql.Column])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    // ofRows analyzes: the source (a table ref, temp view, or
    // subquery captured before resolution) resolves here, in the
    // session that runs the statement
    val src = GraftShims.dataFrame(spark, source)
    Seq(Row(TxnLog.merge(src, root, keys,
      notMatchedBySourceDelete = nmbsDelete)))
  }
}

case class GraftOptimizeCommand(root: String,
                                range: Option[(String, Any, Any)],
                                zorderBy: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = Seq(Row(
    if (zorderBy.nonEmpty) TxnLog.cluster(spark, root, zorderBy)
    else range match {
      case Some((c, lo, hi)) => TxnLog.compactWhere(spark, root, c, lo, hi)
      case None => TxnLog.compact(spark, root)
    }))
}

case class GraftVacuumCommand(root: String, retainVersions: Int)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    TxnLog.vacuum(spark, root, retainVersions)
    Seq.empty
  }
}

/** `RESTORE graft.`p` TO VERSION AS OF n | TO TIMESTAMP AS OF 'ts'` —
  * re-points the table at an earlier snapshot as a NEW commit
  * ([[TxnLog.restore]]); timestamps resolve exactly like the
  * connector's `timestampAsOf` (epoch millis, full timestamp, or
  * date-only). */
case class GraftRestoreCommand(root: String, version: Option[Long],
                               timestamp: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val to = version.getOrElse {
      val raw = timestamp.get
      val ms = scala.util.Try(raw.toLong)
        .orElse(scala.util.Try(java.sql.Timestamp.valueOf(raw).getTime))
        .orElse(scala.util.Try(java.sql.Date.valueOf(raw).getTime))
        .getOrElse(throw new IllegalArgumentException(
          s"graft RESTORE: TIMESTAMP AS OF accepts epoch millis, " +
            s"'yyyy-MM-dd HH:mm:ss', or 'yyyy-MM-dd'; got '$raw'"))
      TxnLog.versionAtTimestamp(spark, root, ms)
    }
    Seq(Row(TxnLog.restore(spark, root, to)))
  }
}

/** `CONVERT TO GRAFT parquet.`dir` AS graft.`root`` — wrap an existing
  * parquet directory as a TxnLog table by reference
  * ([[TxnLog.convertFromParquet]]; the reference's convert_to_delta.py
  * statement). Stats collected by default; `NO STATISTICS` skips the
  * scan. */
case class GraftConvertCommand(dir: String, root: String, collectStats: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxnLog.convertFromParquet(spark, dir, root, collectStats)))
}

/** `CREATE TABLE graft.`dst` SHALLOW CLONE graft.`src` [VERSION AS OF n]`
  * — the zero-copy clone ([[TxnLog.cloneTable]]). */
case class GraftCloneCommand(dst: String, src: String, asOf: Option[Long])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxnLog.cloneTable(spark, src, dst, asOf)))
}

/** `DESCRIBE DETAIL graft.`p`` — the one-row ops report
  * ([[TxnLog.health]]): sizes, file census vs ideal, stats coverage,
  * deletion vectors, reclaimable bytes, constraints, schema
  * evolutions. */
case class GraftDescribeDetailCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_dirs", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("total_bytes", LongType, nullable = false)(),
    AttributeReference("ideal_files", LongType, nullable = false)(),
    AttributeReference("compact_flag", IntegerType, nullable = false)(),
    AttributeReference("stats_coverage_bps", LongType, nullable = false)(),
    AttributeReference("dv_count", LongType, nullable = false)(),
    AttributeReference("reclaimable_bytes", LongType, nullable = false)(),
    AttributeReference("checks_n", LongType, nullable = false)(),
    AttributeReference("schema_evolutions", LongType, nullable = false)(),
    AttributeReference("transforms_n", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    TxnLog.health(spark, root).collect().toSeq
}

/** `ALTER TABLE graft.`p` …` — the schema-evolution and constraint
  * DDL (Delta's surface, Spark has no grammar for these): CHECK
  * constraints enforce at every later commit; column rename/drop are
  * METADATA-ONLY (column mapping — physical names stay frozen on
  * disk); ADD COLUMN takes a DEFAULT expression old rows evaluate. */
case class GraftAddCheckCommand(root: String, name: String, predicateSql: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxnLog.addCheck(spark, root, name, predicateSql)))
}

case class GraftDropCheckCommand(root: String, name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxnLog.dropCheck(spark, root, name)))
}

case class GraftRenameColumnCommand(root: String, from: String, to: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxnLog.renameColumn(spark, root, from, to)))
}

case class GraftDropColumnCommand(root: String, name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxnLog.dropColumn(spark, root, name)))
}

case class GraftAddColumnCommand(root: String, name: String, defaultSql: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxnLog.addColumn(spark, root, name, defaultSql)))
}

case class GraftDescribeHistoryCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("committed_at", TimestampType, nullable = false)(),
    AttributeReference("action", StringType, nullable = false)(),
    AttributeReference("n_dirs", LongType, nullable = false)(),
    AttributeReference("txn_id", StringType, nullable = true)(),
    AttributeReference("n_dvs", LongType, nullable = false)(),
    AttributeReference("n_checks", LongType, nullable = false)(),
    AttributeReference("n_external_dirs", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    TxnLog.describeHistory(spark, root).collect().toSeq
}
