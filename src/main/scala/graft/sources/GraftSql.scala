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

  /** A target token is either `graft.`/path`` or a session-catalog
    * table name created `USING graft` — resolve to the table root, or
    * None (→ delegate verbatim: a named ALTER on a non-graft table
    * must reach Spark's own grammar untouched). */
  private def root(token: String): Option[String] = resolveTarget(token)

  override def parsePlan(sqlText: String): LogicalPlan = {
    val claimed: Option[LogicalPlan] = sqlText match {
      case DescribeHistoryRe(t) => root(t).map(GraftDescribeHistoryCommand(_))
      case DescribeDetailRe(t) => root(t).map(GraftDescribeDetailCommand(_))
      case RestoreVersionRe(t, v) => root(t).map(GraftRestoreCommand(_, Some(v.toLong), None))
      case RestoreTimestampRe(t, ts) => root(t).map(GraftRestoreCommand(_, None, Some(ts)))
      case ConvertRe(pdir, dst, nostats) =>
        Some(GraftConvertCommand(pdir, dst, collectStats = nostats == null))
      case CloneRe(dst, src, v) =>
        root(src).map(GraftCloneCommand(dst, _, Option(v).map(_.toLong)))
      case AlterAddCheckRe(t, name, pred) => root(t).map(GraftAddCheckCommand(_, name, pred))
      case AlterDropCheckRe(t, name) => root(t).map(GraftDropCheckCommand(_, name))
      case AlterRenameColRe(t, from, to) => root(t).map(GraftRenameColumnCommand(_, from, to))
      case AlterDropColRe(t, name) => root(t).map(GraftDropColumnCommand(_, name))
      case AlterAddColRe(t, name, default) => root(t).map(GraftAddColumnCommand(_, name, default.trim))
      case VacuumRe(t, retain) =>
        root(t).map(GraftVacuumCommand(_, Option(retain).map(_.toInt).getOrElse(1)))
      case OptimizeRe(t, where, zorder) =>
        root(t).map { r =>
          val range = Option(where).map(parseRange)
          val zcols = Option(zorder).toSeq.flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
          require(range.isEmpty || zcols.isEmpty,
            "OPTIMIZE graft: WHERE and ZORDER BY are mutually exclusive " +
              "(clustering is a whole-table layout rewrite)")
          GraftOptimizeCommand(r, range, zcols)
        }
      case _ => None
    }
    claimed.getOrElse(delegate.parsePlan(sqlText))
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
  // anchor on without re-implementing identifier grammar. Positions
  // that CREATE a table stay path-only (T); positions addressing an
  // EXISTING table also accept a catalog name (TT — resolved by
  // [[GraftCatalogNames]] at parse time; non-graft names delegate).
  private val T = """graft\s*\.\s*`([^`]+)`"""
  private val TT = """(graft\s*\.\s*`[^`]+`|(?:\w+\.){0,2}\w+)"""
  private val PathForm = """(?is)\s*graft\s*\.\s*`([^`]+)`\s*""".r

  /** Target token → table root: the backticked path itself, or a
    * session-catalog `USING graft` table's LOCATION. */
  private[graft] def resolveTarget(token: String): Option[String] = token match {
    case PathForm(p) => Some(p)
    case name => GraftCatalogNames.resolve(name.split("\\.").map(_.trim).toSeq)
  }

  private val DescribeHistoryRe = s"""(?is)\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$TT\\s*;?\\s*""".r
  private val DescribeDetailRe = s"""(?is)\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$TT\\s*;?\\s*""".r
  private val RestoreVersionRe =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$TT\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*""".r
  private val RestoreTimestampRe =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$TT\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*""".r
  private val ConvertRe =
    s"""(?is)\\s*CONVERT\\s+TO\\s+GRAFT\\s+parquet\\s*\\.\\s*`([^`]+)`\\s+AS\\s+$T(\\s+NO\\s+STATISTICS)?\\s*;?\\s*""".r
  private val CloneRe =
    s"""(?is)\\s*CREATE\\s+TABLE\\s+$T\\s+SHALLOW\\s+CLONE\\s+$TT(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?\\s*;?\\s*""".r
  private val VacuumRe = s"""(?is)\\s*VACUUM\\s+$TT(?:\\s+RETAIN\\s+(\\d+)\\s+VERSIONS)?\\s*;?\\s*""".r
  private val AlterAddCheckRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$TT\\s+ADD\\s+CONSTRAINT\\s+(\\w+)\\s+CHECK\\s*\\((.+)\\)\\s*;?\\s*""".r
  private val AlterDropCheckRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$TT\\s+DROP\\s+CONSTRAINT\\s+(\\w+)\\s*;?\\s*""".r
  private val AlterRenameColRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$TT\\s+RENAME\\s+COLUMN\\s+(\\w+)\\s+TO\\s+(\\w+)\\s*;?\\s*""".r
  private val AlterDropColRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$TT\\s+DROP\\s+COLUMN\\s+(\\w+)\\s*;?\\s*""".r
  private val AlterAddColRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$TT\\s+ADD\\s+COLUMN\\s+(\\w+)\\s+DEFAULT\\s+(.+?)\\s*;?\\s*""".r
  private val OptimizeRe =
    s"""(?is)\\s*OPTIMIZE\\s+$TT(?:\\s+WHERE\\s+(.+?))??(?:\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\))?\\s*;?\\s*""".r
}

/** Session-catalog resolution for named graft tables: `CREATE TABLE
  * db.t USING graft LOCATION '/root'` registers an ordinary
  * datasource-v1 table; this resolves such a name back to its table
  * root so DML and the utility statements can address tables the way
  * real users do — by NAME (the reference's own SQL layers, dbt
  * models and the Trino README examples, are all named tables).
  * Returns None for temp views, non-graft providers, and unknown
  * names — callers fall back to Spark's own resolution, so nothing
  * is ever hijacked. */
object GraftCatalogNames {
  def resolve(nameParts: Seq[String]): Option[String] = {
    if (nameParts.isEmpty ||
        nameParts.exists(p => p.isEmpty || p.contains("/") || p.contains("`")))
      return None
    val spark = SparkSession.active
    val catalog = spark.sessionState.catalog
    val ident = nameParts match {
      // a temp view shadows a catalog table of the same name
      case Seq(t) if catalog.getTempView(t).isEmpty => TableIdentifier(t)
      case Seq(db, t) => TableIdentifier(t, Some(db))
      case Seq(cat, db, t) if cat.equalsIgnoreCase("spark_catalog") =>
        TableIdentifier(t, Some(db))
      case _ => return None
    }
    try {
      if (!catalog.tableExists(ident)) None
      else {
        val meta = catalog.getTableMetadata(ident)
        if (!meta.provider.exists(_.equalsIgnoreCase("graft"))) None
        else meta.storage.locationUri.map { u =>
          val p = new org.apache.hadoop.fs.Path(u)
          if (u.getScheme == null || u.getScheme == "file") p.toUri.getPath
          else p.toString
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }
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

  /** The DML target under an optional alias: `graft.`/path`` (gated
    * on a '/' in the identifier, like [[pathRelation]], so a genuine
    * catalog database named `graft` is never hijacked) or a
    * session-catalog table created `USING graft` (resolved to its
    * LOCATION). */
  private def graftTarget(plan: LogicalPlan): Option[(String, Set[String])] = plan match {
    case SubqueryAlias(ident, child) =>
      graftTarget(child).map { case (p, names) => (p, names + ident.name.toLowerCase) }
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
        if u.multipartIdentifier.size == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("graft") &&
          u.multipartIdentifier(1).contains("/") =>
      Some((u.multipartIdentifier(1), Set.empty))
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
      GraftCatalogNames.resolve(u.multipartIdentifier)
        .map(root => (root, Set(u.multipartIdentifier.last.toLowerCase)))
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
        (s"graft SQL MERGE supports: ON key-equality conjunction; WHEN MATCHED " +
          s"[AND cond] THEN UPDATE SET * | UPDATE SET col = expr, … | DELETE; " +
          s"WHEN NOT MATCHED [AND cond] THEN INSERT * | INSERT (cols) VALUES (…); " +
          s"WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET … | DELETE " +
          s"(multi-clause, first-match-wins) — got $what")))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case DeleteFromTable(t, cond) if graftTarget(t).isDefined =>
      val (root, names) = graftTarget(t).get
      GraftDeleteCommand(root, ColumnInterop.column(stripQualifier(cond, names)))

    case UpdateTable(t, assignments, cond) if graftTarget(t).isDefined =>
      val (root, names) = graftTarget(t).get
      val sets = assignments.map { a =>
        // after stripping a leading target alias, a key must be ONE
        // name part: silently collapsing `SET s.x = 1` (a struct-field
        // assignment) onto a top-level column named x would corrupt it
        val name = stripQualifier(a.key, names) match {
          case ua: UnresolvedAttribute if ua.nameParts.size == 1 => ua.nameParts.head
          case other => unsupported(s"assignment target $other (struct-field " +
            "and nested assignments are not supported)")
        }
        (name, ColumnInterop.column(stripQualifier(a.value, names)))
      }
      GraftUpdateCommand(root, sets, ColumnInterop.column(
        cond.map(stripQualifier(_, names)).getOrElse(Literal.TrueLiteral)))

    case MergeIntoTable(t, source, mergeCond, matched, notMatched, nmbs, withSchemaEvo)
        if graftTarget(t).isDefined =>
      val (root, names) = graftTarget(t).get
      if (withSchemaEvo) unsupported("WITH SCHEMA EVOLUTION")
      val keys = mergeKeys(mergeCond).getOrElse(unsupported(s"ON $mergeCond"))
      // the source's alias (or bare relation name) — clause scoping
      // rewrites source-qualified refs per Delta's rules
      val srcAlias: Set[String] = source match {
        case SubqueryAlias(id, _) => Set(id.name.toLowerCase)
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
          Set(u.multipartIdentifier.last.toLowerCase)
        case _ => Set.empty
      }
      // MATCHED scope: both sides visible — source-qualified refs
      // address the joined frame's prefixed source columns, target-
      // qualified (or bare) refs the target columns
      def matchedExpr(e: Expression): org.apache.spark.sql.Column =
        ColumnInterop.column(e.transform {
          case ua: UnresolvedAttribute if ua.nameParts.size > 1 &&
              srcAlias.contains(ua.nameParts.head.toLowerCase) =>
            UnresolvedAttribute(Seq(TxnLog.SrcPrefix + ua.nameParts.last))
          case ua: UnresolvedAttribute if ua.nameParts.size > 1 &&
              names.contains(ua.nameParts.head.toLowerCase) =>
            UnresolvedAttribute(ua.nameParts.tail)
        })
      // NOT MATCHED scope: source only; NMBS scope: target only
      def sourceExpr(e: Expression): org.apache.spark.sql.Column =
        ColumnInterop.column(stripQualifier(e, srcAlias))
      def targetExpr(e: Expression): org.apache.spark.sql.Column =
        ColumnInterop.column(stripQualifier(e, names))
      def assignKey(e: Expression): String = stripQualifier(e, names) match {
        case ua: UnresolvedAttribute if ua.nameParts.size == 1 => ua.nameParts.head
        case other => unsupported(s"assignment target $other (struct-field " +
          "and nested assignments are not supported)")
      }
      val mClauses: Seq[TxnLog.MatchedClause] = matched.map {
        case UpdateStarAction(cond) => TxnLog.MatchedUpdate(cond.map(matchedExpr), None)
        case UpdateAction(cond, Nil, _) => TxnLog.MatchedUpdate(cond.map(matchedExpr), None)
        case UpdateAction(cond, assigns, _) =>
          TxnLog.MatchedUpdate(cond.map(matchedExpr),
            Some(assigns.map(a => (assignKey(a.key), matchedExpr(a.value)))))
        case DeleteAction(cond) => TxnLog.MatchedDelete(cond.map(matchedExpr))
        case other => unsupported(s"matched action $other")
      }
      val iClauses: Seq[TxnLog.NotMatchedInsert] = notMatched.map {
        case InsertStarAction(cond) => TxnLog.NotMatchedInsert(cond.map(sourceExpr), None)
        case InsertAction(cond, Nil) => TxnLog.NotMatchedInsert(cond.map(sourceExpr), None)
        case InsertAction(cond, assigns) =>
          TxnLog.NotMatchedInsert(cond.map(sourceExpr),
            Some(assigns.map(a => (assignKey(a.key), sourceExpr(a.value)))))
        case other => unsupported(s"not-matched action $other")
      }
      val nClauses: Seq[TxnLog.NmbsClause] = nmbs.map {
        case DeleteAction(cond) => TxnLog.NmbsDelete(cond.map(targetExpr))
        case UpdateAction(cond, assigns, _) if assigns.nonEmpty =>
          TxnLog.NmbsUpdate(cond.map(targetExpr),
            assigns.map(a => (assignKey(a.key), targetExpr(a.value))))
        case other => unsupported(s"not-matched-by-source action $other")
      }
      // the classic whole-row shape keeps the fast wholesale-
      // replacement path (no per-column CASE projections)
      val classicMatched = matched match {
        case Seq(UpdateStarAction(None)) => true
        case Seq(UpdateAction(None, Nil, _)) => true
        case _ => false
      }
      val classicInsert = notMatched match {
        case Seq(InsertStarAction(None)) => true
        case Seq(InsertAction(None, Nil)) => true
        case _ => false
      }
      val classicNmbs = nmbs.isEmpty ||
        (nmbs match { case Seq(DeleteAction(_)) => true; case _ => false })
      if (classicMatched && classicInsert && classicNmbs) {
        val nmbsDelete = nmbs match {
          case Nil => None
          case Seq(DeleteAction(condOpt)) => Some(ColumnInterop.column(
            condOpt.map(stripQualifier(_, names)).getOrElse(Literal.TrueLiteral)))
          case _ => None // unreachable under classicNmbs
        }
        GraftMergeCommand(root, source, keys, nmbsDelete)
      } else
        GraftMergeClausesCommand(root, source, keys, mClauses, iClauses, nClauses)

    // INSERT INTO graft.`/path`: the statement holds its target as a
    // NON-CHILD field, so the relation case below never sees it —
    // convert explicitly; Spark then lowers through InsertableRelation
    case i: InsertIntoStatement if pathRelation(i.table).isDefined =>
      i.copy(table = pathRelation(i.table).get)

    // `table_changes('<name-or-/path>', start [, end])` — Delta's CDF
    // table-valued function, resolved onto the connector's
    // readChangeFeed relation. Bounds are versions (numbers) or
    // timestamps ('yyyy-MM-dd[ HH:mm:ss]' / epoch millis), resolved
    // at-or-before through the manifest mtimes (the timestampAsOf
    // convention). Non-graft targets are left untouched (Spark then
    // reports the unknown function itself).
    case tvf: org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction
        if tvf.name.map(_.toLowerCase) == Seq("table_changes") &&
          tableChangesPlan(tvf).isDefined =>
      tableChangesPlan(tvf).get

    // QUERY-position TIME TRAVEL — `SELECT … FROM graft.`/t` VERSION
    // AS OF n | TIMESTAMP AS OF 'ts'` (also on catalog-named graft
    // tables). Spark 4 parses the suffix into RelationTimeTravel;
    // resolve it onto the reader's existing versionAsOf/timestampAsOf
    // options, so the SQL form is definitionally ≡ the option form.
    case tt: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel
        if graftTarget(tt.relation).isDefined && !tt.relation.isStreaming =>
      val root = graftTarget(tt.relation).get._1
      val reader = SparkSession.active.read.format("graft")
      val pinned = (tt.version, tt.timestamp) match {
        case (Some(v), None) => reader.option("versionAsOf", v)
        case (None, Some(ts)) if ts.foldable =>
          val raw = ts.eval() match {
            case null => unsupported("TIMESTAMP AS OF NULL")
            case s: org.apache.spark.unsafe.types.UTF8String => s.toString
            case other => other.toString
          }
          reader.option("timestampAsOf", raw)
        case other => unsupported(s"time travel clause $other")
      }
      pinned.load(root).queryExecution.analyzed

    // QUERY-position references — `SELECT … FROM graft.`/path``, a
    // MERGE source, a join leg — resolve to the connector relation
    // directly (Delta's path-table read shape); reads then go through
    // the scan-substitution rule like any connector read.
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
        if pathRelation(u).isDefined =>
      pathRelation(u).get
  }

  /** The CDF relation behind `table_changes(...)`, or None when the
    * arguments don't name a graft table (leave the node for Spark). */
  private def tableChangesPlan(
      tvf: org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction): Option[LogicalPlan] = {
    val args = tvf.functionArgs
    if (args.size < 2 || args.size > 3) return None
    val lits: Seq[Any] = args.map {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
      case Literal(v, _) => v
      case _ => return None // non-literal arguments: not ours
    }
    val root: String = lits.head match {
      case s: String if s.contains("/") => s
      case s: String =>
        GraftCatalogNames.resolve(s.split("\\.").map(_.trim).toIndexedSeq)
          .getOrElse(return None)
      case _ => return None
    }
    if (TxnLog.latestVersion(SparkSession.active, root) < 0L) return None
    def boundOf(x: Any): String = x match {
      case n: Number => n.longValue.toString
      case s: String if scala.util.Try(s.toLong).isSuccess => s
      case s: String =>
        val ms = scala.util.Try(java.sql.Timestamp.valueOf(s).getTime)
          .orElse(scala.util.Try(java.sql.Date.valueOf(s).getTime))
          .getOrElse(unsupported(
            s"table_changes bound '$s' (want a version number, epoch millis, " +
              "'yyyy-MM-dd HH:mm:ss', or 'yyyy-MM-dd')"))
        TxnLog.versionAtTimestamp(SparkSession.active, root, ms).toString
      case other => unsupported(s"table_changes bound $other")
    }
    val reader0 = SparkSession.active.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", boundOf(lits(1)))
    val reader =
      if (lits.size == 3) reader0.option("endingVersion", boundOf(lits(2)))
      else reader0
    Some(reader.load(root).queryExecution.analyzed)
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

/** The generalized MERGE (conditional / multi-clause / explicit-
  * column) — lowers onto [[TxnLog.mergeClauses]]. Clause conditions
  * and assignments ride as opaque Columns (see the note above
  * [[GraftDeleteCommand]]). */
case class GraftMergeClausesCommand(root: String, source: LogicalPlan,
                                    keys: Seq[String],
                                    matched: Seq[TxnLog.MatchedClause],
                                    notMatched: Seq[TxnLog.NotMatchedInsert],
                                    nmbs: Seq[TxnLog.NmbsClause])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val src = GraftShims.dataFrame(spark, source)
    Seq(Row(TxnLog.mergeClauses(src, root, keys, matched, notMatched, nmbs)))
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
