package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.planning.PhysicalOperation
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types._

import graft.sources.{GraftChangeFeedRelation, GraftDataSource, GraftRelation, TxnLog}

/** Splice `format("graft")` reads into the plan NATIVELY — the scale
  * fix for the connector's DSv1 ceiling. A v1 `PrunedFilteredScan`
  * must return `RDD[Row]`, which forces every row through
  * InternalRow→Row→InternalRow at the relation boundary and breaks
  * both whole-stage codegen and the vectorized parquet reader for
  * every connector read — correctness was never at stake (filters all
  * stayed above the scan), but at 100 TB the per-row conversion tax
  * IS the read path. This optimizer rule replaces the
  * `LogicalRelation(GraftRelation)` leaf with the SAME pruned
  * DataFrame plan the native `TxnLog` read path builds (directory
  * pruning against manifest [min,max] stats included), so the final
  * physical plan is ordinary vectorized `FileScan parquet` with
  * pushed filters — zero conversion, full codegen — exactly as if the
  * caller had used the native API. The DSv1 relation remains as the
  * contract surface (schema, writes, INSERT INTO, fallback when the
  * rule is disabled via `spark.graft.connector.substituteScan=false`).
  *
  * Semantics are preserved by construction:
  *  - the matched projects/filters are REBUILT verbatim above the
  *    spliced subtree (pruning stays pure I/O avoidance — the same
  *    `unhandledFilters = all` discipline the relation declares);
  *  - the spliced subtree's output is aliased back to the relation's
  *    own attribute ids, so nothing above the leaf re-resolves;
  *  - any failure to splice leaves the plan UNTOUCHED (the DSv1 scan
  *    still answers correctly, just slower).
  *
  * Runs after [[MvAggregateRewrite]] (injection order), which matches
  * on the intact `GraftRelation` leaf for its O(1) version guard.
  *
  * Reference anchor: the reference lakehouse reads route through
  * `format("delta")` (`convert_to_delta.py:85-88`); Delta's connector
  * achieves the same end state with a file-index-backed
  * HadoopFsRelation — this rule reaches the identical physical plan
  * through the engine's own read path. */
object GraftScanSubstitution extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    scala.util.Try(SparkSession.active.conf
      .get("spark.graft.connector.substituteScan")).toOption.forall(_.toBoolean)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan transformDown {
      // snapshot reads: collect the project/filter chain over the
      // relation (whatever its descent state inside the fixpoint
      // batch), splice the pruned native read, rebuild the chain
      case op @ PhysicalOperation(projects, filters, lr: LogicalRelation)
          if lr.relation.isInstanceOf[GraftRelation] =>
        scala.util.control.Exception.nonFatalCatch.withApply { e =>
          logWarning(s"graft scan substitution skipped (DSv1 fallback): $e")
          op
        } {
          val sub = snapshotPlan(lr, lr.relation.asInstanceOf[GraftRelation], filters)
          val filtered = filters.reduceOption(And).map(Filter(_, sub)).getOrElse(sub)
          Project(projects, filtered)
        }
      // change-feed reads: whole-feed by contract — splice directly
      case op @ PhysicalOperation(projects, filters, lr: LogicalRelation)
          if lr.relation.isInstanceOf[GraftChangeFeedRelation] =>
        scala.util.control.Exception.nonFatalCatch.withApply { e =>
          logWarning(s"graft CDF scan substitution skipped (DSv1 fallback): $e")
          op
        } {
          val feed = lr.relation.asInstanceOf[GraftChangeFeedRelation].feedFrame
          // splice the OPTIMIZED inner plan: the outer optimizer's
          // "Replace Operators" batch (Except/Intersect rewrites) has
          // already run by the time this rule fires, so an analyzed
          // subtree could smuggle un-replaceable nodes past it
          val sub = remapped(lr, feed.queryExecution.optimizedPlan)
          val filtered = filters.reduceOption(And).map(Filter(_, sub)).getOrElse(sub)
          Project(projects, filtered)
        }
    }
  }

  /** The native pruned snapshot read, output-aliased to the
    * relation's attribute ids. Dir pruning uses the SAME conjunctive
    * range extraction the DSv1 path fed from pushed filters. */
  private def snapshotPlan(lr: LogicalRelation, g: GraftRelation,
                           filters: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val ranges = filters.flatMap(rangesOfExpr)
    val (frame, kept, skipped, filesKept, filesSkipped) =
      TxnLog.readRangesCensusFiles(spark, g.tableRoot, ranges, g.pinnedAsOf)
    GraftDataSource.lastScanCensus = (kept, skipped)
    GraftDataSource.lastFileCensus = (filesKept, filesSkipped)
    // optimized, not analyzed — see the CDF case for why
    remapped(lr, frame.queryExecution.optimizedPlan)
  }

  /** Alias `inner`'s columns back to the relation's output ids so the
    * rest of the plan re-resolves untouched. Refuses (throws → caller
    * falls back to DSv1) on any name/type drift. */
  private def remapped(lr: LogicalRelation, inner: LogicalPlan): LogicalPlan = {
    val byName = inner.output.map(a => a.name -> a).toMap
    Project(lr.output.map { o =>
      val in = byName.getOrElse(o.name, throw new IllegalStateException(
        s"graft substitution: column ${o.name} missing from the native read"))
      require(in.dataType == o.dataType,
        s"graft substitution: column ${o.name} type drift (${in.dataType} vs ${o.dataType})")
      Alias(in, o.name)(exprId = o.exprId, qualifier = o.qualifier)
    }, inner)
  }

  /** Catalyst predicate → optional-bounded ranges for manifest dir
    * pruning — the Expression twin of `GraftDataSource.rangesOf`
    * (which speaks DSv1 `Filter`s). Only conjunctive single-column
    * comparisons against literals contribute; everything else prunes
    * nothing (never a wrong skip — the full predicate is rebuilt
    * above the spliced scan regardless). */
  private[graft] def rangesOfExpr(e: Expression): Seq[(String, Option[Any], Option[Any])] = {
    def value(l: Literal): Any = CatalystTypeConverters.convertToScala(l.value, l.dataType)
    e match {
      case And(l, r) => rangesOfExpr(l) ++ rangesOfExpr(r)
      case EqualTo(a: AttributeReference, l: Literal) if l.value != null =>
        Seq((a.name, Some(value(l)), Some(value(l))))
      case EqualTo(l: Literal, a: AttributeReference) if l.value != null =>
        Seq((a.name, Some(value(l)), Some(value(l))))
      case GreaterThan(a: AttributeReference, l: Literal) if l.value != null =>
        Seq((a.name, Some(value(l)), None))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) if l.value != null =>
        Seq((a.name, Some(value(l)), None))
      case LessThan(a: AttributeReference, l: Literal) if l.value != null =>
        Seq((a.name, None, Some(value(l))))
      case LessThanOrEqual(a: AttributeReference, l: Literal) if l.value != null =>
        Seq((a.name, None, Some(value(l))))
      // flipped comparisons: lit OP attr
      case GreaterThan(l: Literal, a: AttributeReference) if l.value != null =>
        Seq((a.name, None, Some(value(l))))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) if l.value != null =>
        Seq((a.name, None, Some(value(l))))
      case LessThan(l: Literal, a: AttributeReference) if l.value != null =>
        Seq((a.name, Some(value(l)), None))
      case LessThanOrEqual(l: Literal, a: AttributeReference) if l.value != null =>
        Seq((a.name, Some(value(l)), None))
      // IN list → envelope, exact only for integral/string domains
      // (the same gate the DSv1 twin applies)
      case In(a: AttributeReference, list) if list.nonEmpty &&
          list.forall(x => x.isInstanceOf[Literal] && x.asInstanceOf[Literal].value != null) =>
        envelope(a, list.map(x => value(x.asInstanceOf[Literal])))
      case InSet(a: AttributeReference, hset) if hset.nonEmpty && !hset.contains(null) =>
        envelope(a, hset.toSeq.map(v =>
          CatalystTypeConverters.convertToScala(v, a.dataType)))
      case _ => Seq.empty
    }
  }

  private def envelope(a: AttributeReference, vs: Seq[Any]): Seq[(String, Option[Any], Option[Any])] =
    a.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        val ls = vs.map(_.asInstanceOf[Number].longValue)
        Seq((a.name, Some(Long.box(ls.min)), Some(Long.box(ls.max))))
      case StringType =>
        val ss = vs.map(_.asInstanceOf[String])
        Seq((a.name, Some(ss.min), Some(ss.max)))
      case _ => Seq.empty
    }
}
