package graft.plans

import java.io.File

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** TRANSPARENT materialized-view serving — the missing half of the
  * engine's MV story. The maintenance half already exists
  * (`streaming.MaterializedView`, the `mv_*` incremental updaters);
  * this is the SERVING half every warehouse pairs with it: a query
  * that aggregates the base table is rewritten BY THE OPTIMIZER to
  * scan the pre-aggregated view instead, so the caller keeps writing
  * the natural query and the 100 TB scan becomes a few thousand MV
  * rows. Registration is explicit ([[MvCatalog.register]]); matching
  * is deliberately STRICT (exact dims, exact SUM/COUNT(*) shapes —
  * a query the MV cannot answer exactly is left untouched); and a
  * STALENESS GUARD fingerprints the base table's files at rewrite
  * time, so a stale view silently stops serving rather than serving
  * wrong rows — the fail-safe direction.
  *
  * Scale notes: the guard is one directory listing + sampled-byte
  * read per MATCHED query plan (the LayoutCache fingerprint — no data
  * scan), paid only when the plan shape already matches a registered
  * view. The rewrite itself preserves the Aggregate's output
  * attribute ids via aliases, so downstream operators re-resolve
  * against the view scan untouched.
  */
object MvCatalog {

  /** One registered view: `dims ++ aggs` name the MV parquet's
    * columns exactly; `fingerprint` pins the base-table content the
    * view was built from — a sampled file fingerprint for plain
    * parquet sources (`kind = "files"`), the table VERSION for
    * TxnLog-backed `format("graft")` sources (`kind = "graft"`, where
    * the guard is one O(1) manifest-name listing — the shape this
    * check must take on a 100 TB table). */
  private[graft] case class MvEntry(sourcePath: String, dims: Seq[String],
                                    aggs: Seq[(String, Option[String], String)],
                                    mvPath: String, fingerprint: String,
                                    kind: String = "files")

  private val entries = TrieMap.empty[String, MvEntry]

  private[graft] def fingerprintOf(path: String): String = {
    val f = new File(path)
    val files =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[File]).toSeq
          .filter(x => x.isFile && !x.getName.startsWith(".")).sortBy(_.getName)
      else Seq(f)
    graft.sources.LayoutCache.contentFingerprint(files)
  }

  /** Register `mvPath` (a parquet table with columns `dims ++ agg
    * output names`) as the materialization of
    * `SELECT dims, aggs FROM sourcePath GROUP BY dims`.
    * `aggs` entries: `("sum", Some(measure), outName)` or
    * `("count", None, outName)` (COUNT(*)). The CURRENT content of
    * `sourcePath` is fingerprinted — rebuild + re-register after the
    * base table changes, or the rule stops serving the view. */
  def register(sourcePath: String, dims: Seq[String],
               aggs: Seq[(String, Option[String], String)],
               mvPath: String): Unit = {
    require(dims.nonEmpty && aggs.nonEmpty, "MvCatalog: need dims and aggs")
    aggs.foreach {
      case ("sum" | "min" | "max", Some(_), _) | ("count", None, _) => ()
      case other => throw new IllegalArgumentException(
        s"MvCatalog: unsupported agg spec $other (want (sum|min|max, Some(col), name) or (count, None, name))")
    }
    entries.put(new File(sourcePath).getAbsolutePath,
      MvEntry(sourcePath, dims, aggs, mvPath, fingerprintOf(sourcePath)))
    ()
  }

  /** Register a view over a TxnLog-backed `format("graft")` table:
    * same contract as [[register]], but the staleness pin is the
    * table's committed VERSION — the rewrite-time guard is one
    * manifest-name listing instead of a file fingerprint, so it costs
    * the same at 100 TB as at 100 MB. Rebuild + re-register after the
    * table commits, or the rule stops serving. */
  def registerGraft(spark: org.apache.spark.sql.SparkSession, root: String,
                    dims: Seq[String],
                    aggs: Seq[(String, Option[String], String)],
                    mvPath: String): Unit = {
    require(dims.nonEmpty && aggs.nonEmpty, "MvCatalog: need dims and aggs")
    aggs.foreach {
      case ("sum" | "min" | "max", Some(_), _) | ("count", None, _) => ()
      case other => throw new IllegalArgumentException(
        s"MvCatalog: unsupported agg spec $other (want (sum|min|max, Some(col), name) or (count, None, name))")
    }
    val v = graft.sources.TxnLog.latestVersion(spark, root)
    require(v >= 0L, s"MvCatalog: no graft table at $root")
    entries.put("graft:" + new File(root).getAbsolutePath,
      MvEntry(root, dims, aggs, mvPath, v.toString, kind = "graft"))
    ()
  }

  def invalidate(sourcePath: String): Unit = {
    entries.remove(new File(sourcePath).getAbsolutePath)
    entries.remove("graft:" + new File(sourcePath).getAbsolutePath); ()
  }

  /** Is the registered base-table content still what the view
    * materialized? Files → sampled fingerprint; graft → one O(1)
    * version listing. */
  private[graft] def fresh(entry: MvEntry): Boolean = entry.kind match {
    case "graft" => graft.sources.TxnLog.latestVersion(
      SparkSession.active, entry.sourcePath).toString == entry.fingerprint
    case _ => fingerprintOf(entry.sourcePath) == entry.fingerprint
  }

  private[graft] def lookup(rootPaths: Seq[String]): Option[MvEntry] =
    rootPaths match {
      case Seq(one) if one.startsWith("graft:") => entries.get(one)
      case Seq(one) => entries.get(new File(one).getAbsolutePath)
      case _ => None // multi-root scans never match a single-table MV
    }
}

object MvAggregateRewrite extends Rule[LogicalPlan] {

  /** The base-table scan under an Aggregate: a bare parquet
    * LogicalRelation, optionally under the column-pruning Project of
    * plain attributes the optimizer inserts. */
  private def scanRoots(plan: LogicalPlan): Option[Seq[String]] = plan match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        Some(fs.location.rootPaths.map(_.toUri.getPath))
      case g: graft.sources.GraftRelation if g.pinnedAsOf.isEmpty =>
        Some(Seq("graft:" + new File(g.tableRoot).getAbsolutePath))
      case _ => None
    }
    case Project(projectList, child) if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      scanRoots(child)
    case _ => None
  }

  /** Map one Aggregate output expression onto the MV column that
    * answers it, or None when the view cannot answer exactly. */
  private def mvColumnFor(e: NamedExpression, entry: MvCatalog.MvEntry): Option[String] = e match {
    case a: AttributeReference if entry.dims.contains(a.name) => Some(a.name)
    case Alias(a: AttributeReference, _) if entry.dims.contains(a.name) => Some(a.name)
    case Alias(ae: AggregateExpression, name)
        if !ae.isDistinct && ae.filter.isEmpty =>
      def measured(kind: String, child: Expression): Option[String] = child match {
        case m: AttributeReference => entry.aggs.collectFirst {
          case (k, Some(meas), out) if k == kind && meas == m.name && out == name => out
        }
        case _ => None
      }
      ae.aggregateFunction match {
        case s: Sum => measured("sum", s.child)
        case m: Min => measured("min", m.child)
        case m: Max => measured("max", m.child)
        case c: Count if c.children.forall(_.isInstanceOf[Literal]) =>
          entry.aggs.collectFirst { case ("count", None, out) if out == name => out }
        case _ => None
      }
    case _ => None
  }

  /** The re-aggregation function that rolls one stored view column up
    * to a coarser grouping: SUM and COUNT(*) both roll up as SUM of
    * the stored column (a count of counts is a sum), MIN as MIN, MAX
    * as MAX. AVG and DISTINCT are exactly why those shapes were never
    * matched — they do not re-aggregate. */
  private def rollupFn(orig: AggregateExpression,
                       attr: Expression): Option[Expression] =
    (orig.aggregateFunction match {
      case _: Sum => Some(Sum(attr))
      case _: Count => Some(Sum(attr))
      case _: Min => Some(Min(attr))
      case _: Max => Some(Max(attr))
      case _ => None
    }).map(f => AggregateExpression(f, Complete, isDistinct = false))

  private def groupingNames(groupings: Seq[Expression]): Option[Seq[String]] = {
    val names = groupings.map {
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    if (names.forall(_.isDefined)) Some(names.flatten) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(groupings, aggExprs, child, _) =>
      val rewritten = for {
        roots <- scanRoots(child)
        entry <- MvCatalog.lookup(roots)
        dims <- groupingNames(groupings)
        // exact dims serve directly; a strict SUBSET (including the
        // global aggregate, dims = Nil) rolls the view up — SUM of
        // sums, SUM of counts, MIN of mins, MAX of maxes — still
        // exactly the base-table answer, still never scanning it
        if dims.distinct == dims && dims.toSet.subsetOf(entry.dims.toSet)
        cols = aggExprs.map(e => mvColumnFor(e, entry))
        if cols.forall(_.isDefined)
        // staleness guard: the base table must still be the content
        // the view materialized — otherwise fall through to the scan
        // (slow and right beats fast and wrong)
        if MvCatalog.fresh(entry)
      } yield {
        val mvPlan = SparkSession.active.read.parquet(entry.mvPath)
          .queryExecution.analyzed
        val byName = mvPlan.output.map(a => a.name -> a).toMap
        if (dims.sorted == entry.dims.sorted) {
          // every output must exist in the view with the same type, or
          // the rewrite would change the query's schema — fall through
          val mapped = aggExprs.zip(cols.map(_.get)).map { case (orig, mv) =>
            byName.get(mv).filter(_.dataType == orig.dataType).map { attr =>
              Alias(attr, orig.name)(exprId = orig.exprId)
            }
          }
          if (mapped.forall(_.isDefined)) Project(mapped.map(_.get), mvPlan)
          else agg
        } else {
          val mapped: Seq[Option[NamedExpression]] =
            aggExprs.zip(cols.map(_.get)).map { case (orig, mv) =>
              byName.get(mv).flatMap { attr =>
                orig match {
                  case a: AttributeReference if attr.dataType == a.dataType =>
                    Some(Alias(attr, a.name)(exprId = a.exprId))
                  case al @ Alias(_: AttributeReference, name)
                      if attr.dataType == al.dataType =>
                    Some(Alias(attr, name)(exprId = al.exprId))
                  case al @ Alias(ae: AggregateExpression, name) =>
                    rollupFn(ae, attr).filter(_.dataType == al.dataType)
                      .map(f => Alias(f, name)(exprId = al.exprId))
                  case _ => None
                }
              }
            }
          if (mapped.forall(_.isDefined) && dims.forall(byName.contains))
            Aggregate(dims.map(byName), mapped.map(_.get), mvPlan)
          else agg
        }
      }
      rewritten.getOrElse(agg)
  }
}
