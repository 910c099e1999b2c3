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

  /** In-process cache over the (optional) persisted store. */
  private val entries = TrieMap.empty[String, MvEntry]

  /** Registration key: the scheme-stripped absolute path, matching
    * what [[MvAggregateRewrite.scanRoots]] extracts from a scan's
    * FileIndex (`toUri.getPath`). Scheme-less local paths resolve
    * against the working directory exactly as the scan side does. */
  private[graft] def keyOf(path: String): String = {
    val uri = new org.apache.hadoop.fs.Path(path).toUri
    if (uri.getScheme == null) new File(path).getAbsolutePath else uri.getPath
  }

  /** Sampled content fingerprint of the base table, resolved through
    * Hadoop [[org.apache.hadoop.fs.FileSystem]] so hdfs://, s3a://,
    * and every other scheme a Spark scan can read is LISTABLE here
    * too (`java.io.File` sees nothing on those and would fingerprint
    * an empty listing — making every staleness check pass forever,
    * the WRONG fail direction). `None` = unlistable, unreadable, or
    * empty — callers must treat that as "cannot guard", never as a
    * valid pin. */
  private[graft] def fingerprintOf(path: String): Option[String] =
    scala.util.Try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(p) // throws when absent → None
      val files =
        if (st.isDirectory)
          fs.listStatus(p).toSeq
            .filter(s => s.isFile && !s.getPath.getName.startsWith("."))
            .sortBy(_.getPath.getName)
        else Seq(st)
      if (files.isEmpty) None
      else Some(graft.sources.LayoutCache.contentFingerprintHadoop(fs, files))
    }.toOption.flatten

  private def checkAggSpecs(dims: Seq[String],
                            aggs: Seq[(String, Option[String], String)]): Unit = {
    require(dims.nonEmpty && aggs.nonEmpty, "MvCatalog: need dims and aggs")
    aggs.foreach {
      case ("sum" | "min" | "max", Some(_), _) | ("count", None, _) => ()
      case other => throw new IllegalArgumentException(
        s"MvCatalog: unsupported agg spec $other (want (sum|min|max, Some(col), name) or (count, None, name))")
    }
  }

  /** Register `mvPath` (a parquet table with columns `dims ++ agg
    * output names`) as the materialization of
    * `SELECT dims, aggs FROM sourcePath GROUP BY dims`.
    * `aggs` entries: `("sum", Some(measure), outName)` or
    * `("count", None, outName)` (COUNT(*)). The CURRENT content of
    * `sourcePath` is fingerprinted — rebuild + re-register after the
    * base table changes, or the rule stops serving the view.
    * Registration REFUSES a source it cannot fingerprint (empty or
    * unreadable listing): a guard that can't see the base table can't
    * detect staleness, and "always fresh" is the failure direction
    * this catalog exists to prevent. */
  def register(sourcePath: String, dims: Seq[String],
               aggs: Seq[(String, Option[String], String)],
               mvPath: String): Unit = {
    checkAggSpecs(dims, aggs)
    val fp = fingerprintOf(sourcePath).getOrElse(throw new IllegalArgumentException(
      s"MvCatalog: cannot register $sourcePath — base-table listing is empty or " +
        "unreadable, so staleness could never be detected"))
    val key = keyOf(sourcePath)
    val e = MvEntry(sourcePath, dims, aggs, mvPath, fp)
    entries.put(key, e)
    persistPut(key, e)
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
    checkAggSpecs(dims, aggs)
    val v = graft.sources.TxnLog.latestVersion(spark, root)
    require(v >= 0L, s"MvCatalog: no graft table at $root")
    val key = "graft:" + keyOf(root)
    val e = MvEntry(root, dims, aggs, mvPath, v.toString, kind = "graft")
    entries.put(key, e)
    persistPut(key, e)
  }

  def invalidate(sourcePath: String): Unit = {
    val k1 = keyOf(sourcePath)
    val k2 = "graft:" + k1
    entries.remove(k1); entries.remove(k2)
    persistRemove(Seq(k1, k2))
  }

  /** Is the registered base-table content still what the view
    * materialized? Files → sampled fingerprint (an UNLISTABLE base
    * table is STALE — fail-safe); graft → one O(1) version listing. */
  private[graft] def fresh(entry: MvEntry): Boolean = entry.kind match {
    case "graft" => scala.util.Try(graft.sources.TxnLog.latestVersion(
      SparkSession.active, entry.sourcePath).toString == entry.fingerprint)
      .getOrElse(false)
    case _ => fingerprintOf(entry.sourcePath).contains(entry.fingerprint)
  }

  private[graft] def lookup(rootPaths: Seq[String]): Option[MvEntry] =
    rootPaths match {
      case Seq(one) =>
        val key = if (one.startsWith("graft:")) one else keyOf(one)
        entries.get(key).orElse { maybeLoadStore(); entries.get(key) }
      case _ => None // multi-root scans never match a single-table MV
    }

  // ---------------------------------------------------------------
  // Persistence — `spark.graft.mvCatalog = <txnlog root>`.
  //
  // Registrations are process-local by default (the TrieMap above);
  // setting the conf makes them durable: every register/invalidate
  // write-throughs the full entry set as ONE TxnLog commit (rows are
  // a handful of strings — commit cost is one manifest write), and a
  // fresh session lazily loads the store on its first cache-miss
  // lookup. The store inherits TxnLog's whole contract: atomic
  // create-exclusive commits (two racing registrars cannot silently
  // interleave), history, time travel for audits. Staleness of the
  // CACHE is fail-safe by construction: a re-registration made by
  // another session changes the base table's fingerprint pin, and a
  // cached stale entry already stops serving via [[fresh]]; a brand
  // NEW registration is picked up on the cache-miss path.
  // ---------------------------------------------------------------

  private val StoreConfKey = "spark.graft.mvCatalog"
  /** Field separators inside the store's string row-encoding —
    * control chars no column name contains. */
  private val Sep = "\u0001"
  private val GroupSep = "\u0002"

  /** (storeRoot, version) the cache last loaded, to skip re-reads. */
  @volatile private var loadedStore: Option[(String, Long)] = None

  private def storeRoot: Option[String] =
    scala.util.Try(SparkSession.active.conf.get(StoreConfKey))
      .toOption.filter(_.nonEmpty)

  private def encodeAggs(aggs: Seq[(String, Option[String], String)]): String =
    aggs.map { case (k, m, o) => s"$k$Sep${m.getOrElse("")}$Sep$o" }.mkString(GroupSep)

  private def decodeAggs(s: String): Seq[(String, Option[String], String)] =
    if (s.isEmpty) Seq.empty
    else s.split(GroupSep, -1).toSeq.map { t =>
      val parts = t.split(Sep, -1)
      (parts(0), Some(parts(1)).filter(_.nonEmpty), parts(2))
    }

  private def writeStore(root: String, all: Map[String, MvEntry],
                         expectedVersion: Long): Unit = {
    val spark = SparkSession.active
    import spark.implicits._
    val rows = all.toSeq.sortBy(_._1).map { case (k, e) =>
      (k, e.sourcePath, e.dims.mkString(Sep), encodeAggs(e.aggs),
        e.mvPath, e.fingerprint, e.kind)
    }
    val v = graft.sources.TxnLog.commit(
      rows.toDF("key", "source_path", "dims", "aggs", "mv_path", "fingerprint", "kind"),
      root, "overwrite", txnId = None, expectedLatest = Some(expectedVersion))
    loadedStore = Some((root, v))
  }

  private def readStore(root: String,
                        asOf: Option[Long] = None): Map[String, MvEntry] = {
    val spark = SparkSession.active
    if (graft.sources.TxnLog.latestVersion(spark, root) < 0L) return Map.empty
    graft.sources.TxnLog.read(spark, root, asOf)
      .select("key", "source_path", "dims", "aggs", "mv_path", "fingerprint", "kind")
      .collect() // bounded: one row per registered view
      .map { r =>
        r.getString(0) -> MvEntry(r.getString(1),
          r.getString(2).split(Sep, -1).toSeq.filter(_.nonEmpty),
          decodeAggs(r.getString(3)), r.getString(4), r.getString(5), r.getString(6))
      }.toMap
  }

  /** Read-modify-write of the whole store under a real CAS: the read
    * pins the version it saw, the commit carries it as
    * `expectedLatest`, and a racer landing in between raises
    * ConcurrentModificationException → re-read and re-apply. Without
    * the pin, two racing registrars/invalidators silently lose one
    * write (last writer wins over a stale read) — a lost INVALIDATE
    * would resurrect a deliberately removed entry that the
    * fingerprint guard alone won't retire while the base table is
    * unchanged. */
  private def casWrite(root: String)
                      (f: Map[String, MvEntry] => Option[Map[String, MvEntry]]): Unit = {
    val spark = SparkSession.active
    var attempt = 0
    while (attempt < 10) {
      val expected = graft.sources.TxnLog.latestVersion(spark, root)
      val current =
        if (expected < 0L) Map.empty[String, MvEntry]
        else readStore(root, asOf = Some(expected))
      f(current) match {
        case None => return // no-op (e.g. removing an absent key)
        case Some(next) =>
          try { writeStore(root, next, expected); return }
          catch { case _: java.util.ConcurrentModificationException => attempt += 1 }
      }
    }
    throw new IllegalStateException(
      s"MvCatalog: lost 10 consecutive store-write races at $root — giving up")
  }

  private def persistPut(key: String, e: MvEntry): Unit = storeRoot.foreach { root =>
    casWrite(root)(all => Some(all + (key -> e)))
  }

  private def persistRemove(keys: Seq[String]): Unit = storeRoot.foreach { root =>
    casWrite(root) { all =>
      val next = all -- keys
      if (next.size != all.size) Some(next) else None
    }
  }

  /** Cache-miss path: (re)load the persisted store when configured
    * and its version moved since the last load. */
  private def maybeLoadStore(): Unit = storeRoot.foreach { root =>
    val v = scala.util.Try(
      graft.sources.TxnLog.latestVersion(SparkSession.active, root)).getOrElse(-1L)
    if (v >= 0L && !loadedStore.contains((root, v))) {
      readStore(root).foreach { case (k, e) => entries.put(k, e) }
      loadedStore = Some((root, v))
    }
  }

  /** Test hook: drop the in-process cache (NOT the persisted store),
    * so specs can prove a fresh session re-serves from the store. */
  private[graft] def resetCache(): Unit = {
    entries.clear()
    loadedStore = None
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
        Some(Seq("graft:" + MvCatalog.keyOf(g.tableRoot)))
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
