package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ENSURE_REQUIREMENTS, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Static lint over a physical plan: the anti-patterns this engine's
  * PlanSpec guards assert away, packaged as a reusable advisor any
  * pipeline can run before committing cluster-hours to a query. A
  * finding is advice, not an error — some plans legitimately contain
  * a tiny cartesian (a documented quadratic baseline, a 1-row config
  * cross) — but at 100 TB each of these patterns is usually the
  * difference between minutes and days:
  *
  *  - `cartesian`: CartesianProduct / BroadcastNestedLoopJoin — the
  *    O(|L|·|R|) shapes; a missing equi-condition usually caused it.
  *  - `wide-shuffle`: a named wide column (document text, media
  *    bytes) crossing a ShuffleExchange — ship hashes/ids instead
  *    (every dedup/corpus operator here does; the guard keeps it so).
  *  - `unpushed-filter`: a Filter sitting directly on a parquet scan
  *    that pushed NO filters down — data-skipping (row groups,
  *    [[graft.sources.FileIndex]] file pruning) is being left on the
  *    table. Non-convertible predicates (UDF-like, regex) are real,
  *    but the common cause is a cast or wrapped column defeating
  *    pushdown.
  */
object PlanLint {

  final case class Finding(rule: String, severity: String, detail: String)

  /** Lint the frame's executed plan. `wideCols`: column names whose
    * shuffle is worth flagging (defaults to the corpus convention). */
  def lint(df: DataFrame,
           wideCols: Set[String] = Set("text", "bytes", "payload")): Seq[Finding] = {
    val nodes = collect(df.queryExecution.executedPlan)
    val cartesian = nodes.collect {
      case c: CartesianProductExec =>
        Finding("cartesian", "error", s"CartesianProduct over ${c.output.size} columns")
      case b: BroadcastNestedLoopJoinExec
          if !(boundedRows(b.left) || boundedRows(b.right)) =>
        Finding("cartesian", "error",
          s"BroadcastNestedLoopJoin (${b.joinType}) — no equi-condition")
    }
    // Only PLANNER-inserted exchanges (ENSURE_REQUIREMENTS: join/agg/
    // window distribution) are findings: text riding one means a keyed
    // operator is shuffling payload instead of hashes/ids. An explicit
    // caller repartition (REPARTITION_BY_* / REBALANCE origins) is the
    // engine's documented parallelism bootstrap (Parallelism.ensure on
    // an under-split local scan — a no-op at scale) or a shard
    // redistribution operator (corpus_shuffle, doc_pack) whose whole
    // point is moving the payload exactly once.
    val wide = nodes.collect {
      case s: ShuffleExchangeExec
          if s.shuffleOrigin == ENSURE_REQUIREMENTS &&
            s.output.exists(a => wideCols.contains(a.name)) =>
        val cols = s.output.map(_.name).filter(wideCols.contains)
        Finding("wide-shuffle", "warn",
          s"shuffle carries wide column(s): ${cols.mkString(",")}")
    }
    val unpushed = nodes.collect {
      case f: FilterExec if !isNotNullOnly(f.condition) && pushableShaped(f.condition) =>
        scanBelow(f.child) match {
          case Some(scan) if scanPushedNothing(scan) =>
            Seq(Finding("unpushed-filter", "warn",
              s"filter above ${scan.nodeName} pushed no usable predicates: " +
                f.condition.sql.take(160)))
          case _ => Seq.empty
        }
      case _: FilterExec => Seq.empty
    }.flatten
    cartesian ++ wide ++ unpushed
  }

  /** A condition that is nothing but IsNotNull conjuncts — the
    * null-safety guards Catalyst infers for join keys and computed
    * expressions. These are inherently unpushable when the operand is
    * derived (isnotnull(md5(...))) and carry no user intent, so they
    * are not evidence of defeated pushdown. */
  private def isNotNullOnly(
      cond: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{And, IsNotNull}
    cond match {
      case And(l, r)    => isNotNullOnly(l) && isNotNullOnly(r)
      case _: IsNotNull => true
      case _            => false
    }
  }

  /** A condition with at least one conjunct of the shape parquet CAN
    * push — an attribute (possibly cast-wrapped) compared/matched
    * against literals. A filter made only of derived expressions
    * (`size(split(text)) > 0`, an md5 hash-bucket test) can never
    * reach the scan no matter how it is written, so its presence on a
    * scan is not a defect; a cast-wrapped comparison IS flagged — the
    * uncast predicate would push, which is exactly the miss this rule
    * exists to catch. Disjunctions push only whole, so `Or` requires
    * both arms shaped. */
  private def pushableShaped(
      cond: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{DateType, NumericType, TimestampType}
    // Strip only casts whose CHILD could have been compared natively
    // (numeric/date/timestamp column wrapped in a cast): those
    // predicates are pushable if rewritten, which is the miss this
    // rule reports. A cast FROM a string (cast(s AS int) = 5) has no
    // equivalent uncast form — '05' also casts to 5 — so it is not
    // evidence of a defeated pushdown.
    def strippable(t: org.apache.spark.sql.types.DataType): Boolean = t match {
      case _: NumericType | DateType | TimestampType => true
      case _ => false
    }
    def stripCast(e: Expression): Expression = e match {
      case c: Cast if strippable(c.child.dataType) => stripCast(c.child)
      case o => o
    }
    def isAttr(e: Expression): Boolean =
      stripCast(e).isInstanceOf[AttributeReference]
    def attrVsLit(l: Expression, r: Expression): Boolean =
      (isAttr(l) && r.foldable) || (isAttr(r) && l.foldable)
    def leaf(e: Expression): Boolean = e match {
      case b: BinaryComparison => attrVsLit(b.left, b.right)
      case In(v, list) => isAttr(v) && list.forall(_.foldable)
      case i: InSet => isAttr(i.child)
      case s: StartsWith => attrVsLit(s.left, s.right)
      case s: EndsWith => attrVsLit(s.left, s.right)
      case s: Contains => attrVsLit(s.left, s.right)
      case _ => false
    }
    // A disjunction — or anything under a Not — pushes only WHOLE
    // (Spark's translateFilter translates Not/Or iff every child
    // translates), so those subtrees must be fully shaped; only a
    // top-level conjunction can push one conjunct and drop the rest.
    def fully(e: Expression): Boolean = e match {
      case And(l, r) => fully(l) && fully(r)
      case Or(l, r) => fully(l) && fully(r)
      case Not(x) => fully(x)
      case x => leaf(x)
    }
    def shaped(e: Expression): Boolean = e match {
      case And(l, r) => shaped(l) || shaped(r)
      case Or(l, r) => fully(l) && fully(r)
      case Not(x) => fully(x)
      case x => leaf(x)
    }
    shaped(cond)
  }

  /** Provably row-bounded subtree: descending ONLY through
    * row-preserving-or-reducing wrappers (project/filter/sort/
    * exchange/codegen plumbing), the side's top is a global
    * (no-grouping) aggregate (1 row) or a limit ≤ `cap`. A
    * nested-loop join against such a side is a LINEAR per-row fan-out
    * of at most `cap` — the scalar-broadcast pattern ("attach the
    * sketch / percentile row to every row") and its small-table
    * generalization (nearest-centroid argmin against a ≤256-row
    * centroid table) — not a missing join condition.
    *
    * An AQE query stage that has MATERIALIZED carries exact runtime
    * row counts; a stage of ≤ `cap` rows is bounded no matter what
    * plan produced it. This is what keeps the rule honest under AQE
    * rewrites (e.g. a GlobalLimit elided at runtime leaves only a
    * LocalLimit below a shuffle — statically unbounded, actually one
    * row) and recognizes genuinely tiny broadcast sides (a filtered
    * 5-row query set) without guessing at filter selectivity.
    * KNOWN TRADE: the runtime count proves boundedness for THIS run's
    * data only — a side that is small at the linted scale factor but
    * grows with the corpus (an accidentally dropped join condition on
    * a data-dependent subquery) passes here and would not have passed
    * the static shape check. The static shapes remain the scale-
    * invariant proof; treat a bound that exists only at runtime as a
    * prompt to check the side's growth law.
    *
    * The descent is deliberately NOT a subtree search: a limit with a
    * row-EXPANDING operator above it (explode, join, union) bounds
    * nothing, so `bigTable JOIN (x LIMIT 200)` still flags. */
  private def boundedRows(p: SparkPlan, cap: Int = 256): Boolean = {
    import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, InputAdapter, ProjectExec, SortExec, TakeOrderedAndProjectExec, WholeStageCodegenExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}
    import org.apache.spark.sql.execution.ColumnarToRowExec
    p match {
      // A no-grouping aggregate is 1 row only in Final/Complete mode; a
      // Partial one emits a row PER INPUT PARTITION (valid plans always
      // top it with a Final agg, but make the bound robust if the
      // descent ever reaches a bare partial), so descend instead.
      case a: BaseAggregateExec if a.groupingExpressions.isEmpty =>
        import org.apache.spark.sql.catalyst.expressions.aggregate.{Complete, Final}
        if (a.aggregateExpressions.forall(e => e.mode == Final || e.mode == Complete)) true
        else boundedRows(a.child, cap)
      case a: BaseAggregateExec => boundedRows(a.child, cap)
      case l: GlobalLimitExec => l.limit <= cap
      case l: CollectLimitExec => l.limit <= cap
      case t: TakeOrderedAndProjectExec => t.limit <= cap
      case w: ProjectExec => boundedRows(w.child, cap)
      case w: FilterExec => boundedRows(w.child, cap)
      case w: SortExec => boundedRows(w.child, cap)
      case e: Exchange => boundedRows(e.child, cap)
      case r: ReusedExchangeExec => boundedRows(r.child, cap)
      case a: AdaptiveSparkPlanExec => boundedRows(a.executedPlan, cap)
      case q: QueryStageExec =>
        runtimeRowCount(q).exists(_ <= cap) || boundedRows(q.plan, cap)
      case w: WholeStageCodegenExec => boundedRows(w.child, cap)
      case i: InputAdapter => boundedRows(i.child, cap)
      case c: ColumnarToRowExec => boundedRows(c.child, cap)
      case _ => false
    }
  }

  /** Exact output row count of a materialized AQE stage (None before
    * materialization or when the stage kind exposes no count). */
  private def runtimeRowCount(q: QueryStageExec): Option[BigInt] =
    try q.getRuntimeStatistics.rowCount catch { case _: Throwable => None }

  /** The scan this node sits directly on top of, descending ONLY
    * through the codegen/columnar plumbing Spark inserts between a
    * filter and its scan. Deliberately NOT any single-child operator:
    * a Generate (explode) or Expand between them means the filter
    * consumes generated rows and could never have pushed to the scan,
    * so attributing it to the scan would be a false finding. */
  private def scanBelow(p: SparkPlan): Option[FileSourceScanExec] = {
    import org.apache.spark.sql.execution.{ColumnarToRowExec, InputAdapter, WholeStageCodegenExec}
    p match {
      case s: FileSourceScanExec => Some(s)
      case w: WholeStageCodegenExec => scanBelow(w.child)
      case i: InputAdapter => scanBelow(i.child)
      case c: ColumnarToRowExec => scanBelow(c.child)
      case _ => None
    }
  }

  /** "Pushed nothing USABLE": an empty list, or only the IsNotNull
    * guards Catalyst infers for free — a cast/function-wrapped column
    * defeats the comparative predicate but still yields IsNotNull, so
    * bare non-emptiness would hide exactly the defect this rule is
    * for. */
  private def scanPushedNothing(scan: FileSourceScanExec): Boolean =
    scan.metadata.get("PushedFilters").forall { v =>
      val inner = v.trim.stripPrefix("[").stripSuffix("]").trim
      inner.isEmpty ||
        inner.split(",").map(_.trim).forall(_.startsWith("IsNotNull"))
    }

  private def collect(p: SparkPlan): Seq[SparkPlan] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[SparkPlan]
    def walk(n: SparkPlan): Unit = {
      buf += n
      n match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec        => walk(q.plan)
        case other                    => other.children.foreach(walk)
      }
    }
    walk(p)
    buf.toSeq
  }
}
