package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst optimizer rule: collapse the exact numeric cast roundtrip
  *
  *   `cast(cast(e AS double) AS <integral>)`  →  `cast(e AS <integral>)`
  *
  * when `e` is byte/short/int-typed. Every such value is exactly
  * representable in an IEEE-754 double (|v| ≤ 2^31 < 2^53), so the
  * detour through double is the identity on the value and the single
  * remaining cast has the same overflow/ANSI behavior as the pair —
  * for equal source/target widths Catalyst's own `SimplifyCasts` then
  * erases it entirely.
  *
  * Why it matters here: the staging layer keeps reference-schema
  * columns as doubles (pandas-style measures — e.g.
  * `graft.taxi.TaxiShape` maps int `l_linenumber` to double
  * `rate_code_id`), and warehouse-layer guards compare
  * `cast(rate_code_id AS int)` against literals. Without this rule the
  * scan-level predicate is `cast(cast(c AS double) AS int) < 7`, which
  * parquet cannot push; with it the predicate simplifies to a bare
  * column comparison that reaches `PushedFilters` — at 100 TB the
  * difference between row-group skipping and a full scan.
  *
  * LONG inner types are deliberately excluded: long→double rounds
  * above 2^53, so the roundtrip is not the identity there.
  */
object CastRoundtripSimplify extends Rule[LogicalPlan] {

  private def exactInDouble(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType => true
    case _ => false
  }

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case outer @ Cast(Cast(e: Expression, DoubleType, _, _), target, _, _)
        if integral(target) && exactInDouble(e.dataType) =>
      outer.copy(child = e)
  }
}
