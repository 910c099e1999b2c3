package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality engine — replaces the reference's Great
  * Expectations suite (reference: data_validation/gx/expectations/
  * validate_trip_data.json:5-92) with a single-pass conditional-count
  * aggregate: all rules evaluate in ONE scan of the table regardless of
  * rule count (A4/F5 in SURVEY.md §2), so cost is one job at any scale.
  */
object Expectations {

  sealed trait Expectation {
    def name: String
    /** true ⇔ the row violates the rule. */
    def violation: Column
  }

  /** expect_column_values_to_not_be_null. */
  final case class NotNull(column: String) extends Expectation {
    val name = s"not_null_$column"
    def violation: Column = col(column).isNull
  }

  /** expect_column_values_to_be_between — GX ignores nulls for range
    * rules, so null is not a violation here (NotNull covers it). */
  final case class Between(column: String, lo: Double, hi: Double) extends Expectation {
    val name = s"between_$column"
    def violation: Column =
      col(column).isNotNull && (col(column) < lo || col(column) > hi)
  }

  /** One row; one BIGINT violation-count column per rule. */
  def report(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    val aggs = suite.map(e =>
      sum(when(e.violation, 1L).otherwise(0L)).as(e.name))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Boolean per-rule pass view over a report row. */
  def passed(reportRow: DataFrame): DataFrame =
    reportRow.select(reportRow.columns.toIndexedSeq.map(c => (col(c) === 0L).as(c)): _*)

  /** The reference's 12-rule suite (validate_trip_data.json:5-92):
    * 10 not-null columns + 2 range rules. */
  val referenceSuite: Seq[Expectation] = Seq(
    NotNull("vendor_id"), NotNull("rate_code_id"),
    NotNull("pickup_location_id"), NotNull("dropoff_location_id"),
    NotNull("payment_type_id"), NotNull("service_type"),
    NotNull("pickup_latitude"), NotNull("pickup_longitude"),
    NotNull("dropoff_latitude"), NotNull("dropoff_longitude"),
    Between("trip_distance", 0, 100), Between("extra", 0, 3))
}
