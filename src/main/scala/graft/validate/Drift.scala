package graft.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot drift detection over
  * [[graft.operators.Profiler.profile]] outputs — the monitoring layer
  * that catches a broken upstream BEFORE the bad batch pollutes the
  * lake: a null-rate jump (extractor started dropping a field), a
  * distinct-count collapse (join key went constant), a row-count cliff
  * (partial delivery).
  *
  * Pure profile-frame arithmetic: two tiny per-column stat tables join
  * on column name — the 100 TB facts were already reduced to one
  * profile row per column when the snapshots were taken. Rates are
  * compared (not absolute counts), so a growing table does not
  * false-alarm. */
object Drift {

  /** Per-column drift verdicts between two profile snapshots.
    * `nullRateTol`: max allowed |Δ null-rate| (fraction of rows).
    * `distinctRatioTol`: max allowed relative change in distinct count
    * per row (a proxy for key health). `rowRatioTol`: max allowed
    * relative row-count change. Columns present in only one snapshot
    * are flagged `schema_drift`. */
  def compare(before: DataFrame, after: DataFrame,
              nullRateTol: Double = 0.05,
              distinctRatioTol: Double = 0.5,
              rowRatioTol: Double = 0.5): DataFrame = {
    require(nullRateTol >= 0 && distinctRatioTol >= 0 && rowRatioTol >= 0,
      "tolerances must be non-negative")
    val b = before.select(col("column"),
      col("n_rows").as("rows_b"), col("n_nulls").as("nulls_b"),
      col("n_distinct").as("distinct_b"))
    val a = after.select(col("column"),
      col("n_rows").as("rows_a"), col("n_nulls").as("nulls_a"),
      col("n_distinct").as("distinct_a"))
    val joined = b.join(a, Seq("column"), "full_outer")
    val nullRate = (n: String, r: String) =>
      col(n).cast("double") / greatest(col(r).cast("double"), lit(1.0))
    val perRow = (d: String, r: String) =>
      col(d).cast("double") / greatest(col(r).cast("double"), lit(1.0))
    joined.select(
      col("column"),
      col("rows_b"), col("rows_a"),
      (nullRate("nulls_a", "rows_a") - nullRate("nulls_b", "rows_b")).as("null_rate_delta"),
      (perRow("distinct_a", "rows_a") - perRow("distinct_b", "rows_b")).as("distinct_per_row_delta"),
      when(col("rows_b").isNull || col("rows_a").isNull, lit("schema_drift"))
        .when(abs(nullRate("nulls_a", "rows_a") - nullRate("nulls_b", "rows_b")) > nullRateTol,
          lit("null_rate_drift"))
        .when(abs(perRow("distinct_a", "rows_a") - perRow("distinct_b", "rows_b")) >
            greatest(perRow("distinct_b", "rows_b"), lit(1e-9)) * distinctRatioTol,
          lit("distinct_drift"))
        .when(abs(col("rows_a").cast("double") - col("rows_b").cast("double")) >
            greatest(col("rows_b").cast("double"), lit(1.0)) * rowRatioTol,
          lit("row_count_drift"))
        .otherwise(lit("ok")).as("verdict"))
  }
}
