package graft.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy audits over quasi-identifiers — the release-gate checks a
  * dataset must pass before leaving the curation pipeline (the
  * population side of what [[graft.clean.Clean]]/mask_pii's
  * pseudonymization does per value):
  *
  *  - **k-anonymity**: every combination of quasi-identifier values
  *    must be shared by ≥ k rows, or the combination re-identifies
  *    its members. [[kAnonymityGroups]] returns each violating
  *    equivalence class with its size; [[kAnonymityReport]] is the
  *    one-row release gate (violating classes, exposed rows, exposed
  *    fraction in exact basis points, worst class size).
  *  - **l-diversity** of a sensitive column within each class: a
  *    class where every member shares the sensitive value leaks it
  *    even at k members. Reported as classes with < l distinct
  *    sensitive values.
  *
  * Scale shape: one hash-aggregate keyed by the QI tuple — the same
  * shuffle any GROUP BY pays; the report is a second aggregate over
  * class sizes only (narrow). No row data leaves the executors; the
  * report row is O(1). */
object Privacy {

  /** Equivalence classes (QI-value combinations) with fewer than
    * `k` members: (qi columns..., class_size). */
  def kAnonymityGroups(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < k)
  }

  /** One-row release gate: total rows, classes, violating classes,
    * exposed rows (members of violating classes), exposed share in
    * exact basis points (integer floor — engine-portable), and the
    * smallest class size observed. */
  def kAnonymityReport(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .agg(
        // coalesce: an EMPTY dataset must gate as vacuously anonymous
        // (0 rows, 0 violations), not as a row of NULL aggregates
        coalesce(sum(col("class_size")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_classes"),
        coalesce(sum(when(col("class_size") < k, 1L).otherwise(0L)), lit(0L))
          .as("violating_classes"),
        coalesce(sum(when(col("class_size") < k, col("class_size")).otherwise(0L)),
          lit(0L)).as("exposed_rows"),
        coalesce(min(col("class_size")), lit(0L)).as("min_class_size"))
      .select(col("n_rows"), col("n_classes"), col("violating_classes"),
        col("exposed_rows"),
        // integral division of non-negative longs: floor == trunc on
        // every engine, so the gate value replays exactly; greatest
        // guards the empty-input denominator only
        expr("(exposed_rows * 10000) div greatest(n_rows, 1)").as("exposed_bps"),
        col("min_class_size"),
        (col("violating_classes") === 0).as("k_anonymous"))
  }

  /** Classes (of ≥1 rows) whose sensitive column takes fewer than `l`
    * distinct values: (qi columns..., class_size, sensitive_distinct).
    * A class passing k-anonymity can still leak the sensitive value
    * when every member shares it. */
  def lDiversityGroups(df: DataFrame, qiCols: Seq[String],
                       sensitiveCol: String, l: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l-diversity needs l >= 2, got $l")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("sensitive_distinct"))
      .filter(col("sensitive_distinct") < l)
  }
}
