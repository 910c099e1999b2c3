package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the row-level diff between two keyed
  * tables (yesterday's load vs today's, a pipeline rewrite's output
  * vs the incumbent's, a replica vs its source). The reference
  * validates loads with aggregate expectations
  * (`data_validation/great_expectations_validation.py`); a diff is
  * the row-level complement: WHICH keys appeared, vanished, or
  * changed, and in which columns.
  */
object Reconcile {

  /** Keyed diff of `right` against `left`: one row per key whose
    * content differs, with `status` ∈ added (right only) / removed
    * (left only) / changed (both sides, some non-key column differs)
    * and `changed_cols` the comma-joined sorted names of the
    * differing columns (empty for added/removed). Unchanged keys are
    * absent — on the 100 TB nightly reconciliation the output is
    * sized by the CHANGE volume, not the table.
    *
    * Comparison is null-safe (`<=>`; NULL equals NULL, the SQL
    * `IS NOT DISTINCT FROM`). Columns named in `hashCols` are
    * compared by md5 instead of value — the wide-text discipline:
    * document bodies never cross the join exchange, only their
    * 32-byte digests do, so the shuffle stays narrow no matter how
    * wide the payload. Both schemas must agree (loud otherwise);
    * keys are assumed non-null (enforce upstream with a CHECK).
    *
    * Scale shape: project-narrow → ONE key-partitioned full-outer
    * join (sort-merge at volume, broadcastable when one side is a
    * small delta) → map-side status/changed_cols derivation. No
    * windows, no driver loops; skew on a hot key is impossible by
    * construction (keys are unique per side — a duplicate key is the
    * caller's data bug and surfaces as a row-count blowup, not a
    * silent wrong answer). */
  def tableDiff(left: DataFrame, right: DataFrame, keys: Seq[String],
                hashCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "tableDiff: no key columns")
    require(left.columns.sorted.sameElements(right.columns.sorted),
      s"tableDiff: schemas differ: ${left.columns.sorted.mkString(",")} vs " +
        s"${right.columns.sorted.mkString(",")} — align or project first")
    keys.foreach(k => require(left.columns.contains(k), s"tableDiff: no key column '$k'"))
    hashCols.foreach(c => require(left.columns.contains(c) && !keys.contains(c),
      s"tableDiff: hash column '$c' must be a non-key table column"))
    val dataCols = left.columns.filterNot(keys.contains).sorted.toSeq
    def side(df: DataFrame, tag: String, marker: String) =
      df.select(keys.map(col) ++ dataCols.map { c =>
        (if (hashCols.contains(c)) md5(col(c).cast("string")) else col(c))
          .as(s"${tag}_$c")
      }: _*).withColumn(marker, lit(1))
    val j = side(left, "l", "__lp")
      .join(side(right, "r", "__rp"), keys, "full_outer")
    val diffs = dataCols.map(c => c -> not(col(s"l_$c") <=> col(s"r_$c")))
    val anyDiff = diffs.map(_._2).reduce(_ || _)
    j.withColumn("status",
        when(col("__lp").isNull, lit("added"))
          .when(col("__rp").isNull, lit("removed"))
          .when(anyDiff, lit("changed")))
      .filter(col("status").isNotNull)
      .withColumn("changed_cols",
        when(col("status") === "changed",
          concat_ws(",", diffs.map { case (c, d) => when(d, lit(c)) }: _*))
          .otherwise(lit("")))
      .select((keys.map(col) :+ col("status") :+ col("changed_cols")): _*)
  }
}
