package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust statistics for quality-score pipelines. */
object Robust {

  /** Winsorization: clip `valueCol` to its per-group exact [lo, hi]
    * percentiles — the robust-scaling step applied to quality scores
    * before thresholding or mixing, so one source's heavy tail cannot
    * dominate a global cut. NULL values stay NULL (they carry "not
    * scored", not "extreme").
    *
    * Scale shape: the cut points are one tiny per-group aggregate
    * (exact sort-based `percentile`, the cross-engine-proven parity
    * of the `percentiles` query) broadcast back onto the data — no
    * global sort, no per-row window, and the clip itself is a
    * codegen'd projection. Same pattern as
    * [[Sampling.quantileBuckets]]. */
  def winsorize(df: DataFrame, valueCol: String, groupCol: String,
                lo: Double = 0.05, hi: Double = 0.95,
                outCol: String = ""): DataFrame = {
    require(lo >= 0 && lo < hi && hi <= 1, s"need 0 <= lo < hi <= 1, got [$lo, $hi]")
    val out = if (outCol.nonEmpty) outCol else valueCol + "_w"
    val cuts = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, $lo)").as("__lo"),
        expr(s"percentile($valueCol, $hi)").as("__hi"))
    df.join(broadcast(cuts), groupCol)
      .withColumn(out,
        when(col(valueCol).isNull, lit(null).cast("double"))
          .otherwise(least(greatest(col(valueCol), col("__lo")), col("__hi"))))
      .drop("__lo", "__hi")
  }

  /** Robust z-score: (v − median) / MAD per group — the outlier scale
    * that heavy tails cannot corrupt (mean/stddev move with the
    * outliers being scored; median/MAD do not). MAD = median of
    * |v − median|, the raw (unscaled) form. Groups whose MAD is 0
    * (over half the values identical) score NULL rather than ±∞ —
    * "no robust scale exists" is the honest answer there.
    *
    * Scale shape: two tiny per-group percentile aggregates (median,
    * then MAD over the deviations), each broadcast back — two
    * passes over the data but ZERO wide shuffles of it; the fact
    * rows themselves never cross an exchange. */
  def robustZ(df: DataFrame, valueCol: String, groupCol: String,
              outCol: String = "robust_z"): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("__med"))
    val withMed = df.join(broadcast(med), groupCol)
    val mad = withMed
      .withColumn("__dev", abs(col(valueCol) - col("__med")))
      .groupBy(col(groupCol))
      .agg(expr("percentile(__dev, 0.5)").as("__mad"))
    withMed.join(broadcast(mad), groupCol)
      .withColumn(outCol,
        when(col(valueCol).isNull || col("__mad") === 0.0,
          lit(null).cast("double"))
          .otherwise((col(valueCol) - col("__med")) / col("__mad")))
      .drop("__med", "__mad")
  }
}
