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

  /** Rank-transform normalization: per-group decile (`ntile`) and
    * percent-rank features — the distribution-free scaling used when
    * scores from different sources are incomparable in magnitude but
    * comparable in order (mixing quality scores ahead of curriculum
    * ordering). Ties are broken by `tieCol` so every row has a unique
    * rank and both engines agree bit-for-bit (percent_rank over a
    * unique ordering is exactly (row_number−1)/(n−1), the same two
    * integer operands and one IEEE division everywhere). NULL values
    * are excluded up front: the two engines disagree on NULL sort
    * order (Spark NULLS FIRST vs DuckDB NULLS LAST asc default), and
    * an unscored row has no rank.
    *
    * Scale shape: one sort per group partition — rank features need a
    * per-group total order, so this is for bounded-size groups (score
    * columns per source/type). For groups too large to sort, the
    * sketch path ([[graft.expressions.SketchAggregates]] quantile) or
    * the percentile-broadcast path ([[winsorize]]) is the 100 TB
    * variant. */
  def rankTransform(df: DataFrame, valueCol: String, groupCol: String,
                    tieCol: String, nTiles: Int = 10): DataFrame = {
    require(nTiles >= 2, s"need nTiles >= 2, got $nTiles")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc, col(tieCol).asc)
    df.filter(col(valueCol).isNotNull)
      .withColumn("decile", ntile(nTiles).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
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

  /** Per-group CALIBRATED top-percent filter: keep each group's top
    * `keepPct` percent of rows by `scoreCol` (ties broken by `idCol`,
    * so the cut is deterministic). The curation use: one GLOBAL
    * quality threshold over-prunes domains whose scores run low
    * (code, forums) and under-prunes high-scoring boilerplate
    * domains — calibrating the cutoff per source preserves the
    * domain mix while still dropping each domain's worst tail. Each
    * group keeps its top ceil(n·keepPct/100) rows — CEILING, so a
    * group too small for the percentage to reach one row (a 2-doc
    * domain at 30%) still keeps its best row instead of being wiped
    * out, which is the whole point of preserving the domain mix. The
    * keep test is pure integer arithmetic (rank·100 ≤ n·pct + 99 ⇔
    * rank ≤ ceil(n·pct/100)), so any engine replays the exact cut.
    *
    * Scale shape: only (id, group, score) enters the per-group rank
    * exchange; the full rows come back via a semi-join on the kept
    * ids — payload columns never cross the rank exchange. */
  def calibratedTopPct(df: DataFrame, scoreCol: String, groupCol: String,
                       keepPct: Int, idCol: String): DataFrame = {
    require(keepPct >= 1 && keepPct <= 100, s"keepPct in [1,100], got $keepPct")
    import org.apache.spark.sql.expressions.Window
    val byScore = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val kept = df.select(col(idCol), col(groupCol), col(scoreCol))
      .withColumn("__rn", row_number().over(byScore))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .filter(col("__rn") * 100 <= col("__n") * keepPct + 99)
      .select(col(idCol))
    df.join(kept, Seq(idCol), "left_semi")
  }

  /** The 100 TB shape of [[calibratedTopPct]]: per-group cutoff SCORE
    * from a mergeable quantile sketch, broadcast back, map-side
    * filter — the [[Sampling.quantileBuckets]]/[[winsorize]] pattern.
    * The rank-window variant sorts each group's rows in ONE window
    * partition, so a dominant domain (half a web crawl is one host)
    * serializes into a single task; here the heavy side never sorts
    * and never shuffles — the only exchange carries per-group sketch
    * states of size O(k·log(n/k)), with map-side partial merge.
    *
    * Semantics: keep rows whose score is AT OR ABOVE the group's
    * cutoff — the value at ascending rank n − ceil(n·keepPct/100) + 1,
    * i.e. the smallest score the rank path would keep
    * ([[graft.expressions.SketchAggregates.sketchTopPctCutoff]]). On
    * distinct scores this reproduces [[calibratedTopPct]]'s keep set
    * EXACTLY; at cutoff ties it keeps every tying row (a score
    * threshold cannot split equal values), and a group too small for
    * the percentage still keeps its best row (the cutoff is never
    * above the group max). Below `sketchK` values per group the
    * sketch is the full sorted sample and the cutoff is the exact
    * order statistic — the regime the SQL oracle replays; above it
    * the cutoff is a near-rank observed score (bounded rank error),
    * the honest trade at corpus scale.
    *
    * NULL scores never survive either path here; the one divergence
    * from the rank path is a group whose scores are ALL null (no
    * cutoff exists → the sketch path drops the group, where the rank
    * path would keep arbitrary-by-id rows — dropping unscored-only
    * groups is the defensible reading). */
  def calibratedTopPctSketch(df: DataFrame, scoreCol: String, groupCol: String,
                             keepPct: Int, sketchK: Int = 32768): DataFrame = {
    require(keepPct >= 1 && keepPct <= 100, s"keepPct in [1,100], got $keepPct")
    if (keepPct == 100) return df
    import graft.expressions.SketchAggregates
    val cuts = df.groupBy(col(groupCol))
      .agg(SketchAggregates.quantileSketch(col(scoreCol).cast("double"), sketchK)
        .as("__sk"))
      .select(col(groupCol),
        SketchAggregates.sketchTopPctCutoff(col("__sk"), keepPct).as("__cut"))
    df.join(broadcast(cuts), groupCol)
      .filter(col(scoreCol).cast("double") >= col("__cut"))
      .drop("__cut")
  }
}
