package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for additive aggregates: merge an
  * already-aggregated table with a new batch's partial aggregate
  * instead of recomputing over all history — the only shape that
  * survives a 100 TB fact table growing by the hour (the recompute
  * touches everything ever ingested; the merge touches one batch plus
  * one group-cell table that is orders of magnitude smaller than the
  * facts).
  *
  * Only MERGEABLE measures are accepted: `sum` (including counts —
  * a count merges as the sum of counts), `min`, `max`. Averages are
  * derived (sum/count) at read time; count-distinct is NOT mergeable
  * exactly — that is precisely what the KMV sketch with its union
  * algebra is for ([[graft.expressions.SketchAggregates]]).
  *
  * Exactness: merge sums in integer domains (`Exact.centsSum` for
  * money) — long addition is associative, so the result is identical
  * no matter how many batches arrived in what order. Double sums
  * merged repeatedly drift by accumulation order.
  */
object Incremental {

  /** Merge two aggregate tables sharing the schema
    * `keys ++ measures.keys`. `measures` maps each measure column to
    * its merge function: "sum" | "min" | "max". One narrow shuffle of
    * group cells; the underlying facts are never touched. */
  def mergeAggregates(stored: DataFrame, delta: DataFrame,
                      keys: Seq[String],
                      measures: Map[String, String]): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    require(measures.nonEmpty, "need at least one measure")
    val bad = measures.values.toSet -- Set("sum", "min", "max")
    require(bad.isEmpty, s"unmergeable merge functions: $bad " +
      "(avg: derive from sum/count; count-distinct: use the KMV sketch)")
    val cols = keys ++ measures.keys.toSeq.sorted
    require(cols.forall(stored.columns.contains) && cols.forall(delta.columns.contains),
      s"stored/delta missing columns from ${cols.mkString(",")}")
    val aligned = stored.select(cols.map(col): _*)
      .unionByName(delta.select(cols.map(col): _*))
    val aggs = measures.toSeq.sortBy(_._1).map {
      case (c, "sum") => sum(col(c)).as(c)
      case (c, "min") => min(col(c)).as(c)
      case (c, _)     => max(col(c)).as(c) // "max"; others rejected above
    }
    aligned.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Incremental view maintenance UNDER DELETES AND UPDATES — the
    * counting algorithm over a row-level change feed
    * ([[graft.sources.TxnLog.changeFeed]]): each feed row carries a
    * SIGN (+1 for insert/update_postimage, −1 for
    * delete/update_preimage), the per-group signed deltas collapse
    * map-side, and one outer merge against the stored aggregate
    * yields the maintained view — the shape that keeps a 100 TB
    * fact's rollup current through RTBF erasures and CDC merges
    * without ever recomputing history ([[mergeAggregates]] handles
    * the append-only case; this one survives retractions).
    *
    * Signed algebra is exact for counts and integer sums (long
    * addition is associative and invertible); min/max are NOT
    * maintainable under deletes (a retraction can expose an unknown
    * second-place value) and are rejected. Groups whose maintained
    * count reaches zero vanish from the view, matching the recompute.
    * `base` carries `groupCols ++ (countCol +: sums.keys)`; `sums`
    * maps each maintained sum column to the FEED column it sums. */
  def applyChangeFeed(base: DataFrame, feed: DataFrame, groupCols: Seq[String],
                      countCol: String, sums: Map[String, String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group key")
    val sign = when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .when(col("_change_type").isin("delete", "update_preimage"), lit(-1L))
      // a change type this algebra doesn't know must FAIL, not silently
      // skew the view (a future feed extension would corrupt rollups)
      .otherwise(raise_error(concat(
        lit("applyChangeFeed: unknown _change_type '"),
        col("_change_type"), lit("'"))))
    val deltaAggs = sum(col("__sign")).as(countCol) +:
      sums.toSeq.sortBy(_._1).map { case (alias, src) =>
        sum(col("__sign") * col(src)).as(alias) }
    val delta = feed.withColumn("__sign", sign)
      .groupBy(groupCols.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
    val cols = countCol +: sums.keys.toSeq.sorted
    require(cols.forall(base.columns.contains),
      s"base view missing maintained columns from ${cols.mkString(",")}")
    val mergeAggs = sum(col(countCol)).as(countCol) +:
      sums.keys.toSeq.sorted.map(c => sum(col(c)).as(c))
    base.select((groupCols.map(col) ++ cols.map(col)): _*)
      .unionByName(delta.select((groupCols.map(col) ++ cols.map(col)): _*))
      .groupBy(groupCols.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
      .filter(col(countCol) > 0)
  }

  /** Incremental COUNT DISTINCT via KMV sketch union — the mergeable
    * path [[mergeAggregates]] points count-distinct at. Both sides
    * carry the sketch's k-minima array (`sk.kmin` from
    * `SketchAggregates.kmvDistinct`); the union of two k-minima sets
    * truncated back to k IS the k-minima of the union (the KMV
    * mergeability property), so merging partial sketches gives
    * byte-identical state to sketching all the data at once — pure
    * built-ins, no re-hashing, each group cell carries ≤ 2k longs
    * through the merge. */
  def mergeKmv(stored: DataFrame, delta: DataFrame, keys: Seq[String],
               kminCol: String, k: Int): DataFrame = {
    require(keys.nonEmpty && k > 1, s"need keys and k > 1, got $keys, k=$k")
    val cols = keys :+ kminCol
    val aligned = stored.select(cols.map(col): _*)
      .unionByName(delta.select(cols.map(col): _*))
    aligned.groupBy(keys.map(col): _*)
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col(kminCol))))),
        1, k).as(kminCol))
  }
}
