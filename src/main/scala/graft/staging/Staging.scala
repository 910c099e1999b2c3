package graft.staging

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Exact

/** Staging stage — replaces the reference's batch job
  * (reference: batch_processing_optimized.py:99-179,
  * batch_processing/datalake_to_dw.py:99-139).
  */
object Staging {

  /** P4 — derived calendar columns. `year` is kept as STRING to match
    * the reference's staging DDL quirk (utils/create_table.py:40:
    * VARCHAR year); `month`/`dow` are full English names
    * (reference: datalake_to_dw.py:100-102 — 'MMMM'/'EEEE').
    */
  def deriveTimeColumns(df: DataFrame, tsCol: String = "pickup_datetime"): DataFrame =
    df.withColumn("year", year(col(tsCol)).cast("string"))
      .withColumn("month", date_format(col(tsCol), "MMMM"))
      .withColumn("dow", date_format(col(tsCol), "EEEE"))

  /** Reference lake layout for the staging output: the streaming sink
    * partitions by `date_partition` (reference:
    * streaming_to_minio_fixed.py:63-64,75); the batch staging
    * equivalent partitions by (year, month), so a reader filtering one
    * month lists and scans only that directory — at 100 TB the
    * difference between touching one month and touching the whole lake.
    * Use SaveMode.Append when loading month-by-month (each load lands
    * in fresh partition dirs); Overwrite rebuilds the lake. */
  def writeLake(staged: DataFrame, lakeDir: String,
                mode: org.apache.spark.sql.SaveMode = org.apache.spark.sql.SaveMode.Overwrite,
                compression: String = "snappy"): Unit =
    graft.sources.Sinks.partitionedParquet(staged, lakeDir, Seq("year", "month"),
      mode, compression)

  /** P5 — canonical key renames (reference: datalake_to_dw.py:108-112). */
  val keyRenames: Map[String, String] = Map(
    "vendorid" -> "vendor_id",
    "ratecodeid" -> "rate_code_id",
    "pulocationid" -> "pickup_location_id",
    "dolocationid" -> "dropoff_location_id",
    "payment_type" -> "payment_type_id")

  def renameKeys(df: DataFrame): DataFrame =
    keyRenames.filter { case (from, _) => df.columns.contains(from) }
      .foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }

  /** The 10 staging measures (reference: datalake_to_dw.py:115-126). */
  val measures: Seq[String] = Seq(
    "passenger_count", "trip_distance", "extra", "mta_tax", "fare_amount",
    "tip_amount", "tolls_amount", "total_amount", "improvement_surcharge",
    "congestion_surcharge")

  /** A1 + P8 — grouped SUM over the staging keys, drift-tolerant: a
    * measure column absent from this file variant aggregates as
    * `sum(0)` (reference: batch_processing_optimized.py:136-171).
    * Grouping keys intentionally include the raw event timestamps —
    * the reference's dedup-and-sum of identical trips — so this is a
    * high-cardinality hash aggregate. Map-side partial aggregation +
    * AQE partition coalescing keep the shuffle bounded at scale; no
    * global sort is involved.
    */
  def stagingAggregate(df: DataFrame, keys: Seq[String],
                       sums: Seq[String] = measures,
                       exact: Boolean = true): DataFrame = {
    val aggs = sums.map { m =>
      val c = if (df.columns.contains(m)) col(m) else lit(0.0)
      (if (exact) Exact.dsum(c) else sum(c)).as(m)
    }
    val present = keys.filter(df.columns.contains)
    df.groupBy(present.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** [[stagingAggregate]] with the calendar trio derived AFTER the
    * aggregate (guide §2.3 — shuffle fewer bytes): `year`/`month`/
    * `dow` are pure functions of `tsCol` (which stays in the grouping
    * set), so grouping by the timestamp alone yields IDENTICAL groups
    * while the exchange carries three fewer STRING key columns per
    * row (~30% of this aggregate's shuffled key bytes — the full
    * English month/day names dominate) and the hash aggregate
    * compares 11 keys instead of 14. The trio is re-derived from the
    * aggregated rows with the exact [[deriveTimeColumns]] expressions
    * and the output schema/order is unchanged, so results are
    * bit-identical. Falls back to [[stagingAggregate]] whenever the
    * frame lacks the timestamp or any trio member is not the derived
    * column (drift tolerance — same contract as the plain path). */
  def stagingAggregateDeferredCalendar(df: DataFrame, keys: Seq[String],
                                       sums: Seq[String] = measures,
                                       tsCol: String = "pickup_datetime",
                                       exact: Boolean = true): DataFrame = {
    val trio = Seq("year", "month", "dow")
    if (!keys.contains(tsCol) || !trio.forall(keys.contains) ||
        !df.columns.contains(tsCol))
      return stagingAggregate(df, keys, sums, exact)
    val narrowKeys = keys.filterNot(trio.contains)
    val agg = stagingAggregate(df.drop(trio: _*), narrowKeys, sums, exact)
    val derived: Map[String, Column] = Map(
      "year" -> year(col(tsCol)).cast("string").as("year"),
      "month" -> date_format(col(tsCol), "MMMM").as("month"),
      "dow" -> date_format(col(tsCol), "EEEE").as("dow"))
    agg.select(keys.map(k => derived.getOrElse(k, col(k).as(k))) ++
      sums.map(col): _*)
  }

  /** P7 — constant service-type tag keyed off the source path
    * (reference: datalake_to_dw.py:132-136 — 1=yellow, 2=green). */
  def tagServiceType(df: DataFrame, sourcePath: String): DataFrame = {
    val tag = if (sourcePath.toLowerCase.contains("green")) 2 else 1
    df.withColumn("service_type", lit(tag))
  }

  /** K1 semantics — write parallelism discipline for a JDBC-style sink
    * (reference: batch_processing_optimized.py:182-197: coalesce(4),
    * batchsize 10000). Kept as a plain coalesce so any writer can apply
    * the same discipline; the JDBC url itself is environment-specific.
    */
  def withWriteParallelism(df: DataFrame, n: Int = 4): DataFrame = df.coalesce(n)
}
