package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.clean.Clean
import graft.sources.{Sinks, Sources}
import graft.staging.Staging
import graft.validate.Expectations

/** End-to-end batch orchestration — the engine's equivalent of the
  * reference's two entry points chained (scripts/transform_data.py
  * cleaning + batch_processing_optimized.py staging build): a user of
  * the reference pipeline calls [[run]] where they ran those scripts.
  *
  * Unit of work is one file, matching the reference's per-file loop
  * with per-file error containment (batch_processing_optimized.py:
  * 221-248). For engines feeding from a well-split lake, point [[run]]
  * at a directory and let each file keep the reference's
  * one-output-per-input contract; the operators themselves are
  * scale-independent.
  */
object BatchPipeline {

  /** Reference cleaning stage (transform_data.py): normalize names,
    * canonicalize datetimes across yellow/green drift, drop operational
    * columns, optional zone enrichment (broadcast inner join — drops
    * unmatched location ids), id casts, null pruning, canonical column
    * order. */
  def clean(raw: DataFrame, lookup: Option[DataFrame]): DataFrame = {
    val lowered = Clean.canonicalizeDatetimeColumns(Clean.lowercaseColumns(raw))
    val dropped = Clean.dropColumns(lowered,
      "store_and_fwd_flag", "trip_type", "ehail_fee", "airport_fee", "fee")
    val hasCoords = dropped.columns.contains("pickup_latitude")
    val enriched = lookup match {
      case Some(lk) if !hasCoords =>
        val lkLower = lk // lookup schema contract: LocationID, latitude, longitude
        Clean.zoneEnrich(
          Clean.zoneEnrich(dropped, lkLower, "pulocationid", "pickup"),
          lkLower, "dolocationid", "dropoff")
          .drop("borough", "zone", "service_zone")
      case _ => dropped
    }
    val cast = Clean.castColumns(enriched, Map(
      "vendorid" -> "int", "pulocationid" -> "int",
      "dolocationid" -> "int", "payment_type" -> "int"))
    Clean.sortColumns(Clean.dropNullRows(cast))
  }

  /** Reference staging build (batch_processing_optimized.py:99-179):
    * calendar derivation, key renames, drift-tolerant grouped sums,
    * service-type tag from the source path. */
  def staging(cleaned: DataFrame, sourcePath: String): DataFrame = {
    val derived = Staging.renameKeys(Staging.deriveTimeColumns(cleaned))
    val baseKeys = Seq("year", "month", "dow", "vendor_id", "rate_code_id",
      "pickup_location_id", "dropoff_location_id", "payment_type_id",
      "pickup_datetime", "dropoff_datetime",
      "pickup_latitude", "pickup_longitude",
      "dropoff_latitude", "dropoff_longitude")
    Staging.tagServiceType(Staging.stagingAggregate(derived, baseKeys), sourcePath)
  }

  final case class FileResult(path: String, rows: Long, error: Option[String])
  final case class Report(processed: Seq[FileResult], validation: Option[DataFrame])

  /** Process every parquet file under `inputDir`: clean → staging →
    * write to `outDir/<basename>`; failures skip the file. Optionally
    * validates the union of outputs with the reference rule suite. */
  def run(spark: SparkSession, inputDir: String, lookupCsv: Option[String],
          outDir: String, validate: Boolean = true): Report = {
    val lookup = lookupCsv.map(p => Sources.csv(spark, p))
    val results = Sources.perFile(spark, inputDir) { (path, raw) =>
      val base = new java.io.File(path).getName.stripSuffix(".parquet")
      val staged = staging(clean(raw, lookup), path)
      // cache-count-write-unpersist discipline (reference §3.1.4)
      staged.cache()
      val n = staged.count()
      Sinks.parquet(staged, s"$outDir/$base")
      staged.unpersist()
      n
    }
    val fileResults = results.map {
      case (p, scala.util.Success(n)) => FileResult(p, n, None)
      case (p, scala.util.Failure(e)) => FileResult(p, -1L, Some(e.getMessage))
    }
    val validation =
      if (validate && fileResults.exists(_.error.isEmpty)) {
        val all = spark.read.parquet(s"$outDir/*")
        val present = Expectations.referenceSuite.filter {
          case Expectations.NotNull(c) => all.columns.contains(c)
          case Expectations.Between(c, _, _) => all.columns.contains(c)
          case _ => true
        }
        Some(Expectations.report(all, present))
      } else None
    Report(fileResults, validation)
  }
}
