package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.pipeline.BatchPipeline

class BatchPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private def yellowRaw = Seq(
    (1, t("2024-01-01 10:00:00"), t("2024-01-01 10:20:00"), 1.0, 2.5, 1.0, "N", 10, 20, 1, 12.5, 1.0, 0.5, 2.0, 0.0, 0.3, 16.3, 2.5),
    (2, t("2024-01-01 11:00:00"), t("2024-01-01 11:30:00"), 2.0, 5.0, 1.0, "Y", 10, 99, 2, 20.0, 0.5, 0.5, 0.0, 0.0, 0.3, 21.3, 2.5) // DOLocationID 99 unmatched
  ).toDF("VendorID", "tpep_pickup_datetime", "tpep_dropoff_datetime",
    "passenger_count", "trip_distance", "RatecodeID", "store_and_fwd_flag",
    "PULocationID", "DOLocationID", "payment_type", "fare_amount", "extra",
    "mta_tax", "tip_amount", "tolls_amount", "improvement_surcharge",
    "total_amount", "congestion_surcharge")

  private def greenRaw = Seq(
    (2, t("2024-02-01 09:00:00"), t("2024-02-01 09:10:00"), 1.0, 1.5, 1.0, "N", 20, 10, 1, 8.0, 0.5, 0.5, 1.0, 0.0, 0.3, 10.3, 0.0, 0.0, 1)
  ).toDF("VendorID", "lpep_pickup_datetime", "lpep_dropoff_datetime",
    "passenger_count", "trip_distance", "RatecodeID", "store_and_fwd_flag",
    "PULocationID", "DOLocationID", "payment_type", "fare_amount", "extra",
    "mta_tax", "tip_amount", "tolls_amount", "improvement_surcharge",
    "total_amount", "congestion_surcharge", "ehail_fee", "trip_type")

  private def writeLookup(dir: String): String = {
    val f = java.nio.file.Paths.get(dir, "taxi_lookup.csv")
    Files.writeString(f,
      "LocationID,Borough,zone,service_zone,latitude,longitude\n" +
        "10,Manhattan,Midtown,Yellow,40.75,-73.98\n" +
        "20,Queens,Astoria,Boro,40.77,-73.92\n") // 99 intentionally absent
    f.toString
  }

  test("end-to-end: yellow+green files clean, aggregate, tag, validate") {
    val inDir = Files.createTempDirectory("graft_pipe_in").toString
    val outDir = Files.createTempDirectory("graft_pipe_out").toString
    yellowRaw.coalesce(1).write.parquet(s"$inDir/stage_y")
    greenRaw.coalesce(1).write.parquet(s"$inDir/stage_g")
    def promote(stage: String, name: String): Unit = {
      val part = new java.io.File(s"$inDir/$stage").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, java.nio.file.Paths.get(inDir, name))
    }
    promote("stage_y", "yellow_tripdata_2024-01.parquet")
    promote("stage_g", "green_tripdata_2024-02.parquet")

    val report = BatchPipeline.run(spark, inDir,
      Some(writeLookup(inDir)), outDir)

    val ok = report.processed.filter(p => p.error.isEmpty && p.path.endsWith(".parquet"))
    assert(ok.size == 2, report.processed)
    val yellow = spark.read.parquet(s"$outDir/yellow_tripdata_2024-01")
    val green = spark.read.parquet(s"$outDir/green_tripdata_2024-02")
    // inner-join drop: yellow row with unmatched DOLocationID 99 vanished
    assert(yellow.count() == 1 && green.count() == 1)
    assert(yellow.head().getAs[Int]("service_type") == 1)
    assert(green.head().getAs[Int]("service_type") == 2)
    // staging shape: derived calendar cols + renamed keys + coords
    val cols = yellow.columns.toSet
    assert(Set("year", "month", "dow", "vendor_id", "rate_code_id",
      "pickup_location_id", "dropoff_location_id", "payment_type_id",
      "pickup_latitude", "dropoff_longitude", "fare_amount").subsetOf(cols))
    assert(yellow.head().getAs[String]("month") == "January")
    assert(green.head().getAs[String]("dow") == "Thursday")
    // measures aggregated (sums of the single surviving row)
    assert(yellow.head().getAs[Double]("fare_amount") == 12.5)
    // validation: no violations in the cleaned output
    val v = report.validation.get.head()
    assert((0 until v.length).forall(i => v.getLong(i) == 0L))
  }

  test("per-file error containment: a broken file does not abort the run") {
    val inDir = Files.createTempDirectory("graft_pipe_in2").toString
    val outDir = Files.createTempDirectory("graft_pipe_out2").toString
    yellowRaw.coalesce(1).write.parquet(s"$inDir/stage")
    val part = new java.io.File(s"$inDir/stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, java.nio.file.Paths.get(inDir, "good.parquet"))
    Files.writeString(java.nio.file.Paths.get(inDir, "bad.parquet"), "not parquet")
    val report = BatchPipeline.run(spark, inDir, Some(writeLookup(inDir)), outDir)
    val (good, bad) = report.processed.partition(_.error.isEmpty)
    assert(good.exists(_.path.endsWith("good.parquet")))
    assert(bad.exists(_.path.endsWith("bad.parquet")))
  }
}
