package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  * One parquet file per table under `<sfDir>/`; schema comes from the
  * parquet footer (reference relies on footer-schema inference the same
  * way: batch_processing_optimized.py:226).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** `ts` is TIMESTAMP(NANOS) in the parquet; with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as a long
    * which we truncate to micros (`div 1000` — integer division; a
    * double division would lose precision above 2^53 ns) to match
    * DuckDB's nanos→micros read-truncation.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    if (df.schema("ts").dataType == LongType)
      // cast to NTZ: Spark 4 reads the other tables' naive parquet
      // timestamps as TIMESTAMP_NTZ, and DuckDB sees naive TIMESTAMP —
      // keep every engine timestamp in the same (UTC-pinned) NTZ domain.
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    else df
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
