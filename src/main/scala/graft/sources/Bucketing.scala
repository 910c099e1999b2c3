package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables: pre-shuffle a fact table ONCE at write time so
  * every later equi-join/aggregation on the bucket key runs
  * exchange-free. At 100 TB this converts the recurring join shuffle
  * (the dominant cost of the star-schema fact build) into a one-time
  * layout cost — the classic bucketed-join optimization.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets for
    * merge-friendly reads). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables bucketed on the same key with the same bucket
    * count — planner elides both exchanges. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
