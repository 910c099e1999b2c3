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
    * merge-friendly reads). Overwrite also clears an ORPHANED table
    * location: with the default in-memory catalog, a previous JVM's
    * managed-table files survive while its metadata doesn't, and CTAS
    * refuses the existing directory.
    *
    * Bucket on EXACTLY the keys later joins/aggregations cluster on:
    * Spark's co-partition check (`requireAllClusterKeysForCoPartition`,
    * default true) rejects subset-key bucketing for joins, and the
    * planner then silently disables the bucketed scan and shuffles
    * BOTH sides — the layout cost paid for nothing. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    writeBucketed(df, table, Seq(bucketCol), nBuckets, mode)

  /** Multi-column variant: bucket (and sort) by a composite key. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    nBuckets: Int, mode: SaveMode): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    val spark = df.sparkSession
    if (mode == SaveMode.Overwrite && !spark.catalog.tableExists(table)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write.mode(mode)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two tables bucketed on the same key with the same bucket
    * count — planner elides both exchanges. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
