package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Batch sinks (SURVEY.md §2.2). */
object Sinks {

  /** K2 — cleaned-file parquet write, one deterministic output path per
    * input (reference: scripts/transform_data.py:169-171). */
  def parquet(df: DataFrame, path: String,
              mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)

  /** Partitioned lake write — the batch twin of the streaming sink's
    * `partitionBy(date_partition)` layout, giving readers directory
    * pruning (reference: streaming_to_minio_fixed.py:75). */
  def partitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String],
                         mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** K7 semantics — idempotent load: deterministic target path +
    * skip-if-exists (reference: scripts/extract_load.py:49-89 checks
    * object existence before upload). `SaveMode.Ignore` is the engine
    * equivalent: a re-run of the same load is a no-op, so retries are
    * safe.
    */
  def idempotentParquet(df: DataFrame, path: String): Boolean = {
    val existed = pathExists(df.sparkSession, path)
    df.write.mode(SaveMode.Ignore).parquet(path)
    !existed
  }

  def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** K3 — Delta write with feature detection: if the Delta connector is
    * on the classpath use it, else fall back to plain parquet with the
    * same overwrite semantics (reference: scripts/convert_to_delta.py:85-88;
    * fallback per SURVEY.md §7.4 — no delta jars in this build env). */
  def deltaOrParquet(df: DataFrame, path: String): String = {
    val fmt = if (deltaAvailable) "delta" else "parquet"
    df.write.format(fmt).mode(SaveMode.Overwrite).save(path)
    fmt
  }

  def deltaAvailable: Boolean =
    try { Class.forName("org.apache.spark.sql.delta.sources.DeltaDataSource"); true }
    catch { case _: ClassNotFoundException => false }

  /** K1 — staging JDBC append with the reference's write discipline:
    * coalesce(4) → 4 connections, 10k-row batches, append mode
    * (reference: batch_processing_optimized.py:182-197). Returns the
    * configured writer; `.save()` is the caller's environment-specific
    * step (no database in the build env).
    */
  def jdbcStagingWriter(df: DataFrame, url: String, table: String,
                        user: String, password: String,
                        numPartitions: Int = 4, batchSize: Int = 10000)
      : org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] =
    df.coalesce(numPartitions).write.format("jdbc")
      .mode(SaveMode.Append)
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("batchsize", batchSize)
      .option("numPartitions", numPartitions)

  /** Small-file compaction: rewrite a parquet directory into
    * ~targetMB-sized files (streaming sinks and per-file loops leave
    * many small files; at scale, scan overhead is per-file). Uses the
    * source's on-disk byte size to pick the output file count, writes
    * to a temp dir, then swaps via rename-aside (current -> __old,
    * tmp -> current, drop __old): NOT one atomic operation, but every
    * crash point leaves a complete copy under either the directory,
    * `__old`, or `__compact_tmp` for recovery. Returns the new file
    * count. */
  def compact(spark: SparkSession, dir: String, targetMB: Int = 128): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / (targetMB.toLong << 20)).toInt)
    val df = spark.read.parquet(dir)
    val tmp = new Path(dir.stripSuffix("/") + "__compact_tmp")
    val old = new Path(dir.stripSuffix("/") + "__old")
    df.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(old, true)
    fs.rename(p, old)
    fs.rename(tmp, p)
    fs.delete(old, true)
    nFiles
  }

  /** K6 — table materialization (dbt `materialized='table'` CTAS
    * equivalent): register the frame as a named view; callers wanting
    * physical tables use `saveAsTable` against a real catalog. */
  def materializeView(df: DataFrame, name: String): DataFrame = {
    df.createOrReplaceTempView(name)
    df
  }
}
