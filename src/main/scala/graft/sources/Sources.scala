package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import scala.util.{Failure, Success, Try}

/** Batch sources (SURVEY.md §2.1). The reference reads its lake through
  * an object-store client and loops file-by-file; here the same
  * semantics sit on Hadoop FS globbing so they work on any filesystem
  * Spark can reach (local, HDFS, S3A) without a bespoke client.
  */
object Sources {

  /** S1/S2 — parquet scan (single file, directory, or glob). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Scan with row-level provenance from Spark's hidden `_metadata`
    * struct: every row carries its source file and row index — the
    * lineage/audit columns an incremental pipeline needs for replays
    * and bad-record forensics. Zero cost beyond the two extra columns
    * (populated by the reader itself; no join, no UDF). */
  def parquetWithProvenance(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(col("*"),
      col("_metadata.file_path").as("src_file"),
      col("_metadata.row_index").as("src_row"))

  /** Drift-tolerant multi-file scan: unions the schemas of all footers
    * (columns absent from a file read as null) — the whole-directory
    * alternative to the per-file variant handling in `Clean`
    * (yellow/green/year drift, SURVEY.md §1.3). Costs a footer read
    * per file at planning time; prefer a fixed schema once known. */
  def parquetMergeSchema(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** S3 — header CSV scan with an explicit schema contract (the
    * zone-lookup table: LocationID,Borough,zone,service_zone,
    * latitude,longitude — reference: scripts/transform_data.py:43).
    * An explicit schema avoids the double-read of `inferSchema` — at
    * 100 TB an inference pass is a full extra scan.
    */
  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(path)
  }

  /** JSON-lines scan (the events `props` column shape as a file
    * format); explicit schema avoids the inference pass. */
  def jsonLines(spark: SparkSession, path: String,
                schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** ORC scan — Spark-native columnar alternative to parquet. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JSONL ingest with CORRUPT-RECORD QUARANTINE — the production
    * ingest contract for feeds you don't control: a malformed line
    * must neither kill the job (FAILFAST) nor silently vanish
    * (DROPMALFORMED); it lands in the quarantine frame with the RAW
    * line preserved for replay after the producer is fixed.
    *
    * Shape: read as text, parse with `from_json` against the pinned
    * schema — pure relational split (no caching workaround for
    * Spark's internal `_corrupt_record` restrictions), one scan
    * feeding both frames, everything map-side.
    *
    * What quarantines: anything the parser flags — syntactically
    * malformed lines, non-object JSON (bare scalar/array; the literal
    * `null` parses to a null struct, indistinguishable by
    * construction, and quarantines too — the conservative reading for
    * an ingest gate), and rows whose field VALUES cannot convert to
    * the declared types (the parser marks those corrupt as well, so
    * the raw line survives for replay instead of passing with a
    * silently-nulled field). Benign schema drift — unknown extra
    * fields — passes. */
  def jsonLinesQuarantine(spark: SparkSession, path: String,
                          schema: StructType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.input_file_name
    quarantineSplit(
      spark.read.textFile(path).toDF("raw")
        .select(col("raw"), input_file_name().as("src_file")),
      schema)
  }

  /** The parse-and-split core of [[jsonLinesQuarantine]], usable on ANY
    * frame carrying a raw-line string column — including a STREAMING
    * one (`readStream.text` / Kafka values): `from_json` and the two
    * filters are all stateless map-side operations, so the same gate
    * runs unchanged per micro-batch (two writeStream sinks, or
    * foreachBatch when both halves must commit atomically together).
    * Extra columns on `df` (file provenance, Kafka offsets) ride
    * through on the quarantine side. */
  def quarantineSplit(df: DataFrame, schema: StructType,
                      rawCol: String = "raw"): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.from_json
    val crpt = "_graft_corrupt"
    require(!schema.fieldNames.contains(crpt), s"schema may not contain $crpt")
    val full = schema.add(crpt, org.apache.spark.sql.types.StringType)
    val parsed = df.withColumn("__r",
      from_json(col(rawCol), full, Map("columnNameOfCorruptRecord" -> crpt)))
    val good = parsed
      .filter(col("__r").isNotNull && col(s"__r.$crpt").isNull)
      .select(schema.fieldNames.map(f => col(s"__r.`$f`")).toIndexedSeq: _*)
    val quarantined = parsed
      .filter(col("__r").isNull || col(s"__r.$crpt").isNotNull)
      .drop("__r")
    (good, quarantined)
  }

  /** S5 — bounded row prefix (reference: utils/streaming_data_db.py:42-44). */
  def parquetHead(spark: SparkSession, path: String, n: Int): DataFrame =
    spark.read.parquet(path).limit(n)

  /** S6 — enumerate files under a prefix, matching an extension
    * (reference: utils/minio_utils.py:30-38). Driver-side metadata op;
    * returns paths sorted for deterministic per-file loops.
    */
  def listFiles(spark: SparkSession, dir: String, suffix: String = ".parquet"): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toIndexedSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(suffix))
      .map(_.getPath.toString).sorted
  }

  /** §3.1 — the reference's per-file processing loop with
    * error-containment: each file is processed independently and a
    * failure skips that file instead of aborting the batch
    * (reference: batch_processing_optimized.py:221-248). Returns
    * (path, result-or-error) per file.
    *
    * Scale note: this exists for the reference's one-output-per-input
    * contract and OOM discipline; when per-file isolation isn't
    * required, prefer a single multi-file scan (`parquet(dir)`) and let
    * Spark parallelize splits.
    */
  def perFile[A](spark: SparkSession, dir: String, suffix: String = ".parquet")
                (process: (String, DataFrame) => A): Seq[(String, Try[A])] =
    listFiles(spark, dir, suffix).map { path =>
      path -> Try(process(path, spark.read.parquet(path)))
    }

  /** S7 — JDBC table scan (reference: gx great_expectations.yml:100-109
    * reads staging.nyc_taxi). Partitioned read options exposed so a
    * large table scan parallelizes across executors instead of a single
    * connection. Untestable in this environment (no database) — kept as
    * the one environment-specific source behind a thin builder.
    */
  def jdbc(spark: SparkSession, url: String, table: String,
           props: Map[String, String] = Map.empty,
           partitionColumn: Option[String] = None,
           bounds: Option[(Long, Long)] = None,
           numPartitions: Int = 4): org.apache.spark.sql.DataFrameReader = {
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    val withProps = props.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }
    (partitionColumn, bounds) match {
      case (Some(c), Some((lo, hi))) =>
        withProps.option("partitionColumn", c)
          .option("lowerBound", lo).option("upperBound", hi)
          .option("numPartitions", numPartitions)
      case _ => withProps
    }
  }

  /** Summarize a per-file run: (processed, failed) with error messages
    * (reference logs processed/total, batch_processing_optimized.py:252). */
  def loopReport[A](results: Seq[(String, Try[A])]): (Seq[String], Seq[(String, String)]) = {
    val ok = results.collect { case (p, Success(_)) => p }
    val bad = results.collect { case (p, Failure(e)) => p -> e.getMessage }
    (ok, bad)
  }
}
