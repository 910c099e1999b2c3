package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Batch sinks (SURVEY.md §2.2). */
object Sinks {

  /** K2 — cleaned-file parquet write, one deterministic output path per
    * input (reference: scripts/transform_data.py:169-171).
    * `compression`: parquet codec ("snappy" default; "zstd" trades
    * ~1.3-2x smaller files for slightly more write CPU — the usual
    * choice for a long-lived 100 TB lake where scan IO dominates). */
  def parquet(df: DataFrame, path: String,
              mode: SaveMode = SaveMode.Overwrite,
              compression: String = "snappy"): Unit =
    df.write.mode(mode).option("compression", compression).parquet(path)

  /** Parquet write with per-column bloom filters — the file-level data
    * skipping that complements min/max stats: point lookups on a
    * high-cardinality key (trip id, doc id, user id) skip whole row
    * groups whose bloom says "definitely absent", where min/max ranges
    * on an unsorted key prune nothing. The footer cost is a few hundred
    * KB per column per row group; worth it on any 100 TB table queried
    * by key. `ndv` sizes each filter (expected distinct values per row
    * group). `options` passes through extra parquet writer knobs
    * (e.g. `parquet.block.size` to bound row groups,
    * `parquet.enable.dictionary` when plain encoding is wanted). */
  def parquetWithBloom(df: DataFrame, path: String, bloomCols: Seq[String],
                       ndv: Long = 100000L,
                       mode: SaveMode = SaveMode.Overwrite,
                       compression: String = "snappy",
                       options: Map[String, String] = Map.empty): Unit = {
    val w = df.write.mode(mode).option("compression", compression).options(options)
    val withBloom = bloomCols.foldLeft(w) { (acc, c) =>
      acc.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }
    withBloom.parquet(path)
  }

  /** Size-targeted parquet write — the "optimize write" shape: the
    * output file count is chosen FROM THE DATA so a 100 TB job never
    * writes ten thousand 2 MB files (small-file debt) or five 200 GB
    * ones (no read parallelism). The frame's in-memory size is
    * estimated from the optimized plan's statistics (Catalyst's
    * sizeInBytes — free, no extra pass), discounted by
    * `compressionRatio` for the on-disk parquet size, and the write
    * repartitions to `ceil(bytes / targetBytes)` files. Returns the
    * file count chosen. A plan without usable stats (sizeInBytes
    * unknown ⇒ a huge default) is clamped to `maxFiles` — wrong
    * sizing costs layout, never data. `compressionRatio` defaults to
    * 1 because FILE-backed plans already report on-disk (compressed)
    * bytes; raise it when the frame's lineage starts from in-memory
    * relations, whose stats are uncompressed row estimates. */
  def sizedParquet(df: DataFrame, path: String,
                   targetBytes: Long = 128L * 1024 * 1024,
                   compressionRatio: Int = 1,
                   maxFiles: Int = 4096,
                   compression: String = "snappy"): Int = {
    require(targetBytes > 0 && compressionRatio >= 1 && maxFiles >= 1,
      s"bad sizing: target=$targetBytes ratio=$compressionRatio max=$maxFiles")
    val planBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val onDisk = planBytes / compressionRatio
    val n = ((onDisk + targetBytes - 1) / targetBytes)
      .min(BigInt(maxFiles)).max(BigInt(1)).toInt
    df.repartition(n).write.mode(SaveMode.Overwrite)
      .option("compression", compression).parquet(path)
    n
  }

  /** Partitioned lake write — the batch twin of the streaming sink's
    * `partitionBy(date_partition)` layout, giving readers directory
    * pruning (reference: streaming_to_minio_fixed.py:75). */
  def partitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String],
                         mode: SaveMode = SaveMode.Overwrite,
                         compression: String = "snappy"): Unit =
    df.write.mode(mode).option("compression", compression)
      .partitionBy(partitionCols: _*).parquet(path)

  /** ORC write — the Spark-native columnar alternative for stacks
    * whose readers (Hive, Trino ORC connectors) want ORC instead of
    * parquet. Same codec trade as [[parquet]]: zstd by default, since
    * a long-lived lake is scan-dominated. Round-trip fidelity (text
    * included, so string/long encodings and stripe framing are
    * exercised) is oracle-checked by `orc_roundtrip`. */
  def orc(df: DataFrame, path: String,
          mode: SaveMode = SaveMode.Overwrite,
          compression: String = "zstd"): Unit =
    df.write.mode(mode).option("compression", compression).orc(path)

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
    if (fmt == "parquet")
      // loud, not silent: a caller expecting Delta's ACID log/time
      // travel must see the degradation, not discover it at read time
      org.slf4j.LoggerFactory.getLogger(Sinks.getClass).warn(
        s"deltaOrParquet: Delta connector NOT on classpath — writing plain " +
        s"parquet to $path (overwrite snapshot semantics preserved; no " +
        "transaction log, no time travel). Add delta-spark jars to restore " +
        "the Delta format.")
    df.write.format(fmt).mode(SaveMode.Overwrite).save(path)
    fmt
  }

  def deltaAvailable: Boolean =
    try { Class.forName("org.apache.spark.sql.delta.sources.DeltaDataSource"); true }
    catch { case _: ClassNotFoundException => false }

  /** K3 with ACID semantics everywhere: Delta when the connector is on
    * the classpath, else [[TxnLog]] — the engine's own manifest-log
    * format, which preserves what the parquet fallback of
    * [[deltaOrParquet]] loses (atomic commit point, time travel,
    * idempotent append). Returns the format used ("delta" or
    * "txnlog"). */
  def acidOverwrite(df: DataFrame, path: String): String =
    if (deltaAvailable) {
      df.write.format("delta").mode(SaveMode.Overwrite).save(path); "delta"
    } else {
      TxnLog.overwrite(df, path); "txnlog"
    }

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

  /** Rename-aside swap with failure checks: dest → `old`, `src` →
    * dest, drop `old`. Every rename's boolean return is verified — a
    * silently failed rename must NOT be followed by the final delete,
    * or the only complete copy would be destroyed. On any failure the
    * swap aborts with the surviving copy intact (under dest, `old`, or
    * `src`), so recovery is always possible. NOT one atomic operation
    * (HDFS-style single-dir renames are; the 3-step swap is not). */
  private[graft] def swapInPlace(fs: org.apache.hadoop.fs.FileSystem,
                                 src: Path, dest: Path, old: Path): Unit = {
    // A prior swap that crashed between dest->old and src->dest leaves
    // `old` as the only copy of the previous data with `dest` missing;
    // deleting `old` here would destroy it before `dest` is
    // re-established. Refuse and point the operator at the copies.
    if (fs.exists(old) && !fs.exists(dest))
      throw new java.io.IOException(
        s"$dest is missing but $old exists — a previous swap crashed " +
          s"mid-way. Recover manually: previous data is at $old, a new " +
          s"copy may be at $src; restore one to $dest before retrying")
    fs.delete(old, true)
    if (fs.exists(old))
      throw new java.io.IOException(s"cannot clear $old; aborting swap")
    if (fs.exists(dest) && !fs.rename(dest, old))
      throw new java.io.IOException(
        s"rename $dest -> $old failed; current data untouched at $dest")
    if (!fs.rename(src, dest))
      throw new java.io.IOException(
        s"rename $src -> $dest failed; previous copy preserved at $old")
    if (!fs.exists(dest))
      throw new java.io.IOException(
        s"$dest missing after swap; copies remain at $old and/or $src")
    fs.delete(old, true)
    ()
  }

  /** Partition columns of a Hive-layout directory tree, outermost
    * first (`year=…/month=…` → Seq("year", "month")); empty for flat
    * layouts. */
  private[graft] def detectPartitionCols(fs: org.apache.hadoop.fs.FileSystem,
                                         root: Path): Seq[String] = {
    val cols = scala.collection.mutable.ArrayBuffer.empty[String]
    var cur = root
    var descending = true
    while (descending) {
      val partDirs = fs.listStatus(cur).filter(_.isDirectory)
        .map(_.getPath)
        .filter { q =>
          val n = q.getName
          n.contains("=") && !n.startsWith("_") && !n.startsWith(".")
        }
      partDirs.headOption match {
        case Some(d) => cols += d.getName.takeWhile(_ != '='); cur = d
        case None => descending = false
      }
    }
    cols.toSeq
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ~targetMB-sized files (streaming sinks and per-file loops leave
    * many small files; at scale, scan overhead is per-file). Uses the
    * source's on-disk byte size to pick the output file count, writes
    * to a temp dir, then swaps via the checked rename-aside
    * [[swapInPlace]] — NOT one atomic operation, but every crash or
    * rename failure leaves a complete copy under either the directory,
    * `__old`, or `__compact_tmp` for recovery.
    *
    * Hive-partitioned layouts (`col=value` dirs) are preserved: the
    * rewrite re-partitions by the detected (or caller-supplied)
    * partition columns so directory pruning survives compaction.
    * Directories carrying a `_spark_metadata` streaming-sink log are
    * refused — rewriting them would orphan the sink's file manifest
    * while a stream may still own it. Returns the actual data-file
    * count under the destination after the swap (with partitionBy each
    * writer task emits one file per partition value it holds, so the
    * result can exceed the repartition task count). */
  def compact(spark: SparkSession, dir: String, targetMB: Int = 128,
              partitionCols: Seq[String] = Seq.empty): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new Path(p, "_spark_metadata")),
      s"$dir holds a _spark_metadata streaming-sink log; compacting would " +
        "orphan the sink's manifest — stop the stream and drop the log first")
    val parts =
      if (partitionCols.nonEmpty) partitionCols else detectPartitionCols(fs, p)
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / (targetMB.toLong << 20)).toInt)
    val df = spark.read.parquet(dir)
    val tmp = new Path(dir.stripSuffix("/") + "__compact_tmp")
    val old = new Path(dir.stripSuffix("/") + "__old")
    val repartitioned =
      // hash-partitioning by the layout columns gives one writer task
      // per partition dir, so each dir compacts to a single file
      if (parts.nonEmpty) df.repartition(nFiles, parts.map(org.apache.spark.sql.functions.col): _*)
      else df.repartition(nFiles)
    val writer = repartitioned.write.mode(SaveMode.Overwrite)
    (if (parts.nonEmpty) writer.partitionBy(parts: _*) else writer).parquet(tmp.toString)
    swapInPlace(fs, tmp, p, old)
    countDataFiles(fs, p)
  }

  /** Recursive count of data files (non-hidden, non-metadata) under a
    * directory — the truthful post-compaction file count. */
  private def countDataFiles(fs: org.apache.hadoop.fs.FileSystem, root: Path): Int = {
    val it = fs.listFiles(root, true)
    var n = 0
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) n += 1
    }
    n
  }

  /** K6 — table materialization (dbt `materialized='table'` CTAS
    * equivalent): register the frame as a named view; callers wanting
    * physical tables use `saveAsTable` against a real catalog. */
  def materializeView(df: DataFrame, name: String): DataFrame = {
    df.createOrReplaceTempView(name)
    df
  }
}
