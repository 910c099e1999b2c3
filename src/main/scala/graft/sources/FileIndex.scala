package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping over a parquet directory — the external
  * min/max index Delta/Iceberg keep in their manifests, rebuilt here
  * as a tiny stats table the planner consults BEFORE the scan.
  *
  * Parquet already skips row groups inside each file it opens; what it
  * cannot skip is opening the files at all — on a 100 TB table the
  * footer reads alone (one round trip per file, thousands of files)
  * dominate a selective lookup. A one-pass stats build (ideally at
  * write time, alongside the data) plus a driver-side prune against
  * per-file [min, max] cuts the file list to the few files that can
  * possibly match — the same reason [[ZOrder]] clusters the layout:
  * range-disjoint files make min/max pruning surgical.
  *
  * The index is advisory and conservative: a file is read unless its
  * range PROVES it cannot match (NULL bounds keep the file — all-null
  * files have no usable range), and the residual filter is always
  * re-applied, so a stale or missing index can cost time, never
  * correctness. */
object FileIndex {

  /** One pass over the data: per-file row count and [min, max] per
    * indexed column. Runs as a scan + narrow hash-agg on file name —
    * build it right after a write (or compaction) while the files are
    * hot. */
  def build(spark: SparkSession, dataPath: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one indexed column")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    spark.read.parquet(dataPath)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Persist the stats table next to the data (tiny: one row per
    * file). */
  def save(stats: DataFrame, indexPath: String): Unit =
    stats.coalesce(1).write.mode("overwrite").parquet(indexPath)

  /** Files whose [min, max] range may contain a value in
    * [lo, hi] — the surviving file list after pruning. Bounds with
    * NULL stats survive (conservative). */
  def candidateFiles(spark: SparkSession, indexPath: String,
                     column: String, lo: Column, hi: Column): Seq[String] = {
    val stats = spark.read.parquet(indexPath)
    require(stats.columns.contains(s"min_$column"),
      s"index at $indexPath does not cover column '$column'")
    stats.filter(
        col(s"min_$column").isNull || col(s"max_$column").isNull ||
        (col(s"max_$column") >= lo && col(s"min_$column") <= hi))
      .select("file").collect().map(_.getString(0)).toSeq
  }

  /** Pruned range read: scan only the candidate files, then re-apply
    * the exact predicate (the index proves absence, never presence).
    * Result-identical to `spark.read.parquet(dataPath).filter(...)`;
    * the win is the files never opened. */
  def readRange(spark: SparkSession, indexPath: String,
                column: String, lo: Column, hi: Column): DataFrame = {
    val files = candidateFiles(spark, indexPath, column, lo, hi)
    // zero candidates = provably empty result, but the caller still
    // deserves the data schema: open ONE file (one footer read) and
    // let the always-false filter empty it
    val toRead =
      if (files.nonEmpty) files
      else spark.read.parquet(indexPath).select("file")
        .limit(1).collect().map(_.getString(0)).toSeq
    require(toRead.nonEmpty, s"index at $indexPath lists no files")
    val base = spark.read.parquet(toRead: _*)
    if (files.nonEmpty) base.filter(col(column) >= lo && col(column) <= hi)
    else base.filter(lit(false))
  }
}
