package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sources.TxnLog

/** Hidden partitioning — Iceberg-style transforms (`days(ts)`,
  * `bucket(n, col)`, `trunc(w, col)`) as `partitionBy` entries: the
  * writer derives a reserved `__p_*` Hive partition column, readers
  * never see it, and readWhere/readPoint map RAW-column predicates
  * onto the derived column so Spark's partition pruning skips files
  * inside each commit dir. */
class HiddenPartitioningSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft_hidden").toString + "/t"

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def days(root: String) = Seq(
    (1L, ts("2024-01-01 10:00:00"), "a"),
    (2L, ts("2024-01-02 11:00:00"), "b"),
    (3L, ts("2024-01-03 12:00:00"), "c"),
    (4L, ts("2024-01-04 13:00:00"), "d"))
    .toDF("id", "ts", "s")
    .withColumn("ts", col("ts").cast("timestamp_ntz"))

  test("days(ts): derived dirs on disk, hidden from reads, pruned by raw-ts ranges") {
    val root = fresh()
    TxnLog.overwrite(days(root), root, partitionBy = Seq("days(ts)"))
    // the derived column is REAL on disk (Hive dirs)...
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataDir = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/data"))
      .filter(_.isDirectory).head.getPath
    val parts = fs.listStatus(dataDir).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("__p_days_ts=")).sorted
    assert(parts.length == 4 && parts.head == "__p_days_ts=2024-01-01")
    // ...and invisible to every read
    assert(TxnLog.read(spark, root).columns.toSeq == Seq("id", "ts", "s"))
    // a raw-ts range prunes to the matching day partitions: the plan
    // must carry a partition filter on the derived column
    val lo = ts("2024-01-02 00:00:00"); val hi = ts("2024-01-03 23:59:59")
    val q = TxnLog.readWhere(spark, root, "ts", lo, hi)
    assert(q.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("__p_days_ts"),
      s"expected a partition filter on __p_days_ts in:\n$plan")
    // the scan actually read only the 2 admitted day-files
    assert(q.select(input_file_name()).distinct().count() == 2L)
    assert(TxnLog.read(spark, root)
      .select(input_file_name()).distinct().count() == 4L)
  }

  test("bucket(n, key): point lookups open one derived bucket; readPoints ORs them") {
    val root = fresh()
    val df = spark.range(0L, 64L).select(col("id"), (col("id") * 2).as("v"))
    TxnLog.overwrite(df, root, partitionBy = Seq("bucket(8, id)"))
    val pt = TxnLog.readPoint(spark, root, "id", 17L)
    assert(pt.collect().map(_.getLong(0)).toSeq == Seq(17L))
    // exactly one bucket-file read for one key
    assert(pt.select(input_file_name()).distinct().count() == 1L)
    val multi = TxnLog.readPoints(spark, root, "id", Seq(3L, 17L, 42L))
    assert(multi.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 17L, 42L))
    assert(multi.select(input_file_name()).distinct().count() <= 3L)
    // bucket is hash-ordered: a RANGE must not wrongly prune (all rows)
    assert(TxnLog.readWhere(spark, root, "id", 10L, 20L).count() == 11L)
  }

  test("trunc(w, n): range predicates map to width-aligned partitions") {
    val root = fresh()
    val df = spark.range(0L, 400L).select(col("id"), (col("id") % 7).as("m"))
    TxnLog.overwrite(df, root, partitionBy = Seq("trunc(100, id)"))
    val q = TxnLog.readWhere(spark, root, "id", 150L, 250L)
    assert(q.count() == 101L)
    assert(q.select(input_file_name()).distinct().count() == 2L) // files 100, 200
  }

  test("appends inherit the transform; rewrites preserve the derived layout") {
    val root = fresh()
    TxnLog.overwrite(days(root), root, partitionBy = Seq("days(ts)"))
    // an append WITHOUT partitionBy re-derives nothing (flat dir) —
    // conservative reads still work; an append WITH the same spec
    // lays down the derived dirs again
    TxnLog.append(Seq((5L, ts("2024-01-05 09:00:00"), "e")).toDF("id", "ts", "s")
      .withColumn("ts", col("ts").cast("timestamp_ntz")),
      root, partitionBy = Seq("days(ts)"))
    assert(TxnLog.readWhere(spark, root, "ts",
      ts("2024-01-05 00:00:00"), ts("2024-01-05 23:59:59"))
      .collect().map(_.getLong(0)).toSeq == Seq(5L))
    // copy-on-write delete on the hidden-partitioned table: layoutOf
    // echoes the __p_ dir and commit recovers its transform spec
    TxnLog.delete(spark, root, col("id") === 2L)
    val snap = TxnLog.read(spark, root)
    assert(snap.columns.toSeq == Seq("id", "ts", "s"))
    assert(snap.orderBy("id").collect().map(_.getLong(0)).toSeq
      == Seq(1L, 3L, 4L, 5L))
    // pruning still works over the rewritten layout
    val q = TxnLog.readWhere(spark, root, "ts",
      ts("2024-01-03 00:00:00"), ts("2024-01-03 23:59:59"))
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(q.queryExecution.executedPlan.toString.contains("__p_days_ts"))
  }

  test("compact preserves the derived layout instead of flattening it") {
    val root = fresh()
    TxnLog.overwrite(days(root).filter(col("id") <= 2L), root,
      partitionBy = Seq("days(ts)"))
    TxnLog.append(days(root).filter(col("id") > 2L), root,
      partitionBy = Seq("days(ts)"))
    TxnLog.compact(spark, root)
    // one commit dir now, still day-partitioned inside
    val q = TxnLog.readWhere(spark, root, "ts",
      ts("2024-01-02 00:00:00"), ts("2024-01-02 23:59:59"))
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(q.queryExecution.executedPlan.toString.contains("__p_days_ts"),
      "compaction must not flatten the hidden-partition layout")
    assert(q.select(input_file_name()).distinct().count() == 1L)
    assert(TxnLog.read(spark, root).columns.toSeq == Seq("id", "ts", "s"))
  }

  test("pre-transform dirs stay whole (conservative); malformed specs refuse") {
    val root = fresh()
    // first commit flat, transform arrives later
    TxnLog.overwrite(days(root).filter(col("id") <= 2L), root)
    TxnLog.append(days(root).filter(col("id") > 2L), root,
      partitionBy = Seq("days(ts)"))
    val q = TxnLog.readWhere(spark, root, "ts",
      ts("2024-01-01 00:00:00"), ts("2024-01-03 23:59:59"))
    assert(q.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      TxnLog.append(days(root), root, partitionBy = Seq("bucket(1, id)"))
    }
    intercept[IllegalArgumentException] {
      TxnLog.append(days(root), root, partitionBy = Seq("days(nope)"))
    }
  }
}
