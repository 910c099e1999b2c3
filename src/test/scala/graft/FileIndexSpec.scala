package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.FileIndex

class FileIndexSpec extends SparkSpec {
  import spark.implicits._

  private def lake(): (String, String) = {
    val base = Files.createTempDirectory("graft_fidx").toString
    val data = s"$base/data"
    // range-disjoint files (the zorder/sort-at-write layout the index
    // is designed for): ids 0-999 split into 8 contiguous ranges
    (0L until 1000L).map(i => (i, s"p$i")).toDF("id", "payload")
      .repartitionByRange(8, col("id"))
      .write.parquet(data)
    val idx = s"$base/idx"
    FileIndex.save(FileIndex.build(spark, data, Seq("id")), idx)
    (data, idx)
  }

  test("pruned read opens a strict subset of files, result-identical") {
    val (data, idx) = lake()
    val all = spark.read.parquet(data)
    val full = all.filter(col("id") >= 100 && col("id") <= 120)
      .collect().map(_.getLong(0)).sorted
    val pruned = FileIndex.readRange(spark, idx, "id", lit(100L), lit(120L))
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq == full.toSeq)
    // the win: candidate list ≪ file list
    val nAll = all.inputFiles.length
    val nCand = FileIndex.candidateFiles(spark, idx, "id", lit(100L), lit(120L)).length
    assert(nAll == 8 && nCand <= 2, s"pruning opened $nCand of $nAll")
  }

  test("out-of-range query provably empty, schema intact") {
    val (_, idx) = lake()
    val out = FileIndex.readRange(spark, idx, "id", lit(5000L), lit(6000L))
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("id", "payload"))
  }

  test("index stats carry per-file counts and true bounds") {
    val (data, idx) = lake()
    val stats = spark.read.parquet(idx)
    assert(stats.count() == 8)
    val totals = stats.agg(sum("n_rows"), min("min_id"), max("max_id"))
      .collect()(0)
    assert(totals.getLong(0) == 1000L &&
      totals.getLong(1) == 0L && totals.getLong(2) == 999L)
    // uncovered column is rejected loudly
    intercept[IllegalArgumentException] {
      FileIndex.candidateFiles(spark, idx, "payload", lit("a"), lit("b"))
    }
    assert(data.nonEmpty)
  }
}
