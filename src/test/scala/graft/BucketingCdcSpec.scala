package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing
import graft.streaming.Streams

class BucketingCdcSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join elides both shuffle exchanges") {
    spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    // the in-memory catalog forgets tables between JVM runs, but the
    // warehouse dirs persist — remove stale locations
    Seq("graft_bkt_a", "graft_bkt_b").foreach { t =>
      val dir = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    Bucketing.writeBucketed(
      spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("va")),
      "graft_bkt_a", "k", nBuckets = 4)
    Bucketing.writeBucketed(
      spark.range(0, 1000).select(col("id").as("k"), (col("id") * 3).as("vb")),
      "graft_bkt_b", "k", nBuckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "graft_bkt_a", "graft_bkt_b", "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free plan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("foreachBatchMerge maintains an upsert snapshot across micro-batches") {
    import java.nio.file.Files
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val snap = Files.createTempDirectory("graft_snap").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_snap_ckpt").toString
    val input = MemoryStream[(Long, String, Long, String)]
    val writer = graft.streaming.Streams.foreachBatchMerge(
      input.toDF().toDF("id", "payload", "ts_ms", "op"),
      snap, ckpt, Seq("id"), "ts_ms")
    val q = writer.start()
    input.addData((1L, "v1", 100L, "c"), (2L, "x1", 100L, "c"))
    q.processAllAvailable()
    input.addData((1L, "v2", 200L, "u"), (2L, null, 300L, "d"), (3L, "y1", 150L, "c"))
    q.processAllAvailable()
    q.stop()
    val live = graft.streaming.Streams.readMergeSnapshot(spark, snap)
      .orderBy("id").collect()
    assert(live.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(live(0).getString(1) == "v2" && live(1).getString(1) == "y1")
    // the tombstone for key 2 is RETAINED in the raw snapshot, so a
    // late lower-ordinal update cannot resurrect the deleted key
    val raw = spark.read.parquet(snap)
    assert(raw.count() == 3)
    assert(raw.filter(col("id") === 2L).head().getString(3) == "d")
  }

  test("cdcMerge applies latest-wins upserts and deletes") {
    val changes = Seq(
      (1L, "v1", 100L, "c"),
      (1L, "v2", 200L, "u"), // latest for key 1
      (2L, "x1", 100L, "c"),
      (2L, null, 300L, "d"), // key 2 deleted
      (3L, "y1", 50L, "r")
    ).toDF("id", "payload", "ts_ms", "op")
    val snap = Streams.cdcMerge(changes, Seq("id"), "ts_ms")
      .orderBy("id").collect()
    assert(snap.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(snap(0).getString(1) == "v2" && snap(1).getString(1) == "y1")
  }
}
