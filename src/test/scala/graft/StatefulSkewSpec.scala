package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.Skew
import graft.streaming.{StatefulSessions, StreamingNearDup}

class StatefulSkewSpec extends SparkSpec {
  import spark.implicits._

  test("nearDupStream screens arrivals against the banded state catalog") {
    implicit val sql = spark.sqlContext
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearA = (1 to 59).map(i => s"w$i").mkString(" ") + " zz"
    val other = (1 to 60).map(i => s"q$i").mkString(" ")
    val input = MemoryStream[(Long, String)]
    val verdicts = StreamingNearDup.nearDupStream(
      input.toDF().toDF("doc_id", "text"), threshold = 0.7)
    val q = verdicts.writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    // batch 1: base admitted (first in doc_id order), near-dup caught,
    // unrelated doc admitted silently
    input.addData((1L, base), (2L, nearA), (3L, other))
    q.processAllAvailable()
    val b1 = spark.table("neardup_out").collect()
    assert(b1.forall(_.getLong(0) == 2L), b1.mkString(","))
    assert(b1.nonEmpty && b1.forall(_.getLong(2) == 1L)) // dup_of = doc 1
    // batch 2: exact replay of doc 1 collides in EVERY band at est 1.0;
    // a fresh doc stays silent
    val fresh = (1 to 60).map(i => s"z$i").mkString(" ")
    input.addData((10L, base), (11L, fresh))
    q.processAllAvailable()
    q.stop()
    val b2 = spark.table("neardup_out").collect().filter(_.getLong(0) >= 10L)
    assert(b2.nonEmpty && b2.forall(r => r.getLong(0) == 10L &&
      r.getLong(2) == 1L && r.getDouble(3) == 1.0), b2.mkString(","))
    assert(b2.length == 4) // all 4 bands collide on an exact dup
  }

  test("nearDupStream restarts against a snapshotted catalog (initial state bootstrap)") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val other = (1 to 60).map(i => s"q$i").mkString(" ")
    // "yesterday's" accepted corpus lives in the lake; snapshot it in
    // the stream's bootstrap shape
    val accepted = Seq((1L, base), (3L, other)).toDF("doc_id", "text")
    val catalog = StreamingNearDup.catalogFrom(accepted)
    assert(catalog.count() == 8) // 2 docs x 4 bands
    // a NEW query incarnation seeded from the snapshot: no batch ever
    // contained docs 1/3, yet their near-dups are caught immediately
    val input = MemoryStream[(Long, String)]
    val verdicts = StreamingNearDup.nearDupStream(
      input.toDF().toDF("doc_id", "text"), threshold = 0.7,
      initialCatalog = Some(catalog))
    val q = verdicts.writeStream.format("memory").queryName("neardup_boot")
      .outputMode("append").start()
    val fresh = (1 to 60).map(i => s"z$i").mkString(" ")
    input.addData((10L, base), (11L, fresh))
    q.processAllAvailable()
    // the fresh doc must also have been ADMITTED to the restored
    // catalog: its later exact replay gets screened
    input.addData((20L, fresh))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("neardup_boot").collect()
    val exactDup = rows.filter(_.getLong(0) == 10L)
    assert(exactDup.length == 4 && exactDup.forall(r =>
      r.getLong(2) == 1L && r.getDouble(3) == 1.0), rows.mkString(","))
    assert(!rows.exists(_.getLong(0) == 11L), rows.mkString(","))
    val replay = rows.filter(_.getLong(0) == 20L)
    assert(replay.length == 4 && replay.forall(_.getLong(2) == 11L),
      rows.mkString(","))
  }

  test("sessionizeStream closes sessions after the gap via event-time timeout") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    def t(s: String) = Timestamp.valueOf(s)
    // user 1: two events 10s apart (one session); user 2: one event
    input.addData((1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:00:10")),
      (2L, t("2024-01-01 10:00:05")))
    val sessions = StatefulSessions.sessionizeStreamDF(
      input.toDF().toDF("user_id", "ts"), "ts", "user_id",
      watermarkDelay = "5 seconds", gapSeconds = 60)
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    q.processAllAvailable()
    // watermark still at 10:00:10-5s → nothing closed yet
    assert(spark.table("sess_out").count() == 0)
    // an event far in the future advances the watermark past both
    // sessions' (last + gap) timeouts → they close
    input.addData((3L, t("2024-01-01 12:00:00")))
    q.processAllAvailable()
    input.addData((3L, t("2024-01-01 12:00:01"))) // extra batch to fire timers
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_out").orderBy("user_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L && rows(0).getAs[Long]("n_events") == 2L)
    assert(rows(0).getAs[Timestamp]("session_start") == t("2024-01-01 10:00:00"))
    assert(rows(0).getAs[Timestamp]("session_end") == t("2024-01-01 10:00:10"))
    assert(rows(1).getLong(0) == 2L && rows(1).getAs[Long]("n_events") == 1L)
  }

  test("cusumStream: two-long state, batch parity, alarms across the batch boundary") {
    import graft.streaming.StatefulCusum
    import graft.streaming.StatefulCusum.CusumEvent
    implicit val sql = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    // ref 10, threshold 25 — same fixture as the batch spec:
    // x = [12, 18, 5] in batch 1, [30, 2, 40] in batch 2; alarms at
    // events 3 (S=25, accumulation SPANS the boundary) and 5 (S=47)
    val all = Seq(12L, 18L, 5L, 30L, 2L, 40L).zipWithIndex.map { case (x, i) =>
      CusumEvent(1L, t(f"2024-01-01 00:0$i:00"), i.toLong, x)
    }
    val input = MemoryStream[CusumEvent]
    val alarms = StatefulCusum.cusumStream(input.toDS(), refCents = 10L,
      thresholdCents = 25L)
    val q = alarms.writeStream.format("memory").queryName("cusum_out")
      .outputMode("append").start()
    input.addData(all.take(3): _*)
    q.processAllAvailable()
    assert(spark.table("cusum_out").count() == 0) // S peaks at 10 so far
    input.addData(all.drop(3): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cusum_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 3L, 25L), (1L, 5L, 47L)))
    // parity: identical to the batch operator over the union
    import org.apache.spark.sql.functions.col
    val batch = graft.operators.TimeSeries.cusum(
        all.toDF(), "user_id", "ts", "event_id", col("cents"), 10L, 25L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch == got)
  }

  test("rateLimitStream: budget spans the batch boundary, resets at the window, batch parity, late events never over-admit") {
    import graft.streaming.StatefulRateLimit
    import graft.streaming.StatefulRateLimit.RateEvent
    implicit val sql = spark.sqlContext
    val hourMs = 3600 * 1000L
    def ev(id: Long, ms: Long) = RateEvent(1L, new Timestamp(ms), id)
    // window = 1h, max = 2. Events 0,1,2 in hour 0 (2 admitted, 1
    // dropped — the drop lands in batch 2, so the budget must SPAN the
    // boundary); events 3,4 in hour 1 (fresh budget, both admitted).
    val all = Seq(ev(0L, 0L), ev(1L, 60000L), ev(2L, 120000L),
      ev(3L, hourMs), ev(4L, hourMs + 60000L))
    val input = MemoryStream[RateEvent]
    val out = StatefulRateLimit.rateLimitStream(input.toDS(), maxPerWindow = 2,
      windowMs = hourMs)
    val q = out.writeStream.format("memory").queryName("rate_out")
      .outputMode("append").start()
    input.addData(all.take(2): _*)
    q.processAllAvailable()
    input.addData(all.drop(2): _*)
    q.processAllAvailable()
    val got = spark.table("rate_out")
      .collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    assert(got == Map(0L -> 1, 1L -> 1, 2L -> 0, 3L -> 1, 4L -> 1))
    // a LATE event for the already-advanced hour 0 is dropped — the
    // conservative answer (its budget state is gone; never over-admit)
    input.addData(ev(9L, 120001L))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("rate_out").collect()
      .find(_.getLong(1) == 9L).get.getInt(3) == 0)
    // parity with the batch operator over the in-order prefix
    import org.apache.spark.sql.functions.col
    val batch = graft.operators.TimeSeries.rateLimit(
        all.toDF(), "user_id", "ts", "event_id", maxPerWindow = 2,
        truncUnit = "hour")
      .select("event_id", "admitted").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(batch == got)
  }

  test("AQE splits a skewed shuffle-join partition at runtime (skew=true)") {
    // Salting (below) is the manual fix; AQE's OptimizeSkewedJoin is the
    // runtime one — the hot partition is split into advisory-sized reader
    // chunks after the shuffle map stages report their sizes. Thresholds
    // are production-scale (256 MB); shrink them so a ~MB-scale hot key
    // trips the same code path the 100 TB cluster relies on.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // pinned: with very few partitions the skew rule's median-size
      // test can never separate the hot partition from the rest (the
      // shared session's partition count depends on suite order)
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 80% of left rows share key 0; the padding is REFERENCED by the
      // aggregate so pruning can't drop it and the hot partition's
      // shuffle bytes clear the (lowered) skew threshold. The aggregate
      // is GLOBAL, not keyed on k: a keyed parent would reuse the
      // join's hash partitioning, and OptimizeSkewedJoin correctly
      // refuses to split a partition some parent still requires.
      val left = spark.range(0, 60000).select(
        when(col("id") % 10 < 8, 0L).otherwise(col("id")).as("k"),
        lpad(col("id").cast("string"), 60, "x").as("pad"))
      val right = spark.range(0, 3000).select(
        (col("id") % 100).as("k"), col("id").as("w"))
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(length(col("pad"))).as("pad_bytes"))
      val row = joined.collect().head
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan)
      // correctness under the split: key 0 joins 48000 x 30; the 20
      // non-hot left keys that land in [0, 100) join 30 right rows each
      val expected = 48000L * 30 + 20L * 30
      assert(row.getLong(0) == expected, row)
      assert(row.getLong(1) == expected * 60, row)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltedJoin equals the plain join under a hot key") {
    // hot key: 90% of large rows share key 7
    val large = spark.range(0, 1000)
      .select(col("id"), when(col("id") % 10 =!= 0, 7L).otherwise(col("id") % 5).as("k"))
    val small = Seq((7L, "hot"), (0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val plain = large.join(small, "k").select("id", "k", "v")
    val salted = Skew.saltedJoin(large, small, "k", nSalts = 8, saltBy = col("id"))
      .select("id", "k", "v")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
