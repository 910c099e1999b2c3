package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("missingRanges reports exactly the gaps between observed-day islands") {
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    // present: 1-2, 5, 8-9 → gaps 3-4 and 6-7
    val df = Seq("2024-03-01", "2024-03-02", "2024-03-05", "2024-03-08",
      "2024-03-09", "2024-03-02" /* dup day */)
      .map(s => Tuple1(ts(s + " 12:00:00"))).toDF("ts")
    val got = TimeSeries.missingRanges(df, "ts")
      .as[(Date, Date, Long)].collect().toSet
    assert(got == Set(
      (d("2024-03-03"), d("2024-03-04"), 2L),
      (d("2024-03-06"), d("2024-03-07"), 2L)))
    // contiguous days → nothing to backfill
    val dense = Seq("2024-03-01", "2024-03-02", "2024-03-03")
      .map(s => Tuple1(ts(s + " 01:00:00"))).toDF("ts")
    assert(TimeSeries.missingRanges(dense, "ts").isEmpty)
    // a single island (or empty input) reports no gaps
    assert(TimeSeries.missingRanges(dense.limit(1), "ts").isEmpty)
    assert(TimeSeries.missingRanges(dense.limit(0), "ts").isEmpty)
  }

  test("streaks finds the longest run per key, ties to the earliest, no-hit keys absent") {
    def mk(user: Long, vals: Seq[Long]) = vals.zipWithIndex.map { case (v, i) =>
      (user, ts(f"2024-01-01 00:${i}%02d:00"), i.toLong, v)
    }
    // user 1: runs [1,2] [4,5,6] [8] -> longest len 3 at events 4..6
    // user 2: three len-1 runs -> tie broken to the earliest (event 0)
    // user 3: no hits -> absent
    val df = (mk(1L, Seq(5, 12, 15, 3, 20, 30, 40, 7, 50)) ++
      mk(2L, Seq(12, 3, 15, 2, 20)) ++ mk(3L, Seq(1, 2, 3)))
      .toDF("user_id", "ts", "event_id", "v")
    val got = TimeSeries.streaks(df, "user_id", "ts", "event_id", col("v") >= 10L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 4L, 6L), (2L, 1L, 0L, 0L)))
    // a run spanning the whole key
    val all = TimeSeries.streaks(mk(7L, Seq(11, 12, 13)).toDF("user_id", "ts", "event_id", "v"),
      "user_id", "ts", "event_id", col("v") >= 10L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(all == Set((7L, 3L, 0L, 2L)))
  }

  test("cusum matches the sequential recurrence and resets at zero") {
    // hand-traced: ref=10, x=[12,18,5,30,2,40] -> d=[2,8,-5,20,-8,30],
    // S=[2,10,5,25,17,47]; threshold 25 alarms events 4 and 6
    val rows = Seq(12L, 18L, 5L, 30L, 2L, 40L).zipWithIndex.map { case (x, i) =>
      (1L, ts(f"2024-01-01 00:0$i:00"), i.toLong, x)
    }
    val df = rows.toDF("user_id", "ts", "event_id", "cents")
    val got = TimeSeries.cusum(df, "user_id", "ts", "event_id",
        valueCents = col("cents"), refCents = 10L, thresholdCents = 25L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 25L), (1L, 5L, 47L)))
    // reset law: a deep deficit never goes negative, later excess
    // starts from zero — x=[1,1,50], ref=10 -> S=[0,0,40]
    val df2 = Seq((2L, ts("2024-01-01 01:00:00"), 0L, 1L),
      (2L, ts("2024-01-01 01:01:00"), 1L, 1L),
      (2L, ts("2024-01-01 01:02:00"), 2L, 50L)).toDF("user_id", "ts", "event_id", "cents")
    val got2 = TimeSeries.cusum(df2, "user_id", "ts", "event_id",
        col("cents"), refCents = 10L, thresholdCents = 30L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got2 == Set((2L, 2L, 40L)))
    // property: prefix form == sequential recurrence on a pseudo-random
    // stream (deterministic generator), every event, threshold 0+1
    val xs = (0 until 200).map(i => (i * 37 % 23).toLong)
    val ref = 11L
    var s = 0L
    val want = xs.zipWithIndex.map { case (x, i) =>
      s = math.max(0L, s + (x - ref)); (3L, i.toLong, s)
    }.filter(_._3 >= 1L).toSet
    val df3 = xs.zipWithIndex.map { case (x, i) =>
      (3L, ts(f"2024-01-01 ${i / 60 + 2}%02d:${i % 60}%02d:00"), i.toLong, x)
    }.toDF("user_id", "ts", "event_id", "cents")
    val got3 = TimeSeries.cusum(df3, "user_id", "ts", "event_id",
        col("cents"), ref, thresholdCents = 1L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got3 == want)
  }

  test("resampleFfill fills gaps with carried-forward sums and flags them") {
    val df = Seq(
      (1L, ts("2024-01-01 00:10:00"), 5.0),
      (1L, ts("2024-01-01 00:40:00"), 2.5),
      // hour 01 empty (gap), hour 02 has one event
      (1L, ts("2024-01-01 02:05:00"), 4.0),
      (2L, ts("2024-01-01 10:00:00"), 1.0)
    ).toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val out = TimeSeries.resampleFfill(df, "user_id", "ts", "value", "hour")
      .orderBy("user_id", "bucket").collect()
    // user 1: hours 00,01,02 — dense grid; user 2: single hour
    assert(out.length == 4)
    val h0 = out(0); val h1 = out(1); val h2 = out(2); val u2 = out(3)
    assert(h0.getLong(2) == 2 && !h0.getBoolean(3) && h0.getDouble(4) == 7.5)
    assert(h1.getLong(2) == 0 && h1.getBoolean(3) && h1.getDouble(4) == 7.5) // ffill
    assert(h2.getLong(2) == 1 && !h2.getBoolean(3) && h2.getDouble(4) == 4.0)
    assert(u2.getLong(2) == 1 && u2.getDouble(4) == 1.0)
  }

  test("resampleFfill grid is dense per key: (span/step + 1) rows, no cross-key leakage") {
    val df = Tables01.events(spark).filter(col("user_id") < 3)
    val out = TimeSeries.resampleFfill(df, "user_id", "ts", "value", "hour")
    val spans = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"), min("bucket").as("mn"), max("bucket").as("mx"))
      .withColumn("expected",
        (unix_timestamp(col("mx")) - unix_timestamp(col("mn"))) / 3600 + 1)
      .filter(col("n") =!= col("expected"))
    assert(spans.isEmpty, s"grid not dense: ${spans.collect().toSeq}")
  }

  test("scd2 collapses runs and chains half-open validity intervals") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 01:00:00"), 2L, "a"), // same state: collapsed
      (1L, ts("2024-01-01 02:00:00"), 3L, "b"),
      (1L, ts("2024-01-01 03:00:00"), 4L, "a"), // back to a: new interval
      (2L, ts("2024-01-01 00:00:00"), 5L, "x")
    ).toDF("user_id", "ts", "event_id", "event_type")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val out = TimeSeries.scd2(df, "user_id", "ts", "event_id", "event_type")
      .orderBy("user_id", "valid_from").collect()
    assert(out.length == 4)
    // intervals chain: each valid_to equals the next valid_from
    import java.time.LocalDateTime
    assert(out(0).getString(1) == "a" && out(0).getAs[LocalDateTime]("valid_to") ==
      out(1).getAs[LocalDateTime]("valid_from"))
    assert(out(1).getString(1) == "b" && out(1).getAs[LocalDateTime]("valid_to") ==
      out(2).getAs[LocalDateTime]("valid_from"))
    // exactly one current row per key, and it is the last state
    assert(out(2).getString(1) == "a" && out(2).getBoolean(4))
    assert(out(3).getLong(0) == 2L && out(3).getBoolean(4))
    assert(out.count(_.getBoolean(4)) == 2)
  }

  test("scd2 treats NULL states as runs (null-safe change detection)") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, Some("a")),
      (1L, ts("2024-01-01 01:00:00"), 2L, None),
      (1L, ts("2024-01-01 02:00:00"), 3L, None), // null run: collapsed
      (1L, ts("2024-01-01 03:00:00"), 4L, Some("a"))
    ).toDF("user_id", "ts", "event_id", "event_type")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val out = TimeSeries.scd2(df, "user_id", "ts", "event_id", "event_type")
    assert(out.count() == 3)
    assert(out.filter(col("event_type").isNull).count() == 1)
  }

  test("rollingAgg trailing window includes boundary, excludes past-window, sums exactly") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.10),
      (1L, ts("2024-01-01 00:30:00"), 2.20),
      (1L, ts("2024-01-01 01:00:00"), 4.40), // exactly 1h after first: in window
      (1L, ts("2024-01-01 02:00:00"), 8.80), // exactly 1h after third: still in
      (2L, ts("2024-01-01 00:45:00"), 1.00)  // other key: isolated
    ).toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val out = TimeSeries.rollingAgg(df, "user_id", "ts", "value",
      windowMicros = 3600L * 1000000L)
      .orderBy("user_id", "ts").collect()
    val sums = out.map(r => (r.getAs[Double]("rolling_sum"), r.getAs[Long]("rolling_n")))
    assert(sums(0) == (1.10, 1L))
    assert(sums(1) == (3.30, 2L)) // 1.10 + 2.20 exact in cents
    assert(sums(2) == (7.70, 3L)) // boundary row included (closed trailing range)
    assert(sums(3) == (13.20, 2L)) // 4.40 + 8.80; first two aged out of [01:00, 02:00]
    assert(sums(4) == (1.00, 1L)) // no cross-key leakage
  }

  test("rollingAgg equal timestamps are frame peers (order-independent)") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0, "a"),
      (1L, ts("2024-01-01 00:00:00"), 2.0, "b") // same micros: peers
    ).toDF("user_id", "ts", "value", "tag")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val out = TimeSeries.rollingAgg(df, "user_id", "ts", "value", 1000000L)
    // both rows see BOTH peers — a ROWS frame would give one of them
    // a partial sum depending on arrival order
    assert(out.select("rolling_sum").as[Double].collect().toSeq == Seq(3.0, 3.0))
  }

  test("gaps emits only pairs spaced past the threshold, with deterministic predecessor") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L),
      (1L, ts("2024-01-01 00:30:00"), 11L), // 30 min: below threshold
      (1L, ts("2024-01-01 02:00:00"), 12L), // 90 min gap from 11
      (2L, ts("2024-01-01 00:00:00"), 20L),
      (2L, ts("2024-01-01 09:00:00"), 21L)  // 9h gap
    ).toDF("user_id", "ts", "event_id")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val out = TimeSeries.gaps(df, "user_id", "ts", "event_id",
      minGapMicros = 3600L * 1000000L)
      .orderBy("user_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("prev_event_id") == 11L &&
      out(0).getAs[Long]("event_id") == 12L &&
      out(0).getAs[Long]("gap_us") == 5400L * 1000000L)
    assert(out(1).getAs[Long]("prev_event_id") == 20L &&
      out(1).getAs[Long]("gap_us") == 9L * 3600L * 1000000L)
  }

  test("watermarkAudit: closed-form lateness; sharded prefix max equals the global one") {
    // arrival 0..5, event times (micros) 100,200,150,50,300,299 —
    // exclusive prefix max is [none,100,200,200,200,300]; with a
    // 10-micro delay only arrivals 2 and 3 are late (150<190, 50<190;
    // 299 vs 300-10 is on-time). shardWidth=2 puts every prior max for
    // arrivals 2..5 in an EARLIER shard, so the carry path decides.
    val df = Seq((0L, 100L), (1L, 200L), (2L, 150L), (3L, 50L),
      (4L, 300L), (5L, 299L)).toDF("event_id", "t")
      .withColumn("ts", expr("timestamp_micros(t)")).drop("t")
    val sharded = TimeSeries.watermarkAudit(df, delayMicros = 10L,
      shardWidth = 2L).collect()
    assert(sharded.length == 1)
    val r = sharded.head
    assert(r.getAs[Long]("window_start_us") == 0L)
    assert(r.getAs[Long]("n_events") == 6L)
    assert(r.getAs[Long]("n_late") == 2L)
    assert(r.getAs[Long]("late_bps") == 3333L)
    // two-phase ≡ single-shard global replay, row for row
    val global = TimeSeries.watermarkAudit(df, delayMicros = 10L,
      shardWidth = 1L << 20).collect()
    assert(global.map(_.toSeq).toSet == sharded.map(_.toSeq).toSet)
  }
}

/** sf0.01 table loader shared by specs that want real data. */
private object Tables01 {
  def events(spark: org.apache.spark.sql.SparkSession) =
    graft.core.Tables.events(spark, "/root/testdata/sf0.01")
}
