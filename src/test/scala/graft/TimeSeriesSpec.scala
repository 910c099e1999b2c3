package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

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
}

/** sf0.01 table loader shared by specs that want real data. */
private object Tables01 {
  def events(spark: org.apache.spark.sql.SparkSession) =
    graft.core.Tables.events(spark, "/root/testdata/sf0.01")
}
