package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.{SchemaConfig, Streams}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val configJson =
    """{
      |  "fields": [
      |    { "name": "vendorid", "type": "IntegerType", "nullable": true },
      |    { "name": "fare_amount", "type": "DoubleType", "nullable": true },
      |    { "name": "tpep_pickup_datetime", "type": "LongType", "nullable": true }
      |  ]
      |}""".stripMargin

  test("SchemaConfig builds the payload/envelope StructTypes from JSON") {
    val after = SchemaConfig.payloadSchema(configJson)
    assert(after == new StructType()
      .add("vendorid", IntegerType).add("fare_amount", DoubleType)
      .add("tpep_pickup_datetime", LongType))
    val env = SchemaConfig.envelopeSchema(after)
    assert(env.fieldNames.toSeq == Seq("payload"))
    assert(env("payload").dataType.asInstanceOf[StructType]("after").dataType == after)
  }

  test("SchemaConfig rejects unknown type names") {
    intercept[IllegalArgumentException] {
      SchemaConfig.payloadSchema("""{"fields":[{"name":"x","type":"WeirdType"}]}""")
    }
  }

  test("cdcDecode extracts payload.after and converts epoch micros over a MemoryStream") {
    implicit val sql = spark.sqlContext
    val after = SchemaConfig.payloadSchema(configJson)
    val input = MemoryStream[String]
    // Debezium-shaped envelopes; 1700000000000000 us = 2023-11-14T22:13:20Z
    input.addData(
      """{"payload":{"after":{"vendorid":1,"fare_amount":12.5,"tpep_pickup_datetime":1700000000000000}}}""",
      """{"payload":{"after":{"vendorid":2,"fare_amount":7.25,"tpep_pickup_datetime":1700000060000000}}}""")
    val decoded = Streams.cdcDecode(
      input.toDF().select(col("value")),
      after, Seq("tpep_pickup_datetime"))
    val q = decoded.writeStream.format("memory").queryName("cdc_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("cdc_out").orderBy("vendorid").collect()
    assert(rows.length == 2)
    assert(rows(0).getInt(0) == 1 && rows(0).getDouble(1) == 12.5)
    assert(rows(0).getTimestamp(2).toInstant.toString == "2023-11-14T22:13:20Z")
  }

  test("quarantineSplit runs unchanged on a STREAM: bad lines quarantine per micro-batch") {
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val schema = new StructType().add("id", LongType).add("name", StringType)
    val input = MemoryStream[String]
    val (good, bad) = graft.sources.Sources.quarantineSplit(
      input.toDF().toDF("raw"), schema)
    val qg = good.writeStream.format("memory").queryName("quar_good")
      .outputMode("append").start()
    val qb = bad.writeStream.format("memory").queryName("quar_bad")
      .outputMode("append").start()
    try {
      input.addData("""{"id": 1, "name": "ok"}""", """{"id": 2 broken""")
      qg.processAllAvailable(); qb.processAllAvailable()
      input.addData("[3]", """{"id": 4, "name": "late"}""")
      qg.processAllAvailable(); qb.processAllAvailable()
      val goodRows = spark.table("quar_good").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(goodRows == Set((1L, "ok"), (4L, "late")), goodRows)
      val badRows = spark.table("quar_bad").collect().map(_.getString(0)).toSet
      assert(badRows == Set("""{"id": 2 broken""", "[3]"), badRows)
    } finally { qg.stop(); qb.stop() }
  }

  test("rawPassthrough projects key/value/partitions and drops null payloads") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, String)]
    input.addData(("k1", """{"a":1}"""), ("k2", null))
    val records = input.toDF()
      .select(col("_1").cast("binary").as("key"), col("_2").cast("binary").as("value"),
        current_timestamp().as("timestamp"))
    val out = Streams.rawPassthrough(records)
    val q = out.writeStream.format("memory").queryName("raw_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("raw_out").collect()
    assert(rows.length == 1) // null payload filtered
    val row = spark.table("raw_out").select("message_key", "cdc_payload", "date_partition").head()
    assert(row.getString(0) == "k1" && row.getString(1) == """{"a":1}""")
    assert(row.getString(2).matches("""\d{4}-\d{2}-\d{2}"""))
  }

  test("parquetSink writes date-partitioned files a batch reader can prune") {
    implicit val sql = spark.sqlContext
    val outDir = Files.createTempDirectory("graft_sink").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val input = MemoryStream[(String, String)]
    input.addData(("k1", "v1"), ("k2", "v2"))
    val records = input.toDF()
      .select(col("_1").cast("binary").as("key"), col("_2").cast("binary").as("value"),
        current_timestamp().as("timestamp"))
    Streams.runBounded(
      Streams.parquetSink(Streams.rawPassthrough(records, withHour = false),
        outDir, ckpt, triggerSeconds = None))
    val back = spark.read.parquet(outDir)
    assert(back.count() == 2)
    // partition dirs exist on disk (date_partition=YYYY-MM-DD)
    val dirs = new java.io.File(outDir).listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("date_partition=")))
  }

  test("windowedAgg over an event-time stream with watermark") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    input.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:05"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:35"), "click", 2.0),
      (java.sql.Timestamp.valueOf("2024-01-01 10:01:10"), "view", 3.0))
    val df = input.toDF().toDF("ts", "event_type", "value")
    val agg = Streams.windowedAgg(df, "ts", "1 minute", "10 seconds",
      Seq("event_type"), Some("value"))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    input.addData((java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "late", 0.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("win_out")
      .orderBy("window_start", "event_type").collect()
    // watermark advanced past 10:02 → both 10:00 and 10:01 windows emitted
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("event_type") == "click"
      && rows(0).getAs[Long]("n_events") == 2L
      && rows(0).getAs[Double]("sum_value") == 3.0)
    assert(rows(1).getAs[String]("event_type") == "view"
      && rows(1).getAs[Long]("n_events") == 1L)
  }

  test("fileSource streams a parquet directory through a windowed agg") {
    val dir = Files.createTempDirectory("graft_fsrc").toString
    Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:10"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:40"), "click", 2.0))
      .toDF("ts", "event_type", "value")
      .write.parquet(s"$dir/batch1")
    val schema = spark.read.parquet(s"$dir/batch1").schema
    val stream = Streams.fileSource(spark, s"$dir/batch1", schema)
    assert(stream.isStreaming)
    val agg = Streams.windowedAgg(stream, "ts", "1 minute", "5 seconds",
      Seq("event_type"), Some("value"))
    val q = agg.writeStream.format("memory").queryName("fsrc_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    // append mode emits nothing until the watermark passes the window —
    // the point here is the source+agg plumbing runs; state is bounded
    assert(spark.table("fsrc_out").columns.contains("n_events"))
  }

  test("streamStreamJoin matches right events inside the interval window") {
    implicit val sql = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, java.sql.Timestamp)]
    clicks.addData((1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 10:00:00")))
    buys.addData(
      (1L, t("2024-01-01 10:00:30")),  // inside 60s window -> match
      (2L, t("2024-01-01 10:05:00")))  // outside -> no match
    val joined = graft.streaming.Streams.streamStreamJoin(
      clicks.toDF().toDF("user_id", "click_ts"),
      buys.toDF().toDF("user_id", "buy_ts"),
      "user_id", "click_ts", "buy_ts", "10 seconds", 60L)
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ssj_out").collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 1L)
  }

  test("streamStreamJoin leftOuter: unmatched rows emit with NULLs only after the watermark proves no partner can arrive") {
    implicit val sql = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = graft.streaming.Streams.streamStreamJoin(
      clicks.toDF().toDF("user_id", "click_ts"),
      buys.toDF().toDF("user_id", "buy_ts"),
      "user_id", "click_ts", "buy_ts", "10 seconds", 60L,
      joinType = "leftOuter")
    val q = joined.writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append").start()
    // click 1 gets an in-window buy; click 2 never will
    clicks.addData((1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 10:00:05")))
    buys.addData((1L, t("2024-01-01 10:00:30")))
    q.processAllAvailable()
    val early = spark.table("ssj_outer").collect()
    assert(early.map(_.getLong(0)).toSet == Set(1L),
      "the unmatched click must NOT emit while its window could still fill")
    // event time advances far past click 2's window + watermark: the
    // state store flushes the provably-unmatched row with NULL buy_ts
    buys.addData((99L, t("2024-01-01 10:30:00")))
    q.processAllAvailable()
    clicks.addData((98L, t("2024-01-01 10:30:00")))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ssj_outer").collect()
      .map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(rows(1L).isDefined, "matched click keeps its buy")
    assert(rows.contains(2L) && rows(2L).isEmpty,
      s"watermark-expired click emits with NULL right side: $rows")
    // a bad join type is refused
    intercept[IllegalArgumentException] {
      graft.streaming.Streams.streamStreamJoin(
        clicks.toDF().toDF("user_id", "click_ts"),
        buys.toDF().toDF("user_id", "buy_ts"),
        "user_id", "click_ts", "buy_ts", "10 seconds", 60L,
        joinType = "fullOuter")
    }
  }

  test("SQL surface over streams: temp view + spark.sql passthrough (P13)") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Int]
    input.addData(1, 2, 3)
    input.toDF().createOrReplaceTempView("stream_view")
    val out = spark.sql("SELECT value * 2 AS doubled FROM stream_view")
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("sqlpass")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("sqlpass").as[Int].collect().sorted.toSeq == Seq(2, 4, 6))
  }

  test("dedupStream drops CDC re-deliveries within the watermark") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Int)]
    val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    input.addData((t, 1), (t, 1), (t, 2))
    val dedup = Streams.dedupStream(
      input.toDF().toDF("ts", "id"), "ts", "1 minute", Seq("id"))
    val q = dedup.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup_out").count() == 2)
  }

  test("corpusIngest quality-gates and fingerprint-dedups a document stream") {
    implicit val sql = spark.sqlContext
    val longDoc = "the quick brown fox jumps over one lazy dog while seven " +
      "other animals watch from a nearby grassy hill today"
    val otherDoc = "large distributed systems aggregate partial results before " +
      "any exchange happens so the network moves only compact summaries between all workers"
    val input = MemoryStream[(java.sql.Timestamp, String)]
    input.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), longDoc),
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:05"), "  " + longDoc + " "), // same fingerprint
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:10"), "too short"),          // quality-dropped
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:15"), otherDoc))
    val out = Streams.corpusIngest(
      input.toDF().toDF("ts", "text"), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("corpus_out")
      .outputMode("append").start()
    q.processAllAvailable()
    // a later re-delivery inside the watermark is still suppressed
    input.addData((java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), longDoc))
    q.processAllAvailable(); q.stop()
    val texts = spark.table("corpus_out").collect().map(_.getAs[String]("text"))
    assert(texts.length == 2)
    assert(texts.map(_.trim).toSet == Set(longDoc, otherDoc))
  }

  test("stream-static enrichment against SCD2 validity intervals picks the right version") {
    import graft.operators.TimeSeries
    // static side: an SCD2 dimension built from a change log —
    // user 1 was "bronze" until 12:00, "gold" after
    val log = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "bronze"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 2L, "gold")
    ).toDF("user_id", "ts", "event_id", "event_type")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val dim = TimeSeries.scd2(log, "user_id", "ts", "event_id", "event_type")
      .withColumnRenamed("event_type", "tier")
    // stream side: events at 08:00 (bronze era) and 15:00 (gold era)
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    input.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 08:00:00"), 1L, 10.0),
      (java.sql.Timestamp.valueOf("2024-01-01 15:00:00"), 1L, 20.0))
    val stream = input.toDF().toDF("ts", "user_id", "amount")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    // stream-static join: point-in-validity-interval (half-open)
    val enriched = stream.join(dim,
      stream("user_id") === dim("user_id") &&
        stream("ts") >= dim("valid_from") &&
        (dim("valid_to").isNull || stream("ts") < dim("valid_to")))
      .select(stream("ts"), stream("user_id"), col("amount"), col("tier"))
    val q = enriched.writeStream.format("memory").queryName("scd2_enriched")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("scd2_enriched")
      .select("amount", "tier").as[(Double, String)].collect().toSet
    assert(rows == Set((10.0, "bronze"), (20.0, "gold")), s"got $rows")
  }

  test("StreamMetrics records per-batch rows and rates through the listener") {
    import graft.streaming.StreamMetrics
    val metrics = new StreamMetrics(maxEvents = 100)
    spark.streams.addListener(metrics)
    try {
      implicit val sql = spark.sqlContext
      val in = MemoryStream[Long]
      val q = in.toDF().toDF("v").writeStream
        .format("memory").queryName("metrics_probe").start()
      in.addData(1L, 2L, 3L); q.processAllAvailable()
      in.addData(4L); q.processAllAvailable()
      q.stop()
      // listener events are async — the polling loop below drains.
      // NEVER "wait" via spark.streams.awaitAnyTermination here: the
      // session's StreamingQueryManager is SHARED across the parallel
      // suite, and awaitAnyTermination rethrows any OTHER suite's
      // expected query failure (the connector's rewrite-refusal tests
      // terminate queries with exceptions by design) — the one flake
      // the full suite ever showed
      val deadline = System.currentTimeMillis() + 10000
      def batches() = metrics.frame(spark)
        .filter(col("queryName") === "metrics_probe" && col("numInputRows") > 0)
        .select("batchId", "numInputRows")
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      while (batches().size < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(batches().map(_._2) == Seq(3L, 1L), s"got ${batches()}")
    } finally spark.streams.removeListener(metrics)
  }

  test("observed validation metrics surface per micro-batch in streaming progress") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Option[Int], Double)]
    val df = input.toDF().toDF("vendor_id", "trip_distance")
    val suite = Seq(graft.validate.Expectations.NotNull("vendor_id"),
      graft.validate.Expectations.Between("trip_distance", 0, 100))
    // Observation objects are batch-only; streaming reads the same
    // CollectMetrics node back through progress.observedMetrics
    val observedDf = graft.validate.Expectations.observedStream(df, suite, "sq_checks")
    val q = observedDf.writeStream.format("memory").queryName("obs_out")
      .outputMode("append").start()
    try {
      input.addData((Some(1), 5.0), (None, 200.0), (Some(2), 50.0))
      q.processAllAvailable()
      val m = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("sq_checks"))).last
      assert(m.getAs[Long]("n_rows") == 3L)
      assert(m.getAs[Long]("not_null_vendor_id") == 1L)
      assert(m.getAs[Long]("between_trip_distance") == 1L)
    } finally q.stop()
  }

  test("enrichWithStatic joins each micro-batch against the static dim, left-preserving") {
    implicit val sql = spark.sqlContext
    val dim = Seq((1, "Manhattan"), (2, "Queens")).toDF("zone_id", "borough")
    val input = MemoryStream[(Int, Double)]
    input.addData((1, 10.0), (2, 7.5), (9, 3.0)) // 9 has no dim row
    val out = Streams.enrichWithStatic(
      input.toDF().select(col("_1").as("zone_id"), col("_2").as("fare")),
      dim, Seq("zone_id"))
    val q = out.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("enrich_out").orderBy("zone_id").collect()
    assert(rows.length == 3)
    assert(rows(0).getString(2) == "Manhattan" && rows(1).getString(2) == "Queens")
    assert(rows(2).isNullAt(2)) // unmatched event survives the left join
    // contract guards: sides must be stream + static respectively
    intercept[IllegalArgumentException] {
      Streams.enrichWithStatic(dim, dim, Seq("zone_id"))
    }
  }

  test("corpus quality and blocklist filters run unchanged on a streaming frame") {
    // the per-doc filter tier is pure codegen projections, so the SAME
    // operator instances screen the firehose — no streaming twin needed
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    input.addData((1L, "the cat sat on the mat."), (2L, "slow slow slow dup"))
    val docs = input.toDF().select(col("_1").as("doc_id"), col("_2").as("text"))
    val out = graft.functions.TextFunctions
      .blocklistFilter(docs, Seq("slow", "dup"), maxHits = 2)
      .join(broadcast(
        Seq((1L, true)).toDF("doc_id", "expect_keep")), Seq("doc_id"), "left")
    val q = out.writeStream.format("memory").queryName("bl_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("bl_out").orderBy("doc_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getBoolean(3) && !rows(1).getBoolean(3))
    // and the linear quality model streams the same way
    val input2 = MemoryStream[(Long, String)]
    input2.addData((1L, "the cat sat on the mat."))
    val q2 = graft.functions.TextFunctions
      .qualityLinear(input2.toDF().select(col("_1").as("doc_id"), col("_2").as("text")))
      .writeStream.format("memory").queryName("ql_out")
      .outputMode("append").start()
    q2.processAllAvailable(); q2.stop()
    val r2 = spark.table("ql_out").head()
    assert(r2.getLong(4) == 1065220L && r2.getBoolean(5))
  }
}
