package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.types._

import graft.sources.{Sinks, Sources}

class SourcesSinksSpec extends SparkSpec {
  import spark.implicits._

  test("csv reads header files with an explicit schema contract") {
    val dir = Files.createTempDirectory("graft_csv")
    val f = dir.resolve("lookup.csv")
    Files.writeString(f,
      "LocationID,Borough,zone,service_zone,latitude,longitude\n" +
        "1,Manhattan,Alphabet City,Yellow,40.7,-73.9\n" +
        "2,Queens,Astoria,Boro,40.8,-73.8\n")
    val schema = new StructType()
      .add("LocationID", IntegerType).add("Borough", StringType)
      .add("zone", StringType).add("service_zone", StringType)
      .add("latitude", DoubleType).add("longitude", DoubleType)
    val df = Sources.csv(spark, f.toString, Some(schema))
    assert(df.schema == schema)
    assert(df.count() == 2)
    assert(df.filter($"LocationID" === 1).head().getString(1) == "Manhattan")
  }

  test("orc round-trips typed rows through zstd stripes") {
    val dir = Files.createTempDirectory("graft_orc").resolve("t").toString
    val rows = Seq((1L, "alpha \"quoted\" text", 17L),
      (2L, "unicode é中文", 3L), (3L, null.asInstanceOf[String], 0L))
    val df = rows.toDF("id", "text", "n")
    Sinks.orc(df, dir)
    val back = Sources.orc(spark, dir)
    // ORC (like parquet) stores every column nullable; compare names+types
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
    // the codec option actually landed (file name carries the codec tag)
    val files = new java.io.File(dir).listFiles.map(_.getName)
    assert(files.exists(f => f.endsWith(".orc") && f.contains("zstd")), files.mkString(","))
  }

  test("jsonLinesQuarantine: bad lines survive with raw text; type drift stays PERMISSIVE") {
    val dir = Files.createTempDirectory("graft_jsonlq")
    val f = dir.resolve("feed.jsonl")
    Files.writeString(f,
      """{"id": 1, "name": "ok"}
        |{"id": 2 "name": "missing comma"}
        |[1, 2, 3]
        |{"id": "not-a-number", "name": "typed wrong"}
        |null
        |{"id": 5, "name": "fine", "extra": true}
        |""".stripMargin)
    val schema = new StructType()
      .add("id", LongType).add("name", StringType)
    val (good, bad) = Sources.jsonLinesQuarantine(spark, f.toString, schema)
    val goodRows = good.collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]), r.getString(1))).toSet
    // well-formed on-schema rows pass; unknown extra fields are benign
    assert(goodRows == Set((Some(1L), "ok"), (Some(5L), "fine")), goodRows)
    // malformed syntax, non-object JSON, literal null, AND rows whose
    // values cannot convert to the declared types all quarantine with
    // the raw line preserved for replay
    val badRows = bad.select("raw").collect().map(_.getString(0)).toSet
    assert(badRows == Set(
      """{"id": 2 "name": "missing comma"}""", "[1, 2, 3]", "null",
      """{"id": "not-a-number", "name": "typed wrong"}"""), badRows)
    assert(bad.columns.toSeq == Seq("raw", "src_file"))
    // conservation: every input line lands in exactly one frame
    assert(good.count() + bad.count() == 6)
  }

  test("listFiles + perFile loop processes each file and contains errors") {
    val dir = Files.createTempDirectory("graft_lake").toString
    Seq(1, 2).toDF("a").write.parquet(s"$dir/f1.parquet")
    Seq(3).toDF("a").write.parquet(s"$dir/f2.parquet")
    // parquet dirs written by Spark are directories; write flat files too
    val flat = Files.createTempDirectory("graft_flat").toString
    Seq(1, 2).toDF("a").coalesce(1).write.parquet(s"$flat/stage")
    val part = new java.io.File(s"$flat/stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, java.nio.file.Paths.get(s"$flat/one.parquet"))
    Files.writeString(java.nio.file.Paths.get(s"$flat/broken.parquet"), "not parquet")

    val listed = Sources.listFiles(spark, flat)
    assert(listed.map(p => new java.io.File(p).getName) == Seq("broken.parquet", "one.parquet"))

    val results = Sources.perFile(spark, flat)((_, df) => df.count())
    val (ok, bad) = Sources.loopReport(results)
    assert(ok.exists(_.endsWith("one.parquet")) && ok.size == 1)
    assert(bad.exists(_._1.endsWith("broken.parquet")) && bad.size == 1)
  }

  test("idempotentParquet writes once and is a no-op on re-run") {
    val path = Files.createTempDirectory("graft_idem").toString + "/out"
    val first = Sinks.idempotentParquet(Seq(1, 2, 3).toDF("x"), path)
    assert(first)
    val second = Sinks.idempotentParquet(Seq(9, 9, 9, 9).toDF("x"), path)
    assert(!second)
    assert(spark.read.parquet(path).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("partitionedParquet lays out partition dirs a reader can prune") {
    val path = Files.createTempDirectory("graft_part").toString + "/lake"
    Seq(("2024-01-01", 1), ("2024-01-02", 2)).toDF("date_partition", "v")
    Sinks.partitionedParquet(
      Seq(("2024-01-01", 1), ("2024-01-02", 2)).toDF("date_partition", "v"),
      path, Seq("date_partition"))
    val dirs = new java.io.File(path).listFiles().map(_.getName).filter(_.startsWith("date_partition="))
    assert(dirs.toSet == Set("date_partition=2024-01-01", "date_partition=2024-01-02"))
    val pruned = spark.read.parquet(path).filter($"date_partition" === "2024-01-01")
    assert(pruned.count() == 1)
    // partition filter must prune at scan time, not post-filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || pruned.inputFiles.length == 1)
  }

  test("staging lake layout: (year,month) write prunes reads to one partition") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val lake = Files.createTempDirectory("graft_stlake").toString + "/staging"
    val staged = graft.taxi.TaxiShape.staging(spark, "/root/testdata/sf0.001")
    graft.staging.Staging.writeLake(staged, lake)
    val partitions = new java.io.File(lake).listFiles().filter(_.getName.startsWith("year="))
    assert(partitions.nonEmpty)
    def countParquet(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles().map(countParquet).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    val nTotalFiles = countParquet(new java.io.File(lake))
    // pick a real (year, month) and read it back with a partition filter
    // partition-dir type inference may read year= back as int; compare stringly
    val one = spark.read.parquet(lake).select("year", "month").head()
    val rd = spark.read.parquet(lake)
      .filter($"year" === one.get(0).toString && $"month" === one.get(1).toString)
    val plan = rd.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("year"), plan)
    assert(rd.count() > 0)
    // hard proof: the scan touched fewer files than the lake holds.
    // Drive THIS queryExecution (count() above spawns its own), then
    // read the scan node's numFiles metric.
    rd.queryExecution.toRdd.count()
    val executed = rd.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = executed.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    val filesRead = scans.map(_.metrics("numFiles").value).sum
    assert(filesRead > 0 && filesRead < nTotalFiles,
      s"scan read $filesRead of $nTotalFiles files — no pruning")
  }

  test("deltaOrParquet falls back to parquet when delta is absent") {
    val path = Files.createTempDirectory("graft_delta").toString + "/t"
    val fmt = Sinks.deltaOrParquet(Seq(1).toDF("x"), path)
    assert(fmt == (if (Sinks.deltaAvailable) "delta" else "parquet"))
    assert(spark.read.format(fmt).load(path).count() == 1)
  }

  test("parquetMergeSchema unions drifted file schemas, nulling absent columns") {
    val dir = Files.createTempDirectory("graft_drift").toString
    Seq((1L, 2.5)).toDF("vendorid", "fare_amount").write.parquet(s"$dir/p=1")
    Seq((2L, 0.5, "J")).toDF("vendorid", "ehail_fee", "trip_type").write.parquet(s"$dir/p=2")
    val df = Sources.parquetMergeSchema(spark, dir)
    assert(df.columns.toSet == Set("vendorid", "fare_amount", "ehail_fee", "trip_type", "p"))
    val yellow = df.filter($"vendorid" === 1L).head()
    assert(yellow.getAs[Double]("fare_amount") == 2.5 && yellow.isNullAt(df.columns.indexOf("trip_type")))
  }

  test("compact rewrites many small files into few and preserves rows") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/lake"
    // 20 tiny files
    spark.range(0, 2000).repartition(20).write.parquet(dir)
    val before = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before >= 20)
    val n = Sinks.compact(spark, dir, targetMB = 128)
    val after = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(n == 1 && after == 1)
    assert(spark.read.parquet(dir).count() == 2000)
  }

  test("parquetWithBloom writes bloom filters readers can skip on") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("graft_bloom").toString
    val df = spark.range(0, 50000).selectExpr("id AS doc_id", "id % 100 AS v")
    Sinks.parquetWithBloom(df, s"$root/b", Seq("doc_id"), ndv = 50000)
    Sinks.parquet(df, s"$root/plain")
    def bloomOffsets(dir: String): Seq[(String, Long)] = {
      val f = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration)
      val r = ParquetFileReader.open(in)
      try r.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala.map(c =>
        (c.getPath.toDotString, c.getBloomFilterOffset))).toSeq
      finally r.close()
    }
    val withBloom = bloomOffsets(s"$root/b").toMap
    val plain = bloomOffsets(s"$root/plain").toMap
    assert(withBloom("doc_id") >= 0, s"doc_id should carry a bloom filter: $withBloom")
    assert(withBloom("v") == -1, "v was not requested and should have none")
    assert(plain("doc_id") == -1, "plain write should carry no bloom filter")
    assert(spark.read.parquet(s"$root/b").count() == 50000)
  }

  test("parquet bloom read path: point lookup on an unsorted key skips row groups") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions.{col, xxhash64}
    val root = Files.createTempDirectory("graft_bloom_read").toString
    // high-entropy unsorted key: every row group's min/max spans the
    // full range, so stats pruning is useless — only the bloom can
    // skip. Dictionary encoding is disabled so parquet-mr's dictionary
    // row-group filter can't mask the effect; 1 MiB blocks force many
    // row groups.
    val knobs = Map("parquet.block.size" -> "1048576",
      "parquet.enable.dictionary" -> "false")
    val df = spark.range(0, 500000).select(xxhash64(col("id")).as("k"), col("id").as("v"))
    Sinks.parquetWithBloom(df, s"$root/bloom", Seq("k"), ndv = 70000, options = knobs)
    df.write.options(knobs).parquet(s"$root/plain")
    val needle = spark.read.parquet(s"$root/bloom").select("k").head().getLong(0)
    def scanRows(dir: String): Long = {
      val q = spark.read.parquet(dir).filter(col("k") === needle)
      // collect() drives THIS queryExecution, so its scan metrics fill
      assert(q.collect().length == 1) // the lookup itself is exact either way
      val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
        case s: FileSourceScanExec => s
      }.get
      assert(scan.metadata("PushedFilters").contains("EqualTo"),
        s"lookup not pushed: ${scan.metadata("PushedFilters")}")
      scan.metrics("numOutputRows").value
    }
    val bloomRows = scanRows(s"$root/bloom")
    val plainRows = scanRows(s"$root/plain")
    // without blooms every row group is decoded; with them only the
    // group(s) whose filter might contain the key surface rows
    assert(plainRows >= 400000, s"plain scan should decode ~all rows, got $plainRows")
    assert(bloomRows * 3 <= plainRows,
      s"bloom scan should skip most row groups: bloom=$bloomRows plain=$plainRows")
  }

  test("zstd compression option lands in the parquet files and reads back") {
    val path = Files.createTempDirectory("graft_zstd").toString + "/out"
    Sinks.parquet(spark.range(0, 1000).toDF("x"), path, compression = "zstd")
    val files = new java.io.File(path).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".zstd.parquet")), files.toSeq)
    assert(spark.read.parquet(path).count() == 1000)
  }

  test("compact preserves a Hive-partitioned layout and its pruning") {
    val dir = Files.createTempDirectory("graft_cpart").toString + "/lake"
    spark.range(0, 300)
      .selectExpr("id", "CAST(id % 3 AS INT) AS bucket")
      .repartition(10)
      .write.partitionBy("bucket").parquet(dir)
    val n = Sinks.compact(spark, dir, targetMB = 128)
    // truthful count: one file per partition dir, not the task count
    assert(n == 3)
    val dirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("bucket="))
    assert(dirs.toSet == Set("bucket=0", "bucket=1", "bucket=2"), dirs.toSeq)
    // each partition dir compacted to a single file
    dirs.foreach { d =>
      val files = new java.io.File(s"$dir/$d").listFiles().count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"$d has $files files")
    }
    val back = spark.read.parquet(dir)
    assert(back.count() == 300)
    assert(back.filter($"bucket" === 1).count() == 100)
  }

  test("sizedParquet picks the file count from plan stats and clamps the statless default") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("sized").toString
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.01")
    // ~500 docs of ~500 chars ≈ sub-MB: one file at the default target
    val n1 = Sinks.sizedParquet(docs, s"$dir/one")
    assert(n1 == 1)
    def files(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files(s"$dir/one") == 1)
    // a tiny target forces a multi-file layout scaled to the data
    val n2 = Sinks.sizedParquet(docs, s"$dir/many", targetBytes = 16 * 1024)
    assert(n2 > 1 && files(s"$dir/many") == n2)
    // maxFiles clamps runaway estimates (statless plans default huge)
    val n3 = Sinks.sizedParquet(docs, s"$dir/clamped", targetBytes = 1L,
      maxFiles = 8)
    assert(n3 == 8 && files(s"$dir/clamped") == 8)
    // content survives every layout
    assert(spark.read.parquet(s"$dir/many").count() == docs.count())
    assert(spark.read.parquet(s"$dir/many").filter(col("doc_id") === 7L).count() == 1)
  }

  test("compact refuses directories owned by a streaming file sink") {
    val dir = Files.createTempDirectory("graft_cmeta").toString + "/sink"
    Seq(1, 2).toDF("x").write.parquet(dir)
    Files.createDirectory(java.nio.file.Paths.get(dir, "_spark_metadata"))
    val e = intercept[IllegalArgumentException](Sinks.compact(spark, dir))
    assert(e.getMessage.contains("_spark_metadata"))
  }

  test("TrinoDdl generates schema + external table DDL from a real parquet schema") {
    import graft.sources.TrinoDdl
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val ddl = TrinoDdl.script(df, "datalake", "batch", "lineitem",
      "s3://raw/", "s3://raw/batch")
    assert(ddl.contains("CREATE SCHEMA IF NOT EXISTS datalake.batch"))
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS datalake.batch.lineitem ("))
    assert(ddl.contains("\"l_orderkey\" BIGINT"))
    assert(ddl.contains("\"l_quantity\" DOUBLE"))
    assert(ddl.contains("\"l_returnflag\" VARCHAR"))
    assert(ddl.contains("external_location = 's3://raw/batch'"))
    assert(ddl.contains("format = 'PARQUET'"))
    // nested types map recursively
    import org.apache.spark.sql.types._
    val nested = StructType(Seq(
      StructField("tags", ArrayType(StringType)),
      StructField("kv", MapType(StringType, LongType)),
      StructField("pt", StructType(Seq(StructField("x", DoubleType))))))
    assert(TrinoDdl.trinoType(nested) ==
      """ROW("tags" ARRAY(VARCHAR), "kv" MAP(VARCHAR, BIGINT), "pt" ROW("x" DOUBLE))""")
    // identifiers that need quoting get it; string literals are escaped
    val odd = TrinoDdl.createSchemaSql("Data-Lake", "batch", "s3://it's/raw")
    assert(odd.contains("\"Data-Lake\".batch"))
    assert(odd.contains("'s3://it''s/raw'"))
  }

  test("jdbcStagingWriter carries the reference write discipline") {
    val w = Sinks.jdbcStagingWriter(Seq(1).toDF("x"),
      "jdbc:postgresql://example/db", "staging.nyc_taxi", "u", "p")
    // options are private; assert via the writer's string form
    assert(w.toString != null) // constructible without a database
  }

  test("parquetWithProvenance attaches real file paths and per-file row indexes") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("prov").toString
    spark.range(0, 100).toDF("id").repartition(4)
      .write.mode("overwrite").parquet(dir)
    val df = Sources.parquetWithProvenance(spark, dir)
    assert(df.columns.toSeq.takeRight(2) == Seq("src_file", "src_row"))
    assert(df.count() == 100)
    // every src_file is a real parquet part of this directory
    val files = df.select("src_file").distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(f =>
      f.contains(dir.substring(1)) && f.endsWith(".parquet")))
    // row index is dense 0..n-1 within each file
    val bad = df.groupBy("src_file")
      .agg(count(lit(1)).as("n"), min("src_row").as("mn"), max("src_row").as("mx"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(bad.isEmpty)
    // (file, row) uniquely identifies a row — the replay/forensics key
    assert(df.select("src_file", "src_row").distinct().count() == 100)
  }
}
