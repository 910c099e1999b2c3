package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.StreamPipeline
import graft.sources.Sources

class StreamPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("runCdcDecode: envelope stream lands as parquet with converted timestamps") {
    implicit val sql = spark.sqlContext
    val cfg =
      """{"fields": [
        |  {"name": "vendorid", "type": "IntegerType", "nullable": true},
        |  {"name": "tpep_pickup_datetime", "type": "LongType", "nullable": true}
        |]}""".stripMargin
    val input = MemoryStream[String]
    input.addData(
      """{"payload":{"after":{"vendorid":1,"tpep_pickup_datetime":1700000000000000}}}""")
    val out = Files.createTempDirectory("graft_sp_out").toString
    val ckpt = Files.createTempDirectory("graft_sp_ckpt").toString
    val q = StreamPipeline.runCdcDecode(
      input.toDF().select(col("value")), cfg,
      Seq("tpep_pickup_datetime"), out, ckpt)
    q.processAllAvailable(); q.stop()
    val back = spark.read.parquet(out)
    assert(back.count() == 1)
    assert(back.head().getAs[java.sql.Timestamp]("tpep_pickup_datetime")
      .toInstant.toString == "2023-11-14T22:13:20Z")
  }

  test("jsonLines and orc round-trip") {
    val dir = Files.createTempDirectory("graft_fmt").toString
    Files.writeString(java.nio.file.Paths.get(dir, "data.jsonl"),
      """{"a": 1, "b": "x"}
        |{"a": 2, "b": "y"}""".stripMargin)
    val schema = new StructType().add("a", LongType).add("b", StringType)
    val j = Sources.jsonLines(spark, s"$dir/data.jsonl", Some(schema))
    assert(j.as[(Long, String)].collect().sorted.toSeq == Seq((1L, "x"), (2L, "y")))
    j.write.orc(s"$dir/orc")
    assert(Sources.orc(spark, s"$dir/orc").count() == 2)
  }
}
