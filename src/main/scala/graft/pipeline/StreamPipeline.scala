package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.streaming.{SchemaConfig, Streams}

/** End-to-end streaming orchestration — the engine's equivalent of the
  * reference's streaming jobs: Kafka (or file) source → decode →
  * partitioned checkpointed parquet sink.
  *
  * Two shapes, matching the two reference jobs:
  *  - [[runPassthrough]]: raw record passthrough with processing-time
  *    partitions (streaming_to_minio_fixed.py).
  *  - [[runCdcDecode]]: Debezium envelope decode with config-driven
  *    schema and epoch conversion (streaming_to_datalake.py).
  */
object StreamPipeline {

  def kafkaPassthrough(spark: SparkSession, brokers: String, topic: String,
                       outPath: String, checkpoint: String,
                       triggerSeconds: Int = 10): StreamingQuery =
    Streams.parquetSink(
      Streams.rawPassthrough(Streams.kafkaSource(spark, brokers, topic)),
      outPath, checkpoint,
      partitionCols = Seq("date_partition"),
      triggerSeconds = Some(triggerSeconds)).start()

  /** CDC decode over any record stream carrying a `value` column
    * (Kafka or test source), schema loaded from the reference-shaped
    * JSON config. */
  def cdcDecode(records: DataFrame, schemaConfigJson: String,
                epochMicroCols: Seq[String]): DataFrame =
    Streams.cdcDecode(records,
      SchemaConfig.payloadSchema(schemaConfigJson), epochMicroCols)

  def runCdcDecode(records: DataFrame, schemaConfigJson: String,
                   epochMicroCols: Seq[String], outPath: String,
                   checkpoint: String): StreamingQuery =
    Streams.parquetSink(
      cdcDecode(records, schemaConfigJson, epochMicroCols),
      outPath, checkpoint,
      partitionCols = Seq.empty,
      triggerSeconds = None).start()
}
