/*
 * The one Spark-internal bridge this library uses, isolated in its own
 * package so the dependency is explicit and auditable.
 *
 * A DataSource-v1 streaming `Source.getBatch` MUST return a DataFrame
 * with `isStreaming = true` (MicroBatchExecution asserts exactly that:
 * "did not have isStreaming=true"), and the only constructor for such
 * a frame is `SparkSession.internalCreateDataFrame`, which is
 * `private[sql]`. Declaring this shim inside `org.apache.spark.sql.*`
 * is the established public technique for v1 streaming sources — the
 * open-source Delta connector (delta-io/delta, DeltaSource) and the
 * Spark-bundled Kafka source (KafkaSource.getBatch calls
 * `sqlContext.internalCreateDataFrame(..., isStreaming = true)`) ship
 * the same shape. Nothing else in this repository lives outside the
 * `graft` namespace.
 */
package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

object GraftShims {

  /** `df` re-wrapped as a STREAMING DataFrame with the given schema —
    * the return value a v1 `Source.getBatch` owes MicroBatchExecution.
    * The rows are the batch plan's own `InternalRow`s (`toRdd`), so
    * the full batch optimizer (pushdown, pruning, codegen) already ran
    * underneath; only the streaming flag changes. */
  def streamingDataFrame(spark: SparkSession, rows: RDD[InternalRow],
                         schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rows, schema, isStreaming = true)

  /** The inverse wrap for a v1 streaming SINK: `Sink.addBatch`
    * receives a streaming-tagged Dataset that refuses batch `write`
    * actions — re-wrap its rows as a plain batch frame (the
    * DeltaSink/console-sink technique) so the micro-batch can go
    * through an ordinary batch writer. */
  def batchDataFrame(spark: SparkSession, rows: RDD[InternalRow],
                     schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rows, schema, isStreaming = false)

  /** A resolved [[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]]
    * as a DataFrame (`Dataset.ofRows` is `private[sql]`) — how the SQL
    * DML commands hand their already-analyzed MERGE source plan to the
    * TxnLog API. The same bridge every SQL extension with commands
    * carrying query subtrees (Delta's MergeIntoCommand) relies on. */
  def dataFrame(spark: SparkSession,
                plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
