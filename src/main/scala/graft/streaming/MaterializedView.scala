package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.Incremental
import graft.sources.TxnLog

/** Streaming materialized view: a grouped aggregate kept current by
  * merging each micro-batch's partial into a [[TxnLog]] table —
  * composition of the engine's incremental-view-maintenance merge
  * (only mergeable measures, integer domains for money) with the
  * manifest log's atomic commits and txnId idempotence.
  *
  * Per batch: aggregate the batch (tiny — one micro-batch), read the
  * current view (group cells, not facts), merge, publish as a new
  * version with `txnId = mv-batch-<id>`. A checkpoint-recovery replay
  * of the same batch finds its txnId in the log and does nothing —
  * the merge is exactly-once even though it is read-modify-write.
  * Time travel gives the view's history for free (what did the
  * dashboard say at version N?).
  *
  * Scale shape: the facts stream through once and are never re-read;
  * the view table is one row per group cell. The whole-view rewrite
  * per batch is the honest cost of parquet immutability at this layer
  * (Delta pays it too under merge-on-write); size triggers
  * accordingly (seconds-scale batches want a key-partitioned variant,
  * not one commit per second).
  *
  * `measures` uses [[Incremental.mergeAggregates]]'s contract:
  * sum | min | max per measure column (counts merge as sums; money
  * should arrive as integer cents — see `Exact.centsSum`). */
object MaterializedView {

  /** `foreachBatch` body maintaining the view at `root`. The batch
    * frame must already be the PRE-AGGREGATED shape
    * (keys ++ measure columns): aggregate in the caller's stream
    * (`df.groupBy(...).agg(...)` with output mode "update"/"complete"
    * is NOT needed — aggregate inside the batch function instead,
    * keeping the stream stateless). */
  def mergeBatch(root: String, keys: Seq[String],
                 measures: Map[String, String])
      (batchAgg: DataFrame, batchId: Long): Unit = {
    val spark = batchAgg.sparkSession
    val merged =
      if (TxnLog.latestVersion(spark, root) < 0) batchAgg
      else Incremental.mergeAggregates(
        TxnLog.read(spark, root), batchAgg, keys, measures)
    // materialize BEFORE the overwrite commit: `merged` lazily reads
    // the current version, and writing a plan that reads the table
    // being replaced must resolve its input files first
    val frozen = merged.localCheckpoint(true)
    try { TxnLog.overwrite(frozen, root, Some(s"mv-batch-$batchId")); () }
    // the commit persisted the view to parquet — the checkpoint block
    // is dead; without this a long-running stream strands one block
    // per micro-batch
    finally graft.core.Checkpoints.releaseAll(frozen)
  }

  /** Current view contents (convenience). */
  def read(spark: org.apache.spark.sql.SparkSession, root: String): DataFrame =
    TxnLog.read(spark, root)
}
