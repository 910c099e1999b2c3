package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release of the block-store entries behind
  * `localCheckpoint` frames.
  *
  * An eager local checkpoint is a plain persisted RDD; the
  * ContextCleaner frees it only after the *referencing JVM object* is
  * garbage-collected. Iterative operators (connected components,
  * PageRank) that checkpoint every round therefore strand dozens of
  * dead round-(N−1) blocks per call — harmless in a toy run, but a
  * production pipeline calling these operators back-to-back
  * accumulates orphaned blocks until the storage pool evicts working
  * cache (the round-6→7 bench drift, relocated inside the operators
  * in round 8). Each fixpoint loop instead releases round N−1 the
  * moment round N is materialized.
  *
  * Identification is by the frame's OWN plan — the `LogicalRDD`
  * leaves its lineage actually reads — never by diffing the context's
  * persistent-RDD registry, which would race against concurrent
  * queries on the same session (graft.Verify dumps four at a time).
  *
  * SAFETY: a local checkpoint has no lineage to recompute from, so
  * releasing one is only valid when the frame (and everything derived
  * from it lazily) will never be read again. Inside operators, this
  * releases superseded rounds. For RETURNED results, it is the
  * caller-side release: a checkpointed result frame
  * ([[graft.dedup.Dedup.nearDupClusters]], [[graft.operators.Graph]]
  * outputs) owns 1-3 blocks that otherwise live until the JVM handle
  * is garbage-collected — call `releaseAll(result)` when done
  * consuming it (composite results expose it as `release()`:
  * [[graft.pipeline.CorpusPipeline.Prepared]],
  * [[graft.dedup.Dedup.IncrementalNearDup]]). */
object Checkpoints {

  /** Unpersist every checkpoint/cached-scan RDD this frame's plan
    * reads. Blocking=false: eviction proceeds asynchronously; the ids
    * leave the persistent registry immediately. */
  def releaseAll(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case l: LogicalRDD => l.rdd
    }.distinct.foreach { r => r.unpersist(blocking = false); () }
}
