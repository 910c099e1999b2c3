package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Post-execution plan metrics — the numbers that matter when a query
  * moves from local testing to a 1000-executor cluster: how much was
  * shuffled, whether anything spilled, how many files the scans
  * touched. Reads the executed plan's SQL metrics after driving the
  * query, descending through AQE stage wrappers.
  */
object Metrics {

  final case class PlanMetrics(
      rowsOut: Long,
      shuffleBytesWritten: Long,
      shuffleRecordsWritten: Long,
      spillBytesDisk: Long,
      spillBytesMemory: Long,
      filesRead: Long,
      scanRowsRead: Long) {
    def spilled: Boolean = spillBytesDisk > 0
  }

  /** Drive `df`'s own query execution to completion (full output
    * materialization) and sum its plan-tree metrics. */
  def measure(df: DataFrame): PlanMetrics = {
    val rows = df.queryExecution.toRdd.count()
    val nodes = scala.collection.mutable.ArrayBuffer.empty[SparkPlan]
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def walk(p: SparkPlan): Unit = if (seen.add(p)) {
      nodes += p
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        // ReusedExchangeExec points back at an exchange subtree that is
        // already reachable from its own branch; counting it again would
        // inflate shuffle/scan sums (identity-dedup makes the revisit a
        // no-op even when the reuse target sits in a later sibling).
        case r: ReusedExchangeExec => walk(r.child)
        case other => other.children.foreach(walk)
      }
    }
    walk(df.queryExecution.executedPlan)
    def sumOf(keys: String*): Long = nodes.flatMap(_.metrics).collect {
      case (name, m) if keys.contains(name) && m.value > 0 => m.value
    }.sum
    PlanMetrics(
      rowsOut = rows,
      shuffleBytesWritten = sumOf("shuffleBytesWritten", "bytesWritten"),
      shuffleRecordsWritten = sumOf("shuffleRecordsWritten", "recordsWritten"),
      spillBytesDisk = sumOf("spillSize", "diskBytesSpilled"),
      spillBytesMemory = sumOf("memoryBytesSpilled"),
      filesRead = sumOf("numFiles"),
      scanRowsRead = nodes.collect {
        case s if s.nodeName.contains("Scan") =>
          s.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
      }.sum)
  }

  /** Like [[measure]], but sums task metrics across EVERY job the
    * evaluation triggers, via a stage listener. The plan-walk in
    * [[measure]] sees only the final query's executed plan — an
    * iterative operator (connected components, PageRank, a pipeline
    * with `localCheckpoint` rounds) does most of its shuffling in
    * earlier jobs whose plans are gone by the time the result
    * materializes, so plan-walk volumes under-report exactly the
    * operators whose scaling most needs attribution. `filesRead` is
    * not a task metric; it is taken from the final plan as before.
    *
    * Only this query may be executing on the session while measuring —
    * a concurrent job's stages would be counted too (fine in Bench,
    * which is strictly sequential).
    *
    * `df` is BY-NAME, and that is load-bearing: the eager fixpoint
    * operators (connected components, PageRank, the corpus pipeline)
    * run most of their jobs while the query CONSTRUCTOR evaluates, so
    * a by-value parameter would finish those jobs before the listener
    * registers and attribute near-zero volumes to exactly the queries
    * whose attribution matters most (the round-8 128-row ghosts).
    * Requires an active session (the listener must attach before the
    * frame exists). */
  def measureAllJobs(df: => DataFrame): PlanMetrics = {
    import java.util.concurrent.atomic.AtomicLong
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    val sc = org.apache.spark.sql.SparkSession.active.sparkContext
    val shufB = new AtomicLong; val shufR = new AtomicLong
    val spillD = new AtomicLong; val spillM = new AtomicLong
    val inRecs = new AtomicLong
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shufB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          spillD.addAndGet(m.diskBytesSpilled)
          spillM.addAndGet(m.memoryBytesSpilled)
          inRecs.addAndGet(m.inputMetrics.recordsRead)
        }
      }
    }
    sc.addSparkListener(listener)
    val planSide =
      try {
        val r = measure(df) // by-name: constructor-time jobs count too
        org.apache.spark.GraftListenerAccess.waitUntilListenerBusEmpty(sc)
        r
      } finally sc.removeSparkListener(listener)
    PlanMetrics(
      rowsOut = planSide.rowsOut,
      shuffleBytesWritten = shufB.get(),
      shuffleRecordsWritten = shufR.get(),
      spillBytesDisk = spillD.get(),
      spillBytesMemory = spillM.get(),
      filesRead = planSide.filesRead,
      scanRowsRead = inRecs.get())
  }
}
