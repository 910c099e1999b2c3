package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-micro-batch throughput metrics for any streaming query — the
  * ops surface behind backpressure decisions (is `maxFilesPerTrigger`/
  * `maxOffsetsPerTrigger` sized right? is processing rate keeping up
  * with input rate, or is lag building?).
  *
  * A [[StreamingQueryListener]] records (query, batch, rows, input
  * rows/s, processed rows/s, batch duration) into a bounded in-memory
  * ring (driver-side listener events are tiny; the cap guards a
  * weeks-long run from unbounded growth). `frame` exposes the ring as
  * a DataFrame for the usual analysis — join against expectations,
  * alert on processedRowsPerSecond < inputRowsPerSecond sustained.
  */
object StreamMetrics {
  final case class BatchMetric(queryName: String, batchId: Long, numInputRows: Long,
                               inputRowsPerSecond: Double, processedRowsPerSecond: Double,
                               batchDurationMs: Long)
}

final class StreamMetrics(maxEvents: Int = 10000) extends StreamingQueryListener {
  import StreamMetrics.BatchMetric
  require(maxEvents > 0, s"need maxEvents > 0, got $maxEvents")

  private val ring = new java.util.concurrent.ConcurrentLinkedDeque[BatchMetric]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    ring.addLast(BatchMetric(
      Option(p.name).getOrElse(p.id.toString), p.batchId, p.numInputRows,
      zeroIfNaN(p.inputRowsPerSecond), zeroIfNaN(p.processedRowsPerSecond),
      p.batchDuration))
    while (ring.size() > maxEvents) { ring.pollFirst(); () }
  }

  private def zeroIfNaN(d: Double): Double = if (d.isNaN || d.isInfinite) 0.0 else d

  /** Snapshot of the recorded batches as a frame. */
  def frame(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    ring.iterator().asScala.toSeq.toDF()
  }

  /** Batches where processing could not keep up with input — sustained
    * presence here means the trigger ingests more than the cluster
    * digests and lag is accumulating. */
  def laggingBatches(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions.col
    frame(spark).filter(col("processedRowsPerSecond") < col("inputRowsPerSecond"))
  }
}
