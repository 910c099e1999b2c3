package graft

import org.apache.spark.sql.functions._

import graft.operators.Inference

/** Executor-side invocation counter for failure-path tests (see the
  * retryOn test for why an accumulator can't count failed tasks). */
object InferenceSpecCounters {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Batched-inference plumbing contracts: batch shapes, per-partition
  * handle init, retry, and loud misalignment failure. */
class InferenceSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int, parts: Int) =
    spark.range(n).select(col("id").as("doc_id"),
      concat(lit("doc "), col("id")).as("text")).repartition(parts)

  test("scores align with ids through batching; batch sizes are bounded") {
    val batchSizes = spark.sparkContext.collectionAccumulator[Int]("bs")
    val model: Seq[String] => Seq[Double] = ts => {
      batchSizes.add(ts.length)
      ts.map(t => t.stripPrefix("doc ").toDouble / 100.0)
    }
    val out = Inference.batchScore(docs(10, 2), model, batchSize = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == (0 until 10).map(i => i.toLong -> i * 10000L).toMap)
    import scala.jdk.CollectionConverters._
    val sizes = batchSizes.value.asScala.toList
    assert(sizes.forall(_ <= 3), sizes.toString)
    assert(sizes.sum == 10)
  }

  test("heavy handles initialize once per partition, on the executor") {
    val inits = spark.sparkContext.longAccumulator("inits")
    val out = Inference.batchScoreWith(docs(20, 4), () => {
      inits.add(1) // runs inside mapPartitions — once per partition
      (ts: Seq[String]) => ts.map(_ => 1.0)
    }, batchSize = 2).collect()
    assert(out.length == 20)
    assert(inits.value == 4, s"expected 4 partition inits, got ${inits.value}")
  }

  test("a transient batch fault is retried once; persistent faults fail the task") {
    // partition-local flakiness: first call throws, retry succeeds
    val flaky: () => Seq[String] => Seq[Double] = () => {
      var first = true
      (ts: Seq[String]) => {
        if (first) { first = false; throw new RuntimeException("transient") }
        ts.map(_ => 0.5)
      }
    }
    val ok = Inference.batchScoreWith(docs(6, 1), flaky, batchSize = 10).collect()
    assert(ok.map(_.getLong(1)).toSet == Set(500000L))
    val broken: Seq[String] => Seq[Double] = _ => throw new RuntimeException("down")
    intercept[org.apache.spark.SparkException] {
      Inference.batchScore(docs(3, 1), broken).collect()
    }
  }

  test("retryOn=false: deterministic faults run ONCE and the original surfaces") {
    // accumulators from FAILED tasks never merge; local mode shares the
    // JVM, so a static counter sees the executor-side invocations
    InferenceSpecCounters.calls.set(0)
    val det: Seq[String] => Seq[Double] = _ => {
      InferenceSpecCounters.calls.incrementAndGet()
      throw new IllegalStateException("bad request 400")
    }
    val e = intercept[org.apache.spark.SparkException] {
      Inference.batchScoreWith(docs(3, 1), () => det, batchSize = 10,
        retryOn = _.isInstanceOf[java.io.IOException]).collect()
    }
    // one invocation per task ATTEMPT (Spark may retry the task itself;
    // local default is 1 attempt) — the point is no doubling per attempt
    assert(InferenceSpecCounters.calls.get() == 1,
      s"non-retryable fault invoked the model ${InferenceSpecCounters.calls.get()}x")
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e).exists(_.getMessage.contains("bad request 400")), e.getMessage)
  }

  test("a failed retry carries the FIRST failure as a suppressed cause") {
    val twice: () => Seq[String] => Seq[Double] = () => {
      var n = 0
      _ => { n += 1; throw new RuntimeException(s"attempt-$n") }
    }
    val e = intercept[org.apache.spark.SparkException] {
      Inference.batchScoreWith(docs(3, 1), twice, batchSize = 10).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    val withSuppressed = chain(e).find(_.getSuppressed.nonEmpty)
    assert(withSuppressed.isDefined,
      s"no exception in the chain carries a suppressed first attempt: $e")
    assert(withSuppressed.get.getMessage.contains("attempt-2"), withSuppressed.get.getMessage)
    assert(withSuppressed.get.getSuppressed.head.getMessage.contains("attempt-1"))
  }

  test("the same operator scores a STREAM unchanged (mapPartitions is streaming-safe)") {
    // the scoring path a streaming ingest pipeline needs is the batch
    // operator verbatim: mapPartitions + per-partition init compose
    // with micro-batches without a separate streaming implementation
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val scored = Inference.batchScore(
      input.toDF().toDF("doc_id", "text"),
      Inference.hashScoreModel, batchSize = 4)
    val q = scored.writeStream.format("memory").queryName("inf_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, "alpha"), (2L, "beta"))
      q.processAllAvailable()
      input.addData((3L, "gamma"))
      q.processAllAvailable()
      val got = spark.table("inf_stream").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = Seq(1L -> "alpha", 2L -> "beta", 3L -> "gamma").map {
        case (id, t) => id -> math.round(Inference.hashScoreModel(Seq(t)).head * 1e6)
      }.toMap
      assert(got == want)
    } finally q.stop()
  }

  test("a model returning the wrong count fails loudly with the id range") {
    val lossy: Seq[String] => Seq[Double] = ts => ts.drop(1).map(_ => 0.0)
    val e = intercept[org.apache.spark.SparkException] {
      Inference.batchScore(docs(4, 1), lossy, batchSize = 4).collect()
    }
    assert(e.getMessage.contains("3 scores for 4 inputs") ||
      Option(e.getCause).exists(_.getMessage.contains("3 scores for 4 inputs")),
      e.getMessage)
  }
}
