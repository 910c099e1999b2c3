package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Engine-side plumbing for BATCHED external-model inference — the
  * "run a scorer over every document" step of a curation pipeline
  * (quality classifiers, reward models, toxicity filters). The model
  * is a black box `Seq[String] => Seq[Double]`; the engine's job is
  * everything around it:
  *
  *  - **per-partition handle init**: [[batchScoreWith]] takes an
  *    `init: () => model` thunk invoked ONCE per partition on the
  *    executor, so heavy handles (a tokenizer, an ONNX session, an
  *    HTTP client) are never serialized from the driver and never
  *    rebuilt per batch;
  *  - **bounded batches**: rows stream through `grouped(batchSize)` —
  *    peak memory per task is one batch of texts + scores, never the
  *    partition;
  *  - **contract enforcement**: a model returning the wrong count for
  *    a batch fails THAT task loudly with the batch's id range named
  *    (a silent zip would misalign every later row in the partition);
  *  - **one retry per batch** before failing, for models with
  *    transient faults (the HTTP case); deterministic models pay
  *    nothing.
  *
  * Scale shape: pure `mapPartitions` — no shuffle, no driver
  * round-trip; parallelism is the input's partitioning (repartition
  * upstream to match the model's throughput × executor count). This
  * is the same per-row-JVM-work niche as the multimodal codecs —
  * the one place `mapPartitions` beats expressions. */
object Inference {

  /** (doc_id, score_micros): scores carried as integer micro-units so
    * downstream thresholds and oracles compare exactly. */
  final case class ScoredDoc(doc_id: Long, score_micros: Long)

  def batchScore(df: DataFrame, model: Seq[String] => Seq[Double],
                 batchSize: Int = 64, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame =
    batchScoreWith(df, () => model, batchSize, textCol, idCol)

  /** `retryOn` gates the one-shot retry: a batch whose first invocation
    * throws `e` is re-invoked only when `retryOn(e)` — callers with a
    * real HTTP scorer pass a transient-fault predicate (timeouts,
    * 5xx) so a DETERMINISTIC failure doesn't run its side effects
    * twice. The default retries everything, matching the documented
    * "one retry per batch" contract for models whose faults are
    * transient by assumption. Either way the FIRST failure is never
    * discarded: a retry that also fails rethrows the second exception
    * with the first attached as a suppressed cause, so the task log
    * shows both attempts. */
  def batchScoreWith(df: DataFrame, init: () => Seq[String] => Seq[Double],
                     batchSize: Int = 64, textCol: String = "text",
                     idCol: String = "doc_id",
                     retryOn: Throwable => Boolean = _ => true): DataFrame = {
    require(batchSize >= 1, s"need batchSize >= 1, got $batchSize")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val model = init() // once per partition, on the executor
        it.grouped(batchSize).flatMap { batch =>
          val texts = batch.map(_._2)
          val scores =
            try model(texts)
            catch {
              case scala.util.control.NonFatal(first) if retryOn(first) =>
                try model(texts) // one retry
                catch {
                  case scala.util.control.NonFatal(second) =>
                    second.addSuppressed(first)
                    throw second
                }
            }
          require(scores.length == batch.length,
            s"model returned ${scores.length} scores for ${batch.length} " +
              s"inputs (ids ${batch.head._1}..${batch.last._1})")
          batch.lazyZip(scores).map { case ((id, _), s) =>
            ScoredDoc(id, math.round(s * 1e6))
          }
        }
      }
      .toDF()
  }

  /** Deterministic stand-in model: score in [0, 1) derived from the
    * 60-bit md5 prefix of the text — the oracle-replayable fake that
    * exercises the batching plumbing end-to-end (real deployments
    * swap in their scorer via `init`). */
  val hashScoreModel: Seq[String] => Seq[Double] = texts =>
    texts.map { t =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % 1000000L) / 1e6
    }
}
