package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.TextFunctions

/** One-call LLM training-corpus preparation, composing the engine's
  * data operators in the canonical order:
  *
  *  1. quality gate — [[TextFunctions.corpusFilter]]: length floor,
  *     exact-duplicate representative, repetition dominance;
  *  2. near-duplicate removal — [[Dedup.dedupCorpus]]: MinHash+LSH
  *     candidate pairs, exact-Jaccard verify, connected components,
  *     keep each cluster's minimum id;
  *  3. benchmark decontamination (optional) — drop documents whose
  *     3-gram overlap with a held-out eval set exceeds
  *     `maxEvalOverlap` ([[TextFunctions.contamination]] with the eval
  *     set as the reference corpus);
  *  4. sequence packing — [[TextFunctions.packDocuments]] into fixed
  *     `windowTokens` context windows across `nShards` parallel
  *     shards.
  *
  * Every stage is a lazy DataFrame transform — nothing executes until
  * the caller acts on a stage frame, so intermediate counts are
  * opt-in, and Catalyst sees the whole composition.
  */
object CorpusPipeline {

  /** Lazy stage frames; act on whichever you need. `packed` is the
    * training-ready output: (doc_id, shard, n_tokens, start_tok,
    * bin_id, offset_in_bin) joined back to the text. */
  final case class Prepared(
      filtered: DataFrame,
      deduped: DataFrame,
      decontaminated: DataFrame,
      packed: DataFrame)

  def prepare(docs: DataFrame,
              evalDocs: Option[DataFrame] = None,
              minTokens: Int = 20,
              maxTopGramFrac: Double = 0.2,
              minJaccard: Double = 0.8,
              maxEvalOverlap: Double = 0.1,
              windowTokens: Int = 2048,
              nShards: Int = 32,
              textCol: String = "text",
              idCol: String = "doc_id"): Prepared = {
    val keepIds = TextFunctions
      .corpusFilter(docs, minTokens, maxTopGramFrac, textCol, idCol)
      .filter(col("keep")).select(col("doc_id").as(idCol))
    val filtered = docs.join(keepIds, Seq(idCol), "left_semi")
    val deduped = Dedup.dedupCorpus(filtered, minJaccard, textCol, idCol)
    val decontaminated = evalDocs match {
      case Some(ev) =>
        val cleanIds = TextFunctions
          .contamination(train = ev, test = deduped, textCol, idCol)
          .filter(col("contamination") <= maxEvalOverlap)
          .select(col("doc_id").as(idCol))
        deduped.join(cleanIds, Seq(idCol), "left_semi")
      case None => deduped
    }
    val packed = TextFunctions
      .packDocuments(decontaminated, windowTokens, nShards, textCol, idCol)
      .join(decontaminated.select(col(idCol).as("doc_id"), col(textCol)), "doc_id")
    Prepared(filtered, deduped, decontaminated, packed)
  }

  /** Domain-weighted corpus mixing: keep each source's documents at
    * its configured rate (percent, deterministic by document id — see
    * [[graft.operators.Sampling.stratified]]), the knob used to hit a
    * per-domain token budget when assembling a training mix (e.g.
    * upsample curated sources, downsample crawl). Sources absent from
    * `weights` keep `defaultPct`.
    *
    * Pure map-side filter — no shuffle; the rate predicate is an
    * md5-derived bucket, so re-running over a grown corpus keeps
    * exactly the previously-kept documents (stable mixes across
    * snapshots). */
  def mixSources(docs: DataFrame, weights: Map[String, Int],
                 defaultPct: Int = 0, salt: String = "",
                 sourceCol: String = "source",
                 idCol: String = "doc_id"): DataFrame =
    graft.operators.Sampling.stratified(docs, idCol, sourceCol, weights, defaultPct, salt)
}
