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
  * Execution shape: the near-dup connected-components fixpoint is
  * inherently eager (driver-coordinated rounds), and `prepare` rides
  * that eagerness to shingle the corpus exactly ONCE — the MinHash
  * signature frame (which carries each doc's distinct-shingle set) is
  * loan-scope persisted and feeds BOTH the LSH dedup and the
  * decontamination overlap join, instead of re-tokenizing the full
  * corpus per stage. Only narrow id lists are materialized inside the
  * scope; the returned stage frames stay lazy over those lists plus
  * the caller's `docs`, so no cache outlives the call.
  */
object CorpusPipeline {

  /** Stage frames — lazy over `docs` plus the narrow id lists
    * `prepare` materialized; act on whichever you need. `packed` is the
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
    // One shingling/minhash pass feeds dedup AND decontamination: the
    // signature frame carries (doc_id, shingles, sig). Persist for the
    // scope of the two consumers; everything that reads it (the CC
    // fixpoint's eager rounds, the narrow id-list checkpoints below)
    // materializes before the unpersist, so nothing leaks.
    val sigs = Dedup.minhashSignatures(filtered, textCol = textCol, idCol = idCol)
    sigs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (deduped, decontaminated) =
      try {
        // identical construction to Dedup.dedupCorpus/minhashNearDups
        // (same k/bands/bucket-cap defaults), minus its private scoped
        // cache — `sigs` is our loan here
        val pairs = Dedup.verifyJaccard(
            Dedup.lshCandidates(Dedup.lshBands(sigs),
              Some(Dedup.DefaultBucketCap)), sigs)
          .filter(col("jaccard") >= minJaccard)
          .select("doc_a", "doc_b")
        // eager fixpoint; consumes the cached sigs, returns stars over
        // its own checkpointed edge set (no sigs lineage)
        val dupIds = Dedup.nearDupClusters(pairs)
          .filter(col("doc_id") =!= col("cluster_id"))
          .select(col("doc_id"))
        val deduped0 = filtered.join(
          dupIds.withColumnRenamed("doc_id", idCol), Seq(idCol), "left_anti")
        val decon0 = evalDocs match {
          case Some(ev) =>
            // decontamination reads the PRECOMPUTED shingle sets
            // instead of re-shingling the deduped text. Deduped docs
            // too short to shingle (possible only when minTokens < 3)
            // have no sigs row; a left join + empty-set default keeps
            // them at contamination 0.0, exactly as re-shingling would.
            // The clean-id list is narrow, checkpointed eagerly inside
            // the loan scope so the returned frame carries no sigs
            // lineage.
            val testShingles = filtered.select(col(idCol).as("doc_id"))
              .join(dupIds, Seq("doc_id"), "left_anti")
              .join(sigs.select(col("doc_id"), col("shingles")), Seq("doc_id"), "left")
              .select(col("doc_id"),
                coalesce(col("shingles"), lit(Array.empty[String])).as("shingles"))
            val cleanIds = TextFunctions
              .contaminationOfSets(train = ev, testShingles, textCol)
              .filter(col("contamination") <= maxEvalOverlap)
              .select(col("doc_id").as(idCol))
              .localCheckpoint(true)
            deduped0.join(cleanIds, Seq(idCol), "left_semi")
          case None => deduped0
        }
        (deduped0, decon0)
      } finally { sigs.unpersist(blocking = false); () }
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
