package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting + the leakage audit that makes a
  * split trustworthy.
  *
  * A train/val/test split for model training has two requirements a
  * `randomSplit` can't give: (1) DETERMINISM — re-running over a
  * grown corpus must keep every previously-assigned document in its
  * split (eval sets are annotated, cached, and compared across
  * snapshots; a reshuffling split invalidates all of it), and (2) a
  * LEAKAGE audit — a val/test document whose near-duplicate sits in
  * train is evaluated on memorized content, inflating every metric.
  * Exact-duplicate checks miss this; the audit needs the near-dup
  * machinery ([[graft.dedup.Dedup.crossNearDups]]).
  */
object Splits {

  /** Salted md5 split: bucket = md5(id · salt) mod 100, `val` below
    * `valPct`, `test` in the next `testPct`, `train` above. Pure
    * map-side projection (no shuffle); same derivation as
    * [[Sampling.hashBucket]], so any engine replays the assignment
    * and a grown corpus keeps prior members in place. */
  def hashSplit(df: DataFrame, idCol: String = "doc_id",
                salt: String = "split", valPct: Int = 10,
                testPct: Int = 10): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct < 100,
      s"need valPct + testPct < 100, got $valPct + $testPct")
    val bucket = Sampling.hashBucket(col(idCol), salt)
    df.withColumn("split",
      when(bucket < valPct, lit("val"))
        .when(bucket < valPct + testPct, lit("test"))
        .otherwise(lit("train")))
  }

  /** Eval→train leakage audit: every val/test document with a
    * near-duplicate (exact Jaccard ≥ `minJaccard` over the MinHash-LSH
    * candidates) in train, with the leaking train partner and the
    * score — the within-corpus twin of benchmark decontamination
    * (which guards against EXTERNAL eval sets). Returns
    * (doc_id, split, train_partner, n_inter, n_union, jaccard).
    *
    * Scale shape: inherits [[graft.dedup.Dedup.crossNearDups]] —
    * candidates only ACROSS the boundary (never the train×train
    * quadratic), narrow band shuffles, per-side bucket caps; the
    * FLAGGED pair list (leaked pairs only — tiny at any sane leak
    * rate, so AQE broadcasts it back onto the eval projection at
    * runtime; a pathological all-leaked corpus degrades to a shuffle
    * join instead of an OOM'd forced broadcast) picks up the split
    * label last. */
  def splitLeakage(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", salt: String = "split",
                   valPct: Int = 10, testPct: Int = 10,
                   minJaccard: Double = 0.8): DataFrame = {
    val s = hashSplit(docs, idCol, salt, valPct, testPct)
    leakageTail(s.filter(col("split") === "train").select(col(idCol), col(textCol)),
      s.filter(col("split") =!= "train"), idCol, textCol, minJaccard)
  }

  /** Audit an EXTERNAL split assignment — [[graft.dedup.Dedup
    * .leakageSafeSplit]]'s cluster-unit output (which must audit
    * CLEAN: no near-dup pair can straddle a cluster-unit boundary —
    * the coherence spec pins it), or a legacy split inherited from
    * elsewhere. `splits` is the narrow (idCol, split) table,
    * "train" vs anything else; the doc sides are formed by semi-joins
    * against its id lists (AQE broadcasts them when they fit). Same
    * output shape as [[splitLeakage]]. */
  def auditSplit(docs: DataFrame, splits: DataFrame,
                 idCol: String = "doc_id", textCol: String = "text",
                 minJaccard: Double = 0.8): DataFrame = {
    val train = docs.join(
      splits.filter(col("split") === "train").select(idCol), Seq(idCol), "left_semi")
      .select(col(idCol), col(textCol))
    val eval = docs.join(
      splits.filter(col("split") =!= "train").select(idCol), Seq(idCol), "left_semi")
      .select(col(idCol), col(textCol))
      .join(splits.select(col(idCol), col("split")), Seq(idCol))
    leakageTail(train, eval, idCol, textCol, minJaccard)
  }

  private def leakageTail(train: DataFrame, eval: DataFrame, idCol: String,
                          textCol: String, minJaccard: Double): DataFrame = {
    val pairs = graft.dedup.Dedup.crossNearDups(
        train, eval.select(col(idCol), col(textCol)),
        textCol = textCol, idCol = idCol)
      .filter(col("jaccard") >= minJaccard)
    eval.select(col(idCol), col("split"))
      .join(pairs.select(col("doc_b").as(idCol),
        col("doc_a").as("train_partner"),
        col("n_inter"), col("n_union"), col("jaccard")), idCol)
      .select(col(idCol), col("split"), col("train_partner"),
        col("n_inter"), col("n_union"), col("jaccard"))
  }
}
