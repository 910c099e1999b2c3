package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a lexical ranking
  * (BM25) with a dense-vector ranking (embedding cosine) is the
  * standard two-tower serving shape, and reciprocal-rank fusion is
  * the standard way to combine them without score calibration
  * (Cormack, Clarke & Buettcher, "Reciprocal Rank Fusion outperforms
  * Condorcet and individual Rank Learning Methods", SIGIR 2009:
  * score(d) = Σ_lists 1/(K + rank_d), K = 60).
  *
  * Reference scope: the reference's serving layer exposes only
  * single-ranker queries (`models/marts` aggregates); fusion is part
  * of this library's retrieval extension tier alongside
  * [[graft.functions.TextFunctions.bm25Search]] and
  * [[graft.similarity.Similarity]].
  */
object Fusion {

  /** Fuse ranked lists by reciprocal rank. Each input frame is one
    * ranking: `(idCol, rankCol)` with 1-based ranks from that
    * ranker's own top-k (anything else it carries is ignored). The
    * per-list contribution 1/(rrfK + rank) is carried in integer
    * millionths via floor division, so the fused score is an exact
    * integer sum — order-independent and engine-portable (the double
    * form would sum order-sensitively and never hash stably).
    *
    * Returns `(doc_id, n_lists, rrf_fp, rank)`: how many lists
    * retrieved the doc, its fused fixed-point score, and its fused
    * rank (ties broken by doc_id), limited to `topK`.
    *
    * Scale shape: inputs are top-k lists — bounded by construction by
    * each ranker's own TakeOrdered — so the fusion is a union of tiny
    * frames, one hash aggregate on ids, and a TakeOrderedAndProject.
    * Cost is O(Σ k·lists) regardless of corpus size; the rank window
    * runs over the already-limited ≤ topK rows. */
  def rrfFuse(rankings: Seq[DataFrame], topK: Int, rrfK: Int = 60,
              idCol: String = "doc_id", rankCol: String = "rank"): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(topK > 0 && rrfK >= 0, s"bad constants topK=$topK rrfK=$rrfK")
    val contrib = rankings.map(_.select(
        col(idCol).cast("long").as("doc_id"),
        expr(s"CAST(1000000 AS BIGINT) div ($rrfK + CAST($rankCol AS BIGINT))")
          .as("rrf_fp")))
      .reduce(_ unionAll _)
    val fused = contrib.groupBy("doc_id")
      .agg(count(lit(1)).as("n_lists"), sum(col("rrf_fp")).as("rrf_fp"))
      .orderBy(col("rrf_fp").desc, col("doc_id").asc)
      .limit(topK)
    // single-partition window over ≤ topK rows — bounded by the limit
    fused.withColumn("rank", row_number()
        .over(Window.orderBy(col("rrf_fp").desc, col("doc_id").asc))
        .cast("bigint"))
      .select("doc_id", "n_lists", "rrf_fp", "rank")
  }
}
