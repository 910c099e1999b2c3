package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data VALUATION: exact closed-form Shapley values of
  * training points under a K-nearest-neighbor utility (Jia et al.,
  * "Efficient Task-Specific Data Valuation for Nearest Neighbor
  * Algorithms", VLDB 2019, Theorem 1) — the standard data-selection
  * signal for "which training documents actually help this eval set",
  * computable exactly in O(N log N) per test point instead of the
  * 2^N of general Shapley.
  *
  * Per test point, rank training points by similarity; with
  * a_i = 1[label_i = test label] the recurrence
  *
  *   s_N = a_N / N
  *   s_i = s_{i+1} + (a_i − a_{i+1}) · min(K,i) / (K·i)
  *
  * assigns each training point its exact marginal contribution to
  * KNN accuracy on that test point; summing over the test set gives
  * the dataset-level value. Steps are accumulated in integer
  * micro-units (each rational term floor-divided once at 10^-12
  * resolution — deterministic, engine-portable; error per term
  * < 10^-12, never compounding through the suffix sum, which is
  * exact integer addition).
  *
  * Scale shape: the test set broadcasts (bounded, like every query
  * set in [[graft.similarity.Similarity]]); train embeddings are
  * scored map-side and only (q_id, vec_id, cos, label bits) enter
  * the per-test-point rank exchange — embeddings never cross it. The
  * per-test ranking is the same window shape as brute-force top-k;
  * for corpus-scale valuation, pre-prune candidates with an ANN
  * screen (ivfTopK) and value only the retrieved neighborhood (the
  * paper's own large-N recipe: s_i decays as 1/i, so far points
  * contribute ~0).
  */
object Valuation {

  /** @param train (vec_id, embedding, label)
    * @param test  (q_id, q_emb, q_label) — bounded; broadcast
    * @return (vec_id, shapley_micros): per training point, the sum
    *         over test points of its KNN-Shapley value in 10^-12
    *         units. */
  def knnShapley(train: DataFrame, test: DataFrame, k: Int = 5,
                 micro: Long = 1000000000000L): DataFrame = {
    import graft.similarity.Similarity.{dot, norm}
    val scored = train.crossJoin(broadcast(test))
      .select(col("vec_id"), col("q_id"),
        (col("label") === col("q_label")).cast("int").as("a"),
        round(dot(col("embedding"), col("q_emb")) /
          (norm(col("embedding")) * norm(col("q_emb"))), 9).as("cos"))
    shapleyFromScored(scored, k, micro)
  }

  /** The closed-form recurrence over an already-scored candidate
    * frame (vec_id, q_id, a, cos) — shared by the exact path (every
    * train point scored) and the ANN-screened path (only the
    * retrieved neighborhood scored, n = the per-test candidate
    * count). */
  private def shapleyFromScored(scored: DataFrame, k: Int,
                                micro: Long): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val byRank = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val ranked = scored
      .withColumn("rnk", row_number().over(byRank))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("q_id"))))
      .withColumn("a_next", lead(col("a"), 1).over(byRank))
    // per-row contribution: the base term at rank N, the recurrence
    // step elsewhere; each is ONE integral division of POSITIVE
    // integers (`div`, sign applied outside), where truncation and
    // floor coincide — so Spark's `div` and the oracle's `//` agree
    // bit-for-bit (a double-rounded floor(x/y) would not, at
    // quotients within one ulp of an integer)
    val stepMag = expr(
      s"(CAST($micro AS BIGINT) * least($k, rnk)) div (${k.toLong} * rnk)")
    val contrib = when(col("a_next").isNull,
        expr(s"(CAST(a AS BIGINT) * $micro) div n"))
      .otherwise(signum(col("a") - col("a_next")).cast("long") * stepMag)
    val suffix = Window.partitionBy(col("q_id"))
      .orderBy(col("rnk").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked.withColumn("c", contrib)
      .withColumn("s", sum(col("c")).over(suffix))
      .groupBy(col("vec_id"))
      .agg(sum(col("s")).as("shapley_micros"))
  }

  /** Corpus-scale KNN-Shapley: ANN-SCREEN the train set per test
    * point, then value only the retrieved neighborhood — the paper's
    * own large-N recipe (s_i decays as 1/i, so far points contribute
    * ~0; with screenK ≫ k the truncation error is the tail sum
    * ≤ micro/screenK per dropped point). The screen is the
    * coarse-to-fine JL projection
    * ([[graft.similarity.Similarity.projectedRerankTopK]]): integer
    * projected dot prunes the corpus to `coarseK` per query, exact
    * cosine re-ranks to `screenK` — deterministic plane literals, so
    * the whole chain replays in SQL and the oracle can restate it.
    *
    * EXACTNESS INVARIANT (the spec's proof shape, mirroring
    * `sim_ivf_kmeans`'s full-probe oracle): with screenK ≥ N and
    * coarseK ≥ N the screen retains everything and the result is
    * IDENTICAL to [[knnShapley]].
    *
    * Scale shape: embeddings never cross an exchange — the coarse
    * stage shuffles (q_id, vec_id, score) triples, the survivors
    * broadcast back, and the valuation window partitions hold at most
    * `screenK` rows per test point (vs the FULL train set in the
    * exact path — the window shape that would serialize at 100 TB).
    * Valuation semantics are "exact Shapley restricted to the
    * retrieved candidate set": each recurrence runs with n = that
    * test point's candidate count. */
  def knnShapleyScreened(train: DataFrame, test: DataFrame, k: Int = 5,
                         screenK: Int = 50, dim: Int = 64, outDim: Int = 32,
                         coarseK: Int = 100,
                         micro: Long = 1000000000000L): DataFrame = {
    require(screenK >= k, s"need screenK >= k, got $screenK < $k")
    val screened = graft.similarity.Similarity.projectedRerankTopK(
      train.select(col("vec_id"), col("embedding")),
      test.select(col("q_id"), col("q_emb")),
      dim = dim, outDim = outDim, coarseK = coarseK, k = screenK)
    // labels ride in narrow: the tiny screened pair list broadcasts
    // onto the train projection (vec_id, label) — embeddings stay out
    val scored = train.select(col("vec_id"), col("label"))
      .join(broadcast(screened.select(col("q_id"), col("vec_id"), col("cos"))),
        "vec_id")
      .join(broadcast(test.select(col("q_id"), col("q_label"))), "q_id")
      .select(col("vec_id"), col("q_id"),
        (col("label") === col("q_label")).cast("int").as("a"), col("cos"))
    shapleyFromScored(scored, k, micro)
  }
}
