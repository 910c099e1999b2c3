package graft

import org.apache.spark.sql.functions._

import graft.operators.Valuation

/** KNN-Shapley: the closed-form recurrence must equal the
  * DEFINITIONAL Shapley value (enumeration over all coalitions) of
  * the KNN utility, and carry over multiple test points additively. */
class ValuationSpec extends SparkSpec {
  import spark.implicits._

  private val K = 2

  // 6 training points at distinct cosines to the single test point,
  // labels mixed; 2-dim embeddings keep the geometry legible
  private val trainPts: Seq[(Long, Array[Float], Int)] = Seq(
    (10L, Array(1.0f, 0.1f), 0),
    (11L, Array(1.0f, 0.3f), 1),
    (12L, Array(1.0f, 0.7f), 0),
    (13L, Array(0.5f, 1.0f), 1),
    (14L, Array(0.1f, 1.0f), 1),
    (15L, Array(-0.4f, 1.0f), 0))
  private val q: (Long, Array[Float], Int) = (0L, Array(1.0f, 0.0f), 0)

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    d / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
  }

  /** v(S) = fraction of the ≤K nearest members of S matching the test
    * label — the utility the closed form is exact for. */
  private def utility(s: Set[Long]): Double = {
    if (s.isEmpty) return 0.0
    val ranked = trainPts.filter(p => s.contains(p._1))
      .sortBy(p => (-cosine(p._2, q._2), p._1))
    ranked.take(K).count(_._3 == q._3).toDouble / K
  }

  private def enumShapley(i: Long): Double = {
    val others = trainPts.map(_._1).filterNot(_ == i)
    val n = trainPts.size
    def fact(x: Int): Double = (1 to x).product.toDouble
    others.indices.inclusive.flatMap { sz =>
      others.combinations(sz).map { sSeq =>
        val s = sSeq.toSet
        fact(s.size) * fact(n - s.size - 1) / fact(n) *
          (utility(s + i) - utility(s))
      }
    }.sum
  }

  test("closed-form recurrence equals definitional Shapley enumeration") {
    val train = trainPts.toDF("vec_id", "embedding", "label")
    val test = Seq(q).toDF("q_id", "q_emb", "q_label")
    val got = Valuation.knnShapley(train, test, k = K)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    trainPts.foreach { case (id, _, _) =>
      val want = enumShapley(id)
      val gotV = got(id) / 1e12
      assert(math.abs(gotV - want) < 1e-6,
        s"point $id: closed-form $gotV vs enumeration $want")
    }
    // efficiency: values sum to v(full) - v(empty)
    val total = got.values.sum / 1e12
    assert(math.abs(total - utility(trainPts.map(_._1).toSet)) < 1e-6, total)
  }

  test("screened path with screenK >= N is IDENTICAL to the exact path") {
    // the full-retention invariant (same proof shape as the full-probe
    // IVF oracle): when the screen keeps everything, restricting the
    // valuation to the retrieved neighborhood restricts nothing
    val train = trainPts.map { case (id, emb, l) =>
      (id, emb ++ Array.fill(62)(0.0f), l) // pad to the 64-dim default
    }.toDF("vec_id", "embedding", "label")
    val test = Seq((q._1, q._2 ++ Array.fill(62)(0.0f), q._3))
      .toDF("q_id", "q_emb", "q_label")
    val exact = Valuation.knnShapley(train, test, k = K)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val screened = Valuation.knnShapleyScreened(train, test, k = K,
      screenK = trainPts.size, coarseK = trainPts.size)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(screened == exact, s"screened $screened vs exact $exact")
  }

  test("screened valuation windows hold at most screenK candidates per test point") {
    // 40 train points, screenK=8: every per-test-point candidate set —
    // the rank-window partition — is capped at screenK, the property
    // that keeps the window shape safe at corpus scale
    val train = (10 until 50).map { i =>
      (i.toLong, Array.tabulate(64)(d => ((i * 7 + d) % 13 - 6) / 6.0f), i % 3)
    }.toDF("vec_id", "embedding", "label")
    val test = (0 until 3).map { i =>
      (i.toLong, Array.tabulate(64)(d => ((i * 11 + d) % 13 - 6) / 6.0f), i % 3)
    }.toDF("q_id", "q_emb", "q_label")
    val screened = Valuation.knnShapleyScreened(train, test, k = 2,
      screenK = 8, coarseK = 16)
    // valued points ⊆ train, and each test point contributed ≤ screenK
    // candidates: with 3 test points no vec_id can be valued unless
    // screened, and the union of 3 screens caps at 24 distinct ids
    val ids = screened.collect().map(_.getLong(0)).toSet
    assert(ids.size <= 24, s"${ids.size} valued ids exceed 3 x screenK")
    assert(ids.forall(i => i >= 10 && i < 50))
    // the restricted-n semantics: per test point the recurrence ran
    // over exactly screenK rows — total |sc| = 3 x 8 (checked through
    // the deterministic replay of the screen itself)
    import graft.similarity.Similarity
    val pairs = Similarity.projectedRerankTopK(
      train.select(col("vec_id"), col("embedding")),
      test.select(col("q_id"), col("q_emb")), dim = 64, outDim = 32,
      coarseK = 16, k = 8)
    val perQ = pairs.groupBy(col("q_id")).count()
      .collect().map(_.getLong(1))
    assert(perQ.forall(_ <= 8), perQ.mkString(","))
  }

  test("multiple test points sum additively") {
    val train = trainPts.toDF("vec_id", "embedding", "label")
    val q2: (Long, Array[Float], Int) = (1L, Array(0.0f, 1.0f), 1)
    val both = Seq(q, q2).toDF("q_id", "q_emb", "q_label")
    val one = Valuation.knnShapley(train, Seq(q).toDF("q_id", "q_emb", "q_label"), k = K)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = Valuation.knnShapley(train, Seq(q2).toDF("q_id", "q_emb", "q_label"), k = K)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sum = Valuation.knnShapley(train, both, k = K)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    trainPts.foreach { case (id, _, _) =>
      assert(sum(id) == one(id) + two(id), s"point $id not additive")
    }
  }
}
