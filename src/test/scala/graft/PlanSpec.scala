package graft

/** Physical-plan regression guards: the scale-critical plan shapes
  * (broadcasts, pushdown, map-side window limits) must survive
  * refactors. String-level assertions on explain output are coarse but
  * catch the failure modes that matter (a broadcast silently becoming
  * a shuffle, a filter no longer reaching the scan).
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("zone_enrich: both lookup joins broadcast, no shuffle exchange") {
    val p = plan("zone_enrich")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2, p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("fact_trip: all three dim joins broadcast") {
    val p = plan("fact_trip")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
  }

  test("sim_pq: codebook and distance-table joins broadcast, never sort-merge") {
    val p = plan("sim_pq")
    assert(!p.contains("SortMergeJoin"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }

  test("q1_agg: partial aggregation before the exchange") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
  }

  test("window_topk: rank filter bounded map-side by WindowGroupLimit") {
    val p = plan("window_topk")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("column pruning: q1_agg reads only the needed lineitem columns") {
    val p = plan("q1_agg")
    // lineitem has 16 columns; the query needs 4
    val readSchemas = "ReadSchema: [^\n]*lineitem[^\n]*".r.findAllIn(p).toList
    val scan = "struct<[^>]*l_orderkey[^>]*>".r.findFirstIn(p)
    assert(scan.exists(s => s.count(_ == ',') <= 4), s"unpruned scan: $scan")
  }

  test("q3_priority: top-10 runs as TakeOrderedAndProject, not a global sort") {
    val p = plan("q3_priority")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("tfidf_top_terms: no mandatory vocabulary broadcast; 1-row N folded in") {
    val p = plan("tfidf_top_terms")
    // the corpus-size side is one row and broadcast-nested-loop joined;
    // the tf<->df join strategy is left to Catalyst/AQE (a forced
    // broadcast of the full vocabulary would OOM at web scale)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("WindowGroupLimit"), p) // per-doc top-k bounded map-side
  }

  test("bloom_join: might_contain prefilter sits below the join, above the scan") {
    val p = plan("bloom_join")
    assert(p.contains("might_contain"), p)
    // the probe-side filter must be planned before the join, i.e. the
    // join node appears earlier (higher) in the tree printout than the
    // bloom predicate applied at the scan side
    val joinAt = p.indexOfSlice("HashJoin")
    val bloomAt = p.indexOf("might_contain")
    assert(joinAt >= 0 && bloomAt > joinAt,
      s"bloom filter should be on the probe branch below the join: $p")
  }

  test("distinct_sketch: KMV aggregate runs partial (map-side) before the exchange") {
    val p = plan("distinct_sketch")
    // TypedImperativeAggregate plans as ObjectHashAggregate with a
    // partial mode pass — k longs per group cross the shuffle, not rows
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_kmv_distinct"), p)
  }

  private def shuffledColumns(name: String): Seq[String] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = SparkEntry.queries(name)(spark, dir)
    val nodes = scala.collection.mutable.ArrayBuffer.empty[SparkPlan]
    def walk(p: SparkPlan): Unit = {
      nodes += p
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
        case other => other.children.foreach(walk)
      }
    }
    walk(df.queryExecution.executedPlan)
    nodes.collect { case s: ShuffleExchangeExec => s.output.map(_.name) }.flatten.toSeq
  }

  test("corpus operators never shuffle the document text") {
    // dedup/text pipelines shuffle hashes, signatures, ids — never the
    // raw document text column
    Seq("dedup_exact", "dedup_minhash", "dedup_containment", "decontaminate",
      "repetition", "corpus_filter", "doc_pack", "tfidf_top_terms",
      "span_dedup", "corpus_shuffle", "corpus_sample_tokens", "corpus_mix",
      "corpus_sample_per_source", "corpus_stats_by_source",
      "quality_gopher", "text_shingles", "keyword_search",
      "corpus_mix_tokens", "bm25_search", "lm_bigram_score",
      "span_dup_stats", "corpus_mix_temperature", "prefix_dup",
      "source_overlap", "bpe_encode", "corpus_ppl_sample",
      "blocklist_filter", "quality_score_linear").foreach { q =>
      val cols = shuffledColumns(q)
      assert(!cols.contains("text"), s"$q shuffles text: $cols")
      // span_dedup additionally must not shuffle the token array
      if (q == "span_dedup")
        assert(!cols.contains("t"), s"$q shuffles token arrays: $cols")
    }
  }

  test("embedding-space operators never hash/range-shuffle the vectors") {
    // search/assignment consume embeddings map-side (broadcast query
    // sets, broadcast centroid argmin); rank and argmin exchanges
    // carry only (id, cell/score) tuples — the 100 TB contract. The
    // one exchange allowed to carry vectors is Parallelism.ensure's
    // ROUND-ROBIN repartition: the small-local-input guard, a no-op on
    // a real multi-split scan, and never keyed (no co-location cost).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning
    def keyedShuffleCols(name: String): Seq[String] = {
      val df = SparkEntry.queries(name)(spark, dir)
      val nodes = scala.collection.mutable.ArrayBuffer.empty[SparkPlan]
      def walk(p: SparkPlan): Unit = {
        nodes += p
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
          case other => other.children.foreach(walk)
        }
      }
      walk(df.queryExecution.executedPlan)
      nodes.collect {
        case s: ShuffleExchangeExec
            if !s.outputPartitioning.isInstanceOf[RoundRobinPartitioning] =>
          s.output.map(_.name)
      }.flatten.toSeq
    }
    Seq("sim_topk", "hard_negatives", "embed_cluster_sample",
      "semantic_dedup").foreach { q =>
      val cols = keyedShuffleCols(q)
      assert(!cols.contains("embedding") && !cols.contains("q_emb"),
        s"$q hash/range-shuffles embeddings: $cols")
    }
  }

  test("staging_agg_bucketed: re-aggregation over the bucketed layout plans NO exchange") {
    // the bucketed scan's hash partitioning (pickup_datetime ∈ group
    // keys) must satisfy the aggregation's distribution — the whole
    // point of the layout; a regression here silently reintroduces the
    // whole-table shuffle staging_agg pays
    val p = plan("staging_agg_bucketed")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("Bucketed: true"), p)
  }

  test("filter pushdown reaches the parquet scan") {
    import org.apache.spark.sql.functions.col
    val df = graft.core.Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [") && p.contains("GreaterThan(l_quantity"), p)
  }

  test("keyword_search runs the scan→explode→tf subtree once (AQE exchange reuse)") {
    val df = SparkEntry.queries("keyword_search")(spark, dir)
    df.collect() // AQE reuse materializes at runtime, not in the static plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"),
      s"tf/df branches should share the exploded-corpus exchange:\n$p")
  }
}
