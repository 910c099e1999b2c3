package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.operators.{Graph, Joins, Sampling, TimeSeries}
import graft.similarity.Similarity

/** Zero-row inputs must flow through every operator without crashing —
  * a real pipeline hits them constantly (an empty ingest hour, a filter
  * that drops everything, a new source with no history yet). Each case
  * asserts the operator returns an EMPTY, correctly-schemed frame
  * rather than throwing from a degenerate aggregate/window/explode. */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType))))

  private def emptyEmb: DataFrame =
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")

  test("text/dedup operators accept an empty corpus") {
    assert(Dedup.exact(emptyDocs).isEmpty)
    assert(Dedup.minhashNearDups(emptyDocs).isEmpty)
    assert(Dedup.crossNearDups(emptyDocs, emptyDocs).isEmpty)
    assert(Dedup.simhashNearDups(emptyDocs).isEmpty)
    assert(Dedup.spanDedup(emptyDocs).isEmpty)
    assert(TextFunctions.corpusFilter(emptyDocs).isEmpty)
    assert(TextFunctions.tfidfTopTerms(emptyDocs).isEmpty)
    assert(TextFunctions.keywordSearch(emptyDocs, Seq("spark")).isEmpty)
    assert(TextFunctions.packDocuments(emptyDocs, 256, 8).isEmpty)
    assert(emptyDocs.select(TextFunctions.gopherMeasures(col("text"))).isEmpty)
  }

  test("sampling and time-series operators accept empty inputs") {
    assert(Sampling.hashSample(emptyDocs, "doc_id", 50).isEmpty)
    assert(Sampling.shardShuffle(emptyDocs, "doc_id", 8, "s").isEmpty)
    assert(Sampling.topKPerStratum(emptyDocs, "doc_id", "source", 5).isEmpty)
    assert(Sampling.quantileBuckets(emptyDocs, "n_chars", 10).isEmpty)
    val emptyEv = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    assert(TimeSeries.resampleFfill(emptyEv, "user_id", "ts", "value").isEmpty)
    val emptyLog = Seq.empty[(Long, java.sql.Timestamp, Long, String)]
      .toDF("user_id", "ts", "event_id", "event_type")
    assert(TimeSeries.scd2(emptyLog, "user_id", "ts", "event_id", "event_type").isEmpty)
  }

  test("round-7 additions accept empty inputs") {
    import graft.operators.{Incremental, Robust}
    // prefix/span/triangle chain on an empty corpus
    assert(Dedup.prefixDups(emptyDocs).isEmpty)
    assert(TextFunctions.spanShareEdges(emptyDocs).isEmpty)
    val emptyPairs = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Graph.triangleCounts(emptyPairs, "a", "b").isEmpty)
    // robust stats: empty groups produce empty outputs, not div-by-zero
    val emptyVals = Seq.empty[(Long, String, Option[Double])].toDF("id", "g", "v")
    assert(Robust.winsorize(emptyVals, "v", "g").isEmpty)
    assert(Robust.robustZ(emptyVals, "v", "g").isEmpty)
    assert(Robust.rankTransform(emptyVals, "v", "g", "id").isEmpty)
    // IVM: empty delta leaves the stored aggregate unchanged
    val stored = Seq(("a", 2L)).toDF("k", "n")
    val emptyAgg = Seq.empty[(String, Long)].toDF("k", "n")
    val merged = Incremental.mergeAggregates(stored, emptyAgg, Seq("k"), Map("n" -> "sum"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == Map("a" -> 2L))
    // both sides empty -> empty, schema intact
    assert(Incremental.mergeAggregates(emptyAgg, emptyAgg, Seq("k"),
      Map("n" -> "sum")).isEmpty)
    // salted join: empty left, empty right, both
    val emptyL = Seq.empty[(Long, Long)].toDF("row_id", "k")
    val r = Seq((1L, "x")).toDF("k", "v")
    assert(Joins.saltedJoin(emptyL, r, "k", "row_id").isEmpty)
    assert(Joins.saltedJoin(Seq((1L, 1L)).toDF("row_id", "k"), r.limit(0),
      "k", "row_id", joinType = "left").count() == 1) // left row survives
  }

  test("late round-7 additions accept empty inputs") {
    val emptyEvents = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    assert(TimeSeries.rollingAgg(emptyEvents, "user_id", "ts", "value",
      3600L * 1000000L).isEmpty)
    assert(TimeSeries.gaps(
      emptyEvents.withColumn("event_id", col("user_id")),
      "user_id", "ts", "event_id", 1000000L).isEmpty)
    // edit-distance pairs: empty frame, and capped-empty
    val emptyIdStr = Seq.empty[(Long, String)].toDF("doc_id", "s")
    assert(Dedup.editDistancePairs(emptyIdStr, "doc_id", "s", 3).isEmpty)
    assert(Dedup.editDistancePairs(emptyIdStr, "doc_id", "s", 3,
      maxBlockSize = Some(5)).isEmpty)
    // BPE on an empty corpus: empty merge table / vocab, schema intact
    val bpeOut = TextFunctions.bpeTrain(emptyDocs, nMerges = 2)
    assert(bpeOut.isEmpty &&
      bpeOut.columns.toSeq == Seq("iter", "sym_left", "sym_right", "pair_count"))
    assert(TextFunctions.bpeVocab(emptyDocs, nMerges = 1).isEmpty)
    assert(TextFunctions.bpeEncodeStats(emptyDocs).isEmpty)
    assert(TextFunctions.qualityLinear(emptyDocs).isEmpty)
    assert(TextFunctions.pplSample(emptyDocs).isEmpty)
    assert(TextFunctions.blocklistFilter(emptyDocs, Seq("slow")).isEmpty)
    // leakage-safe split: empty pair set -> every doc a train/heldout singleton
    val docs = (1L to 5L).toDF("doc_id")
    val emptyPairs2 = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val split = Dedup.leakageSafeSplit(docs, emptyPairs2).collect()
    assert(split.length == 5 && split.forall(r => r.getLong(0) == r.getLong(1)))
    // and an empty doc set flows through whole
    assert(Dedup.leakageSafeSplit(docs.limit(0), emptyPairs2).isEmpty)
  }

  test("round-8/9 additions accept empty inputs") {
    // content-defined chunking and its dedup
    assert(TextFunctions.cdcChunkRows(emptyDocs).isEmpty)
    assert(TextFunctions.cdcDedup(emptyDocs).isEmpty)
    // boilerplate vocabulary of an empty corpus is empty; stripping
    // with an empty vocabulary is the identity
    assert(TextFunctions.boilerplateHashes(emptyDocs, 3, 1).isEmpty)
    // DSIR over empty target AND raw: no docs, no scores, no throw
    // (the smoothed denominators stay positive by construction)
    assert(TextFunctions.dsirWeights(emptyDocs, emptyDocs).isEmpty)
    // Bloom decontamination: an empty eval set folds to an all-zero
    // bitset, which flags nothing
    val words = TextFunctions.bloomWordsOfEval(emptyDocs, mBits = 1 << 10)
    assert(words.forall(_ == 0L))
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val screened = TextFunctions.contaminationBloom(docs, words, mBits = 1 << 10)
    assert(screened.filter(col("flagged")).isEmpty)
    assert(TextFunctions.contaminationBloom(emptyDocs, words, mBits = 1 << 10).isEmpty)
    // exact-set contamination against an empty train corpus: scores 0
    val sets = docs.select(col("doc_id"),
      TextFunctions.shingleSet(col("text"), 3).as("shingles"))
    val contam = TextFunctions.contaminationOfSets(emptyDocs, sets).collect()
    assert(contam.forall(_.getAs[Double]("contamination") == 0.0))
  }

  test("round-10 additions accept empty inputs") {
    // substring dedup family: no windows, no cuts, no output rows
    assert(Dedup.substrDedup(emptyDocs).isEmpty)
    assert(Dedup.windowHashCatalog(emptyDocs).isEmpty)
    assert(Dedup.substrDedupIncremental(
      emptyDocs, Dedup.windowHashCatalog(emptyDocs)).isEmpty)
    // an empty batch against a NON-empty catalog, and vice versa
    val someDocs = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    assert(Dedup.substrDedupIncremental(
      emptyDocs, Dedup.windowHashCatalog(someDocs)).isEmpty)
    assert(Dedup.substrDedupIncremental(
        someDocs, Dedup.windowHashCatalog(emptyDocs))
      .collect().head.getString(1) == "a b c d e f g h i j")
    // valuation: empty train set → no values; empty test set → no work
    val emptyLabeled = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    val someTest = Seq((0L, Array(1.0f, 0.0f), 0)).toDF("q_id", "q_emb", "q_label")
    assert(graft.operators.Valuation.knnShapley(emptyLabeled, someTest).isEmpty)
    val someTrain = Seq((1L, Array(1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    assert(graft.operators.Valuation.knnShapley(someTrain,
      Seq.empty[(Long, Array[Float], Int)].toDF("q_id", "q_emb", "q_label")).isEmpty)
    // batched inference: the model is never called on an empty corpus
    // (a throwing model proves it without capturing the spec instance)
    assert(graft.operators.Inference.batchScore(
      emptyDocs, _ => throw new RuntimeException("model called on empty input"))
      .isEmpty)
    // privacy gates: empty input is vacuously anonymous, no div-by-zero
    assert(graft.validate.Privacy.kAnonymityGroups(emptyDocs, Seq("source"), 5).isEmpty)
    val gate = graft.validate.Privacy.kAnonymityReport(emptyDocs, Seq("source"), 5).head()
    assert(gate.getBoolean(6), "empty dataset must gate as k-anonymous")
    // variant shredding: a frame with zero rows has no merged schema —
    // the column survives unshredded as a residual
    import org.apache.spark.sql.functions.parse_json
    val emptyV = Seq.empty[(Long, String)].toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("v"))
    val out = java.nio.file.Files.createTempDirectory("empty_shred").resolve("t").toString
    graft.sources.VariantShred.writeShredded(emptyV, out)
    assert(spark.read.parquet(out).isEmpty)
  }

  test("similarity and graph operators accept empty inputs") {
    assert(Similarity.diversitySample(emptyEmb, dim = 64, perBucket = 2).isEmpty)
    assert(Similarity.semanticDedup(emptyEmb, dim = 64, tau = 0.5).isEmpty)
    assert(Similarity.clusterBalancedSample(emptyEmb, dim = 64, nCells = 8,
      perCell = 5).isEmpty)
    assert(Similarity.hardNegatives(emptyEmb, emptyEmb
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
      k = 5, loCos = 0.2, hiCos = 0.4).isEmpty)
    assert(Similarity.bruteForceTopK(emptyEmb, emptyEmb
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
      k = 5).isEmpty)
    assert(Similarity.randomProject(emptyEmb, dim = 64, outDim = 8).isEmpty)
    assert(Similarity.projectedRerankTopK(emptyEmb, emptyEmb
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
      dim = 64, outDim = 8, coarseK = 50, k = 5).isEmpty)
    val emptyEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.pageRank(emptyEdges).isEmpty)
    assert(Joins.intervalJoin(
      Seq.empty[(Long, Long, Long)].toDF("a", "al", "ah"),
      Seq.empty[(Long, Long, Long)].toDF("b", "bl", "bh"),
      "al", "ah", "bl", "bh", 10.0).isEmpty)
  }

  test("round-12 additions accept empty inputs") {
    import graft.operators.{Profiler, Sampling}
    import graft.validate.Privacy
    val emptyW = Seq.empty[(Long, String, Long)].toDF("id", "stratum", "w")
    assert(Sampling.unimaxBudgets(emptyW, "w", "stratum", 100L, 500000L).isEmpty)
    assert(Sampling.unimaxMix(emptyW, "id", "w", "stratum", 100L, 500000L).isEmpty)
    assert(Graph.labelPropagation(Seq.empty[(Long, Long)].toDF("src", "dst")).isEmpty)
    assert(TextFunctions.phraseSearch(emptyDocs, Seq("table", "part")).isEmpty)
    val emptyEv = Seq.empty[(Long, java.sql.Timestamp, Long, Long)]
      .toDF("user_id", "ts", "event_id", "cents")
    assert(TimeSeries.cusum(emptyEv, "user_id", "ts", "event_id",
      col("cents"), 10L, 5L).isEmpty)
    assert(TimeSeries.streaks(emptyEv, "user_id", "ts", "event_id",
      col("cents") >= 10L).isEmpty)
    assert(Privacy.tCloseness(
      Seq.empty[(String, Long)].toDF("cls", "bin"), Seq("cls"), "bin", 100L).isEmpty)
    // the advisor must still ADVISE on an empty table: zero counts,
    // balanced, salt 1 — not a row of NULLs
    val advice = Profiler.skewAdvice(emptyW, Seq("stratum"), partitions = 8)
      .collect()
    assert(advice.length == 1)
    assert(advice.head.getLong(1) == 0L && !advice.head.getBoolean(5)
      && advice.head.getLong(6) == 1L)
  }

  test("round-15 additions accept empty inputs") {
    import graft.dedup.Dedup
    // span dedup: an empty corpus rebuilds nothing, throws nowhere
    assert(Dedup.substrDedupSpans(emptyDocs).isEmpty)
    // cross-modal ensemble: no evidence pairs → no clusters
    val emptyPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.crossModalClusters(emptyPairs, emptyPairs).isEmpty)
    // one-sided evidence still clusters; the other modality flags 0
    val one = Dedup.crossModalClusters(
      Seq((1L, 2L)).toDF("doc_a", "doc_b"), emptyPairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(one == Map(1L -> ((1L, 0L)), 2L -> ((1L, 0L))))
    // OPQ: an empty corpus fails loudly at the dim check, never with a
    // degenerate-aggregate surprise deeper in the chain
    intercept[IllegalArgumentException] {
      graft.similarity.Similarity.opqTopK(emptyEmb, emptyEmb
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
        dim = 64, k = 5)
    }
    ()
  }
}
