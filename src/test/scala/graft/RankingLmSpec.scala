package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Sampling
import graft.similarity.Similarity

/** Specs for the ranking / LM-quality / PQ / temperature-mix tier. */
class RankingLmSpec extends SparkSpec {
  import spark.implicits._

  test("bm25Search matches the closed-form rational score on a tiny corpus") {
    val docs = Seq(
      (1L, "spark spark merge"),
      (2L, "spark window"),
      (3L, "other text here")
    ).toDF("doc_id", "text")
    val out = TextFunctions.bm25Search(docs, Seq("spark", "merge", "window"), k = 10)
      .orderBy(col("score").desc, col("doc_id"))
      .collect()
    // N=3 docs, T=8 tokens, df_spark=2, df_merge=1, df_window=1
    // score_t = 44·tf·T·(N+1) / ((df+1)·(20·T·tf + 6·T + 18·dl·N))
    def ts(tf: Long, df: Long, dl: Long): Double =
      if (tf == 0) 0.0
      else (44.0 * tf * 8 * 4) / ((df + 1.0) * (20 * 8 * tf + 6 * 8 + 18 * dl * 3))
    val exp1 = ts(2, 2, 3) + ts(1, 1, 3) + 0.0 // doc1: spark×2, merge×1
    val exp2 = ts(1, 2, 2) + 0.0 + ts(1, 1, 2) // doc2: spark×1, window×1
    assert(out.length == 2) // doc 3 has no query terms
    val byId = out.map(r => r.getLong(0) -> r.getDouble(r.length - 1)).toMap
    assert(math.abs(byId(1L) - BigDecimal(exp1).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    assert(math.abs(byId(2L) - BigDecimal(exp2).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    // doc2 outranks doc1: rarer window term + shorter doc
    assert(out(0).getLong(0) == 2L)
  }

  test("Bm25Index: incremental build serves bit-identical results to the ad-hoc scan; buckets prune") {
    import graft.search.Bm25Index
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val path = java.nio.file.Files.createTempDirectory("bm25_idx")
      .resolve("idx").toString
    // build on a prefix, append the rest — additivity means the index
    // must equal a one-shot build AND the ad-hoc scan, exactly
    Bm25Index.build(docs.filter(col("doc_id") < 100), path, nBuckets = 16)
    Bm25Index.append(spark, path, docs.filter(col("doc_id") >= 100))
    val terms = Seq("spark", "merge", "window")
    val fromIndex = Bm25Index.topK(spark, path, terms, k = 20).collect().toSeq
    val adHoc = TextFunctions.bm25Search(docs, terms, k = 20).collect().toSeq
    assert(fromIndex == adHoc, "index-served BM25 differs from the ad-hoc scan")
    // bucket pruning: the postings scan must carry a bucket partition
    // filter (≤ |terms| of 16 buckets read — the IVF cell-probe twin)
    val q = Bm25Index.topK(spark, path, Seq("spark"), k = 5)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*bucket[^\\]]*\\]".r.findFirstIn(plan)
    assert(pf.isDefined, s"no bucket partition filter on the postings scan:\n$plan")
  }

  test("Bm25Index: release pinning makes maintenance atomic — a reader mid-append sees the old triple; crash-retry is exactly-once") {
    import graft.search.Bm25Index
    import graft.sources.TxnLog
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val path = java.nio.file.Files.createTempDirectory("bm25_atomic")
      .resolve("idx").toString
    val terms = Seq("spark", "merge", "window")
    Bm25Index.build(docs.filter(col("doc_id") < 100), path, nBuckets = 16)
    val before = Bm25Index.topK(spark, path, terms, k = 20).collect().toSeq
    // TORN maintenance: the postings member commits, then the writer
    // dies — stats delta and release publish never land (txnId
    // "crash-postings" is exactly what append's first member commit
    // would use)
    TxnLog.append(
      Bm25Index.postingsOf(docs.filter(col("doc_id") >= 100), 16, "text", "doc_id"),
      s"$path/postings", Some("crash-postings"), partitionBy = Seq("bucket"))
    // a reader between the member commits sees the OLD consistent
    // (postings, stats) pair — never new postings over stale N/total_dl
    assert(Bm25Index.topK(spark, path, terms, k = 20).collect().toSeq == before,
      "reader observed a torn (postings, stats) state")
    // the crashed run retries end-to-end under the SAME txnId: the
    // landed member no-ops, the missing ones commit, the release pins
    Bm25Index.append(spark, path, docs.filter(col("doc_id") >= 100),
      txnId = Some("crash"))
    val after = Bm25Index.topK(spark, path, terms, k = 20).collect().toSeq
    assert(after == TextFunctions.bm25Search(docs, terms, k = 20).collect().toSeq,
      "retried append did not converge to the one-shot result (double count?)")
    // a full replay of the retry is a no-op on every member and the release
    val vPost = TxnLog.latestVersion(spark, s"$path/postings")
    val vStats = TxnLog.latestVersion(spark, s"$path/stats")
    val vRel = TxnLog.latestVersion(spark, s"$path/_catalog")
    Bm25Index.append(spark, path, docs.filter(col("doc_id") >= 100),
      txnId = Some("crash"))
    assert(TxnLog.latestVersion(spark, s"$path/postings") == vPost)
    assert(TxnLog.latestVersion(spark, s"$path/stats") == vStats)
    assert(TxnLog.latestVersion(spark, s"$path/_catalog") == vRel)
    assert(Bm25Index.topK(spark, path, terms, k = 20).collect().toSeq == after)
  }

  test("Bm25Index: streaming foreachBatchUpdate equals a one-shot build; checkpoint replays no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.search.Bm25Index
    import graft.sources.TxnLog
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("bm25_stream")
    val streamed = base.resolve("streamed").toString
    val oneShot = base.resolve("oneshot").toString
    val ckpt = base.resolve("ckpt").toString
    val d = Seq(
      (1L, "spark merge window spark"),
      (2L, "merge window tiny"),
      (3L, "spark window window stream"),
      (4L, "stream stream merge"))
    // batch 0 bootstraps the index; batch 1 maintains it
    Bm25Index.build(d.take(2).toDF("doc_id", "text"), streamed, nBuckets = 4)
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(Bm25Index.foreachBatchUpdate(streamed))
      .start()
    try {
      in.addData(d(2)); q.processAllAvailable()
      in.addData(d(3)); q.processAllAvailable()
    } finally q.stop()
    Bm25Index.build(d.toDF("doc_id", "text"), oneShot, nBuckets = 4)
    val terms = Seq("spark", "merge", "window", "stream")
    // the streamed index serves bit-identical results to the one-shot
    // build over the union of everything ingested
    assert(Bm25Index.topK(spark, streamed, terms, k = 10).collect().toSeq ==
      Bm25Index.topK(spark, oneShot, terms, k = 10).collect().toSeq)
    // and the postings CONTENT is identical — positions included, so
    // the exactness law covers the positional table too
    def postRows(p: String) = TxnLog.read(spark, s"$p/postings")
      .select(col("term"), col("doc_id"), col("tf"), col("dl"),
        col("bucket"), col("positions").cast("string"))
      .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
    assert(postRows(streamed) == postRows(oneShot))
    // checkpoint-recovery replay of the last batch: every member and
    // the release no-op
    val vRel = TxnLog.latestVersion(spark, s"$streamed/_catalog")
    Bm25Index.foreachBatchUpdate(streamed)(d(3) match {
      case (id, t) => Seq((id, t)).toDF("doc_id", "text") }, 1L)
    assert(TxnLog.latestVersion(spark, s"$streamed/_catalog") == vRel)
  }

  test("Bm25Index.delete: post-erasure index is bit-identical to one that never held the victims; retry no-ops") {
    import graft.search.Bm25Index
    import graft.sources.TxnLog
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val base = java.nio.file.Files.createTempDirectory("bm25_del")
    val full = base.resolve("full").toString
    val clean = base.resolve("clean").toString
    val terms = Seq("spark", "merge", "window")
    val victims = docs.filter(col("doc_id") % 7 === 3)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    Bm25Index.build(docs, full, nBuckets = 8)
    Bm25Index.delete(spark, full, victims, Some("rtbf-spec"))
    Bm25Index.build(docs.filter(!col("doc_id").isin(victims: _*)),
      clean, nBuckets = 8)
    // ranked results identical to an index that never held the docs —
    // scores included (df/N/total_dl all shrank exactly)
    assert(Bm25Index.topK(spark, full, terms, k = 20).collect().toSeq ==
      Bm25Index.topK(spark, clean, terms, k = 20).collect().toSeq)
    // a replayed erasure is a no-op on both members and the release
    val vP = TxnLog.latestVersion(spark, s"$full/postings")
    val vS = TxnLog.latestVersion(spark, s"$full/stats")
    val vR = TxnLog.latestVersion(spark, s"$full/_catalog")
    Bm25Index.delete(spark, full, victims, Some("rtbf-spec"))
    assert(TxnLog.latestVersion(spark, s"$full/postings") == vP)
    assert(TxnLog.latestVersion(spark, s"$full/stats") == vS)
    assert(TxnLog.latestVersion(spark, s"$full/_catalog") == vR)
    // erasing ids the index never held is a version no-op too
    Bm25Index.delete(spark, full, Seq(999999999L))
    assert(TxnLog.latestVersion(spark, s"$full/_catalog") == vR)
  }

  test("Bm25Index.delete of a token-less (null-text) doc decrements n_docs exactly") {
    import graft.search.Bm25Index
    import graft.sources.TxnLog
    val base = java.nio.file.Files.createTempDirectory("bm25_nulldoc")
    val full = base.resolve("full").toString
    val clean = base.resolve("clean").toString
    // doc 3 has NULL text: zero tokens, zero real postings — but it IS
    // an indexed doc (n_docs counts it), so deleting it must shrink
    // n_docs or every surviving score drifts from the one-shot build
    val docs = Seq((1L, "spark merge window"), (2L, "merge merge tiny"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    Bm25Index.build(docs, full, nBuckets = 4)
    Bm25Index.delete(spark, full, Seq(3L), Some("rtbf-null"))
    Bm25Index.build(docs.filter(col("doc_id") =!= 3L), clean, nBuckets = 4)
    def stats(p: String) = TxnLog.read(spark, s"$p/stats")
      .agg(org.apache.spark.sql.functions.sum("n_docs"),
        org.apache.spark.sql.functions.sum("total_dl")).head
    assert(stats(full).getLong(0) == 2L, s"n_docs overstated: ${stats(full)}")
    assert(stats(full).toSeq == stats(clean).toSeq)
    // and the served ranking is bit-identical to never-held
    val terms = Seq("spark", "merge")
    assert(Bm25Index.topK(spark, full, terms, k = 10).collect().toSeq ==
      Bm25Index.topK(spark, clean, terms, k = 10).collect().toSeq)
  }

  test("bm25Search favors docs matching more/rarer terms over raw repetition") {
    val docs = Seq(
      (1L, "common common common common common"),
      (2L, "common rare")
    ).toDF("doc_id", "text")
    val out = TextFunctions.bm25Search(docs, Seq("common", "rare"), k = 10).collect()
    val scores = out.map(r => r.getLong(0) -> r.getDouble(r.length - 1)).toMap
    assert(scores(2L) > scores(1L)) // tf saturation: 5x common < 1 common + 1 rare
  }

  test("phraseCounts: index-served phrase search equals the map-side scan; laws hold under append and delete") {
    import graft.search.Bm25Index
    val base = java.nio.file.Files.createTempDirectory("bm25_phrase")
    val path = base.resolve("idx").toString
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "quick brown quick brown quick"),
      (3L, "brown quick brown"),
      (4L, "quick quick quick"), // repeated-term phrase fodder
      (5L, "nothing relevant here")).toDF("doc_id", "text")
    // split build + append: the phrase answer must not care how the
    // index was assembled (positions are per-(doc, term) facts)
    Bm25Index.build(docs.filter(col("doc_id") <= 2), path, nBuckets = 4)
    Bm25Index.append(spark, path, docs.filter(col("doc_id") > 2))
    def served(phrase: Seq[String]) =
      Bm25Index.phraseCounts(spark, path, phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def scanned(phrase: Seq[String], d: org.apache.spark.sql.DataFrame = docs) =
      TextFunctions.phraseSearch(d, phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(served(Seq("quick", "brown")) == scanned(Seq("quick", "brown")))
    assert(served(Seq("quick", "brown")) == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    // overlap counting with a REPEATED term: "quick quick" in doc 4
    // occurs at positions 1 and 2
    assert(served(Seq("quick", "quick")) == scanned(Seq("quick", "quick")))
    assert(served(Seq("quick", "quick"))(4L) == 2L)
    // a 3-term phrase
    assert(served(Seq("quick", "brown", "quick")) ==
      scanned(Seq("quick", "brown", "quick")))
    // erasure law: post-delete phrase answers equal the never-held scan
    Bm25Index.delete(spark, path, Seq(2L), Some("rtbf-phrase"))
    assert(served(Seq("quick", "brown")) ==
      scanned(Seq("quick", "brown"), docs.filter(col("doc_id") =!= 2L)))
  }

  test("unigramTrain: hard-EM unigram LM matches the hand-traced closed form; deterministic under repartition") {
    // corpus 1: ten copies of "aaaa". Seed counts a=40 aa=30 aaa=20
    // aaaa=10; a whole-word piece always wins Viterbi (any split adds
    // >= another 26<<16 of cost), so both EM rounds count aaaa=10 and
    // everything else 0; keepPct=80 over 3 multis keeps all 3. Final
    // smoothing: total=10, V=4 -> p = (cnt+1)*1e6 div 14.
    val c1 = (1 to 10).map(i => (i.toLong, "aaaa")).toDF("doc_id", "text")
    val got1 = TextFunctions.unigramTrain(c1)
      .as[(String, Long, Long)].collect().toSet
    assert(got1 == Set(("a", 0L, 71428L), ("aa", 0L, 71428L),
      ("aaa", 0L, 71428L), ("aaaa", 10L, 785714L)), got1)
    // corpus 2: "abab abab cd" — two word types. Round 1 counts
    // abab=2, cd=1; prune keeps ceil(6*0.8)=5 multis (drops 'bab' by
    // the (cnt desc, sym asc) order); round 2 prunes 'ba' the same
    // way. Final: total=3, V=8 -> p = (cnt+1)*1e6 div 11.
    val c2 = Seq((1L, "abab abab cd")).toDF("doc_id", "text")
    val got2 = TextFunctions.unigramTrain(c2)
      .as[(String, Long, Long)].collect().toSet
    assert(got2 == Set(
      ("a", 0L, 90909L), ("b", 0L, 90909L), ("c", 0L, 90909L), ("d", 0L, 90909L),
      ("ab", 0L, 90909L), ("aba", 0L, 90909L),
      ("abab", 2L, 272727L), ("cd", 1L, 181818L)), got2)
    // deterministic: a repartitioned corpus trains the identical model
    val again = TextFunctions.unigramTrain(c2.repartition(7))
      .as[(String, Long, Long)].collect().toSet
    assert(again == got2)
  }

  test("unigramEncodeStats closes train→encode: per-doc Viterbi token counts; over-cap words fall back to chars; empty docs zero") {
    // training sees only "abab"(2) and "cd"(1) — the 20-char word is
    // over the cap and null text contributes nothing — so the final
    // vocab is the hand-traced one and both words encode as ONE piece:
    // doc 1 = 3 words / 3 tokens / 10 chars -> compression 10e6 div 3
    val docs = Seq((1L, "abab abab cd"), (2L, "aaaaaaaaaaaaaaaaaaaa"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextFunctions.unigramEncodeStats(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 3L, 3L, 10L, 3333333L),
      (2L, 1L, 20L, 20L, 1000000L), // char fallback: 20 pieces
      (3L, 0L, 0L, 0L, 0L)), got)
  }

  test("wordpieceEncodeStats: greedy longest-match vs Viterbi on the same vocabulary") {
    // same hand-traced training corpus as the encode spec: "abab"
    // survives the prune, so GREEDY consumes it whole (1 hop) — and
    // "ababa" (in-cap) greedily takes abab + a = 2 pieces while the
    // 20-char word falls back to chars on both counters
    val docs = Seq((1L, "abab abab cd"), (2L, "ababa"),
      (3L, "aaaaaaaaaaaaaaaaaaaa"), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextFunctions.wordpieceEncodeStats(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // doc1: 3 words; viterbi 3 tokens, greedy abab|abab|cd = 3 → ratio 1e6
    // doc2: 1 word; greedy abab+a = 2; ratio = 1e6*2 div viterbi
    val doc2 = got.find(_._1 == 2L).get
    assert(got.contains((1L, 3L, 3L, 3L, 1000000L)), got)
    assert(doc2._4 == 2L, s"greedy on 'ababa' must take abab then a: $doc2")
    assert(doc2._5 == 1000000L * doc2._4 / doc2._3, got)
    assert(got.contains((3L, 1L, 20L, 20L, 1000000L)), got)
    assert(got.contains((4L, 0L, 0L, 0L, 0L)), got)
  }

  test("lmBigramScore computes exact fixed-point MLE bigram probabilities") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x")).toDF("doc_id", "text")
    val out = TextFunctions.lmBigramScore(docs).orderBy("doc_id").collect()
    // c2: "a b"→3, "b a"→1, "b c"→1 ; c1: a→3, b→2
    // doc1: p(a b)=1e6·3/3=1000000 ×2, p(b a)=1e6·1/2=500000 → sum 2500000, n=3
    // doc2: 1000000 + 500000 → sum 1500000, n=2 ; doc3: no bigrams
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 2500000L)
    assert(out(1).getLong(1) == 2L && out(1).getLong(2) == 1500000L)
    assert(out(2).getLong(1) == 0L && out(2).getLong(2) == 0L &&
      out(2).getDouble(3) == 0.0)
    assert(math.abs(out(0).getDouble(3) - 2500000.0 / 3) < 1e-9)
  }

  test("dupSpanStats counts cross-document duplicated spans") {
    val docs = Seq(
      (1L, "x y z w"), // spans: "x y z", "y z w"
      (2L, "x y z q"), // spans: "x y z", "y z q"  — shares "x y z"
      (3L, "a b")      // too short for a 3-token span
    ).toDF("doc_id", "text")
    val out = TextFunctions.dupSpanStats(docs, width = 3).orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 2L && out(0).getLong(2) == 1L &&
      out(0).getDouble(3) == 0.5)
    assert(out(1).getLong(1) == 2L && out(1).getLong(2) == 1L)
    assert(out(2).getLong(1) == 0L && out(2).getLong(2) == 0L &&
      out(2).getDouble(3) == 0.0)
  }

  test("dupSpanStats counts a repeated span within one doc only once (distinct spans)") {
    val rep = "p q r"
    val docs = Seq((1L, s"$rep $rep"), (2L, "solo words only")).toDF("doc_id", "text")
    // doc1 tokens: p q r p q r → windows: "p q r","q r p","r p q","p q r" → 3 DISTINCT
    val out = TextFunctions.dupSpanStats(docs, width = 3).orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 0L) // no OTHER doc shares
  }

  test("temperatureMix derives sqrt-proportional budgets and fills them greedily") {
    // source A: 100 one-token docs; source B: 400 one-token docs
    // sq(A)=10, sq(B)=20, z=30; totalBudget=30 → budget A=10, B=20
    val docs = ((1 to 100).map(i => (i.toLong, "A", 1L)) ++
      (101 to 500).map(i => (i.toLong, "B", 1L))).toDF("doc_id", "source", "w")
    val out = Sampling.temperatureMix(docs, "doc_id", "w", "source", totalBudget = 30L)
    val bySrc = out.groupBy("source").agg(sum("w").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("A") == 10L && bySrc("B") == 20L)
    // proportional sampling would have been A=6, B=24: temperature
    // up-weights the low-resource source
    val again = Sampling.temperatureMix(docs, "doc_id", "w", "source", totalBudget = 30L)
      .select("doc_id").as[Long].collect().sorted
    assert(out.select("doc_id").as[Long].collect().sorted.sameElements(again))
  }

  test("pqTopK with a full codebook degenerates to exact fixed-point L2 top-k") {
    // nCents = n candidates → every vector is its own centroid (d=0
    // beats any tie), so ADC(q,x) = exact integer squared distance.
    val n = 20
    val dim = 8
    val vecs = (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(d => (math.sin(i * 31 + d * 7) * 0.5).toFloat))
    }
    val cands = vecs.toDF("vec_id", "embedding")
    val queries = cands.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val out = Similarity.pqTopK(cands, queries, dim = dim, k = 4,
        nSub = 2, nCents = n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // test-side brute force in the same fixed-point arithmetic
    def fp(v: Array[Float]): Array[Long] =
      v.map(x => math.round(x.toDouble * 1000000.0))
    val fps = vecs.map { case (id, v) => id -> fp(v) }.toMap
    for (q <- 0L until 3L) {
      val exp = fps.keys.filter(_ != q).map { c =>
        val d = fps(q).zip(fps(c)).map { case (a, b) => (a - b) * (a - b) }.sum
        (c, d)
      }.toSeq.sortBy { case (c, d) => (d, c) }.take(4)
      val got = out.filter(_._1 == q).sortBy(_._3).map(r => (r._2, r._4)).toSeq
      assert(got == exp, s"query $q: got $got expected $exp")
    }
  }

  test("hashedTf buckets conserve token mass and find identical docs at cos 1.0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // identical to doc 1
      (3L, "zeta eta theta iota kappa lambda")
    ).toDF("doc_id", "text")
    val v = TextFunctions.hashedTf(docs, dim = 16)
    val sums = v.select(col("doc_id"),
        aggregate(col("vec"), lit(0L), _ + _).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sums == Map(1L -> 5L, 2L -> 5L, 3L -> 6L)) // mass = token count
    val cands = v.select(col("doc_id").as("vec_id"),
      transform(col("vec"), _.cast("float")).as("embedding"))
    val queries = cands.filter(col("vec_id") === 1L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val knn = Similarity.bruteForceTopK(cands, queries, k = 2).collect()
    assert(knn.head.getLong(1) == 2L && knn.head.getDouble(3) == 1.0) // twin first
  }

  test("winsorize clips to per-group percentile cut points, keeps NULLs NULL") {
    val df = ((1 to 100).map(i => (i.toLong, "a", Some(i.toDouble))) :+
      (101L, "a", None) :+ (102L, "b", Some(5.0))).toDF("id", "g", "v")
    val out = graft.operators.Robust.winsorize(df, "v", "g", lo = 0.10, hi = 0.90)
      .collect().map(r => r.getLong(r.fieldIndex("id")) ->
        (if (r.isNullAt(r.fieldIndex("v_w"))) None else Some(r.getDouble(r.fieldIndex("v_w"))))).toMap
    // group a: p10 of 1..100 = 10.9, p90 = 90.1 (linear interpolation)
    assert(out(1L).contains(10.9) &&
      out(100L).exists(v => math.abs(v - 90.1) < 1e-9))
    assert(out(50L).contains(50.0)) // interior values untouched
    assert(out(101L).isEmpty)       // NULL stays NULL
    assert(out(102L).contains(5.0)) // single-value group clips to itself
  }

  test("robustZ scores by median/MAD and NULLs zero-MAD groups") {
    val df = (Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "a", 4.0), (5L, "a", 103.0)) ++
      (1 to 5).map(i => (10L + i, "b", 7.0))).toDF("id", "g", "v")
    val out = graft.operators.Robust.robustZ(df, "v", "g")
      .collect().map(r => r.getLong(r.fieldIndex("id")) ->
        (if (r.isNullAt(r.fieldIndex("robust_z"))) None
         else Some(r.getDouble(r.fieldIndex("robust_z"))))).toMap
    // group a: median 3, deviations {2,1,0,1,100} → MAD 1
    assert(out(3L).contains(0.0) && out(5L).contains(100.0) && out(1L).contains(-2.0))
    // classic stddev would have been dragged to ~44 by the outlier —
    // robust z keeps the spike at 100 MADs
    assert((11L to 15L).forall(i => out(i).isEmpty)) // MAD 0 → NULL
  }

  test("termCooccurrence: topN cut is deterministic, counts are doc-level") {
    val docs = Seq(
      (1L, "spark data data engine"),   // duplicates count once per doc
      (2L, "spark data pipeline"),
      (3L, "spark engine"),
      (4L, "noise floor")
    ).toDF("doc_id", "text")
    val out = TextFunctions.termCooccurrence(docs, topN = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // df: spark 3, data 2, engine 2, pipeline 1, noise 1, floor 1
    // top3 by (df desc, term asc) = spark, data, engine
    assert(out.keySet == Set(("data", "spark"), ("engine", "spark"), ("data", "engine")))
    assert(out(("data", "spark")) == ((2L, 3L, 2L)))  // both in docs 1,2
    assert(out(("engine", "spark")) == ((2L, 3L, 2L)))
    assert(out(("data", "engine")) == ((2L, 2L, 1L))) // only doc 1
  }

  test("rankTransform assigns deciles and percent ranks over a unique order") {
    val df = ((1 to 20).map(i => (i.toLong, "a", Some(i.toDouble))) :+
      (21L, "a", None) :+ (22L, "b", Some(3.0))).toDF("id", "g", "v")
    val out = graft.operators.Robust.rankTransform(df, "v", "g", "id")
      .collect().map(r => r.getLong(r.fieldIndex("id")) ->
        (r.getInt(r.fieldIndex("decile")), r.getDouble(r.fieldIndex("pct_rank")))).toMap
    assert(!out.contains(21L))              // NULL excluded, not ranked
    assert(out(1L) == (1, 0.0))             // min of group a
    assert(out(20L) == (10, 1.0))           // max of group a
    assert(out(10L)._1 == 5 &&              // pr = (rn-1)/(n-1) exactly
      out(10L)._2 == 9.0 / 19.0)
    assert(out(22L) == (1, 0.0))            // single-row group
  }

  test("sourceSpanOverlap counts distinct shared spans per source pair") {
    val boiler = (1 to 10).map(i => s"c$i").mkString(" ") // spans shared below
    val docs = Seq(
      (1L, "s1", s"$boiler unique one text body"),
      (2L, "s2", s"$boiler other words entirely here"),
      (3L, "s3", "totally different content with no shared spans at all")
    ).toDF("doc_id", "source", "text")
    val out = TextFunctions.sourceSpanOverlap(docs, width = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // the 10-token boilerplate yields 3 common 8-token windows
    assert(out(("s1", "s2")) == 3L)
    assert(!out.contains(("s1", "s3")) && !out.contains(("s2", "s3")))
  }

  test("pqTopK codes are bounded by the codebook and ADC is non-negative") {
    val n = 60
    val dim = 16
    val vecs = (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(d => (math.cos(i * 13 + d * 3) * 0.8).toFloat))
    }
    val cands = vecs.toDF("vec_id", "embedding")
    val queries = cands.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val out = Similarity.pqTopK(cands, queries, dim = dim, k = 5,
      nSub = 4, nCents = 8).collect()
    assert(out.length == 25) // 5 queries × k=5
    assert(out.forall(_.getLong(3) >= 0L))
    val perQ = out.groupBy(_.getLong(0))
    assert(perQ.forall { case (_, rs) =>
      rs.map(_.getLong(2)).sorted.sameElements(1L to 5L) })
  }

  test("bpeTrain learns the paper's merges with deterministic tie-breaks") {
    // Sennrich et al. 2016 shape: low*5, lower*2, newest*6, widest*3.
    // (e,s) and (s,t) tie at 9 -> lexicographic pick (e,s); after the
    // merge (es,t) stands alone at 9; then (l,o) and (o,w) tie at 7.
    val corpus = Seq(
      ("low " * 5) + ("lower " * 2),
      ("newest " * 6) + ("widest " * 3)
    ).toDF("text")
    val out = TextFunctions.bpeTrain(corpus, nMerges = 3)
      .orderBy("iter").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out(0) == ((1L, "e", "s", 9L)))
    assert(out(1) == ((2L, "es", "t", 9L)))
    assert(out(2) == ((3L, "l", "o", 7L)))
  }

  test("bpeVocab emits the merged symbols' corpus-weighted counts") {
    // After (e,s) then (es,t): low=l,o,w ×5; lower=l,o,w,e,r ×2;
    // newest=n,e,w,est ×6; widest=w,i,d,est ×3 — so w:16, est:9, e:8.
    val corpus = Seq(
      ("low " * 5) + ("lower " * 2),
      ("newest " * 6) + ("widest " * 3)
    ).toDF("text")
    val out = TextFunctions.bpeVocab(corpus, nMerges = 2, topN = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.take(3).toSeq == Seq(("w", 16L), ("est", 9L), ("e", 8L)))
  }

  test("bpeTrain counts overlapping pairs with multiplicity and merges left-to-right") {
    // "aaaa" x3: initial (a,a) appears 3 adjacent times per word -> 9.
    // Left-to-right merge yields (aa)(aa), NOT a(aa)a — iteration 2's
    // top pair must be (aa,aa), weight 3.
    val corpus = Seq.fill(3)("aaaa").toDF("text")
    val out = TextFunctions.bpeTrain(corpus, nMerges = 2)
      .orderBy("iter").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out(0) == ((1L, "a", "a", 9L)))
    assert(out(1) == ((2L, "aa", "aa", 3L)))
  }

  test("bpeEncodeStats applies the learned merges per document in closed form") {
    // Merges learned on this corpus: (e,s) then (es,t) — so
    // low→[l,o,w]=3 tokens, lower→5, newest→[n,e,w,est]=4, widest→4.
    val docs = Seq(
      (1L, ("low " * 5) + ("lower " * 2)),
      (2L, ("newest " * 6) + ("widest " * 3)),
      (3L, "???") // no [a-z]+ word at all
    ).toDF("doc_id", "text")
    val out = TextFunctions.bpeEncodeStats(docs, nMerges = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc1: 7 words, 5·3+2·5=25 bpe tokens, 5·3+2·5=25 chars → ratio 1.0
    assert(out(0) == ((1L, 7L, 25L, 25L, 1000000L)))
    // doc2: 9 words, 9·4=36 tokens, 9·6=54 chars → ratio 1.5
    assert(out(1) == ((2L, 9L, 36L, 54L, 1500000L)))
    // wordless doc: zero counts, zero ratio (not a crash, not dropped)
    assert(out(2) == ((3L, 0L, 0L, 0L, 0L)))
  }

  test("qualityLinear scores match hand-computed fixed-point arithmetic") {
    val docs = Seq(
      (1L, "the cat sat on the mat."), // fluent: 6 tokens, 3 stopwords
      (2L, "!!! ??? ;;;")              // punctuation noise
    ).toDF("doc_id", "text")
    val out = TextFunctions.qualityLinear(docs).orderBy("doc_id").collect()
    // doc1: stop_fp=3e6/6=500000, punct_fp=1e6/23=43478,
    //       avg_len=18e6/6=3e6 → dev=2e6;
    //       score=400000+1500000−434780−400000=1065220
    assert(out(0).getLong(1) == 500000L && out(0).getLong(2) == 43478L &&
      out(0).getLong(3) == 2000000L && out(0).getLong(4) == 1065220L &&
      out(0).getBoolean(5))
    // doc2: stop_fp=0, punct_fp=9e6/11=818181, dev=2e6 →
    //       score=400000+0−8181810−400000 < 0 → dropped
    assert(out(1).getLong(2) == 818181L && !out(1).getBoolean(5))
  }

  test("pplSample buckets monotonically in the LM score and keeps the whole head") {
    // 3 fluency tiers: repeated high-probability bigrams, mixed, unique
    val docs = (
      (1L to 4L).map(i => (i, "the cat sat on the mat " * 4)) ++
      (5L to 8L).map(i => (i, s"the cat rides bus line $i to work")) ++
      (9L to 12L).map(i => (i, s"zx$i qw$i er$i ty$i ui$i op$i"))
    ).toDF("doc_id", "text")
    val out = TextFunctions.pplSample(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length == 12)
    assert(out.forall { case (_, _, b, _) => b >= 1 && b <= 3 })
    // value-based buckets: a higher score can never land in a lower bucket
    for ((_, sa, ba, _) <- out; (_, sb, bb, _) <- out if sa < sb)
      assert(ba <= bb, s"score $sa in bucket $ba but $sb in bucket $bb")
    // the head (top bucket) is kept in full
    assert(out.filter(_._3 == 3).forall(_._4))
    // deterministic: a rerun produces the identical decision set
    val again = TextFunctions.pplSample(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("lsh_tuning s-curve is monotone with the known value at s=0.5") {
    val rows = SparkEntry.queries("lsh_tuning")(spark, "")
      .orderBy("s_bp").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.length == 19)
    // monotone nondecreasing candidate probability in s
    rows.sliding(2).foreach { case Array((_, a), (_, b)) => assert(a <= b) }
    // s=0.5: 1-(1-0.5^3)^4 = 0.41381... -> 4139 bp under floor chains
    assert(rows.find(_._1 == 5000L).get._2 == 4139L)
    // tails: near-zero candidate rate at s=0.05, near-certain at 0.95
    assert(rows.head._2 < 100 && rows.last._2 > 9900)
  }

  test("ngramNovelty scores the df=1 shingle fraction in closed form") {
    val docs = Seq(
      (1L, "a b c d"),   // shingles: "a b c"(df2), "b c d"(df1) → 1/2
      (2L, "a b c x"),   // shingles: "a b c"(df2), "b c x"(df1) → 1/2
      (3L, "p q r s t"), // all unique → 3/3
      (4L, "zz")         // <3 tokens → no shingles
    ).toDF("doc_id", "text")
    val out = TextFunctions.ngramNovelty(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((1L, 2L, 1L, 500000L)))
    assert(out(1) == ((2L, 2L, 1L, 500000L)))
    assert(out(2) == ((3L, 3L, 3L, 1000000L)))
    assert(out(3) == ((4L, 0L, 0L, 0L)))
  }

  test("blocklistFilter counts hits with multiplicity and distinct terms separately") {
    val docs = Seq(
      (1L, "slow slow dup fast"),   // 3 hits, 2 distinct terms
      (2L, "fast join merge"),      // clean
      (3L, "slow slow slow")        // 3 hits, 1 distinct — over maxHits=2
    ).toDF("doc_id", "text")
    val out = TextFunctions.blocklistFilter(docs, Seq("slow", "dup"), maxHits = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out(0) == ((3L, 2L, false)))
    assert(out(1) == ((0L, 0L, true)))
    assert(out(2) == ((3L, 1L, false)))
  }

  test("hardNegatives stays inside the cosine band and under the near-dup tier") {
    val mk = (a: Float, b: Float) => Array(a, b, 0f, 0f)
    val vecs = Seq(
      (0L, mk(1f, 0f)),        // query
      (1L, mk(0.99f, 0.14f)),  // near-dup (cos ~0.99) — excluded
      (2L, mk(0.3f, 0.954f)),  // cos ~0.3 — the hard negative
      (3L, mk(0f, 1f)),        // orthogonal — excluded
      (4L, mk(0.25f, 0.97f))   // cos ~0.25 — hard negative
    ).toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val out = Similarity.hardNegatives(vecs, q, k = 5, loCos = 0.2, hiCos = 0.4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._1).toSet == Set(2L, 4L))
    assert(out.forall { case (_, _, c) => c >= 0.2 && c < 0.4 })
    // ranking is by cosine descending with contiguous ranks
    assert(out.sortBy(_._2).map(_._1).toSeq == Seq(2L, 4L))
  }

  test("clusterBalancedSample caps every cell and assigns by nearest centroid") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),      // centroid of cell 0
      (1L, Array(0f, 1f, 0f, 0f)),      // centroid of cell 1
      (2L, Array(0.9f, 0.1f, 0f, 0f)),  // → cell 0
      (3L, Array(0.8f, 0.2f, 0f, 0f)),  // → cell 0
      (4L, Array(0.1f, 0.9f, 0f, 0f)),  // → cell 1
      (5L, Array(0f, 0.8f, 0f, 0f))     // → cell 1
    ).toDF("vec_id", "embedding")
    // uncapped: all 6 rows, assignments as constructed
    val all = Similarity.clusterBalancedSample(vecs, dim = 4, nCells = 2,
        perCell = 10).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(all == Map(0L -> 0L, 2L -> 0L, 3L -> 0L, 1L -> 1L, 4L -> 1L, 5L -> 1L))
    // capped: exactly perCell per cell, and a subset of the assignment
    val capped = Similarity.clusterBalancedSample(vecs, dim = 4, nCells = 2,
        perCell = 2).collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(capped.length == 4)
    assert(capped.groupBy(_._2).forall(_._2.length == 2))
    assert(capped.forall { case (v, c) => all(v) == c })
    // a wrong dim fails loudly at the first action, not silently
    intercept[Exception] {
      Similarity.clusterBalancedSample(vecs, dim = 64, nCells = 2,
        perCell = 2).collect()
    }
  }

  test("rrfFuse sums exact reciprocal-rank millionths across lists") {
    import graft.operators.Fusion
    val lex = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val den = Seq((20L, 1L), (40L, 2L)).toDF("doc_id", "rank")
    val out = Fusion.rrfFuse(Seq(lex, den), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 1e6 div (60+r): r=1→16393, r=2→16129, r=3→15873
    assert(out.toSeq == Seq(
      (20L, 2L, 16129L + 16393L, 1L), // retrieved by both lists → wins
      (10L, 1L, 16393L, 2L),
      (40L, 1L, 16129L, 3L),
      (30L, 1L, 15873L, 4L)))
  }

  test("rrfFuse breaks fused-score ties by doc_id and honors topK") {
    import graft.operators.Fusion
    val a = Seq((7L, 1L), (5L, 2L)).toDF("doc_id", "rank")
    val b = Seq((5L, 1L), (7L, 2L)).toDF("doc_id", "rank")
    // both docs score 16393+16129 — tie; 5 < 7 wins rank 1
    val out = Fusion.rrfFuse(Seq(a, b), topK = 1).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 5L && out(0).getLong(3) == 1L)
  }

  test("rrfFuse single-list fusion preserves the input ranking order") {
    import graft.operators.Fusion
    val a = Seq((3L, 1L), (9L, 2L), (4L, 3L)).toDF("doc_id", "rank")
    val out = Fusion.rrfFuse(Seq(a), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(out.toSeq == Seq((3L, 1L), (9L, 2L), (4L, 3L)))
  }

  test("nbClassify: separable labels recover, blends follow evidence, unknown-only docs fall to the deterministic prior path") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val train = Seq(
      (1L, "x x x", "a"), (2L, "x y", "a"),
      (3L, "z z", "b"), (4L, "z w", "b"))
      .toDF("doc_id", "text", "source")
    val score = Seq(
      (10L, "x x"),     // pure label-a evidence
      (11L, "z"),       // pure label-b evidence
      (12L, "x z z"),   // b-dominant blend
      (13L, "q"))       // unknown term only — prior + default decide
      .toDF("doc_id", "text").withColumn("source", org.apache.spark.sql.functions.lit("?"))
    val got = TextFunctions.nbClassify(train, score)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(10L) == "a", s"got $got")
    assert(got(11L) == "b", s"got $got")
    assert(got(12L) == "b", s"got $got")
    assert(got.contains(13L)) // deterministic, engine-defined below
    // exact arithmetic: identical under repartitioning — including
    // the unknown-only doc's tie-path decision
    val got2 = TextFunctions.nbClassify(
      train.repartition(3), score.repartition(2))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == got2, "nbClassify changed under repartitioning")
    // self-classification on the training set recovers every label
    // (fully separable vocabularies)
    val self = TextFunctions.nbClassify(train, train)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(self == Map(1L -> "a", 2L -> "a", 3L -> "b", 4L -> "b"), s"got $self")
  }

  test("tokenEntropy: closed-form bits on power-of-two distributions; zero for constant docs; repartition-stable") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val docs = Seq(
      (1L, "a a a a"),        // one symbol: H = 0
      (2L, "a b"),            // uniform over 2: H = 1 bit
      (3L, "a a b b"),        // still uniform over 2: H = 1 bit
      (4L, "a b c d"),        // uniform over 4: H = 2 bits
      (5L, "a a a b"))        // skewed: 0 < H < 1 bit
      .toDF("doc_id", "text")
    val got = TextFunctions.tokenEntropy(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // powers of two are EXACT in the fp16 log (msb-only, zero frac)
    assert(got(1L) == 0L, s"got $got")
    assert(got(2L) == 65536L, s"got $got")
    assert(got(3L) == 65536L, s"got $got")
    assert(got(4L) == 131072L, s"got $got")
    assert(got(5L) > 0L && got(5L) < 65536L, s"got $got")
    val got2 = TextFunctions.tokenEntropy(docs.repartition(3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == got2, "tokenEntropy changed under repartitioning")
  }
}
