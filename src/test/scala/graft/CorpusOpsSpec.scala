package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.operators.Sampling
import graft.pipeline.CorpusPipeline

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("spanDedup drops repeated chunks, keeps first occurrence, rebuilds text") {
    val boiler = (1 to 20).map(i => s"b$i").mkString(" ") // one full 20-token chunk
    val uniq = (1 to 20).map(i => s"u$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler $uniq"),       // first occurrence of boiler + unique
      (2L, s"$boiler ${uniq.replace("u", "v")}"), // boiler repeated → dropped
      (3L, boiler)                  // all chunks seen before → empty
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, window = 20).orderBy("doc_id").collect()
    assert(out(0).getString(1) == s"$boiler $uniq" && out(0).getInt(2) == 2)
    assert(out(1).getString(1) == uniq.replace("u", "v") && out(1).getInt(2) == 1)
    assert(out(2).getString(1) == "" && out(2).getInt(2) == 0)
  }

  test("spanDedup keeps short documents whole when unique") {
    val docs = Seq((1L, "only five little tokens here")).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, window = 20).head()
    assert(out.getString(1) == "only five little tokens here" && out.getInt(2) == 1)
  }

  test("shardShuffle covers all rows exactly once with dense per-shard positions") {
    val df = spark.range(0, 1000).toDF("doc_id")
    val out = Sampling.shardShuffle(df, "doc_id", nShards = 8, salt = "t")
    assert(out.count() == 1000)
    assert(out.select("doc_id").distinct().count() == 1000)
    assert(out.agg(max("shard")).head().getInt(0) <= 7)
    // positions within each shard are 1..n_shard with no gaps
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(bad.isEmpty)
  }

  test("shardShuffle is deterministic and salt-sensitive") {
    val df = spark.range(0, 200).toDF("doc_id")
    val a = Sampling.shardShuffle(df, "doc_id", 4, "s1").orderBy("doc_id").collect()
    val b = Sampling.shardShuffle(df, "doc_id", 4, "s1").orderBy("doc_id").collect()
    val c = Sampling.shardShuffle(df, "doc_id", 4, "s2").orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq != c.toSeq)
  }

  test("incrementalDedup accepts only corpus-new docs and emits an append-only delta") {
    val catalogDocs = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val catalog = catalogDocs.select(md5($"text").as("fingerprint")).distinct()
    val batch = Seq(
      (10L, "alpha"),  // already in catalog → dropped
      (11L, "gamma"),  // new → kept
      (12L, "gamma"),  // intra-batch dup → min id 11 wins
      (13L, "delta")   // new → kept
    ).toDF("doc_id", "text")
    val r = Dedup.incrementalDedup(batch, catalog)
    assert(r.fresh.select("doc_id").as[Long].collect().sorted.toSeq == Seq(11L, 13L))
    val delta = r.catalogDelta.collect().map(x => (x.getString(0), x.getLong(1))).toMap
    assert(delta.size == 2 && delta.values.toSet == Set(11L, 13L))
    // re-ingesting the same batch against the grown catalog yields nothing
    val grown = catalog.union(r.catalogDelta.select("fingerprint"))
    assert(Dedup.incrementalDedup(batch, grown).fresh.isEmpty)
  }

  test("weightedSample hits the budget, always keeps over-step rows, is deterministic") {
    // 2000 docs of 100 tokens each + 5 giants of 5000 tokens
    val docs = ((0 until 2000).map(i => (i.toLong, 100L)) ++
      (9000L until 9005L).map(i => (i, 5000L))).toDF("doc_id", "w")
    val step = 1000L
    val out = Sampling.weightedSample(docs, "doc_id", "w", step, nShards = 8, salt = "s")
    val totalW = 2000L * 100 + 5 * 5000
    val kept = out.count()
    // kept ≈ slots − collapsed giant slots (a 5000-token row straddles
    // 5 multiples but is one row) − per-shard tail slack
    val want = totalW / step - 5 * 4
    assert(math.abs(kept - want) <= 8, s"kept=$kept want≈$want")
    // every row heavier than step straddles a multiple — always in
    assert(out.filter(col("w") === 5000L).count() == 5)
    // deterministic
    val again = Sampling.weightedSample(docs, "doc_id", "w", step, nShards = 8, salt = "s")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // inclusion is weight-proportional: a 100-token doc keeps ~10%
    val lightRate = out.filter(col("w") === 100L).count().toDouble / 2000
    assert(lightRate > 0.05 && lightRate < 0.15, s"light-doc rate $lightRate")
  }

  test("incrementalNearDup screens vs the band catalog, dedups within batch, re-ingest is empty") {
    val accepted = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "completely different archival content about medieval trade routes and spice markets"))
      .toDF("doc_id", "text")
    val catalog = Dedup.lshBands(Dedup.minhashSignatures(accepted))
    val nearDupOfAccepted = "the quick brown fox jumps over the lazy dog near the river bank today"
    val batchDup = "unique fresh reporting on deep sea exploration and hydrothermal vent ecosystems found"
    val batch = Seq(
      (10L, nearDupOfAccepted),           // exact twin of doc 1 → band hit → dropped
      (11L, batchDup), (12L, batchDup),   // within-batch pair → keep min id 11
      (13L, "short"))                      // no shingles → passes through
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNearDup(batch, catalog)
    val freshIds = out.fresh.select("doc_id").as[Long].collect().toSet
    assert(freshIds == Set(11L, 13L), s"fresh=$freshIds")
    // delta carries only the fresh banded docs' rows, ready to append
    val deltaIds = out.catalogDelta.select("doc_id").distinct().as[Long].collect().toSet
    assert(deltaIds == Set(11L), s"delta=$deltaIds")
    // append the delta; re-ingesting the accepted doc drops it
    val grown = catalog.select("band_idx", "band_hash")
      .unionAll(out.catalogDelta.select("band_idx", "band_hash"))
    val again = Dedup.incrementalNearDup(Seq((20L, batchDup)).toDF("doc_id", "text"), grown)
    assert(again.fresh.isEmpty && again.catalogDelta.isEmpty)
  }

  test("weightedSample preserves caller columns, even ones named __w/__cum") {
    // the sampler windows over its own internal projection, so caller
    // columns colliding with its old working names must survive intact
    val docs = (0 until 200).map(i => (i.toLong, 100L, i * 7L, i * 11L))
      .toDF("doc_id", "w", "__w", "__cum")
    val out = Sampling.weightedSample(docs, "doc_id", "w", 1000L, nShards = 4, salt = "s")
    assert(out.columns.toSeq == Seq("doc_id", "w", "__w", "__cum"))
    assert(out.exceptAll(docs).isEmpty) // strictly a subset, rows unmodified
    assert(out.count() > 0)
  }

  test("topKPerStratum keeps exactly k rows per stratum, deterministically") {
    val docs = (0 until 300).map(i => (i.toLong, s"src${i % 3}", s"text $i"))
      .toDF("doc_id", "source", "text")
    val out = Sampling.topKPerStratum(docs, "doc_id", "source", k = 5, salt = "s")
    val bySource = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySource.values.toSet == Set(5L) && bySource.size == 3, s"$bySource")
    assert(out.exceptAll(docs).isEmpty) // strictly a subset, rows unmodified
    val again = Sampling.topKPerStratum(docs, "doc_id", "source", k = 5, salt = "s")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // a stratum smaller than k keeps all its rows
    val tiny = Sampling.topKPerStratum(docs.filter(col("doc_id") < 2), "doc_id", "source", k = 5)
    assert(tiny.count() == 2)
  }

  test("mixSources keeps rates per source and is a pure filter of the input") {
    val docs = (0 until 2000).map(i => (i.toLong, s"src${i % 2}", s"text $i")).toDF("doc_id", "source", "text")
    val kept = CorpusPipeline.mixSources(docs, Map("src0" -> 100, "src1" -> 0), defaultPct = 0)
    val bySource = kept.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySource.getOrElse("src0", 0L) == 1000 && !bySource.contains("src1"))
    // rate ~50%: binomial bounds, deterministic given salt
    val half = CorpusPipeline.mixSources(docs, Map("src0" -> 50), defaultPct = 50, salt = "m")
    val n = half.count()
    assert(n > 800 && n < 1200, s"~50% of 2000 expected, got $n")
    assert(half.exceptAll(docs).isEmpty) // strictly a subset, rows unmodified
  }

  test("budgetPerStratum fills each stratum's token budget greedily, never over") {
    val docs = (0 until 400).map(i =>
      (i.toLong, s"src${i % 4}", 10L + i % 7)).toDF("doc_id", "source", "w")
    val out = Sampling.budgetPerStratum(docs, "doc_id", "w", "source",
      Map("src0" -> 100L, "src1" -> 0L), defaultBudget = 50L, salt = "t")
    val taken = out.groupBy("source").agg(sum("w").as("tw"))
      .as[(String, Long)].collect().toMap
    assert(taken("src0") <= 100 && taken("src0") > 100 - 17) // filled to the boundary doc
    assert(!taken.contains("src1"))
    Seq("src2", "src3").foreach(s =>
      assert(taken(s) <= 50 && taken(s) > 50 - 17, s"$s -> ${taken(s)}"))
    // strictly a subset of the input, rows unmodified, deterministic
    assert(out.exceptAll(docs).isEmpty)
    val again = Sampling.budgetPerStratum(docs, "doc_id", "w", "source",
      Map("src0" -> 100L, "src1" -> 0L), defaultBudget = 50L, salt = "t")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("unimaxBudgets matches the sequential water-filling reference and its invariants") {
    // sequential reference: ascending by (cap, stratum); a source is
    // capped while its cap times the sources left fits the remaining
    // budget, then the rest split evenly with the remainder handed
    // one token apiece in sort order
    def ref(weights: Seq[(String, Long)], b: Long, capM: Long): Map[String, Long] = {
      var list = weights.map { case (s, w) => (s, w * capM / 1000000L) }
        .sortBy { case (s, c) => (c, s) }
      val res = scala.collection.mutable.Map[String, Long]()
      var rem = b
      while (list.nonEmpty) {
        val (s, c) = list.head
        if (c * list.size <= rem) { res(s) = c; rem -= c; list = list.tail }
        else {
          val share = rem / list.size; val r = (rem % list.size).toInt
          list.zipWithIndex.foreach { case ((s2, c2), i) =>
            res(s2) = math.min(c2, share + (if (i < r) 1 else 0)) }
          list = Nil
        }
      }
      res.toMap
    }
    // skewed masses: one dominant source, a tail of small ones
    val weights = Seq("en" -> 11757L, "zh" -> 4143L, "es" -> 3958L,
      "fr" -> 3758L, "de" -> 3549L)
    val docs = weights.flatMap { case (s, w) =>
      Seq((s + "_a", s, w / 2), (s + "_b", s, w - w / 2))
    }.toDF("doc_id", "stratum", "w")
    for ((b, capM) <- Seq((5433L, 250000L), (100000L, 250000L), (5433L, 2000000L),
                          (1L, 250000L), (6788L, 250000L), (6789L, 250000L))) {
      val got = Sampling.unimaxBudgets(docs, "w", "stratum", b, capM)
        .select("stratum", "budget").as[(String, Long)].collect().toMap
      assert(got == ref(weights, b, capM), s"b=$b capM=$capM")
      // invariants: budget <= cap, total = min(B, sum caps),
      // uncapped budgets within 1 of each other and >= every capped cap
      val caps = weights.map { case (s, w) => s -> w * capM / 1000000L }.toMap
      weights.foreach { case (s, _) => assert(got(s) <= caps(s)) }
      assert(got.values.sum == math.min(b, caps.values.sum))
      val uncapped = got.filter { case (s, v) => v < caps(s) }
      if (uncapped.nonEmpty) {
        assert(uncapped.values.max - uncapped.values.min <= 1)
        got.filter { case (s, v) => v == caps(s) }.foreach { case (_, c) =>
          assert(c <= uncapped.values.min + 1)
        }
      }
    }
  }

  test("unimaxMix fills the derived budgets greedily and is a pure subset") {
    val docs = (0 until 600).map { i =>
      val lang = if (i % 3 == 0) "en" else if (i % 3 == 1) "fr" else "de"
      (i.toLong, lang, 5L + i % 11)
    }.toDF("doc_id", "lang", "w")
    val budgets = Sampling.unimaxBudgets(docs, "w", "lang", 1200L, 500000L)
      .select("stratum", "budget").as[(String, Long)].collect().toMap
    val out = Sampling.unimaxMix(docs, "doc_id", "w", "lang", 1200L, 500000L, salt = "u")
    val taken = out.groupBy("lang").agg(sum("w").as("tw"))
      .as[(String, Long)].collect().toMap
    taken.foreach { case (s, tw) =>
      assert(tw <= budgets(s) && tw > budgets(s) - 16, s"$s -> $tw vs ${budgets(s)}")
    }
    assert(out.exceptAll(docs).isEmpty)
    val again = Sampling.unimaxMix(docs, "doc_id", "w", "lang", 1200L, 500000L, salt = "u")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("phraseSearch counts overlapping exact-phrase occurrences, zero-match docs absent") {
    import graft.functions.TextFunctions
    val docs = Seq(
      (1L, "the table part hash table part"),  // two occurrences
      (2L, "a a a"),                           // overlapping: "a a" twice
      (3L, "table x part"),                    // adjacency broken: no match
      (4L, "  Table   PART  "),                // case + whitespace normalize
      (5L, "short")                            // shorter than the phrase
    ).toDF("doc_id", "text")
    val got = TextFunctions.phraseSearch(docs, Seq("table", "part"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 4L -> 1L))
    val overlaps = TextFunctions.phraseSearch(docs, Seq("a", "a"))
      .as[(Long, Long)].collect().toMap
    assert(overlaps == Map(2L -> 2L))
    // single-term phrase degrades to a term-frequency filter
    val single = TextFunctions.phraseSearch(docs, Seq("table"))
      .as[(Long, Long)].collect().toMap
    assert(single == Map(1L -> 2L, 3L -> 1L, 4L -> 1L))
    intercept[IllegalArgumentException] {
      TextFunctions.phraseSearch(docs, Seq("two words"))
    }
    ()
  }

  test("keywordSearch ranks by the exact rational tf-idf and drops zero-score docs") {
    import graft.functions.TextFunctions
    val docs = Seq(
      (1L, "spark spark spark join"),  // tf(spark)=3
      (2L, "spark merge merge"),       // tf(spark)=1, tf(merge)=2
      (3L, "window"),                  // rare term only
      (4L, "nothing relevant here")    // zero score: dropped
    ).toDF("doc_id", "text")
    val out = TextFunctions.keywordSearch(docs, Seq("spark", "merge", "window"), k = 10)
      .collect()
    // N=4; df: spark=2, merge=1, window=1 → denom=(3)(2)(2)=12, N+1=5
    // doc1: 3*5*(2*2)=60; doc2: 1*5*4 + 2*5*(3*2)=20+60=80; doc3: 1*5*(3*2)=30
    val got = out.map(r => (r.getLong(0), r.getAs[Long]("score_num"))).toSeq
    assert(got == Seq((2L, 80L), (1L, 60L), (3L, 30L)), s"got $got")
    // reported double is exactly num/denom
    out.foreach(r =>
      assert(r.getAs[Double]("score") == r.getAs[Long]("score_num").toDouble / 12.0))
  }

  test("quantileBuckets: monotone in score, ties co-bucketed, no global sort") {
    val df = (0 until 1000).map(i => (i.toLong, (i % 100).toLong)).toDF("id", "score")
    val out = Sampling.quantileBuckets(df, "score", nBuckets = 4)
    assert(out.count() == 1000)
    // bucket range and monotonicity: higher score never lands lower
    val pairs = out.select("score", "bucket").distinct()
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(pairs.forall { case (_, b) => b >= 1 && b <= 4 })
    assert(pairs.sliding(2).forall {
      case Array((_, b1), (_, b2)) => b1 <= b2
      case _ => true
    })
    // equal scores always share a bucket (distinct (score,bucket) pairs == distinct scores)
    assert(pairs.length == 100)
    // scale guard: no single-partition window — the plan's only window-free;
    // the cut points come from one broadcast aggregate row
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global window found:\n$plan")
  }

  test("gopher rules: each rule fires on a crafted violator and passes clean prose") {
    import graft.functions.TextFunctions._
    val clean = (("the and of that have with be to " * 8) + "solid prose words here").trim
    val docs = Seq(
      (1L, clean),                                        // passes everything
      (2L, "too short"),                                  // word_count
      (3L, ("ab " * 60).trim),                            // mean word len < 3
      (4L, (("the of " * 30) + "# ## ### # # # # # # # # # # #").trim), // symbols > 10%
      (5L, (1 to 10).map(i => s"- bullet $i the of and that have with be to").mkString("\n")), // 100% bullet lines
      (6L, (1 to 10).map(i => s"line $i the of and that have with be to...").mkString("\n")), // 100% ellipsis lines
      (7L, (("the of " * 30) + ("42 17 99 " * 30)).trim), // <80% alphabetic words
      (8L, ("zeta koro miro vala tesh " * 12).trim)       // no required stopwords
    ).toDF("doc_id", "text")
    val out = docs
      .withColumn("m", gopherMeasures(col("text")))
      .withColumn("f", gopherFlags(col("m"), minRequiredHits = 2))
      .select(col("doc_id"), col("f.*"))
      .orderBy("doc_id").collect()
    def flags(i: Int) = (0 until 8).map(j => out(i).getBoolean(j + 1))
    assert(flags(0).forall(identity), s"clean doc should pass all: ${out(0)}")
    assert(!out(1).getBoolean(1) && !out(1).getBoolean(8))  // word_count_ok, keep
    assert(!out(2).getBoolean(2))                           // word_len_ok
    assert(!out(3).getBoolean(3))                           // symbol_ok
    assert(!out(4).getBoolean(4))                           // bullet_ok
    assert(!out(5).getBoolean(5))                           // ellipsis_ok
    assert(!out(6).getBoolean(6))                           // alpha_ok
    assert(!out(7).getBoolean(7))                           // stopword_ok
    // every violator is rejected
    (1 to 7).foreach(i => assert(!out(i).getBoolean(8), s"doc ${i + 1} must not keep"))
  }

  // storage levels of the checkpoint blocks a frame's own plan reads —
  // local to the frame, so the assertion cannot race other suites
  // sharing the session's persistent-RDD registry
  private def ckptLevels(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.getStorageLevel
    }

  test("cdcChunkRows: boundaries re-synchronize after an insertion (the CDC property)") {
    import graft.functions.TextFunctions
    val base = (1 to 200).map(i => s"tok${i * 37 % 91}x$i").mkString(" ")
    val edited = "inserted words here " + base
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val rows = TextFunctions.cdcChunkRows(docs)
    val h1 = rows.filter(col("doc_id") === 1).select("chunk_hash").as[Long].collect().toSet
    val h2 = rows.filter(col("doc_id") === 2).select("chunk_hash").as[Long].collect().toSet
    // a FIXED-window scheme would share ~0 windows after a 3-token
    // shift; content-defined boundaries re-sync, so most of the
    // unchanged tail's chunks hash identically
    val shared = (h1 & h2).size.toDouble / h1.size
    assert(shared > 0.5, s"only ${h1 & h2} of $h1 chunks survived the insertion")
    // chunks partition the token stream exactly
    val tokSum = rows.filter(col("doc_id") === 1).agg(sum("n_tokens")).head().getLong(0)
    assert(tokSum == 200L, s"chunks must cover all 200 tokens, got $tokSum")
    // deterministic: same input, same chunking
    val again = TextFunctions.cdcChunkRows(docs)
    assert(rows.exceptAll(again).isEmpty && again.exceptAll(rows).isEmpty)
  }

  test("cdcDedup keeps first chunk occurrences, survives an insertion shift, empties all-dup docs") {
    import graft.functions.TextFunctions
    val base = (1 to 120).map(i => s"tok${i * 37 % 91}x$i").mkString(" ")
    val docs = Seq(
      (1L, base),                      // original: keeps everything
      (2L, "shifted prefix here " + base), // insertion: shared tail chunks dropped
      (3L, base)                       // exact dup: everything seen → empty
    ).toDF("doc_id", "text")
    val out = TextFunctions.cdcDedup(docs).orderBy("doc_id").collect()
    assert(out(0).getString(1) == base && out(0).getInt(2) > 0)
    // the re-synchronized tail was deduplicated: doc 2 keeps its novel
    // prefix (plus at most the few pre-sync chunks) but sheds most tokens
    val kept2 = out(1).getString(1)
    assert(kept2.startsWith("shifted prefix here"), kept2.take(60))
    assert(kept2.length < base.length / 2,
      s"insertion variant should shed its shared tail, kept ${kept2.length} chars")
    assert(out(2).getString(1) == "" && out(2).getInt(2) == 0)
  }

  test("Prepared.release frees the result-owned checkpoint blocks") {
    val docs = (0 until 60).map(i =>
      (i.toLong, s"document number $i carries its own unique prose about topic $i and subject ${i * 7}"))
      .toDF("doc_id", "text")
    val prep = CorpusPipeline.prepare(docs, minTokens = 5, windowTokens = 32, nShards = 4)
    assert(prep.packed.count() > 0)
    val before = ckptLevels(prep.packed)
    assert(before.exists(_ != org.apache.spark.storage.StorageLevel.NONE),
      "packed should read at least one live checkpoint before release")
    prep.release()
    Seq(prep.filtered, prep.deduped, prep.decontaminated, prep.packed).foreach { f =>
      assert(ckptLevels(f).forall(_ == org.apache.spark.storage.StorageLevel.NONE),
        "all result-owned checkpoint blocks must be unpersisted after release")
    }
  }

  test("IncrementalNearDup.release frees the rejected-id and delta blocks") {
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "completely different archival content about medieval trade routes and spice markets"))
      .toDF("doc_id", "text")
    val empty = Seq.empty[(Long, Int, Long)].toDF("doc_id", "band_idx", "band_hash")
    val out = Dedup.incrementalNearDup(batch, empty)
    assert(out.fresh.count() == 2 && out.catalogDelta.count() > 0)
    assert(ckptLevels(out.catalogDelta)
      .exists(_ != org.apache.spark.storage.StorageLevel.NONE))
    out.release()
    Seq(out.fresh, out.catalogDelta).foreach { f =>
      assert(ckptLevels(f).forall(_ == org.apache.spark.storage.StorageLevel.NONE))
    }
  }

  test("skewAdvice recommends the ceil salt factor on hot keys, salt 1 on balanced") {
    import graft.operators.Profiler
    // hot: one key holds 100 of 110 rows; balanced: 11 keys x 10 rows
    val rows = (0 until 100).map(i => ("hot", s"k${i % 11}")) ++
      (0 until 10).map(i => (s"c$i", s"k${i % 11}")) ++
      (0 until 11).flatMap(k => (0 until 9).map(_ => (s"pad$k", s"k$k")))
    // columns: a (hot-key candidate), b (balanced candidate)
    val df = rows.toDF("a", "b")
    val n = rows.size.toLong
    val got = Profiler.skewAdvice(df, Seq("a", "b"), partitions = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getBoolean(5), r.getLong(6), r.getString(7)))
      .toMap
    val ideal = (n + 9) / 10
    val (nr, top, id, sk, salt, reason) = got("a")
    assert(nr == n && top == 100L && id == ideal && sk)
    assert(salt == (100L + ideal - 1) / ideal)
    assert(reason.startsWith("top 100 > 2 x ideal"))
    val (nrB, topB, _, skB, saltB, reasonB) = got("b")
    assert(nrB == n && !skB && saltB == 1L && reasonB == "balanced")
    assert(topB <= 2 * ideal)
  }

  test("corpusDrift: exact shares, one-sided sources, zero-token snapshot") {
    import graft.operators.Profiler
    val vA = Seq(("web", "a b c"), ("web", "d e"), ("books", "f g h i j"))
      .toDF("source", "text") // web 5 tokens, books 5 → shares 50/50
    val vB = Seq(("web", "a b c d e f g h"), ("wiki", "x y"))
      .toDF("source", "text") // web 8, wiki 2 → 80/20; books vanished
    val out = Profiler.corpusDrift(vA, vB).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
         r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(out("web") == ((2L, 1L, 5L, 8L, 500000L, 800000L, 300000L)))
    assert(out("books") == ((1L, 0L, 5L, 0L, 500000L, 0L, 500000L)))
    assert(out("wiki") == ((0L, 1L, 0L, 2L, 0L, 200000L, 200000L)))
    // TV distance = Σ|Δ|/2 = (300000+500000+200000)/2 = half a million
    assert(out.values.map(_._7).sum == 1000000L)
    // an empty snapshot reports zero shares, not a division error
    val empty = vA.filter(col("source") === "nope")
    val z = Profiler.corpusDrift(empty, vB).collect()
    assert(z.forall(_.getLong(5) == 0L)) // share_a_fp all zero
  }
}
