package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, UrlFunctions}

/** Boilerplate segment removal, DSIR importance weights, and URL
  * canonicalization — the curation-layer additions. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private val chrome = "cookie notice click accept button to continue" // 7 tokens → spills segments
  private val banner = "subscribe to our newsletter now today"  // 6 tokens → one segment

  test("boilerplateHashes flags only segments shared across > maxDf docs") {
    val docs = Seq(
      (1L, s"$banner alpha beta gamma delta epsilon zeta"),
      (2L, s"$banner eta theta iota kappa lambda mu"),
      (3L, "nu xi omicron pi rho sigma")).toDF("doc_id", "text")
    val bad = TextFunctions.boilerplateHashes(docs, width = 6, maxDf = 1)
    // exactly the banner's 6-token segment repeats (docs 1 and 2 share
    // it as their first segment; every other segment is unique)
    assert(bad.length == 1)
    val bannerHash = docs.sparkSession.range(1)
      .select(TextFunctions.shingleHash(lit(banner)).as("h"))
      .head().getLong(0)
    assert(bad.head == bannerHash)
  }

  test("boilerplateRemove strips flagged segments, keeps order and counts") {
    val docs = Seq(
      (1L, s"$banner alpha beta gamma delta epsilon zeta"),
      (2L, s"$banner eta theta iota kappa lambda mu"),
      (3L, "nu xi omicron pi rho sigma")).toDF("doc_id", "text")
    val bad = TextFunctions.boilerplateHashes(docs, width = 6, maxDf = 1)
    val out = TextFunctions.boilerplateRemove(docs, bad, width = 6)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text_clean") == "alpha beta gamma delta epsilon zeta")
    assert(out(0).getAs[Long]("n_segments") == 2 && out(0).getAs[Long]("n_removed") == 1)
    assert(out(1).getAs[String]("text_clean") == "eta theta iota kappa lambda mu")
    assert(out(2).getAs[String]("text_clean") == "nu xi omicron pi rho sigma")
    assert(out(2).getAs[Long]("n_removed") == 0)
  }

  test("boilerplateRemove with empty vocabulary is a tokenization no-op") {
    val docs = Seq((1L, "  Mixed   CASE   text  here five six ")).toDF("doc_id", "text")
    val out = TextFunctions.boilerplateRemove(docs, Array.empty[Long], width = 6).head()
    // segments re-join over the lowercased, whitespace-collapsed tokens
    assert(out.getAs[String]("text_clean") == "mixed case text here five six")
    assert(out.getAs[Long]("n_removed") == 0)
  }

  test("boilerplate hash cut is deterministic: df desc then hash asc, capped") {
    val docs = Seq(
      (1L, s"$banner $chrome x"), (2L, s"$banner $chrome y"),
      (3L, s"$banner one two three four five six")).toDF("doc_id", "text")
    // banner appears in 3 docs as first segment; the chrome-derived
    // second segments of docs 1/2 differ (7-token chrome spills into
    // the next segment with the differing tail token), so banner is
    // the clear top hash; capN=1 must keep exactly it
    val bad1 = TextFunctions.boilerplateHashes(docs, width = 6, maxDf = 1, capN = 1)
    val badAll = TextFunctions.boilerplateHashes(docs, width = 6, maxDf = 1, capN = 16)
    assert(bad1.length == 1 && badAll.contains(bad1.head))
  }

  test("dsirWeights: target == raw gives zero scores everywhere") {
    val docs = Seq((1L, "a b c"), (2L, "d e f g"), (3L, "h i")).toDF("doc_id", "text")
    val out = TextFunctions.dsirWeights(docs, docs, dim = 16, topM = 2)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getAs[Long]("score_fp") == 0L))
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq == Seq(3L, 4L, 2L))
    // all tied at zero: top-2 by doc_id
    assert(out.map(_.getAs[Boolean]("selected")).toSeq == Seq(true, true, false))
  }

  test("dsirWeights ranks target-like docs above off-target docs") {
    val docs = Seq(
      (1L, "quality prose quality prose quality prose"),
      (2L, "spam junk spam junk spam junk")).toDF("doc_id", "text")
    val target = Seq(Tuple1("quality prose quality prose")).toDF("text")
    val out = TextFunctions.dsirWeights(docs, target, dim = 16, topM = 1)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("score_fp") > out(1).getAs[Long]("score_fp"))
    assert(out(0).getAs[Boolean]("selected") && !out(1).getAs[Boolean]("selected"))
  }

  test("urlNormalize: case, default port, tracking params, sort, slash, fragment") {
    val cases = Seq(
      "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag" ->
        "http://www.example.com/a/b?a=1&b=2",
      "https://Example.com:443/" -> "https://example.com/",
      "https://example.com" -> "https://example.com/",
      "http://example.com:8080/x" -> "http://example.com:8080/x",
      "https://example.com/p?utm_a=1&gclid=2&ref=z" -> "https://example.com/p",
      "  https://example.com/p?z=1&y=2  " -> "https://example.com/p?y=2&z=1",
      // no scheme: trimmed + fragment-stripped, otherwise untouched
      "example.com/x#y" -> "example.com/x")
    val out = cases.map(_._1).toDF("url")
      .select(UrlFunctions.urlNormalize(col("url"))).as[String].collect()
    out.zip(cases.map(_._2)).foreach { case (got, want) => assert(got == want) }
  }

  test("urlHost and registeredDomain") {
    val rows = Seq(
      "https://WWW.BBC.CO.UK:443/news" -> ("www.bbc.co.uk", "bbc.co.uk"),
      "http://a.b.Example.com/x" -> ("a.b.example.com", "example.com"),
      "http://localhost:8080/" -> ("localhost", "localhost"))
    val out = rows.map(_._1).toDF("url")
      .select(UrlFunctions.urlHost(col("url")).as("h"),
        UrlFunctions.registeredDomain(UrlFunctions.urlHost(col("url"))).as("d"))
      .as[(String, String)].collect()
    out.zip(rows.map(_._2)).foreach { case (got, want) => assert(got == want) }
  }

  test("CorpusPipeline.prepare boilerplateWidth strips shared chrome in place") {
    def words(tag: String) = (1 to 24).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (1L, s"$banner ${words("alpha")}"),
      (2L, s"$banner ${words("beta")}"),
      (3L, words("gamma"))).toDF("doc_id", "text")
    val off = graft.pipeline.CorpusPipeline.prepare(docs)
    val on = graft.pipeline.CorpusPipeline.prepare(docs, boilerplateWidth = Some(6))
    assert(off.filtered.filter(col("text").contains("subscribe")).count() == 2)
    // stage on: the banner segment is gone from every doc, other
    // columns and the doc set ride through
    assert(on.filtered.filter(col("text").contains("subscribe")).count() == 0)
    assert(on.filtered.count() == 3 && on.deduped.count() == 3)
    val t1 = on.filtered.filter(col("doc_id") === 1).select("text").head().getString(0)
    assert(t1 == words("alpha"))
  }

  test("calibratedTopPct cuts per group — low-scoring domains keep their share") {
    import graft.operators.Robust
    // domain A scores 100..91, domain B scores 10..1: a global top-30%
    // threshold would keep ONLY A; the calibrated cut keeps 3 of each
    val rows = (0 until 10).map(i => (i.toLong, "A", 100L - i)) ++
      (0 until 10).map(i => (100L + i, "B", 10L - i))
    val df = rows.toDF("doc_id", "source", "score_fp")
    val kept = Robust.calibratedTopPct(df, "score_fp", "source", 30, "doc_id")
      .collect().map(r => (r.getString(1), r.getLong(0))).toSeq
    assert(kept.count(_._1 == "A") == 3)
    assert(kept.count(_._1 == "B") == 3)
    assert(kept.filter(_._1 == "A").map(_._2).sorted == Seq(0L, 1L, 2L))
    assert(kept.filter(_._1 == "B").map(_._2).sorted == Seq(100L, 101L, 102L))
    // deterministic under ties: equal scores fall back to id order
    val ties = (0 until 10).map(i => (i.toLong, "C", 7L)).toDF("doc_id", "source", "score_fp")
    val keptTies = Robust.calibratedTopPct(ties, "score_fp", "source", 30, "doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(keptTies == Seq(0L, 1L, 2L))
    // CEILING semantics: a domain too small for the percentage to
    // reach a whole row still keeps its best row (preserving the mix),
    // and ceil(4·0.3)=2 keeps two of four
    val small = Seq((0L, "S", 9L), (1L, "S", 5L),
      (10L, "M", 4L), (11L, "M", 3L), (12L, "M", 2L), (13L, "M", 1L))
      .toDF("doc_id", "source", "score_fp")
    val keptSmall = Robust.calibratedTopPct(small, "score_fp", "source", 30, "doc_id")
      .collect().map(r => (r.getString(1), r.getLong(0))).toSeq
    assert(keptSmall.filter(_._1 == "S").map(_._2) == Seq(0L),
      s"a 2-doc domain at 30% must keep its best row: $keptSmall")
    assert(keptSmall.filter(_._1 == "M").map(_._2).sorted == Seq(10L, 11L))
  }

  test("calibratedTopPctSketch: exact-regime parity with the rank path, no window") {
    import graft.operators.Robust
    // distinct scores → threshold semantics == rank semantics exactly
    val rows = (0 until 40).map(i => (i.toLong, "A", 1000L - i)) ++
      (0 until 10).map(i => (100L + i, "B", 10L - i)) ++
      Seq((200L, "S", 5L), (201L, "S", 3L)) // small domain keeps its best
    val df = rows.toDF("doc_id", "source", "score_fp")
    val rank = Robust.calibratedTopPct(df, "score_fp", "source", 30, "doc_id")
      .collect().map(_.getLong(0)).toSet
    val sketch = Robust.calibratedTopPctSketch(df, "score_fp", "source", 30)
      .collect().map(r => r.getAs[Long]("doc_id")).toSet
    assert(sketch == rank, s"sketch $sketch vs rank $rank")
    // cutoff TIES all survive (score-threshold semantics)
    val ties = (Seq((0L, "T", 9L)) ++ (1 until 10).map(i => (i.toLong, "T", 5L)))
      .toDF("doc_id", "source", "score_fp")
    // n=10, keep 30% → cutoff = 70th-pct ascending = 5 → every 5 survives
    val keptTies = Robust.calibratedTopPctSketch(ties, "score_fp", "source", 30)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(keptTies == (0L until 10L).toSet, keptTies.toString)
  }

  test("calibratedTopPctSketch: a dominant group never sorts its rows") {
    import graft.operators.Robust
    // one domain holds ~99% of the input — the exact rank path would
    // serialize it into a single window partition; the sketch path
    // must plan NO Window and NO per-group Sort of the data rows
    val big = spark.range(200000).selectExpr(
      "id AS doc_id", "'dominant' AS source", "(id * 37) % 100000 AS score_fp")
    val small = spark.range(50).selectExpr(
      "id + 1000000 AS doc_id", "'minor' AS source", "id AS score_fp")
    val df = big.unionAll(small)
    val kept = Robust.calibratedTopPctSketch(df, "score_fp", "source", 20)
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"rank window in the sketch path:\n$plan")
    assert(!plan.contains("SortExec") && !plan.toLowerCase.contains("\nsort"),
      s"per-group sort of data rows in the sketch path:\n$plan")
    // the data side must reach the filter via a BROADCAST of the tiny
    // cutoff frame — no hash exchange of the 200k rows
    assert(plan.contains("BroadcastHashJoin"), plan)
    // sanity: roughly the top 20% of the dominant group survives (ties
    // at the cutoff may add a handful)
    val n = kept.filter(col("source") === "dominant").count()
    assert(n >= 39000 && n <= 41000, s"kept $n of 200000 at 20%")
  }

  test("lengthBuckets: power-of-two tops are bit-exact, waste in exact bps") {
    import graft.functions.TextFunctions
    // token counts 1, 2, 3, 5, 8 — covers the n<=1 identity bucket,
    // exact powers (2 and 8 must NOT round up into the next bucket,
    // the float-log2 failure mode), and an interior value per bucket
    val docs = Seq("a", "a b", "a b c", "a b c d e",
      "a b c d e f g h").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextFunctions.lengthBuckets(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(out.keySet == Set(1L, 2L, 4L, 8L))
    assert(out(1L) == ((1L, 1L, 0L, 0L)))          // n=1: no padding
    assert(out(2L) == ((1L, 2L, 0L, 0L)))          // n=2 stays in bucket 2
    assert(out(4L) == ((1L, 3L, 1L, 2500L)))       // n=3: 1 of 4 padded
    assert(out(8L) == ((2L, 13L, 3L, 1875L)))      // n=5,8: 3 of 16 padded
  }

  test("urlNormalize idempotence: normalizing a normal form is a no-op") {
    val urls = Seq(
      "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
      "https://Example.com:443/", "http://h.example.org/p?c=3&a=1&b=2")
    val df = urls.toDF("url")
    val once = df.select(UrlFunctions.urlNormalize(col("url")).as("u"))
    val twice = once.select(UrlFunctions.urlNormalize(col("u")).as("u"))
    assert(once.as[String].collect().toSeq == twice.as[String].collect().toSeq)
  }
}
