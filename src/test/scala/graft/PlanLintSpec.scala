package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.plans.PlanLint

class PlanLintSpec extends SparkSpec {
  import spark.implicits._

  test("flags cartesian products") {
    val a = Seq(1L, 2L).toDF("x")
    val b = Seq(3L, 4L).toDF("y")
    val f = PlanLint.lint(a.crossJoin(b))
    assert(f.exists(_.rule == "cartesian"), f.mkString("; "))
  }

  test("passes the scalar-broadcast pattern: cross join against a provably 1-row side") {
    val facts = spark.range(0, 100).select(col("id"), (col("id") % 7).as("v"))
    // global aggregate side: one stats row attached to every fact row
    val stats = facts.agg(max("v").as("mx"))
    val f1 = PlanLint.lint(facts.crossJoin(broadcast(stats)))
    assert(!f1.exists(_.rule == "cartesian"), f1.mkString("; "))
    // limit-1 side: the top key attached to every row
    val top = facts.orderBy(col("v").desc, col("id").desc).limit(1)
      .select(col("id").as("top_id"))
    val f2 = PlanLint.lint(facts.crossJoin(broadcast(top)))
    assert(!f2.exists(_.rule == "cartesian"), f2.mkString("; "))
  }

  test("flags a wide column crossing a shuffle, passes the hash-only shape") {
    val docs = (1L to 50L).map(i => (i, s"document body $i"))
      .toDF("doc_id", "text")
    // anti-pattern: grouping ON the text shuffles the text (a planner-
    // inserted ENSURE_REQUIREMENTS exchange carries the wide column)
    val bad = docs.groupBy("text").agg(count(lit(1)).as("n"))
    assert(PlanLint.lint(bad).exists(_.rule == "wide-shuffle"))
    // the engine convention: hash first, shuffle the hash
    val good = docs.groupBy(md5(col("text")).as("h")).agg(count(lit(1)).as("n"))
    assert(!PlanLint.lint(good).exists(_.rule == "wide-shuffle"))
    // an EXPLICIT caller repartition is the parallelism bootstrap /
    // shard-redistribution idiom (REPARTITION_BY_* origin): moving the
    // payload once is its whole point, so it is not a finding...
    val boot = docs.repartition(4, col("doc_id"))
      .select(col("doc_id"), length(col("text")).as("n"))
    assert(!PlanLint.lint(boot).exists(_.rule == "wide-shuffle"))
    // ...but a keyed operator DOWNSTREAM of the bootstrap that still
    // carries text through its own exchange keeps flagging
    val bootBad = docs.repartition(4, col("doc_id"))
      .groupBy("text").agg(count(lit(1)).as("n"))
    assert(PlanLint.lint(bootBad).exists(_.rule == "wide-shuffle"))
  }

  test("flags an unpushed filter on a parquet scan, passes a pushed one") {
    val dir = Files.createTempDirectory("graft_lint").toString + "/t"
    (1L to 100L).map(i => (i, i * 2)).toDF("id", "v").write.parquet(dir)
    val scan = spark.read.parquet(dir)
    // pushable predicate: no finding
    val pushed = scan.filter(col("id") > 50)
    assert(!PlanLint.lint(pushed).exists(_.rule == "unpushed-filter"),
      PlanLint.lint(pushed).mkString("; "))
    // cast-wrapped column defeats pushdown: finding
    val defeated = scan.filter(col("id").cast("string") === "7")
    assert(PlanLint.lint(defeated).exists(_.rule == "unpushed-filter"),
      PlanLint.lint(defeated).mkString("; "))
  }

  test("passes a runtime-bounded broadcast side AQE rewrote past the static bound") {
    // a filtered side is statically unbounded (no limit/aggregate shape),
    // but once executed the AQE broadcast stage carries an exact row
    // count — a materialized <=cap side is provably linear fan-out
    val facts = spark.range(0, 500).select(col("id"), (col("id") % 7).as("v"))
    val tiny = facts.filter(col("id") < 5).select(col("id").as("q_id"))
    val joined = facts.crossJoin(broadcast(tiny))
    joined.queryExecution.toRdd.count()
    val f = PlanLint.lint(joined)
    assert(!f.exists(_.rule == "cartesian"), f.mkString("; "))
  }

  test("never-pushable filters don't flag: derived expressions and post-explode columns") {
    val dir = Files.createTempDirectory("graft_lint2").toString
    (1L to 100L).map(i => (i, s"w$i body $i"))
      .toDF("id", "text").write.parquet(dir + "/docs")
    val docs = spark.read.parquet(dir + "/docs")
    // predicate on a derived expression — no possible pushdown, no finding
    val derived = docs.filter(size(split(col("text"), " ")) > 1)
    assert(!PlanLint.lint(derived).exists(_.rule == "unpushed-filter"),
      PlanLint.lint(derived).mkString("; "))
    // predicate on an exploded (generated) column — the filter consumes
    // rows the scan never produced; attributing it to the scan would be
    // a false finding
    val exploded = docs
      .select(col("id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") === "body")
    assert(!PlanLint.lint(exploded).exists(_.rule == "unpushed-filter"),
      PlanLint.lint(exploded).mkString("; "))
    // a NEGATED mixed conjunction pushes only whole (translateFilter
    // translates Not iff its entire child translates), so with one
    // never-pushable arm there is nothing any rewrite could push
    val negMixed = docs.filter(!(col("id") > 50 && length(col("text")) % 3 > 1))
    assert(!PlanLint.lint(negMixed).exists(_.rule == "unpushed-filter"),
      PlanLint.lint(negMixed).mkString("; "))
    // a cast FROM a string has no equivalent uncast predicate
    // (cast(s AS int) = 5 also matches '05') — not a pushdown miss
    val strCast = docs.filter(col("text").cast("int") > 5)
    assert(!PlanLint.lint(strCast).exists(_.rule == "unpushed-filter"),
      PlanLint.lint(strCast).mkString("; "))
  }

  test("CastRoundtripSimplify: int→double→int predicate reaches the parquet scan") {
    val dir = Files.createTempDirectory("graft_lint3").toString + "/t"
    (1 to 100).map(i => (i, i * 2)).toDF("id", "v").write.parquet(dir)
    // the staging-layer shape: an int column kept as double, guarded by
    // a cast-back comparison (Warehouse.dimRateCode over TaxiShape)
    val staged = spark.read.parquet(dir)
      .select(col("id").cast("double").as("rate_code_id"))
    val guarded = staged.filter(col("rate_code_id").cast("int") < 7)
    assert(!PlanLint.lint(guarded).exists(_.rule == "unpushed-filter"),
      PlanLint.lint(guarded).mkString("; "))
    val pushed = guarded.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metadata.getOrElse("PushedFilters", "[]")
    }
    assert(pushed.exists(p => p.contains("LessThan") || p.contains("id")),
      s"expected a pushed comparison, got $pushed")
    assert(guarded.count() === 6L)
  }

  test("the engine's own heavy queries lint clean") {
    val dir = "/root/testdata/sf0.001"
    // representative parity + corpus queries; exempt quadratic
    // baselines (dedup_ngram_jaccard) are not in this list by design
    for (q <- Seq("q1_agg", "fact_trip", "dedup_minhash", "span_dedup",
        "corpus_filter", "triangle_count", "salted_join",
        "bpe_encode", "quality_score_linear", "corpus_ppl_sample",
        "embed_cluster_sample")) {
      val f = PlanLint.lint(SparkEntry.queries(q)(spark, dir))
        .filterNot(_.rule == "unpushed-filter") // full-table reads scan all
      assert(f.isEmpty, s"$q: ${f.mkString("; ")}")
    }
  }
}
