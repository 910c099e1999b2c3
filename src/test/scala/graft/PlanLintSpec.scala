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
    // NOTE no repartition here: a round-robin repartition would itself
    // shuffle the text and (correctly) trip the linter
    val docs = (1L to 50L).map(i => (i, s"document body $i"))
      .toDF("doc_id", "text")
    // anti-pattern: grouping ON the text shuffles the text
    val bad = docs.groupBy("text").agg(count(lit(1)).as("n"))
    assert(PlanLint.lint(bad).exists(_.rule == "wide-shuffle"))
    // the engine convention: hash first, shuffle the hash
    val good = docs.groupBy(md5(col("text")).as("h")).agg(count(lit(1)).as("n"))
    assert(!PlanLint.lint(good).exists(_.rule == "wide-shuffle"))
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
