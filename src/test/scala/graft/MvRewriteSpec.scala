package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.plans.MvCatalog

class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten

  private def hasAggregate(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(_.isInstanceOf[Aggregate])

  private def fixture(): (String, String) = {
    val base = Files.createTempDirectory("graft_mvrw").toString
    val src = s"$base/src"
    val mv = s"$base/mv"
    Seq(("en", "web", 10L, 1.5), ("en", "web", 20L, 2.5), ("en", "book", 5L, 0.5),
      ("de", "web", 7L, 3.0), ("de", "book", 11L, 1.0))
      .toDF("lang", "source", "n", "score").write.parquet(src)
    spark.read.parquet(src).groupBy("lang", "source")
      .agg(sum(col("n")).as("sum_n"), count(lit(1)).as("cnt"))
      .write.parquet(mv)
    (src, mv)
  }

  test("a registered view serves the matching aggregate transparently, answer unchanged") {
    val (src, mv) = fixture()
    def q = spark.read.parquet(src).groupBy("lang", "source")
      .agg(sum(col("n")).as("sum_n"), count(lit(1)).as("cnt"))
    val direct = q.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    MvCatalog.register(src, Seq("lang", "source"),
      Seq(("sum", Some("n"), "sum_n"), ("count", None, "cnt")), mv)
    try {
      val served = q
      assert(scanPaths(served).exists(_.contains(mv)), "view not served")
      assert(!hasAggregate(served), "Aggregate survived")
      val got = served.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == direct, "the rewrite changed the answer")
      // dims may come back in any grouping order
      val flipped = spark.read.parquet(src).groupBy("source", "lang")
        .agg(sum(col("n")).as("sum_n"), count(lit(1)).as("cnt"))
      assert(scanPaths(flipped).exists(_.contains(mv)))
    } finally MvCatalog.invalidate(src)
  }

  test("queries the view cannot answer exactly are left untouched") {
    val (src, mv) = fixture()
    MvCatalog.register(src, Seq("lang", "source"),
      Seq(("sum", Some("n"), "sum_n"), ("count", None, "cnt")), mv)
    try {
      // a dim the view does not carry (rollup only goes COARSER over
      // view dims — a new dim cannot be recovered from aggregates)
      val byScore = spark.read.parquet(src).groupBy("score")
        .agg(sum(col("n")).as("sum_n"))
      assert(!scanPaths(byScore).exists(_.contains(mv)) && hasAggregate(byScore))
      // an aggregate the view does not carry
      val withAvg = spark.read.parquet(src).groupBy("lang", "source")
        .agg(sum(col("n")).as("sum_n"), avg(col("n")).as("a"))
      assert(!scanPaths(withAvg).exists(_.contains(mv)) && hasAggregate(withAvg))
      // a sum over a different measure
      val otherSum = spark.read.parquet(src).groupBy("lang", "source")
        .agg(sum(col("score")).as("sum_n"))
      assert(!scanPaths(otherSum).exists(_.contains(mv)) && hasAggregate(otherSum))
      // DISTINCT changes semantics — never served
      val dist = spark.read.parquet(src).groupBy("lang", "source")
        .agg(sum_distinct(col("n")).as("sum_n"), count(lit(1)).as("cnt"))
      assert(!scanPaths(dist).exists(_.contains(mv)) && hasAggregate(dist))
      // a filtered scan is not the registered shape
      val filtered = spark.read.parquet(src).filter(col("n") > 5)
        .groupBy("lang", "source")
        .agg(sum(col("n")).as("sum_n"), count(lit(1)).as("cnt"))
      assert(!scanPaths(filtered).exists(_.contains(mv)) && hasAggregate(filtered))
    } finally MvCatalog.invalidate(src)
  }

  test("staleness guard: a changed base table stops serving the view — fail-safe, not fail-wrong") {
    val (src, mv) = fixture()
    def q = spark.read.parquet(src).groupBy("lang", "source")
      .agg(sum(col("n")).as("sum_n"), count(lit(1)).as("cnt"))
    MvCatalog.register(src, Seq("lang", "source"),
      Seq(("sum", Some("n"), "sum_n"), ("count", None, "cnt")), mv)
    try {
      assert(scanPaths(q).exists(_.contains(mv)))
      // the base table moves: append one more row
      Seq(("fr", "web", 99L, 9.9)).toDF("lang", "source", "n", "score")
        .write.mode("append").parquet(src)
      val after = q
      assert(!scanPaths(after).exists(_.contains(mv)),
        "stale view must not serve")
      assert(hasAggregate(after))
      // and the answer reflects the NEW data
      assert(after.filter(col("lang") === "fr").count() == 1)
      // re-register after rebuild → serves again
      spark.read.parquet(src).groupBy("lang", "source")
        .agg(sum(col("n")).as("sum_n"), count(lit(1)).as("cnt"))
        .write.mode("overwrite").parquet(mv)
      MvCatalog.register(src, Seq("lang", "source"),
        Seq(("sum", Some("n"), "sum_n"), ("count", None, "cnt")), mv)
      assert(scanPaths(q).exists(_.contains(mv)))
      assert(q.filter(col("lang") === "fr").count() == 1)
    } finally MvCatalog.invalidate(src)
  }

  test("graft-table views: O(1) version guard serves, any commit un-serves, re-register after refresh serves again") {
    import graft.sources.TxnLog
    val base = Files.createTempDirectory("graft_mvrw").toString
    val root = s"$base/t"
    val mv = s"$base/mv"
    TxnLog.append(Seq(("en", 10L), ("en", 20L), ("de", 7L))
      .toDF("lang", "n"), root)
    def q = spark.read.format("graft").load(root).groupBy("lang")
      .agg(sum(col("n")).as("sum_n"), count(lit(1)).as("cnt"))
    q.write.parquet(mv)
    MvCatalog.registerGraft(spark, root, Seq("lang"),
      Seq(("sum", Some("n"), "sum_n"), ("count", None, "cnt")), mv)
    try {
      assert(scanPaths(q).exists(_.contains(mv)), "graft view not served")
      assert(!hasAggregate(q))
      assert(q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
        Set(("en", 30L, 2L), ("de", 7L, 1L)))
      // a time-travel read must NEVER serve the (current-version) view
      val pinned = spark.read.format("graft").option("versionAsOf", "0")
        .load(root).groupBy("lang")
        .agg(sum(col("n")).as("sum_n"), count(lit(1)).as("cnt"))
      assert(!scanPaths(pinned).exists(_.contains(mv)) && hasAggregate(pinned))
      // any commit bumps the version: the guard un-serves immediately
      TxnLog.append(Seq(("fr", 99L)).toDF("lang", "n"), root)
      val after = q
      assert(!scanPaths(after).exists(_.contains(mv)) && hasAggregate(after))
      assert(after.filter(col("lang") === "fr").count() == 1)
      // refresh + re-register → serves the new content
      after.write.mode("overwrite").parquet(mv)
      MvCatalog.registerGraft(spark, root, Seq("lang"),
        Seq(("sum", Some("n"), "sum_n"), ("count", None, "cnt")), mv)
      assert(scanPaths(q).exists(_.contains(mv)))
      assert(q.filter(col("lang") === "fr").count() == 1)
    } finally MvCatalog.invalidate(root)
  }

  test("rollup serving: coarser dims and the global aggregate re-aggregate the view, never the base; min/max kinds roll up too") {
    val base = Files.createTempDirectory("graft_mvrw").toString
    val src = s"$base/src"
    val mv = s"$base/mv"
    Seq(("en", "web", 10L), ("en", "web", 20L), ("en", "book", 5L),
      ("de", "web", 7L), ("de", "book", 11L))
      .toDF("lang", "source", "n").write.parquet(src)
    spark.read.parquet(src).groupBy("lang", "source")
      .agg(sum(col("n")).as("sum_n"), count(lit(1)).as("cnt"),
        min(col("n")).as("min_n"), max(col("n")).as("max_n"))
      .write.parquet(mv)
    MvCatalog.register(src, Seq("lang", "source"),
      Seq(("sum", Some("n"), "sum_n"), ("count", None, "cnt"),
        ("min", Some("n"), "min_n"), ("max", Some("n"), "max_n")), mv)
    try {
      // coarser dims: GROUP BY lang re-aggregates the (lang, source) view
      val byLang = spark.read.parquet(src).groupBy("lang")
        .agg(sum(col("n")).as("sum_n"), count(lit(1)).as("cnt"),
          min(col("n")).as("min_n"), max(col("n")).as("max_n"))
      assert(scanPaths(byLang).exists(_.contains(mv)), "rollup not served")
      assert(!scanPaths(byLang).exists(_.contains("/src")), "base still scanned")
      val got = byLang.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      assert(got == Set(("en", 35L, 3L, 5L, 20L), ("de", 18L, 2L, 7L, 11L)), s"got $got")
      // the GLOBAL aggregate (dims = Nil) rolls up too
      val global = spark.read.parquet(src)
        .agg(sum(col("n")).as("sum_n"), count(lit(1)).as("cnt"))
      assert(scanPaths(global).exists(_.contains(mv)))
      val g = global.head
      assert(g.getLong(0) == 53L && g.getLong(1) == 5L)
      // exact-dims MIN/MAX serve directly
      val direct = spark.read.parquet(src).groupBy("lang", "source")
        .agg(min(col("n")).as("min_n"), max(col("n")).as("max_n"))
      assert(scanPaths(direct).exists(_.contains(mv)) && !hasAggregate(direct))
      // a dim OUTSIDE the view still refuses
      val byN = spark.read.parquet(src).groupBy("n")
        .agg(count(lit(1)).as("cnt"))
      assert(!scanPaths(byN).exists(_.contains(mv)))
    } finally MvCatalog.invalidate(src)
  }

  test("unregistered tables and malformed registrations never engage") {
    val (src, mv) = fixture()
    val q = spark.read.parquet(src).groupBy("lang", "source")
      .agg(sum(col("n")).as("sum_n"))
    assert(!scanPaths(q).exists(_.contains(mv)) && hasAggregate(q))
    intercept[IllegalArgumentException] {
      MvCatalog.register(src, Seq("lang"), Seq(("avg", Some("n"), "a")), mv)
    }
    ()
  }

  test("an unlistable or empty base table refuses to register — a guard that can't fingerprint can't detect staleness") {
    val (_, mv) = fixture()
    val e = intercept[IllegalArgumentException] {
      MvCatalog.register("/no/such/base/table", Seq("lang"),
        Seq(("count", None, "cnt")), mv)
    }
    assert(e.getMessage.contains("empty or"), e.getMessage)
    val empty = Files.createTempDirectory("graft_mv_emptybase").toString
    intercept[IllegalArgumentException] {
      MvCatalog.register(empty, Seq("lang"), Seq(("count", None, "cnt")), mv)
    }
    ()
  }

  test("persisted catalog: a fresh session serves a previously registered view from the store, staleness still fail-safe") {
    val (src, mv) = fixture()
    val store = Files.createTempDirectory("graft_mvstore").toString + "/cat"
    spark.conf.set("spark.graft.mvCatalog", store)
    def q = spark.read.parquet(src).groupBy("lang", "source")
      .agg(sum(col("n")).as("sum_n"), count(lit(1)).as("cnt"))
    try {
      MvCatalog.register(src, Seq("lang", "source"),
        Seq(("sum", Some("n"), "sum_n"), ("count", None, "cnt")), mv)
      // simulate a FRESH process: the in-memory cache is gone, only
      // the TxnLog-backed store survives
      MvCatalog.resetCache()
      val served = q
      assert(scanPaths(served).exists(_.contains(mv)),
        "fresh session did not reload the persisted registration")
      assert(!hasAggregate(served))
      // the reloaded entry's staleness guard still fires: change the
      // base table and the view must stop serving
      Seq(("fr", "web", 100L, 1.0)).toDF("lang", "source", "n", "score")
        .write.mode("append").parquet(src)
      MvCatalog.resetCache()
      val after = q
      assert(!scanPaths(after).exists(_.contains(mv)), "served a stale view")
      assert(hasAggregate(after))
      // invalidate removes from the store too: a fresh cache no longer
      // sees the entry at all
      MvCatalog.invalidate(src)
      MvCatalog.resetCache()
      assert(!scanPaths(q).exists(_.contains(mv)))
    } finally {
      spark.conf.unset("spark.graft.mvCatalog")
      MvCatalog.invalidate(src)
      MvCatalog.resetCache()
    }
  }

  test("persisted catalog CAS: racing register/invalidate never lose a write") {
    // round-15 advice: persistPut/persistRemove were whole-store
    // read-modify-writes with no expectedLatest pin — two racing
    // sessions silently lost one registration (last writer wins).
    // Now the store write carries the pinned version and retries on
    // ConcurrentModificationException, so BOTH racers' effects land.
    val (srcA, mvA) = fixture()
    val (srcB, mvB) = fixture()
    val store = Files.createTempDirectory("graft_mvstore").toString + "/cat"
    spark.conf.set("spark.graft.mvCatalog", store)
    def qOf(src: String) = spark.read.parquet(src).groupBy("lang", "source")
      .agg(sum(col("n")).as("sum_n"), count(lit(1)).as("cnt"))
    try {
      (0 until 6).foreach { iter =>
        val start = new java.util.concurrent.CyclicBarrier(2)
        val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        val fA = scala.concurrent.Future { start.await()
          MvCatalog.register(srcA, Seq("lang", "source"),
            Seq(("sum", Some("n"), "sum_n"), ("count", None, "cnt")), mvA) }
        val fB = scala.concurrent.Future { start.await()
          if (iter % 2 == 0)
            MvCatalog.register(srcB, Seq("lang", "source"),
              Seq(("sum", Some("n"), "sum_n"), ("count", None, "cnt")), mvB)
          else MvCatalog.invalidate(srcB) }
        scala.concurrent.Await.result(fA, scala.concurrent.duration.Duration.Inf)
        scala.concurrent.Await.result(fB, scala.concurrent.duration.Duration.Inf)
        pool.shutdown()
        // a fresh cache shows BOTH racers' effects — nothing lost
        MvCatalog.resetCache()
        assert(scanPaths(qOf(srcA)).exists(_.contains(mvA)),
          s"iter $iter: racer A's registration was lost")
        val bServed = scanPaths(qOf(srcB)).exists(_.contains(mvB))
        if (iter % 2 == 0) assert(bServed, s"iter $iter: racer B's registration was lost")
        else assert(!bServed, s"iter $iter: racer B's invalidation was lost")
        MvCatalog.invalidate(srcA) // reset for the next iteration
      }
    } finally {
      spark.conf.unset("spark.graft.mvCatalog")
      MvCatalog.invalidate(srcA); MvCatalog.invalidate(srcB)
      MvCatalog.resetCache()
    }
  }
}
