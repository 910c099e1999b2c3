package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: JIT/codegen/parquet-reader init and page cache are not
    // operator cost; run one shuffle + every table scan before timing.
    spark.range(1000000).selectExpr("sum(id % 7)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    // min of three timed runs per query: this VM's run-to-run variance
    // is ±30%, and the steady-state minimum is the honest throughput
    // figure. Failed runs report -1 (never a fast-failure latency).
    // Full evaluation via queryExecution.toRdd.count(): a plain count()
    // lets Catalyst prune every projection not needed for counting, so
    // map-only queries (text_scrub, token_count, ...) would be timed as
    // bare scans; driving the unsummarized plan materializes every
    // output column. All per-run times go to stderr so a regression is
    // attributable from the bench log alone (alongside the operators'
    // own [graft] diagnostics, e.g. nearDupClusters' converged-round
    // count).
    val nRuns = 3
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to nRuns).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).queryExecution.toRdd.count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }
      System.err.println(s"[bench] $name runs=" +
        times.map(t => f"$t%.3f").mkString("[", ",", "]"))
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val ccRounds = graft.dedup.Dedup.lastCcRounds.get()
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$nRuns,"cc_rounds":$ccRounds,"timing":"min-of-$nRuns, full materialization via toRdd"}""")
    spark.stop()
  }
}
