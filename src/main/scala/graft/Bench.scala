package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Queries whose documented semantics are quadratic baselines or
    * fixed-query-set brute force: their scaling ratios are recorded
    * but exempt from the ≲-linear expectation. */
  private val scalingExempt = Map(
    "dedup_ngram_jaccard" -> "documented O(n^2) exact Jaccard baseline (maxId-bounded)",
    "sim_topk" -> "brute-force float cosine top-k baseline",
    "sim_hamming" -> "brute-force Hamming top-k baseline",
    "embed_neardup" -> "pair-verifying near-dup: candidate pairs grow with bucket density",
    "sim_lsh" -> "LSH bucket self-join pair baseline")

  private def fmt(d: Double): String = f"$d%.3f"

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
    // Full evaluation via queryExecution.toRdd.count(): a plain count()
    // lets Catalyst prune every projection not needed for counting, so
    // map-only queries (text_scrub, token_count, ...) would be timed as
    // bare scans; driving the unsummarized plan materializes every
    // output column. Each run builds a FRESH plan (AQE reuses shuffle
    // stages of a re-executed DataFrame instance, which would not be an
    // honest timing).
    def timeOne(name: String,
                fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                dir: String): Option[Double] = {
      val t0 = System.nanoTime()
      val timed =
        try {
          fn(spark, dir).queryExecution.toRdd.count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      // Isolation between timed runs (outside the timer): operators
      // scope their own persists since round 7, so this is a defensive
      // guard — any CacheManager entry a query DID leave behind would
      // distort every later query's memory budget and timing.
      spark.catalog.clearCache()
      // localCheckpoint-backed results are plain RDD blocks the
      // ContextCleaner frees only after the result is GARBAGE-
      // COLLECTED — clearCache() does not touch them, and without a GC
      // nudge each run's orphaned blocks stack up in the storage pool
      // until later runs pay eviction/spill (bench-proven: containment
      // runs [2.9, 12.8, 12.1] s with the same fresh plan each time).
      System.gc()
      timed
    }
    // min of three timed runs per query: this VM's run-to-run variance
    // is ±30%, and the steady-state minimum is the honest throughput
    // figure. ALL per-run times ship in the artifact (runs_s), so a
    // cross-round delta is self-adjudicating: per-run spread >> delta
    // means box noise, tight runs that all moved means code. Failed
    // queries report min -1 (never a fast-failure latency).
    val nRuns = 3
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to nRuns).flatMap(_ => timeOne(name, fn, sfDir))
      System.err.println(s"[bench] $name runs=" +
        times.map(fmt).mkString("[", ",", "]"))
      name -> times
    }
    val mins = results.map { case (n, ts) => n -> (if (ts.nonEmpty) ts.min else -1.0) }
    val total = mins.collect { case (_, t) if t > 0 => t }.sum

    // Scaling curve: the 10 heaviest queries re-timed at each sibling
    // scale factor (10x data per step). Ratios near (or below) the data
    // ratio mean the plan scales ~linearly; marked-exempt baselines are
    // recorded but documented quadratic. min-of-2 fresh plans per point
    // (first run warms that SF's page cache).
    val sfNames = Seq("sf0.001", "sf0.01", "sf0.1")
    val baseDir = Option(new java.io.File(sfDir).getParentFile)
    val scalingCompact = new scala.collection.mutable.ArrayBuffer[String]
    val attributionCompact = new scala.collection.mutable.ArrayBuffer[String]
    // sweep-min vs scaling-block agreement per heavy query (task: the
    // two timing paths must adjudicate each other — a 12x disagreement
    // on the same query at the same SF means cross-query interference)
    val consistency = new scala.collection.mutable.ArrayBuffer[(String, Double, Double)]
    val scalingJson = baseDir match {
      case Some(base) if sfNames.forall(n => new java.io.File(base, n).isDirectory) =>
        // 10 heaviest + a fixed watchlist (queries whose growth curves
        // past rounds flagged), so round-over-round curves stay
        // comparable even when the heavy set churns
        val watchlist = Seq("fact_trip", "revenue_by_nation", "corpus_filter",
          "staging_agg", "span_dedup").filter(n =>
          mins.exists { case (m, t) => m == n && t > 0 })
        val heavy = (mins.filter(_._2 > 0).sortBy(-_._2).take(10).map(_._1) ++
          watchlist).distinct
        val entries = heavy.map { name =>
          val fn = SparkEntry.queries(name)
          val points = sfNames.map { sn =>
            val dir = new java.io.File(base, sn).getPath
            val ts = (1 to 2).flatMap(_ => timeOne(name, fn, dir))
            // One metered (untimed) run per point: its shuffle volume,
            // spill, and scan-row counts ATTRIBUTE the time curve — a
            // time ratio at or below the shuffle/scan-volume ratio is
            // data-proportional cost (scale-fine); time outgrowing both
            // would mean the plan itself changed shape across SFs.
            // measureAllJobs (stage listener) rather than the plan
            // walk: iterative operators shuffle in earlier jobs the
            // final plan no longer references.
            val m = try Some(graft.core.Metrics.measureAllJobs(fn(spark, dir)))
                    catch { case _: Throwable => None }
            spark.catalog.clearCache()
            ((if (ts.nonEmpty) ts.min else -1.0), m)
          }
          val times = points.map(_._1)
          System.err.println(s"[bench][scaling] $name " +
            sfNames.zip(times).map { case (s, t) => s"$s=${fmt(t)}" }.mkString(" "))
          sfNames.zip(times).find(_._1 == new java.io.File(sfDir).getName)
            .filter(_._2 > 0).foreach { case (_, iso) =>
              consistency += ((name, mins.toMap.apply(name), iso))
            }
          // growth per 10x data step; null when a leg failed or is too
          // fast to attribute (fixed session overhead dominates <50ms)
          val ratios = times.sliding(2).map {
            case Seq(a, b) if a > 0.05 && b > 0 => fmt(b / a)
            case _ => "null"
          }.mkString("[", ",", "]")
          def mSeries(f: graft.core.Metrics.PlanMetrics => Long): Seq[Long] =
            points.map(_._2.map(f).getOrElse(-1L))
          val shufB = mSeries(_.shuffleBytesWritten)
          val shufR = mSeries(_.shuffleRecordsWritten)
          val scanR = mSeries(_.scanRowsRead)
          val spill = mSeries(_.spillBytesDisk)
          def lastRatio(xs: Seq[Long]): Option[Double] = (xs.init.last, xs.last) match {
            case (a, b) if a > 0 && b >= 0 => Some(b.toDouble / a)
            case _ => None
          }
          // Attribution of the final 10x step (the one local[32] is most
          // likely to distort): sublinear-in-data is always fine; else
          // time must not outgrow the max of shuffle-record and scan-row
          // growth by more than 1.5x, or we flag a suspected plan change.
          val tG = if (times.init.last > 0.05 && times.last > 0)
            Some(times.last / times.init.last) else None
          val volG = (lastRatio(shufR).toSeq ++ lastRatio(scanR).toSeq ++ Seq(1.0)).max
          val attribution = tG match {
            case None => "too-fast-to-attribute"
            case Some(g) if g <= 2.0 => "near-flat"
            case Some(g) if g <= 10.0 && g <= 1.5 * volG => "data-proportional (sublinear-in-data)"
            case Some(g) if g <= 1.5 * volG => "volume-proportional"
            case Some(_) => "SUSPECT: time outgrows shuffle+scan volume — possible plan change"
          }
          val exempt = scalingExempt.get(name)
            .map(r => s"""{"exempt":true,"why":"$r"}""").getOrElse("""{"exempt":false}""")
          scalingCompact +=
            s""""$name${if (scalingExempt.contains(name)) "(exempt)" else ""}":$ratios"""
          attributionCompact += s""""$name":"$attribution""""
          def arr(xs: Seq[Long]) = xs.mkString("[", ",", "]")
          s""""$name":{"times_s":${times.map(fmt).mkString("[", ",", "]")},"growth_per_10x":$ratios,"shuffle_bytes":${arr(shufB)},"shuffle_records":${arr(shufR)},"scan_rows":${arr(scanR)},"spill_bytes":${arr(spill)},"attribution":"$attribution","label":$exempt}"""
        }
        s"""{"sf_points":${sfNames.map("\"" + _ + "\"").mkString("[", ",", "]")},"data_ratio_per_step":10,"timing":"min-of-2 fresh plans + one metered run per point","queries":{${entries.mkString(",")}}}"""
      case _ => "null"
    }

    // Self-adjudication: the sweep and the scaling block time the same
    // query at the same SF through the same timeOne — beyond ~2x apart
    // (min-of-3 vs min-of-2 plus box noise) means queries are
    // interfering (e.g. leaked caches), which round 6 proved can hide a
    // 12x error. Loud on stderr + recorded in the artifact.
    val inconsistent = consistency.filter { case (_, sweep, iso) =>
      sweep > 0 && iso > 0.05 && (sweep / iso > 2.0 || iso / sweep > 2.0)
    }
    inconsistent.foreach { case (n, sweep, iso) =>
      System.err.println(s"[bench][WARNING] TIMING PATHS DISAGREE on $n: " +
        s"sweep-min ${fmt(sweep)}s vs scaling-block ${fmt(iso)}s (>2x) — " +
        "suspect cross-query interference; per-query numbers untrustworthy")
    }
    val consistencyJson = consistency.map { case (n, sweep, iso) =>
      s""""$n":{"sweep_min_s":${fmt(sweep)},"scaling_min_s":${fmt(iso)},"agree_2x":${!inconsistent.exists(_._1 == n)}}"""
    }.mkString("{", ",", "}")

    val qs = mins.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val perRun = results.map { case (k, ts) =>
      "\"" + k + "\":" + ts.map(fmt).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val ccRounds = graft.dedup.Dedup.lastCcRounds.get()
    val detail =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","total_s":${fmt(total)},"sf":"$sfDir","runs":$nRuns,"timing":"min-of-$nRuns, full materialization via toRdd, fresh plan per run, cache cleared between runs","cc_rounds":$ccRounds,"timing_consistency":$consistencyJson,"queries":$qs,"scaling":$scalingJson,"runs_s":$perRun}"""
    // The harness capturing stdout keeps only a bounded TAIL (~2 KB) of
    // it — a full 79-query detail line can never survive that whole. So
    // the complete evidence (per-run times for self-adjudication,
    // per-query mins, the scaling curve) goes to a file, and stdout
    // carries one compact line, sized to fit the tail window entirely:
    // totals, the 10 heaviest mins, and the scaling growth ratios.
    val detailPath = java.nio.file.Paths.get("BENCH_detail.json")
    try java.nio.file.Files.writeString(detailPath, detail + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] detail write failed: ${e.getMessage}") }
    val top10 = mins.filter(_._2 > 0).sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val scalingBrief =
      if (scalingCompact.isEmpty) "null" else scalingCompact.mkString("{", ",", "}")
    val attributionBrief =
      if (attributionCompact.isEmpty) "null" else attributionCompact.mkString("{", ",", "}")
    val disagree = inconsistent.map("\"" + _._1 + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","total_s":${fmt(total)},"sf":"$sfDir","runs":$nRuns,"cc_rounds":$ccRounds,"queries_n":${mins.size},"failed_n":${mins.count(_._2 < 0)},"timing_disagree_2x":$disagree,"top10_min_s":$top10,"scaling_growth_per_10x":$scalingBrief,"scaling_attribution":$attributionBrief,"detail_file":"${detailPath.toAbsolutePath}"}""")
    spark.stop()
  }
}
