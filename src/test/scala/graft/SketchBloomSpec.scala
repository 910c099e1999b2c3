package graft

import org.apache.spark.sql.functions._

import graft.expressions.SketchAggregates
import graft.operators.BloomJoin

class SketchBloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloomJoin returns exactly the plain join result") {
    val probe = spark.range(0, 10000).select(col("id").as("k"), (col("id") % 7).as("v"))
    val build = spark.range(0, 10000, 37).select(col("id").as("bk"), lit("x").as("tag"))
    val plain = probe.join(build, col("k") === col("bk")).select("k", "v", "tag")
    val bloomed = BloomJoin.join(probe, build, "k", "bk", expectedItems = 300)
      .select("k", "v", "tag")
    assert(bloomed.count() == plain.count())
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
  }

  test("bloom prefilter drops most non-matching probe rows map-side") {
    val probe = spark.range(0, 100000).toDF("k")
    val build = spark.range(0, 100000, 1000).toDF("bk") // 100 keys
    val bloom = BloomJoin.buildFilter(build, col("bk"), expectedItems = 100, fpp = 0.01)
    val kept = BloomJoin.prefilter(probe, col("k"), bloom).count()
    // every true match survives; false positives stay near fpp
    assert(kept >= 100, s"true matches must survive, kept=$kept")
    assert(kept <= 100 + 100000 * 0.05, s"fpp blowout: kept=$kept of 100000")
  }

  test("bloomJoin with an empty build side yields an empty result") {
    val probe = spark.range(0, 100).toDF("k")
    val build = spark.range(0, 0).toDF("bk")
    assert(BloomJoin.join(probe, build, "k", "bk", expectedItems = 10).isEmpty)
  }

  test("bloomJoin preserves probe rows for outer/anti join types") {
    // left outer and left_anti PRESERVE unmatched probe rows — exactly
    // the ones a bloom prefilter would drop; the join must bypass the
    // prefilter for them and still equal the plain join
    val probe = spark.range(0, 1000).select(col("id").as("k"), (col("id") % 3).as("v"))
    val build = spark.range(0, 1000, 50).select(col("id").as("bk"), lit("x").as("tag"))
    for (jt <- Seq("left_outer", "full_outer", "left_anti")) {
      val plain = probe.join(build, col("k") === col("bk"), jt)
      val bloomed = BloomJoin.join(probe, build, "k", "bk", expectedItems = 20, joinType = jt)
      assert(bloomed.count() == plain.count(), s"$jt row count")
      assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty, jt)
    }
    // left_semi stays on the prefiltered path and stays exact
    val semiPlain = probe.join(build, col("k") === col("bk"), "left_semi")
    val semiBloom = BloomJoin.join(probe, build, "k", "bk", expectedItems = 20, joinType = "left_semi")
    assert(semiBloom.exceptAll(semiPlain).isEmpty && semiPlain.exceptAll(semiBloom).isEmpty)
  }

  test("bloomJoin clamps oversized expectedItems to the session's runtime-bloom caps") {
    // 10x past the default maxNumItems (4M): must degrade (coarser
    // filter), not fail analysis or over-allocate
    val probe = spark.range(0, 1000).toDF("k")
    val build = spark.range(0, 1000, 100).toDF("bk")
    val out = BloomJoin.join(probe, build, "k", "bk", expectedItems = 40_000_000L)
    assert(out.count() == 10)
  }

  test("kmvDistinct estimate tracks the exact distinct count") {
    // 5000 rows, 1000 distinct keys, k=256 → expect ~1/sqrt(k)≈6% error
    val df = spark.range(0, 5000).select((col("id") % 1000).as("v"))
    val row = df.agg(SketchAggregates.kmvDistinct(col("v"), 256).as("sk"))
      .select(col("sk.estimate")).head()
    val est = row.getLong(0)
    assert(math.abs(est - 1000.0) / 1000.0 < 0.2, s"estimate $est too far from 1000")
  }

  test("kmvDistinct is exact below k and invariant to partitioning") {
    val df = spark.range(0, 500).select((col("id") % 37).as("v"))
    def sketch(d: org.apache.spark.sql.DataFrame) =
      d.agg(SketchAggregates.kmvDistinct(col("v"), 64).as("sk"))
        .select(col("sk.estimate"), array_join(col("sk.kmin"), ",")).head()
    val r1 = sketch(df.repartition(1))
    val r8 = sketch(df.repartition(8))
    assert(r1.getLong(0) == 37 && r8.getLong(0) == 37)
    // merge across partitions must reproduce the identical sketch state
    assert(r1.getString(1) == r8.getString(1))
  }

  test("kmvDistinct works as a streaming windowed aggregate (state round-trips)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    input.addData((1 to 50).map(i =>
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:05"), (i % 20).toLong)): _*)
    val df = input.toDF().toDF("ts", "user_id")
    val agg = df.withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(SketchAggregates.kmvDistinct(col("user_id"), 64).as("sk"))
      .select(col("window.start").as("ws"), col("sk.estimate").as("est"))
    val q = agg.writeStream.format("memory").queryName("kmv_out")
      .outputMode("append").start()
    // advance the watermark past the window so it finalizes
    input.addData((java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 999L))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("kmv_out").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("est") == 20L) // below k → exact, across state store round-trips
  }

  test("kmv sketch algebra: union is exact-composable, overlap tracks true Jaccard") {
    // A = [0, 1200), B = [800, 2000): |A∪B| = 2000, |A∩B| = 400, J = 0.2
    val a = spark.range(0, 1200).agg(SketchAggregates.kmvDistinct(col("id"), 256).as("ska"))
    val b = spark.range(800, 2000).agg(SketchAggregates.kmvDistinct(col("id"), 256).as("skb"))
    val both = a.crossJoin(b).select(
      SketchAggregates.kmvUnion(col("ska"), col("skb"), 256).as("u"),
      SketchAggregates.kmvOverlap(col("ska"), col("skb"), 256).as("o"))
    val r = both.select(col("u.estimate"), col("o.jaccard"), col("o.intersection_est")).head()
    assert(math.abs(r.getLong(0) - 2000.0) / 2000.0 < 0.2, s"union est ${r.getLong(0)}")
    assert(math.abs(r.getDouble(1) - 0.2) < 0.1, s"jaccard ${r.getDouble(1)}")
    assert(math.abs(r.getLong(2) - 400.0) / 400.0 < 0.5, s"intersection ${r.getLong(2)}")
    // union of a sketch with itself is itself (idempotent)
    val self = a.select(SketchAggregates.kmvUnion(col("ska"), col("ska"), 256).as("u"),
      col("ska")).head()
    assert(self.getStruct(0) == self.getStruct(1))
  }

  test("mergeKmv: incremental sketch state is byte-identical to one-shot") {
    import graft.operators.Incremental
    def sk(lo: Long, hi: Long) = spark.range(lo, hi)
      .select((col("id") % 2).as("g"), (col("id") % 500).as("v"))
      .groupBy("g").agg(SketchAggregates.kmvDistinct(col("v"), 64).as("sk"))
      .select(col("g"), col("sk.kmin").as("kmin"))
    val merged = Incremental.mergeKmv(sk(0, 1200), sk(1200, 2000), Seq("g"), "kmin", 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val oneShot = sk(0, 2000)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(merged == oneShot) // KMV mergeability: exact state equality
  }

  test("kmvDistinct per-group sketches merge under partial aggregation") {
    val df = spark.range(0, 2000)
      .select((col("id") % 3).as("g"), (col("id") % 211).as("v"))
      .repartition(8)
    val rows = df.groupBy("g")
      .agg(SketchAggregates.kmvDistinct(col("v"), 128).as("sk"))
      .select(col("g"), col("sk.estimate")).collect()
    assert(rows.length == 3)
    // every residue class mod 3 hits all 211 values (2000 > 3*211*lcm? —
    // id%3 and id%211 cycle with period 633 < 2000, so yes)
    rows.foreach(r => assert(math.abs(r.getLong(1) - 211.0) / 211.0 < 0.25,
      s"g=${r.getLong(0)} est=${r.getLong(1)}"))
  }

  test("mgUnion composes stored sketches like the aggregate's own merge") {
    // two shards, overlapping items, exact regime (k >= total distinct)
    val s1 = spark.range(0, 300).select((col("id") % 3).cast("string").as("x"))
    val s2 = spark.range(0, 200).select((col("id") % 5).cast("string").as("x"))
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.agg(SketchAggregates.misraGries(col("x"), 8).as("hh"))
    val union = sk(s1).crossJoin(sk(s2).withColumnRenamed("hh", "hh2"))
      .select(SketchAggregates.mgUnion(col("hh"), col("hh2"), 8).as("u"))
      .select(explode(col("u"))).select("col.item", "col.cnt")
      .as[(String, Long)].collect().toMap
    val direct = sk(s1.union(s2))
      .select(explode(col("hh"))).select("col.item", "col.cnt")
      .as[(String, Long)].collect().toMap
    assert(union == direct, s"union=$union direct=$direct")
    // lossy regime: a dominant item survives union and stays bounded
    val heavy = spark.range(0, 900).select(lit("H").as("x"))
    val noise = spark.range(0, 64).select(concat(lit("n"), col("id")).as("x"))
    val u2 = sk(heavy).crossJoin(sk(noise).withColumnRenamed("hh", "hh2"))
      .select(SketchAggregates.mgUnion(col("hh"), col("hh2"), 4).as("u"))
      .select(explode(col("u"))).select("col.item", "col.cnt")
      .as[(String, Long)].collect().toMap
    assert(u2.contains("H") && u2("H") <= 900 && u2.size <= 4, s"got $u2")
  }

  test("quantileSketch is exact and partition-invariant below k") {
    val vs = (1 to 1000).map(i => ((i * 37) % 1000).toDouble) // permutation of 0..999
    for (parts <- Seq(1, 7)) {
      val df = vs.toDF("v").repartition(parts)
      val got = df.agg(SketchAggregates.quantileSketch(col("v"), 2048).as("sk"))
        .select(
          SketchAggregates.sketchQuantileDisc(col("sk"), 25),
          SketchAggregates.sketchQuantileDisc(col("sk"), 50),
          SketchAggregates.sketchQuantileDisc(col("sk"), 90)).head()
      // ceil(p*n)-th order statistic of 0..999 (n=1000): 249, 499, 899
      assert((got.getDouble(0), got.getDouble(1), got.getDouble(2))
        == ((249.0, 499.0, 899.0)), s"parts=$parts got $got")
    }
  }

  test("quantileSketch lossy regime stays within a 10% rank bound at 150x overflow") {
    val n = 30000
    val k = 200
    val df = spark.range(0, n).select(
      ((col("id") * 2654435761L) % n).cast("double").as("v")) // scrambled 0..n-1
      .repartition(8)
    val sample = df.agg(SketchAggregates.quantileSketch(col("v"), k).as("sk"))
    val state = sample.select(explode(col("sk"))).select("col.v", "col.w")
      .as[(Double, Long)].collect()
    // bounded state: far fewer than n entries survive
    assert(state.length < 3 * k, s"state ${state.length} should be ~k, n=$n")
    for (p <- Seq(25, 50, 90)) {
      val est = sample.select(SketchAggregates.sketchQuantileDisc(col("sk"), p))
        .head().getDouble(0)
      val trueRank = est // values are 0..n-1, so the value IS its rank
      val target = math.ceil(n * p / 100.0)
      assert(math.abs(trueRank - target) <= 0.1 * n,
        s"p$p: est=$est rank off by ${math.abs(trueRank - target)} (n=$n)")
    }
  }

  test("quantileSketch works as a streaming windowed aggregate (state round-trips)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    input.addData((1 to 99).map(i =>
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:05"), i.toDouble)): _*)
    val df = input.toDF().toDF("ts", "v")
    val agg = df.withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(SketchAggregates.quantileSketch(col("v"), 256).as("sk"))
      .select(SketchAggregates.sketchQuantileDisc(col("sk"), 50).as("med"))
    val q = agg.writeStream.format("memory").queryName("qs_out")
      .outputMode("append").start()
    input.addData((java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 0.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("qs_out").collect()
    assert(rows.length == 1 && rows.head.getDouble(0) == 50.0) // exact below k
  }

  test("misraGries works as a streaming windowed aggregate (state round-trips)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    input.addData((1 to 60).map(i =>
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:05"), (i % 3).toLong)): _*)
    val df = input.toDF().toDF("ts", "item_id")
    val agg = df.withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(SketchAggregates.misraGries(col("item_id").cast("string"), 8).as("hh"))
      .select(explode(col("hh")))
      .select(col("col.item"), col("col.cnt"))
    val q = agg.writeStream.format("memory").queryName("mg_out")
      .outputMode("append").start()
    input.addData((java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 999L))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("mg_out").as[(String, Long)].collect().toMap
    assert(rows == Map("0" -> 20L, "1" -> 20L, "2" -> 20L))
  }

  test("countMin works as a streaming windowed aggregate (state round-trips)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    input.addData((1 to 60).map(i =>
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:05"), (i % 3).toLong)): _*)
    val df = input.toDF().toDF("ts", "item_id")
    val agg = df.withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(SketchAggregates.countMin(col("item_id").cast("string"), 4, 64).as("sk"))
      .select(
        SketchAggregates.cmEstimate(col("sk"), lit("0"), 4, 64).as("e0"),
        SketchAggregates.cmEstimate(col("sk"), lit("1"), 4, 64).as("e1"))
    val q = agg.writeStream.format("memory").queryName("cm_out")
      .outputMode("append").start()
    input.addData((java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 999L))
    q.processAllAvailable(); q.stop()
    // 3 keys in 4x64 buckets: no all-row collision, estimates exact
    val rows = spark.table("cm_out").as[(Long, Long)].collect()
    assert(rows.toSeq == Seq((20L, 20L)))
  }

  test("misraGries is exact and partition-invariant when k >= #distinct") {
    val df = spark.range(0, 5000)
      .select(concat(lit("item"), col("id") % 17).as("x"))
    val exact = df.groupBy("x").count().as[(String, Long)].collect().toMap
    for (parts <- Seq(1, 13)) {
      val hh = df.repartition(parts)
        .agg(SketchAggregates.misraGries(col("x"), 32).as("hh"))
        .select(explode(col("hh"))).select("col.item", "col.cnt")
        .as[(String, Long)].collect().toMap
      assert(hh == exact, s"parts=$parts")
    }
  }

  test("countMin estimates are >= true counts, exact at wide width, partition-invariant") {
    val df = Seq.tabulate(500)(i => s"key${i % 23}").toDF("k")
    val exact = df.groupBy("k").count()
    // narrow sketch: the overestimate-only law must hold per key
    val narrow = df.agg(SketchAggregates.countMin(col("k"), 4, 8).as("sk"))
    val ests = exact.crossJoin(narrow)
      .select(col("k"), col("count"),
        SketchAggregates.cmEstimate(col("sk"), col("k"), 4, 8).as("est"))
      .collect()
    assert(ests.forall(r => r.getAs[Long]("est") >= r.getAs[Long]("count")),
      "CMS must never underestimate")
    // wide sketch: 23 keys in 4x4096 counters — no all-row collision, exact
    val wide = df.agg(SketchAggregates.countMin(col("k"), 4, 4096).as("sk"))
    val wideEsts = exact.crossJoin(wide)
      .select(col("count"),
        SketchAggregates.cmEstimate(col("sk"), col("k"), 4, 4096).as("est"))
      .collect()
    assert(wideEsts.forall(r => r.getAs[Long]("est") == r.getAs[Long]("count")))
    // linearity: the counter matrix is identical under any partitioning
    val a = df.repartition(7).agg(SketchAggregates.countMin(col("k"), 4, 8)).head.getSeq[Long](0)
    val b = df.repartition(2).agg(SketchAggregates.countMin(col("k"), 4, 8)).head.getSeq[Long](0)
    assert(a == b)
  }

  test("cmUnion of stored sketches equals the sketch of the combined data exactly") {
    val dfA = Seq.tabulate(200)(i => s"k${i % 11}").toDF("k")
    val dfB = Seq.tabulate(300)(i => s"k${i % 17}").toDF("k")
    val skA = dfA.agg(SketchAggregates.countMin(col("k"), 4, 16).as("a"))
    val skB = dfB.agg(SketchAggregates.countMin(col("k"), 4, 16).as("b"))
    val unioned = skA.crossJoin(skB)
      .select(SketchAggregates.cmUnion(col("a"), col("b")).as("u"))
      .head.getSeq[Long](0)
    val oneShot = dfA.unionAll(dfB)
      .agg(SketchAggregates.countMin(col("k"), 4, 16)).head.getSeq[Long](0)
    assert(unioned == oneShot, "CMS is linear: union must be exact")
  }

  test("hllDistinct corrected estimate tracks the exact distinct count") {
    // 50k rows, 20k distinct, p=12 (m=4096): raw regime (20k > 5m/2),
    // expected relative error ~1.04/sqrt(m) ≈ 1.6%; allow 6%
    val df = spark.range(0, 50000).select((col("id") % 20000).as("v"))
    val est = df.agg(SketchAggregates.hllDistinct(col("v"), 12).as("hll"))
      .select(SketchAggregates.hllCorrectedEstimate(col("hll"), 12)).head().getLong(0)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.06, s"estimate $est too far from 20000")
  }

  test("hllDistinct small-range regime: linear counting stays tight") {
    // 100 distinct in m=4096 registers → the ln-based branch fires and
    // is near-exact (collision-corrected occupancy count)
    val df = spark.range(0, 1000).select((col("id") % 100).as("v"))
    val est = df.agg(SketchAggregates.hllDistinct(col("v"), 12).as("hll"))
      .select(SketchAggregates.hllCorrectedEstimate(col("hll"), 12)).head().getLong(0)
    assert(math.abs(est - 100.0) <= 5, s"linear-counting estimate $est far from 100")
  }

  test("hll_distinct rejects out-of-domain hashes with the contract named") {
    // the SQL surface takes any long column; a full-64-bit hash like
    // xxhash64 must fail loudly, not index registers out of range
    val e = intercept[org.apache.spark.SparkException] {
      spark.range(0, 10).selectExpr("xxhash64(id) AS h")
        .selectExpr("hll_distinct(h, 12)").collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString("\n")
    assert(msgs.contains("60-bit domain"), s"wrong failure: $msgs")
  }

  test("hllDistinct register state is invariant to partitioning") {
    val df = spark.range(0, 5000).select((col("id") % 700).as("v"))
    def regs(parts: Int): String =
      df.repartition(parts).agg(SketchAggregates.hllDistinct(col("v"), 8).as("hll"))
        .select(array_join(col("hll.regs"), ",")).head().getString(0)
    assert(regs(1) == regs(13)) // pointwise-max merge: order/grouping free
  }

  test("hllUnion of stored registers equals the whole-data sketch exactly") {
    def sk(lo: Long, hi: Long) = spark.range(lo, hi)
      .select((col("id") % 900).as("v"))
      .agg(SketchAggregates.hllDistinct(col("v"), 8).as("hll"))
      .select(col("hll.regs").as("regs"), col("hll.n_zero").as("nz"),
        col("hll.pow_sum").as("ps"))
    val u = sk(0, 1200).select(col("regs").as("a"))
      .crossJoin(sk(1200, 2000).select(col("regs").as("b")))
      .select(SketchAggregates.hllUnion(col("a"), col("b"), 8).as("u"))
      .select(array_join(col("u.regs"), ","), col("u.n_zero"), col("u.pow_sum")).head()
    val whole = sk(0, 2000)
      .select(array_join(col("regs"), ","), col("nz"), col("ps")).head()
    assert(u == whole, s"union=$u whole=$whole")
  }

  test("hllDistinct works as a streaming windowed aggregate (state round-trips)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    input.addData((1 to 200).map(i =>
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:05"), (i % 50).toLong)): _*)
    val df = input.toDF().toDF("ts", "user_id")
    val agg = df.withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(SketchAggregates.hllDistinct(col("user_id"), 12).as("hll"))
      .select(SketchAggregates.hllCorrectedEstimate(col("hll"), 12).as("est"))
    val q = agg.writeStream.format("memory").queryName("hll_out")
      .outputMode("append").start()
    input.addData((java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 999L))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("hll_out").collect()
    assert(rows.length == 1)
    // 50 distinct, m=4096 → linear counting, near-exact across state store
    assert(math.abs(rows.head.getLong(0) - 50.0) <= 3, s"got ${rows.head.getLong(0)}")
  }

  test("contaminationBloom never under-counts vs the exact shingle join") {
    import graft.functions.TextFunctions
    val evalDocs = Seq((1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "pack my box with five dozen liquor jugs right now")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"), // fully contaminated
      (11L, "completely unrelated sentence about distributed query engines and parquet"),
      (12L, "pack my box with five dozen utterly different words here")) // partial overlap
      .toDF("doc_id", "text")
    val words = TextFunctions.bloomWordsOfEval(evalDocs, mBits = 1 << 12, k = 3)
    val bloom = TextFunctions.contaminationBloom(corpus, words, mBits = 1 << 12, k = 3)
      .select("doc_id", "n_flagged").as[(Long, Long)].collect().toMap
    val exact = TextFunctions.contamination(evalDocs, corpus)
      .select("doc_id", "n_matched").as[(Long, Long)].collect().toMap
    exact.foreach { case (id, m) =>
      assert(bloom(id) >= m, s"doc $id: bloom ${bloom(id)} under-counts exact $m")
    }
    // a fully-contained doc must be fully flagged (no false negatives)
    val full = TextFunctions.contaminationBloom(corpus, words, mBits = 1 << 12, k = 3)
      .filter(col("doc_id") === 10L).select("bloom_frac").head().getDouble(0)
    assert(full == 1.0, s"fully-contaminated doc scored $full")
  }

  test("contaminationBloom screens the corpus with ZERO exchanges") {
    import graft.functions.TextFunctions
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val corpus = spark.range(0, 200).select(col("id").as("doc_id"),
      concat(lit("doc words number "), col("id"), lit(" filler text tail")).as("text"))
    val words = new Array[Long]((1 << 12) / 64) // empty bitset: still probes every path
    val screened = TextFunctions.contaminationBloom(corpus, words, mBits = 1 << 12, k = 3)
    screened.queryExecution.toRdd.count()
    val nodes = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.execution.SparkPlan]
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = { nodes += p; p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other => other.children.foreach(walk)
    } }
    walk(screened.queryExecution.executedPlan)
    val exchanges = nodes.collect { case e: Exchange => e }
    assert(exchanges.isEmpty,
      s"bloom screen must be scan→project, found: ${exchanges.mkString(";")}")
    assert(screened.count() == 200)
  }

  test("misraGries lossy regime honors the n/(k+1) guarantee on skewed data") {
    // 6000 rows: 'heavy' 3000 times, 'warm' 1500, and 1500 singletons
    val heavy = spark.range(0, 3000).select(lit("heavy").as("x"))
    val warm = spark.range(0, 1500).select(lit("warm").as("x"))
    val tail = spark.range(0, 1500).select(concat(lit("t"), col("id")).as("x"))
    val df = heavy.union(warm).union(tail).repartition(8)
    val k = 9
    val n = 6000.0
    val got = df.agg(SketchAggregates.misraGries(col("x"), k).as("hh"))
      .select(explode(col("hh"))).select("col.item", "col.cnt")
      .as[(String, Long)].collect().toMap
    assert(got.size <= k)
    // anything above n/(k+1) = 600 must be present
    assert(got.contains("heavy") && got.contains("warm"), s"got $got")
    // counters never overestimate and undershoot by at most n/(k+1)
    val truth = Map("heavy" -> 3000L, "warm" -> 1500L).withDefaultValue(1L)
    got.foreach { case (item, c) =>
      assert(c <= truth(item), s"$item overestimated: $c > ${truth(item)}")
      assert(c >= truth(item) - n / (k + 1), s"$item undershot: $c")
    }
  }

}
