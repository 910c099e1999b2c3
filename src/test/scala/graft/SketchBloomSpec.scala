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
}
